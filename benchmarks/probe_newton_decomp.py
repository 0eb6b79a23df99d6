"""Newton bench-config roofline decomposition (round-4 VERDICT #5).

The bench Newton mix (linear X, sigmoid Y, all non-negative, k=20,
X 30000x11314 bf16, Y 11314x20) measured ~2.44 ms/iter in BENCH_r04
(0.122 s / 50 iters). Its data floor is ONE X pass per iteration: the
fused linear U-pass emits XtU_new/UtU_new in the same pass and the V
update consumes those accumulators, so X streams once (679 MB bf16 ~
1.1 ms at MU's achieved ~620 GB/s); Y is 0.45 MB — noise. Where do the
other ~1.3 ms go?

Method: time the full jitted step, then steps with update_{U,Z,V}
toggled; differences attribute per-factor cost. Anchors: one raw bf16
X pass (the HBM floor) and the batched k x k Cholesky solve at V's row
count (the V update's only O(m k^2) non-matmul piece).

Timing protocol (round-5 fix): on this tunneled axon platform
``block_until_ready`` does NOT block (0.1 ms vs a 343 ms real compute),
and a scalar fetch costs one ~27 ms link RTT — comparable to the ~2 ms
signal. So each variant is timed at TWO loop lengths (R1/R2 iterations
inside one jitted fori_loop, completion forced by fetching a 1x1 slice)
and the per-iteration cost is the SLOPE (t2 - t1) / (R2 - R1), which
cancels the constant dispatch + RTT overhead exactly.

Results land in docs/PERFORMANCE.md ("Newton per-iteration
decomposition").
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

try:
    from pycmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
except Exception:  # noqa: BLE001
    pass

K = 20
SEED = 0
R1, R2 = 10, 60


def fetch(out):
    """Force real completion: device_get a 1x1 slice of the first leaf."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jax.device_get(leaf[(slice(0, 1),) * leaf.ndim]))


def timed_at(fn, *args, reps=5):
    """min seconds of fn(*args) with a real completion fetch inside."""
    fetch(fn(*args))  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed(make_fn, *args):
    """Per-iteration seconds via the two-length slope (RTT cancels)."""
    t1 = timed_at(make_fn(R1), *args)
    t2 = timed_at(make_fn(R2), *args)
    return (t2 - t1) / (R2 - R1), (t1, t2)


def main():
    from pycmf_tpu.solvers.common import SolverConfig, make_hyper
    from pycmf_tpu.solvers.newton import make_newton_step
    from pycmf_tpu.utils.datasets import synthetic_20ng
    from pycmf_tpu.utils.init import initialize_factors
    from pycmf_tpu.utils.validation import as_coupled

    X, Y = synthetic_20ng(random_state=SEED)
    n, m = X.shape
    r = Y.shape[1]
    U0, V0, Z0 = initialize_factors(
        X, Y, K, x_init="random", y_init="random", random_state=SEED)
    use_pallas = jax.default_backend() == "tpu"

    dd = jnp.bfloat16
    Xc = as_coupled(X, dd)
    Yc = as_coupled(Y, dd)
    U = jnp.asarray(U0, jnp.float32)
    V = jnp.asarray(V0, jnp.float32)
    Z = jnp.asarray(Z0, jnp.float32)
    hyper = make_hyper(dtype=jnp.float32)
    key = jax.random.PRNGKey(SEED)
    print(f"X {X.shape} ({n * m * 2 / 1e6:.0f} MB bf16), Y {Y.shape}",
          flush=True)

    def make_loop(cfg):
        step = make_newton_step(cfg)

        def at_reps(reps):
            @jax.jit
            def loop(Xc, Yc, U, V, Z, hyper, key):
                def body(i, c):
                    u, v, z = c
                    u, v, z = step(Xc, Yc, u, v, z, hyper,
                                   jax.random.fold_in(key, i))
                    return (u, v, z)
                return jax.lax.fori_loop(0, reps, body, (U, V, Z))

            return loop

        return at_reps

    import os

    base = dict(y_link="sigmoid", use_pallas=use_pallas)
    if os.environ.get("PYCMF_PROBE_ANCHORS_ONLY", "0") == "1":
        variants = [("full step (bench mix)", SolverConfig(**base))]
    else:
        variants = None
    variants = variants if variants is not None else [
        ("full step (bench mix)", SolverConfig(**base)),
        ("U only", SolverConfig(**base, update_V=False, update_Z=False)),
        ("U+Z", SolverConfig(**base, update_V=False)),
        ("U+V", SolverConfig(**base, update_Z=False)),
    ]
    times = {}
    for name, cfg in variants:
        sec, raw = timed(make_loop(cfg), Xc, Yc, U, V, Z, hyper, key)
        times[name] = sec
        print(f"{name:24s}: {sec * 1e3:7.3f} ms/iter "
              f"(t@{R1}={raw[0]:.3f}s t@{R2}={raw[1]:.3f}s)", flush=True)
    if "U+Z" in times:
        print(f"{'Z attribution (U+Z - U)':24s}: "
              f"{(times['U+Z'] - times['U only']) * 1e3:7.3f} ms", flush=True)
        print(f"{'V attribution (full-U-Z)':24s}: "
              f"{(times['full step (bench mix)'] - times['U+Z']) * 1e3:7.3f}"
              f" ms", flush=True)
        print(f"{'V attribution (U+V - U)':24s}: "
              f"{(times['U+V'] - times['U only']) * 1e3:7.3f} ms", flush=True)

    # ---- anchors ---------------------------------------------------------
    # NB on the toggle variants above: with update_V=False the U update's
    # DB = X·V is LOOP-INVARIANT (V frozen) and XLA hoists it out of the
    # fori_loop — "U only" / "U+Z" therefore measure the per-row work
    # minus the X pass, NOT a real per-iteration cost. Only variants where
    # V updates (U+V, full) stream X every iteration. The anchors below
    # carry the loop state INTO the data pass so nothing can hoist.
    Xd = Xc.A  # dense bf16 device copy

    def make_raw_pass(reps):
        @jax.jit
        def raw_pass(Xd, Vd):
            def body(_, acc):
                # acc[0, 0] is exactly 0 on every iteration, but XLA
                # cannot prove it: the data dependence forces the dot to
                # re-execute per iteration instead of being hoisted (the
                # first probe version measured a -0.011 ms/iter slope —
                # the loop-invariant dot had been folded away entirely).
                vc = (Vd.astype(jnp.float32) * (1.0 + acc[:1, :1] * 0.0)
                      ).astype(Vd.dtype)
                return acc + jnp.dot(Xd, vc,
                                     preferred_element_type=jnp.float32)
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((n, K), jnp.float32))

        return raw_pass

    sec, _ = timed(make_raw_pass, Xd, V.astype(dd))
    print(f"{'raw one-pass XV bf16':24s}: {sec * 1e3:7.3f} ms/iter "
          f"({n * m * 2 / sec / 1e9:.0f} GB/s)", flush=True)

    # True cost of the fused Newton linear U-pass (the bench mix's ONLY
    # X pass — its XᵀU_new/gramU accumulators feed the V update): a
    # pallas_call is opaque to XLA, and U_new feeds back, so every
    # iteration streams X.
    from pycmf_tpu.solvers.newton import shared_gauss_hinv
    from pycmf_tpu.ops.pallas.newton_fused import fused_newton_linear_u_pass

    BtB, Hinv, l1, l2 = shared_gauss_hinv(V, hyper)

    def make_fused_loop(reps, batched=False):
        @jax.jit
        def fused_loop(Xd, U, V, BtB, Hinv, rsq):
            def body(_, u):
                unew, numv, gramu = fused_newton_linear_u_pass(
                    Xd, u, V, BtB, Hinv, rsq, l1, l2,
                    trials=8, non_negative=True, batched_trials=batched)
                # touch the accumulators so they aren't dead-code-eliminated
                return unew + 0.0 * (numv[:1, :1] + gramu[0, 0])
            return jax.lax.fori_loop(0, reps, body, U)

        return fused_loop

    # same-session A/B: unrolled per-candidate dots vs one batched dot
    for tag, batched in [("fused U-pass (unroll)", False),
                         ("fused U-pass (batched)", True)]:
        sec, _ = timed(partial(make_fused_loop, batched=batched),
                       Xd, U, V, BtB, Hinv, Xc.row_sq)
        print(f"{tag:24s}: {sec * 1e3:7.3f} ms/iter "
              f"({n * m * 2 / sec / 1e9:.0f} GB/s)", flush=True)

    from pycmf_tpu.ops.pallas.batched_solve import batched_spd_solve

    Hb = jnp.tile((jnp.eye(K) * 3.0 + 0.1)[None], (m, 1, 1))
    Gb = jnp.asarray(np.random.RandomState(0).randn(m, K), jnp.float32)

    def make_solve_loop(reps):
        @jax.jit
        def solve_loop(Hb, Gb):
            def body(_, acc):
                # thread acc into the operand (same hoisting trap as the
                # raw-pass anchor: a loop-invariant solve measured a
                # NEGATIVE slope once XLA lifted it out of the loop)
                return acc + batched_spd_solve(Hb, Gb + 0.0 * acc)
            return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(Gb))

        return solve_loop

    try:
        sec, _ = timed(make_solve_loop, Hb, Gb)
        print(f"{'batched solve (m,k,k)':24s}: {sec * 1e3:7.3f} ms/iter",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"batched solve anchor failed: {type(e).__name__}: "
              f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
