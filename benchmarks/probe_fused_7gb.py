"""Probe 3: the PRODUCTION fused MU U-pass on a 7.2 GB-dense-equivalent
problem stored bf16 (3.6 GB) — the densify-at-storage-dtype path that the
round-3 sparse decision tree routes beyond-threshold scattered X to.

Compares against the segment-sum CSR floor measured in probe_scatter.py
(187 ms per X@V pass → ~374 ms per MU iteration's two X passes).
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from pycmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    print("backend:", jax.default_backend(), flush=True)

    rng = np.random.RandomState(0)
    n, m, k = 59 * 1024, 30_000, 20
    nnz = 6_000_000
    rows = jnp.asarray(rng.randint(0, n, size=nnz).astype(np.int32))
    cols = jnp.asarray(rng.randint(0, m, size=nnz).astype(np.int32))
    vals = jnp.asarray(rng.rand(nnz).astype(np.float32))

    @jax.jit
    def densify_once(rd, cd, vd):
        return jnp.zeros((n, m), jnp.bfloat16).at[rd, cd].add(
            vd.astype(jnp.bfloat16))

    Xb = densify_once(rows, cols, vals)
    np.asarray(jax.device_get(Xb[0, :4]))
    print("densified bf16", Xb.shape, flush=True)

    V = jnp.asarray(rng.rand(m, k).astype(np.float32))
    U = jnp.asarray(rng.rand(n, k).astype(np.float32))
    from pycmf_tpu.ops.matmul import gram
    from pycmf_tpu.ops.pallas.mu_fused import fused_mu_u_pass

    @jax.jit
    def one_iter(Xb, U, V):
        VtV = gram(V)
        U2, numV, gramU = fused_mu_u_pass(Xb, U, V, VtV, 0.0, 0.0, 1e-10)
        V2 = V * (numV + 1e-10) / (V @ gramU + 1e-10)
        return U2, V2

    ITERS = 10

    @jax.jit
    def many(Xb, U, V):
        def body(_, uv):
            return one_iter(Xb, *uv)

        return jax.lax.fori_loop(0, ITERS, body, (U, V))

    def timeit(f, *args, reps=4):
        out = f(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0][:1]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(out)[0][:1]))
            ts.append(time.perf_counter() - t0)
        return min(ts), ts

    t, ts = timeit(one_iter, Xb, U, V)
    gb = n * m * 2 / 1e9
    print(f"fused MU iteration (single dispatch): {t * 1e3:.1f} ms "
          f"({gb / t:.0f} GB/s; vs 374 ms segment-sum 2-pass = "
          f"{374 / (t * 1e3):.1f}x) {[round(x * 1e3, 1) for x in ts]}",
          flush=True)
    # per-dispatch tunnel RTT dominates a single iteration; the in-jit
    # loop gives the true marginal per-iteration cost (measured 8.8 ms =
    # 411 GB/s = 42.5x segment-sum on 2026-08-17)
    t, ts = timeit(many, Xb, U, V)
    t /= ITERS
    print(f"fused MU per-iter (amortized over {ITERS}): {t * 1e3:.1f} ms "
          f"({gb / t:.0f} GB/s; vs 374 ms segment-sum = "
          f"{374 / (t * 1e3):.1f}x) "
          f"{[round(x / ITERS * 1e3, 1) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
