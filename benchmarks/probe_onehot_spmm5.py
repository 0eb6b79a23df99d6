"""Probe 5: unweighted one-hots + val at the (KP, E) intermediate.

Round-4 VERDICT #1 wants both MU passes (XV and XtU) under the
fused-dense bf16 per-iter time (~1.7 ms at the 20NG shape). Probe 4's
hi*lo product decomposition Mosaic-miscompiles (HTTP 500 in
tpu_compile_helper). This probe tries the remaining construction lever:

  Today each kernel builds ONE weighted one-hot (compare + select(val
  broadcast) + convert = ~3 VPU ops/elt over (T,E)) and one unweighted
  one-hot (same 3 via where(1,0)+astype). Both can be built as
  mask.astype(dtype) — compare + bool->bf16 convert, 2 ops/elt — with
  val applied at the (KP, E) INTERMEDIATE instead (KP*E elems, ~60x
  smaller than (T+R)*E). Expected ~1.5x less VPU work; the pass is
  VPU-bound with the MXU overlapped, so the time should follow.

Also re-measures the fused-dense one-pass time in the same session so
the comparison doesn't ride a stale number across bandwidth drift.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

try:
    from pycmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
except Exception:  # noqa: BLE001
    pass

N, M, NNZ, K = 30000, 11314, 873651, 20
KP = 32
REPS = 20


def make_fwd_kernel(R, T, E, G, dtype, variant):
    def kernel(sb_ref, st_ref, pk_ref, bt_ref, out_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for g in range(G):
            i = s * G + g
            packed = pk_ref[g]
            val = packed[0, :]
            rl = jax.lax.bitcast_convert_type(packed[1, :], jnp.int32)
            cl = jax.lax.bitcast_convert_type(packed[2, :], jnp.int32)
            if variant == "cmp":   # today's construction (weighted cone)
                cone = jnp.where(
                    cl[None, :] == jax.lax.broadcasted_iota(
                        jnp.int32, (T, E), 0),
                    val[None, :], jnp.zeros((), jnp.float32)).astype(dtype)
                Wt = jnp.dot(bt_ref[st_ref[i]].astype(dtype), cone,
                             preferred_element_type=jnp.float32)
            else:                  # "uw": unweighted + val at intermediate
                cone = (cl[None, :] == jax.lax.broadcasted_iota(
                    jnp.int32, (T, E), 0)).astype(dtype)
                Wt = jnp.dot(bt_ref[st_ref[i]].astype(dtype), cone,
                             preferred_element_type=jnp.float32)
                Wt = Wt * val[None, :]
            rone = (rl[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (E, R), 1)).astype(dtype)
            out_ref[sb_ref[i]] += jnp.dot(
                Wt.astype(dtype), rone, preferred_element_type=jnp.float32)

    return kernel


def make_t_kernel(R, T, E, G, dtype, variant):
    def kernel(sb_ref, st_ref, pk_ref, ut_ref, out_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for g in range(G):
            i = s * G + g
            packed = pk_ref[g]
            val = packed[0, :]
            rl = jax.lax.bitcast_convert_type(packed[1, :], jnp.int32)
            cl = jax.lax.bitcast_convert_type(packed[2, :], jnp.int32)
            if variant == "cmp":
                roneT = jnp.where(
                    rl[None, :] == jax.lax.broadcasted_iota(
                        jnp.int32, (R, E), 0),
                    val[None, :], jnp.zeros((), jnp.float32)).astype(dtype)
                Wt = jnp.dot(ut_ref[sb_ref[i]].astype(dtype), roneT,
                             preferred_element_type=jnp.float32)
            else:
                roneT = (rl[None, :] == jax.lax.broadcasted_iota(
                    jnp.int32, (R, E), 0)).astype(dtype)
                Wt = jnp.dot(ut_ref[sb_ref[i]].astype(dtype), roneT,
                             preferred_element_type=jnp.float32)
                Wt = Wt * val[None, :]
            coneT = (cl[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (E, T), 1)).astype(dtype)
            out_ref[st_ref[i]] += jnp.dot(
                Wt.astype(dtype), coneT, preferred_element_type=jnp.float32)

    return kernel


def main():
    import scipy.sparse as sp

    import pycmf_tpu.ops.pallas.onehot as oh

    rng = np.random.RandomState(0)
    lin = rng.choice(N * M, size=NNZ, replace=False).astype(np.int64)
    rows = (lin // M).astype(np.int32)
    cols = (lin % M).astype(np.int32)
    vals = rng.rand(NNZ).astype(np.float32) + 0.5
    Xs = sp.coo_matrix((vals, (rows, cols)), shape=(N, M)).tocsr()
    B_m = rng.randn(M, K).astype(np.float32)
    B_n = rng.randn(N, K).astype(np.float32)

    print("data built; computing host references...", flush=True)
    vq = np.asarray(jnp.asarray(vals, jnp.bfloat16).astype(jnp.float32))
    Xq = sp.coo_matrix((vq.astype(np.float64), (rows, cols)),
                       shape=(N, M)).tocsr()
    Bmq = np.asarray(jnp.asarray(B_m, jnp.bfloat16).astype(jnp.float32),
                     np.float64)
    Bnq = np.asarray(jnp.asarray(B_n, jnp.bfloat16).astype(jnp.float32),
                     np.float64)
    want_f = (Xq @ Bmq).T
    want_t = (Xq.T @ Bnq).T
    print("references done", flush=True)

    # same-session fused-dense anchor: one bf16 pass over a dense X at
    # this shape (the MU one-pass floor the strips must beat). Built ON
    # DEVICE (jax.random) — uploading 679 MB through the ~MB/s tunnel
    # times the link, not the chip. The loop CHAINS V through a tiny
    # output-dependent perturbation so XLA cannot hoist the dot, and the
    # timer fetches a scalar (device_get) so it cannot ride a lazy
    # block_until_ready (probe_newton_decomp round-5 lesson).
    if "--no-dense" not in sys.argv:
        kx, kv = jax.random.split(jax.random.PRNGKey(0))
        Xd = jax.random.normal(kx, (N, M), jnp.bfloat16)
        Vd = jax.random.normal(kv, (M, K), jnp.bfloat16)

        @jax.jit
        def dense_pass(Xd, Vd):
            def body(_, c):
                Vd, acc = c
                out = jnp.dot(Xd, Vd, preferred_element_type=jnp.float32)
                s = (out[0, 0] * 1e-20).astype(jnp.bfloat16)
                return (Vd + s, acc + out[0, 0])
            return jax.lax.fori_loop(
                0, REPS, body, (Vd, jnp.float32(0)))[1]

        float(dense_pass(Xd, Vd))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(dense_pass(Xd, Vd))
            ts.append(time.perf_counter() - t0)
        print(f"dense one-pass XV bf16: {min(ts)/REPS*1e3:7.3f} ms "
              f"({N*M*2/ (min(ts)/REPS)/1e9:.0f} GB/s)", flush=True)
        del Xd

    dtype = jnp.bfloat16
    configs = ((512, 512, 256, 4),)
    idx = [a for a in sys.argv[1:] if not a.startswith("-")]
    all_cfg = ((512, 512, 256, 4), (512, 512, 128, 8),
               (512, 256, 128, 8), (256, 256, 128, 8),
               (512, 512, 512, 2), (1024, 512, 128, 8),
               (512, 512, 128, 16), (256, 512, 128, 8))
    if idx:
        configs = tuple(all_cfg[int(a)] for a in idx)
    for (R, T, E, G) in configs:
        L = oh.onehot_from_scipy(Xs, dtype=jnp.bfloat16, R=R, T=T, E=E, G=G)
        Sp_ = int(L.pk.shape[0])
        n_blocks = -(-N // R)
        m_tiles = -(-M // T)

        def lay(Bx, n_t, D):
            p = np.zeros((KP, n_t * D), np.float32)
            p[:K, :Bx.shape[0]] = Bx.T
            return jnp.asarray(p.reshape(KP, n_t, D).transpose(1, 0, 2)
                               .copy())

        bt_m = lay(B_m, m_tiles, T)
        bt_n = lay(B_n, n_blocks, R)

        for orient, mk, bt, osh, want, nout in (
                ("fwd", make_fwd_kernel, bt_m, (n_blocks, KP, R), want_f, N),
                ("t  ", make_t_kernel, bt_n, (m_tiles, KP, T), want_t, M)):
            for variant in ("uw", "cmp"):
                call = pl.pallas_call(
                    mk(R, T, E, G, dtype, variant),
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=2,
                        grid=(Sp_ // G,),
                        in_specs=[
                            pl.BlockSpec((G, 8, E), lambda s, a, b: (s, 0, 0)),
                            pl.BlockSpec(bt.shape, lambda s, a, b: (0, 0, 0)),
                        ],
                        out_specs=pl.BlockSpec(osh, lambda s, a, b: (0, 0, 0)),
                    ),
                    out_shape=jax.ShapeDtypeStruct(osh, jnp.float32),
                )

                @jax.jit
                def run(sb, st, pk, bt, call=call, osh=osh):
                    # chain bt through a tiny output-dependent term so
                    # XLA cannot hoist the (loop-invariant) call
                    def body(_, c):
                        bt, acc = c
                        out = call(sb, st, pk, bt)
                        return (bt + out[0, 0, 0] * 1e-20, acc + out)
                    return jax.lax.fori_loop(
                        0, REPS, body,
                        (bt, jnp.zeros(osh, jnp.float32)))[1]

                try:
                    out = run(L.sb, L.st, L.pk, bt)
                    float(out[0, 0, 0])  # force completion
                except Exception as e:  # noqa: BLE001
                    print(f"{orient} {variant:4s} R={R:4d} T={T:3d} E={E:3d} "
                          f"G={G:2d}: FAILED {type(e).__name__}: "
                          f"{str(e)[:90]}", flush=True)
                    continue
                got = (np.asarray(out).transpose(1, 0, 2)
                       .reshape(KP, -1)[:K, :nout] / REPS)
                err = (np.max(np.abs(got - want[:K]))
                       / max(1.0, np.abs(want).max()))
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    float(run(L.sb, L.st, L.pk, bt)[0, 0, 0])
                    ts.append(time.perf_counter() - t0)
                sec = min(ts) / REPS
                print(f"{orient} {variant:4s} R={R:4d} T={T:3d} E={E:3d} "
                      f"G={G:2d}: {sec*1e3:7.3f} ms {NNZ/sec/1e9:5.2f} "
                      f"Gnnz/s pad={L.pad_factor:.2f} err={err:.1e}",
                      flush=True)


if __name__ == "__main__":
    main()
