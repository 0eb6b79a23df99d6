"""Probe 4: cheaper one-hot construction + transposed-orientation kernel.

Round-4 VERDICT #1 asks for both MU passes (XV and XtU) under the
fused-dense bf16 per-iter time (~1.71 ms at the 20NG shape). A literal
dual-output strip pass is impossible under the pinned Gauss-Seidel order
(XV uses V_{t-1}, XtU uses U_t -- sequentially dependent through the U
update), so the levers are:

  1. construction cost: the (T,E)/(E,R) one-hots cost ~3 VPU ops/elt
     (int compare + select + convert). A hi*lo product decomposition
     builds two SMALL one-hots ((TH,E)+(TL,E), TH*TL=T) by compare and
     combines them with ONE multiply/elt: ~2.3x fewer VPU ops.
  2. one layout, two kernels: a transposed kernel reads the SAME packed
     strips (they carry both local row and col indices) and emits
     Xt @ B -- the At_onehot layout (host packing + HBM copy) dies.
  3. pad factor: with construction cheaper per element, the optimal
     (R,T,E) shifts toward lower pad (smaller E).

Sweeps variants x configs at the 20NG shape, bf16 dot path.
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


def onehot_cmp(idx, shape, dim, weight, dtype):
    """Current construction: compare + select (+ convert)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
    w = weight if weight is not None else jnp.ones((), jnp.float32)
    if dim == 0:
        return jnp.where(idx[None, :] == iota, w, 0.0).astype(dtype)
    return jnp.where(idx[:, None] == iota, w, 0.0).astype(dtype)


def onehot_prod_sub(idx, D, E, DL, weight, dtype):
    """(D, E) one-hot over the SUBLANE dim via hi*lo product."""
    DH = D // DL
    hi_i = jax.lax.broadcasted_iota(jnp.int32, (DH, E), 0)
    lo_i = jax.lax.broadcasted_iota(jnp.int32, (DL, E), 0)
    w = weight if weight is not None else jnp.ones((), jnp.float32)
    hi = jnp.where((idx // DL)[None, :] == hi_i, w, 0.0).astype(dtype)
    lo = jnp.where((idx % DL)[None, :] == lo_i, 1.0, 0.0).astype(dtype)
    return (hi[:, None, :] * lo[None, :, :]).reshape(D, E)


def onehot_prod_lane(idx, E, D, DL, weight, dtype):
    """(E, D) one-hot over the LANE (minor) dim via hi*lo product."""
    DH = D // DL
    hi_i = jax.lax.broadcasted_iota(jnp.int32, (E, DH), 1)
    lo_i = jax.lax.broadcasted_iota(jnp.int32, (E, DL), 1)
    w = weight if weight is not None else jnp.ones((), jnp.float32)
    hi = jnp.where((idx // DL)[:, None] == hi_i, w, 0.0).astype(dtype)
    lo = jnp.where((idx % DL)[:, None] == lo_i, 1.0, 0.0).astype(dtype)
    return (hi[:, :, None] * lo[:, None, :]).reshape(E, D)


def make_fwd_kernel(R, T, E, G, dtype, variant):
    """out (n_blocks, KP, R) += per-strip A @ B contributions."""

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
            if variant == "cmp":
                cone = onehot_cmp(cl, (T, E), 0, val, dtype)
                rone = onehot_cmp(rl, (E, R), 1, None, dtype)
            else:
                cone = onehot_prod_sub(cl, T, E, 16, val, dtype)
                rone = onehot_prod_lane(rl, E, R, 128, None, dtype)
            Wt = jnp.dot(bt_ref[st_ref[i]].astype(dtype), cone,
                         preferred_element_type=jnp.float32)
            out_ref[sb_ref[i]] += jnp.dot(
                Wt.astype(dtype), rone, preferred_element_type=jnp.float32)

    return kernel


def make_t_kernel(R, T, E, G, dtype, variant):
    """out (m_tiles, KP, T) += per-strip At @ B from the SAME strips.

    Gather B rows by LOCAL ROW index (rone, (R, E) orientation), scale by
    val at the (KP, E) intermediate, scatter by LOCAL COL index (cone,
    (E, T) orientation). Standard (1,),(0,) contractions throughout.
    """

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
                roneT = onehot_cmp(rl, (R, E), 0, val, dtype)
                coneT = onehot_cmp(cl, (E, T), 1, None, dtype)
            else:
                roneT = onehot_prod_sub(rl, R, E, 16, val, dtype)
                coneT = onehot_prod_lane(cl, E, T, 128, None, dtype)
            Wt = jnp.dot(ut_ref[sb_ref[i]].astype(dtype), roneT,
                         preferred_element_type=jnp.float32)
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
    B_m = rng.randn(M, K).astype(np.float32)   # operand for A @ B
    B_n = rng.randn(N, K).astype(np.float32)   # operand for At @ B

    print("data built; computing host references...", flush=True)
    # bf16-quantized values without the 1.4 GB dense f32 detour: quantize
    # the nnz values only, then SPARSE f64 matmuls for the references
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

    dtype = jnp.bfloat16
    configs = ((512, 512, 256, 4), (512, 512, 128, 8),
               (512, 256, 128, 8), (256, 256, 128, 8),
               (512, 512, 512, 2), (1024, 512, 128, 8),
               (512, 512, 128, 16), (256, 512, 128, 8))
    # argv: config indices to run (compile time over the tunneled link
    # makes the full 8-config x 2-orient x 2-variant sweep too slow for
    # one bounded run) — e.g. `probe_onehot_spmm4.py 0 1`
    idx = [a for a in sys.argv[1:] if not a.startswith("-")]
    if idx:
        configs = tuple(configs[int(a)] for a in idx)
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

        variants = ("cmp",) if "--cmp-only" in sys.argv else ("cmp", "prod")
        for orient, mk, bt, osh, want, nout in (
                ("fwd", make_fwd_kernel, bt_m, (n_blocks, KP, R), want_f, N),
                ("t  ", make_t_kernel, bt_n, (m_tiles, KP, T), want_t, M)):
            for variant in variants:
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
                    def body(_, acc):
                        return acc + call(sb, st, pk, bt)
                    return jax.lax.fori_loop(
                        0, REPS, body, jnp.zeros(osh, jnp.float32))

                try:
                    out = jax.block_until_ready(run(L.sb, L.st, L.pk, bt))
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
                    jax.block_until_ready(run(L.sb, L.st, L.pk, bt))
                    ts.append(time.perf_counter() - t0)
                sec = min(ts) / REPS
                print(f"{orient} {variant:4s} R={R:4d} T={T:3d} E={E:3d} "
                      f"G={G:2d}: {sec*1e3:7.3f} ms {NNZ/sec/1e9:5.2f} "
                      f"Gnnz/s pad={L.pad_factor:.2f} err={err:.1e}",
                      flush=True)


if __name__ == "__main__":
    main()
