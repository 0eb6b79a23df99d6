"""Probe: MXU one-hot strip contraction for SCATTERED sparse SpMM.

TPU has no fast dynamic gather (probe_gather/probe_gather2: Mosaic
take_along_axis/indexing forms fail to compile on this jaxlib), and XLA's
per-nonzero scatter/segment paths measure 0.05-0.07 Gnnz/s. This probe
measures the remaining MXU-native formulation: sort nonzeros into strips
that live inside one (row-block R x col-tile T) cell, and per strip do
TWO small matmuls with on-the-fly one-hot matrices:

    Wt(k, E)   = Vt_tile(k, T) @ [onehot(col_local)(T, E) * val]
    out(k, R) += Wt(k, E) @ onehot(row_local)(E, R)

k rides the SUBLANE axis (k=20 pads to 32 sublanes, not 128 lanes), so
the MXU cost is ~k_pad*(T+R) FLOPs/nnz; the VPU cost is the one-hot
builds, ~2*(T+R)/1024 cycles/nnz. Strips are scalar-prefetched
(block ids + previous id for first-visit zeroing); out blocks are
revisited consecutively (strips sorted by row block).

Reported: Gnnz/s per (T, R, E) config at the 20NG shape/density, vs the
fused-dense one-pass time and the XLA segment-sum floor.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    from pycmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
except Exception:  # noqa: BLE001
    pass

N, M, NNZ, K = 30000, 11314, 873651, 20
KP = 32          # k padded to a sublane multiple
REPS = 20


def build_strips(rows, cols, vals, n, m, R, T, E):
    """Host-side strip layout: nonzeros sorted by (row_block, col_tile),
    packed E per strip with zero-val padding; per-strip block ids."""
    blk = rows // R
    tile = cols // T
    order = np.lexsort((cols, tile, blk))
    rows, cols, vals, blk, tile = (a[order] for a in
                                   (rows, cols, vals, blk, tile))
    cell = blk.astype(np.int64) * (m // T + 1) + tile
    # split points where the (blk, tile) cell changes
    starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
    ends = np.r_[starts[1:], len(cell)]
    pk, sb, st = [], [], []
    for s, e in zip(starts, ends):
        for o in range(s, e, E):
            p = min(E, e - o)
            # one (8, E) f32 block per strip (Pallas blocks need 8x128-
            # divisible trailing dims): row 0 = values, rows 1/2 = local
            # row/col indices BITCAST to f32, rows 3-7 = padding
            b = np.zeros((8, E), np.float32)
            b[0, :p] = vals[o:o + p]
            b[1, :p] = (rows[o:o + p] % R).astype(np.int32).view(np.float32)
            b[2, :p] = (cols[o:o + p] % T).astype(np.int32).view(np.float32)
            pk.append(b)
            sb.append(blk[o])
            st.append(tile[o])
    return (np.stack(pk), np.asarray(sb, np.int32),
            np.asarray(st, np.int32))


def onehot_kernel(R, T, E, dtype):
    def kernel(sb_ref, st_ref, prev_ref, pk_ref, vt_ref, out_ref):
        s = pl.program_id(0)

        @pl.when(jnp.logical_or(s == 0, prev_ref[s] != sb_ref[s]))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        packed = pk_ref[0]                              # (8, E)
        val = packed[0, :].astype(dtype)
        rl = jax.lax.bitcast_convert_type(packed[1, :], jnp.int32)
        cl = jax.lax.bitcast_convert_type(packed[2, :], jnp.int32)
        cone = jnp.where(
            cl[None, :] == jax.lax.broadcasted_iota(jnp.int32, (T, E), 0),
            val[None, :], jnp.zeros((), dtype))
        Wt = jnp.dot(vt_ref[:], cone, preferred_element_type=jnp.float32)
        rone = jnp.where(
            rl[:, None] == jax.lax.broadcasted_iota(jnp.int32, (E, R), 1),
            jnp.ones((), jnp.float32), jnp.zeros((), jnp.float32))
        out_ref[:] += jnp.dot(Wt.astype(jnp.float32), rone,
                              preferred_element_type=jnp.float32)

    return kernel


def make_call(n_pad, m_pad, S, R, T, E, dtype):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 8, E), lambda s, sb, st, pv: (s, 0, 0)),
            pl.BlockSpec((KP, T), lambda s, sb, st, pv: (0, st[s])),
        ],
        out_specs=pl.BlockSpec((KP, R), lambda s, sb, st, pv: (0, sb[s])),
    )
    return pl.pallas_call(
        onehot_kernel(R, T, E, dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((KP, n_pad), jnp.float32),
    )


def main():
    rng = np.random.RandomState(0)
    # scattered uniform pattern at the 20NG density
    lin = rng.choice(N * M, size=NNZ, replace=False).astype(np.int64)
    rows = (lin // M).astype(np.int32)
    cols = (lin % M).astype(np.int32)
    vals = rng.rand(NNZ).astype(np.float32) + 0.5
    Vt = rng.randn(KP, M).astype(np.float32)
    Vt[K:] = 0.0

    import scipy.sparse as sp

    Xs = sp.coo_matrix((vals, (rows, cols)), shape=(N, M)).tocsr()
    want = (Xs @ Vt.T.astype(np.float64)).T  # (KP, N)

    for dtype, dname in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        for (R, T, E) in ((512, 512, 512), (512, 512, 256),
                          (1024, 512, 512), (512, 1024, 512),
                          (256, 256, 128), (1024, 1024, 1024)):
            pk, sb, st = build_strips(rows, cols, vals, N, M, R, T, E)
            S = len(sb)
            n_pad = -(-N // R) * R
            m_pad = -(-M // T) * T
            prev = np.r_[sb[:1], sb[:-1]].astype(np.int32)
            Vtp = np.zeros((KP, m_pad), np.float32)
            Vtp[:, :M] = Vt
            call = make_call(n_pad, m_pad, S, R, T, E, dtype)

            @jax.jit
            def run(sb, st, prev, pk, vt):
                def body(_, acc):
                    return acc + call(sb, st, prev, pk, vt.astype(dtype))
                return jax.lax.fori_loop(
                    0, REPS, body, jnp.zeros((KP, n_pad), jnp.float32))

            args = [jnp.asarray(a) for a in (sb, st, prev, pk, Vtp)]
            try:
                out = jax.block_until_ready(run(*args))
            except Exception as e:  # noqa: BLE001
                print(f"{dname} R={R} T={T} E={E}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            got = np.asarray(out)[:, :N] / REPS
            err = np.max(np.abs(got - want)) / max(1.0, np.abs(want).max())
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(run(*args))
                ts.append(time.perf_counter() - t0)
            sec = min(ts) / REPS
            pad = S * E / NNZ
            print(f"{dname} R={R:5d} T={T:5d} E={E:5d}: "
                  f"{sec*1e3:7.3f} ms/pass  {NNZ/sec/1e9:6.2f} Gnnz/s  "
                  f"strips={S} pad={pad:.2f}x  relerr={err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
