"""Probe 3: one-hot strip SpMM with VMEM-resident operand and output.

probe_onehot_spmm2.py measured a flat ~1.2-1.4 ms floor across every
(R, T, E) and dtype — per-strip B-tile DMA and output flush latency, not
compute. At CMF ranks k<=64 the dense operand (KP, m) and the full
output (KP, n) BOTH fit VMEM (1.4 MB + 3.9 MB at 20NG shape), so this
variant keeps them resident for the whole pass:

- B laid out host-side as (m_tiles, KP, T): one constant-index block,
  loaded once; per-strip tile = dynamic leading-dim index (no lane-dim
  dynamic slice).
- out laid out (n_blocks, KP, R), VMEM-resident, zeroed at s==0,
  accumulated by dynamic leading-dim index; XLA reshapes after.
- pk packs G strips per grid step ((G, 8, E) block) to amortize grid
  overhead; strip order no longer constrained (no flush-on-switch).

Expected: drops toward the compute bound (~0.5-0.9 ms at 20NG).
"""
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
KP = 32
REPS = 20


def build_strips(rows, cols, vals, R, T, E, G):
    blk = rows // R
    tile = cols // T
    order = np.lexsort((tile, blk))
    rows, cols, vals, blk, tile = (x[order] for x in
                                   (rows, cols, vals, blk, tile))
    cell = blk.astype(np.int64) * (int(tile.max()) + 1) + tile
    starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
    ends = np.r_[starts[1:], len(cell)]
    pk, sb, st = [], [], []
    for s, e in zip(starts, ends):
        for o in range(s, e, E):
            p = min(E, e - o)
            b = np.zeros((8, E), np.float32)
            b[0, :p] = vals[o:o + p]
            b[1, :p] = (rows[o:o + p] % R).astype(np.int32).view(np.float32)
            b[2, :p] = (cols[o:o + p] % T).astype(np.int32).view(np.float32)
            pk.append(b)
            sb.append(blk[o])
            st.append(tile[o])
    # pad strip count to a multiple of G with all-zero strips on block 0
    S = len(sb)
    Sp = -(-S // G) * G
    for _ in range(Sp - S):
        pk.append(np.zeros((8, E), np.float32))
        sb.append(0)
        st.append(0)
    return (np.stack(pk), np.asarray(sb, np.int32),
            np.asarray(st, np.int32), S)


def make_kernel(R, T, E, G, dtype):
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
            cone = jnp.where(
                cl[None, :] == jax.lax.broadcasted_iota(
                    jnp.int32, (T, E), 0),
                val[None, :], jnp.zeros((), jnp.float32)).astype(dtype)
            Wt = jnp.dot(bt_ref[st_ref[i]].astype(dtype), cone,
                         preferred_element_type=jnp.float32)
            rone = jnp.where(
                rl[:, None] == jax.lax.broadcasted_iota(
                    jnp.int32, (E, R), 1),
                jnp.ones((), jnp.float32),
                jnp.zeros((), jnp.float32)).astype(dtype)
            out_ref[sb_ref[i]] += jnp.dot(
                Wt.astype(dtype), rone, preferred_element_type=jnp.float32)

    return kernel


def make_call(n_blocks, m_tiles, Sp, R, T, E, G, dtype):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Sp // G,),
        in_specs=[
            pl.BlockSpec((G, 8, E), lambda s, sb, st: (s, 0, 0)),
            pl.BlockSpec((m_tiles, KP, T), lambda s, sb, st: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n_blocks, KP, R),
                               lambda s, sb, st: (0, 0, 0)),
    )
    return pl.pallas_call(
        make_kernel(R, T, E, G, dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, KP, R), jnp.float32),
    )


def main():
    rng = np.random.RandomState(0)
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
        for (R, T, E, G) in ((512, 512, 512, 2), (512, 512, 256, 4),
                             (512, 256, 256, 4), (256, 256, 128, 8),
                             (512, 512, 512, 1), (1024, 512, 512, 2),
                             (512, 256, 128, 8), (256, 512, 128, 8)):
            pk, sb, st, S = build_strips(rows, cols, vals, R, T, E, G)
            Sp = len(sb)
            n_blocks = -(-N // R)
            m_tiles = -(-M // T)
            Btp = np.zeros((m_tiles, KP, T), np.float32)
            Btp.reshape(KP, -1, order="F")  # noop, layout via transpose:
            vt_pad = np.zeros((KP, m_tiles * T), np.float32)
            vt_pad[:, :M] = Vt
            Btp = vt_pad.reshape(KP, m_tiles, T).transpose(1, 0, 2).copy()
            call = make_call(n_blocks, m_tiles, Sp, R, T, E, G, dtype)

            @jax.jit
            def run(sb, st, pk, bt):
                def body(_, acc):
                    return acc + call(sb, st, pk, bt)
                return jax.lax.fori_loop(
                    0, REPS, body,
                    jnp.zeros((n_blocks, KP, R), jnp.float32))

            args = [jnp.asarray(x) for x in (sb, st, pk, Btp)]
            try:
                out = jax.block_until_ready(run(*args))
            except Exception as e:  # noqa: BLE001
                print(f"{dname} R={R:4d} T={T:4d} E={E:4d} G={G}: FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)
                continue
            got = (np.asarray(out).transpose(1, 0, 2)
                   .reshape(KP, -1)[:, :N] / REPS)
            err = np.max(np.abs(got - want)) / max(1.0, np.abs(want).max())
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(run(*args))
                ts.append(time.perf_counter() - t0)
            sec = min(ts) / REPS
            print(f"{dname} R={R:4d} T={T:4d} E={E:4d} G={G}: "
                  f"{sec*1e3:7.3f} ms  {NNZ/sec/1e9:5.2f} Gnnz/s  "
                  f"S={S} pad={S*E/NNZ:.2f} err={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
