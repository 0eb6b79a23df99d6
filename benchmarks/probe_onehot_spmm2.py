"""Probe 2: one-hot strip SpMM — config sweep + bf16 variants + both passes.

probe_onehot_spmm.py measured 0.65-0.72 Gnnz/s (f32 operands, default
MXU precision = bf16 multiplies — hence the 3.4e-3 relerr, which is the
bf16-data-path accuracy class) at (T+R)=1024. Cost model per nnz with
strip padding p:

    VPU  ~ p*(T+R)/1024 cycles   (two one-hot builds)
    MXU  ~ p*(T+R)*KP/16384      (f32; halved under bf16-multiply default)

so smaller (T+R) wins until padding (p = S*E/nnz) eats the gain. This
probe sweeps asymmetric (R, T, E), tries bf16 operand variants (the
first probe's bf16 config crashed tpu_compile_helper), and times the
TRANSPOSED orientation (strips sorted by col tile; out = (X^T U)^T) to
report a real both-MU-passes number vs the 2.4 ms/iter fused-dense pass.
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


def build_strips(rows, cols, vals, R, T, E, by_col=False):
    """Strip layout sorted by (out_block, other); out_block = row block
    (by_col=False) or col tile (by_col=True)."""
    blk = rows // R
    tile = cols // T
    a, b = (tile, blk) if by_col else (blk, tile)
    order = np.lexsort((b, a))
    rows, cols, vals, a, b = (x[order] for x in (rows, cols, vals, a, b))
    cell = a.astype(np.int64) * (int(b.max()) + 1) + b
    starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
    ends = np.r_[starts[1:], len(cell)]
    pk, sout, soth = [], [], []
    for s, e in zip(starts, ends):
        for o in range(s, e, E):
            p = min(E, e - o)
            blkb = np.zeros((8, E), np.float32)
            blkb[0, :p] = vals[o:o + p]
            blkb[1, :p] = (rows[o:o + p] % R).astype(np.int32).view(
                np.float32)
            blkb[2, :p] = (cols[o:o + p] % T).astype(np.int32).view(
                np.float32)
            pk.append(blkb)
            sout.append(a[o])
            soth.append(b[o])
    return (np.stack(pk), np.asarray(sout, np.int32),
            np.asarray(soth, np.int32))


def onehot_kernel(Rdim, Tdim, E, dtype, variant):
    """out(KP, Rdim) += (Bt(KP, Tdim) @ cone(Tdim, E)) @ rone(E, Rdim).

    variant: 'f32' (dtype=f32 ops), 'bf16' (cone+Bt bf16), 'bf16_rone'
    (everything bf16 except accumulations)."""

    def kernel(sb_ref, st_ref, prev_ref, pk_ref, bt_ref, out_ref):
        s = pl.program_id(0)

        @pl.when(jnp.logical_or(s == 0, prev_ref[s] != sb_ref[s]))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        packed = pk_ref[0]
        val = packed[0, :]
        rl = jax.lax.bitcast_convert_type(packed[1, :], jnp.int32)
        cl = jax.lax.bitcast_convert_type(packed[2, :], jnp.int32)
        cone = jnp.where(
            cl[None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (Tdim, E), 0),
            val[None, :], jnp.zeros((), jnp.float32)).astype(dtype)
        Wt = jnp.dot(bt_ref[:], cone, preferred_element_type=jnp.float32)
        rone_dt = dtype if variant == "bf16_rone" else jnp.float32
        rone = jnp.where(
            rl[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (E, Rdim), 1),
            jnp.ones((), jnp.float32),
            jnp.zeros((), jnp.float32)).astype(rone_dt)
        out_ref[:] += jnp.dot(Wt.astype(rone_dt), rone,
                              preferred_element_type=jnp.float32)

    return kernel


def make_call(out_pad, oth_pad, S, Rdim, Tdim, E, dtype, variant):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 8, E), lambda s, sb, st, pv: (s, 0, 0)),
            pl.BlockSpec((KP, Tdim), lambda s, sb, st, pv: (0, st[s])),
        ],
        out_specs=pl.BlockSpec((KP, Rdim),
                               lambda s, sb, st, pv: (0, sb[s])),
    )
    return pl.pallas_call(
        onehot_kernel(Rdim, Tdim, E, dtype, variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((KP, out_pad), jnp.float32),
    )


def run_one(rows, cols, vals, Bt, n_out, m_oth, R, T, E, dtype, variant,
            by_col, want):
    """One orientation: out(k, n_out) = contraction streaming B tiles of
    width T over m_oth. by_col swaps the roles (row index <-> col)."""
    if by_col:
        # out blocks over columns: local-out = col % R_out where R_out=R
        pk, sout, soth = build_strips(rows, cols, vals, T, R,
                                      E, by_col=True)
        # by_col: out dim = col tiles of size R(=Tdim arg ... keep simple:
        # reuse the same kernel with rl<->cl swapped on the host side
        pk = pk.copy()
        pk[:, [1, 2]] = pk[:, [2, 1]]
    else:
        pk, sout, soth = build_strips(rows, cols, vals, R, T, E)
    S = len(sout)
    out_pad = -(-n_out // R) * R
    oth_pad = -(-m_oth // T) * T
    prev = np.r_[sout[:1], sout[:-1]].astype(np.int32)
    Btp = np.zeros((KP, oth_pad), np.float32)
    Btp[:, :m_oth] = Bt
    call = make_call(out_pad, oth_pad, S, R, T, E, dtype, variant)

    @jax.jit
    def run(sb, st, prev, pk, bt):
        def body(_, acc):
            return acc + call(sb, st, prev, pk, bt.astype(
                dtype if variant != "f32" else jnp.float32))
        return jax.lax.fori_loop(0, REPS, body,
                                 jnp.zeros((KP, out_pad), jnp.float32))

    args = [jnp.asarray(x) for x in (sout, soth, prev, pk, Btp)]
    out = jax.block_until_ready(run(*args))
    got = np.asarray(out)[:, :n_out] / REPS
    err = np.max(np.abs(got - want)) / max(1.0, np.abs(want).max())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        ts.append(time.perf_counter() - t0)
    sec = min(ts) / REPS
    return sec, err, S, S * E / NNZ


def main():
    rng = np.random.RandomState(0)
    lin = rng.choice(N * M, size=NNZ, replace=False).astype(np.int64)
    rows = (lin // M).astype(np.int32)
    cols = (lin % M).astype(np.int32)
    vals = rng.rand(NNZ).astype(np.float32) + 0.5
    Vt = rng.randn(KP, M).astype(np.float32)
    Vt[K:] = 0.0
    Ut = rng.randn(KP, N).astype(np.float32)
    Ut[K:] = 0.0

    import scipy.sparse as sp

    Xs = sp.coo_matrix((vals, (rows, cols)), shape=(N, M)).tocsr()
    want_n = (Xs @ Vt.T.astype(np.float64)).T          # (KP, N)  X @ V
    want_m = (Xs.T @ Ut.T.astype(np.float64)).T        # (KP, M)  X^T @ U

    print("== forward (X@V) orientation sweep ==", flush=True)
    for variant, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16),
                           ("bf16_rone", jnp.bfloat16)):
        for (R, T, E) in ((1024, 512, 512), (512, 256, 128),
                          (1024, 256, 256), (512, 256, 256),
                          (1024, 128, 128), (2048, 512, 512),
                          (512, 128, 128), (1024, 256, 128)):
            try:
                sec, err, S, pad = run_one(rows, cols, vals, Vt, N, M,
                                           R, T, E, dtype, variant,
                                           False, want_n)
            except Exception as e:  # noqa: BLE001
                print(f"{variant:10s} R={R:5d} T={T:5d} E={E:5d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            print(f"{variant:10s} R={R:5d} T={T:5d} E={E:5d}: "
                  f"{sec*1e3:7.3f} ms  {NNZ/sec/1e9:5.2f} Gnnz/s  "
                  f"S={S} pad={pad:.2f} err={err:.1e}", flush=True)

    print("== transposed (X^T@U) orientation, best configs ==", flush=True)
    for variant, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        for (R, T, E) in ((1024, 512, 512), (512, 256, 128),
                          (1024, 256, 256), (256, 512, 128),
                          (512, 512, 256)):
            try:
                sec, err, S, pad = run_one(rows, cols, vals, Ut, M, N,
                                           R, T, E, dtype, variant,
                                           True, want_m)
            except Exception as e:  # noqa: BLE001
                print(f"{variant:10s} R={R:5d} T={T:5d} E={E:5d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
                continue
            print(f"{variant:10s} R={R:5d} T={T:5d} E={E:5d}: "
                  f"{sec*1e3:7.3f} ms  {NNZ/sec/1e9:5.2f} Gnnz/s  "
                  f"S={S} pad={pad:.2f} err={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
