"""One-hot strip SpMM — the MXU path for SCATTERED sparsity.

BlockEll (ops/pallas/bell.py) wins when nonzeros cluster into 128×128
blocks; at 20NG-like dilution (0.26% uniform) its block storage
approaches the dense size and the converter refuses, leaving XLA's
segment-sum floor (0.05–0.07 Gnnz/s measured) or chunked streaming.
This kernel covers that scattered regime (round-3 VERDICT item #2).

TPU has no fast dynamic gather (probe_gather*: Mosaic indexed loads fail
or serialize), so the gather/scatter pair of an SpMM is reformulated as
TWO dense MXU contractions per "strip" of E nonzeros against on-the-fly
one-hot matrices, with every operand VMEM-resident:

    cone(T, E) = onehot(col_local) * val      # gather  B columns, weighted
    rone(E, R) = onehot(row_local)            # scatter into output rows
    out[blk]  += (Bt_tile[tile] @ cone) @ rone        # (KP,T)@(T,E)@(E,R)

- Nonzeros are sorted into (row-block R × col-tile T) cells and packed E
  per strip on the host, once per fit (the pattern is iteration-
  invariant): pk[s] is an (8, E) f32 block — row 0 values, rows 1-2 the
  LOCAL row/col indices bitcast int32→f32, rows 3-7 tile padding.
- At CMF ranks the dense operand and the FULL output both fit VMEM
  ((m_tiles, KP, T) and (n_blocks, KP, R) stacks, dynamically indexed on
  the leading dim — no lane-dim dynamic slicing), so the kernel streams
  ONLY the packed nonzeros: ~32·pad bytes/nnz instead of a dense pass.
- Measured at the 20NG shape (30000×11314, 873k nnz, KP=32), round-5
  sound-barrier timing (the round-4 Gnnz/s figures rode a
  `block_until_ready` that does not block on this platform): end-to-end
  MU on strips runs **2.5–2.7 ms/iter — stable across sessions because
  the pass is VPU-bound — vs 1.6–2.4 ms/iter fused-dense (HBM-bound,
  swings with achieved bandwidth) and ~20 ms/iter segment-sum**
  (benchmarks/probe_onehot_mu.py, two draws). The kernel does NOT beat
  the fused dense pass where dense fits; its regime is scattered
  sparsity past the densify threshold, at 7.5–10× the segment-sum
  floor and 30 MB of HBM instead of 680 MB.

Cost model per nonzero (pad p = S·E/nnz): VPU ≈ 2p(T+R)/1024 cycles
(compare + bool→dtype convert for both UNWEIGHTED one-hots; values are
applied at the ~60× smaller (KP, E) intermediate — the round-5 "uw"
construction, measured 1.3–1.7× over the weighted-one-hot form in the
same session, probe_onehot_spmm5), MXU ≈ p(T+R)·KP/16384 f32 MACs —
the pass is the VPU bound with the MXU overlapped.

There is no reference analogue (the reference's sparse path is scipy
spmm, SURVEY.md §2 component 3); this layer is mandated by the build's
Pallas kernel requirement (BASELINE.json north_star "tiled CSR spmm").
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Measured config (probe_onehot_spmm3.py): the sweep is flat within ~15%;
# this point had the best bf16 time and a low pad factor at 20NG density.
ROW_BLOCK = 512
COL_TILE = 512
STRIP_E = 256
STRIP_G = 4

# Conservative VMEM budget for the resident operand+output stacks
# (v5e has 16 MB more-or-less usable; leave room for pipeline buffers).
VMEM_BUDGET = 10 * (1 << 20)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class OneHotStrips:
    """Strip layout of a sparse matrix for one orientation (A @ B).

    pk    : (S, 8, E) f32 — packed strips (values + bitcast local indices)
    sb    : (S,) int32 — output row-block index per strip
    st    : (S,) int32 — operand col-tile index per strip
    shape : static logical (p, q)
    nnz   : static — for cost estimates
    dot_bf16 : static — contract in bf16 (bf16 data path) vs f32 HIGHEST
    """

    pk: jnp.ndarray
    sb: jnp.ndarray
    st: jnp.ndarray
    shape: Tuple[int, int]
    nnz: int
    dot_bf16: bool

    def tree_flatten(self):
        return (self.pk, self.sb, self.st), (self.shape, self.nnz,
                                             self.dot_bf16)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        pk, sb, st = leaves
        return cls(pk, sb, st, aux[0], aux[1], aux[2])

    @property
    def nbytes(self) -> int:
        return int(self.pk.size * 4 + self.sb.size * 8)

    @property
    def pad_factor(self) -> float:
        S, _, E = self.pk.shape
        return S * E / max(1, self.nnz)


def onehot_from_scipy(A, dtype=jnp.float32, *,
                      max_bytes: Optional[int] = None,
                      R: int = ROW_BLOCK, T: int = COL_TILE,
                      E: int = STRIP_E, G: int = STRIP_G,
                      return_numpy: bool = False
                      ) -> Optional[OneHotStrips]:
    """Build the strip layout (host, once per fit). Returns None when the
    packed strips would exceed ``max_bytes`` (caller falls back) or the
    storage dtype has no TPU dot path (f64 parity runs keep segment-sum).

    return_numpy: keep the leaves as numpy (the sharded runners stack
    per-shard layouts on the host and upload ONCE — same contract as
    bell_from_scipy).
    """
    import scipy.sparse as sp

    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)):
        return None
    A = sp.csr_matrix(A)
    A.sum_duplicates()
    p, q = A.shape
    coo = A.tocoo()
    n = int(A.nnz)
    if n == 0:
        return None
    rows = coo.row.astype(np.int64)
    cols = coo.col.astype(np.int64)
    vals = coo.data
    blk = rows // R
    tile = cols // T
    order = np.lexsort((cols, tile, blk))
    rows, cols, vals, blk, tile = (x[order] for x in
                                   (rows, cols, vals, blk, tile))
    # vectorized strip assignment: a new strip starts at every cell
    # boundary and every E-th nonzero within a cell
    cell_change = np.r_[True, (blk[1:] != blk[:-1]) | (tile[1:] != tile[:-1])]
    cell_id = np.cumsum(cell_change) - 1
    cell_start = np.flatnonzero(cell_change)
    idx_in_cell = np.arange(n) - cell_start[cell_id]
    new_strip = cell_change | (idx_in_cell % E == 0)
    strip_id = np.cumsum(new_strip) - 1
    slot = idx_in_cell % E
    S = int(strip_id[-1]) + 1
    Sp = -(-S // G) * G
    if max_bytes is not None and Sp * 8 * E * 4 > max_bytes:
        return None
    pk = np.zeros((Sp, 8, E), np.float32)
    # values are packed at the STORAGE precision so the kernel reproduces
    # exactly what a densified copy at `dtype` would contract
    v = vals.astype(np.float32)
    if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16):
        v = np.asarray(jnp.asarray(v, jnp.bfloat16).astype(jnp.float32))
    pk[strip_id, 0, slot] = v
    pk[strip_id, 1, slot] = (rows % R).astype(np.int32).view(np.float32)
    pk[strip_id, 2, slot] = (cols % T).astype(np.int32).view(np.float32)
    first = np.flatnonzero(new_strip)
    sb = np.zeros(Sp, np.int32)
    st = np.zeros(Sp, np.int32)
    sb[:S] = blk[first]
    st[:S] = tile[first]
    bf16 = jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16)
    if return_numpy:
        return OneHotStrips(pk, sb, st, (p, q), n, dot_bf16=bf16)
    return OneHotStrips(
        jnp.asarray(pk), jnp.asarray(sb), jnp.asarray(st), (p, q), n,
        dot_bf16=bf16)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class OneHotStripsT:
    """Transposed VIEW of a OneHotStrips layout: represents base.Aᵀ.

    The packed strips carry BOTH local row and col indices, so the
    transposed contraction Aᵀ @ B runs from the SAME strips with the
    one-hot roles swapped (onehot_spmm_t) — no second host packing pass
    and no second HBM copy (round-5; measured within ~10% of the forward
    kernel at the 20NG shape, benchmarks/probe_onehot_spmm4.py)."""

    base: OneHotStrips

    def tree_flatten(self):
        return (self.base,), ()

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0])

    @property
    def shape(self):
        p, q = self.base.shape
        return (q, p)

    @property
    def nnz(self) -> int:
        return self.base.nnz

    @property
    def nbytes(self) -> int:
        return 0   # a view — the strips are owned by .base


def _kp_for(k: int, bf16: bool) -> int:
    mult = 16 if bf16 else 8
    return max(mult, -(-k // mult) * mult)


def onehot_ok(L, k: int, budget: int = VMEM_BUDGET) -> bool:
    """Whether the VMEM-resident operand/output stacks fit for this k.
    Symmetric in the two stacks, so the T view checks identically."""
    if isinstance(L, OneHotStripsT):
        L = L.base
    p, q = L.shape
    R, T, E = ROW_BLOCK, COL_TILE, L.pk.shape[2]
    kp = _kp_for(k, L.dot_bf16)
    n_blocks = -(-p // R)
    m_tiles = -(-q // T)
    resident = (m_tiles * T + n_blocks * R) * kp * 4
    temps = (T * E + E * R + kp * E) * 4 * 2
    return resident + temps + STRIP_G * 8 * E * 4 * 2 <= budget


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _make_kernel(R, T, E, G, dot_dt, prec):
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
            # UNWEIGHTED one-hots + val at the (KP, E) intermediate
            # (round 5): building a weighted one-hot costs ~3 VPU
            # ops/element over (T, E) (compare + select(val broadcast) +
            # convert); the unweighted form is 2 (compare + bool→dtype
            # convert) and val multiplies the ~60× smaller Wt instead.
            # Identical math: each strip column holds ONE nonzero, so
            # (B·onehot)·val == B·(onehot·val) per column; padding slots
            # carry val=0 and vanish either way. Measured 1.3–1.7×
            # faster per pass (probe_onehot_spmm5, same-session A/B).
            cone = (cl[None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (T, E), 0)).astype(dot_dt)
            Wt = jax.lax.dot_general(
                bt_ref[st_ref[i]].astype(dot_dt), cone,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            Wt = Wt * val[None, :]
            rone = (rl[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (E, R), 1)).astype(dot_dt)
            out_ref[sb_ref[i]] += jax.lax.dot_general(
                Wt.astype(dot_dt), rone, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

    return kernel


def _make_t_kernel(R, T, E, G, dot_dt, prec):
    """Transposed orientation: out[tile] += per-strip Aᵀ @ B from the
    SAME packed strips — gather B rows by LOCAL ROW index (val-weighted
    (R, E) one-hot), scatter by LOCAL COL index ((E, T) one-hot)."""

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
            # unweighted + val-at-intermediate, as in the forward kernel
            roneT = (rl[None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (R, E), 0)).astype(dot_dt)
            Wt = jax.lax.dot_general(
                ut_ref[sb_ref[i]].astype(dot_dt), roneT,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            Wt = Wt * val[None, :]
            coneT = (cl[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (E, T), 1)).astype(dot_dt)
            out_ref[st_ref[i]] += jax.lax.dot_general(
                Wt.astype(dot_dt), coneT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

    return kernel


def onehot_spmm_t(L: OneHotStrips, B: jnp.ndarray) -> jnp.ndarray:
    """L.Aᵀ @ B from the layout of A (p×q) and dense B (p, k) → (q, k)
    f32 — the same strips, roles swapped (see OneHotStripsT)."""
    p, q = L.shape
    R, T = ROW_BLOCK, COL_TILE
    E = int(L.pk.shape[2])
    G = STRIP_G
    S = int(L.pk.shape[0])
    k = B.shape[1]
    kp = _kp_for(k, L.dot_bf16)
    n_blocks = -(-p // R)
    m_tiles = -(-q // T)
    if L.dot_bf16:
        dot_dt, prec = jnp.bfloat16, jax.lax.Precision.DEFAULT
    else:
        dot_dt, prec = jnp.float32, jax.lax.Precision.HIGHEST
    Btp = jnp.zeros((kp, n_blocks * R), jnp.float32)
    Btp = jax.lax.dynamic_update_slice(
        Btp, B.T.astype(jnp.float32), (0, 0))
    ut = Btp.reshape(kp, n_blocks, R).transpose(1, 0, 2)

    out = pl.pallas_call(
        _make_t_kernel(R, T, E, G, dot_dt, prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S // G,),
            in_specs=[
                pl.BlockSpec((G, 8, E), lambda s, sb, st: (s, 0, 0)),
                pl.BlockSpec((n_blocks, kp, R), lambda s, sb, st: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((m_tiles, kp, T),
                                   lambda s, sb, st: (0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_tiles, kp, T), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * E * kp * (T + R),
            bytes_accessed=int(L.pk.size * 4 + (m_tiles * T
                               + n_blocks * R) * kp * 4),
            transcendentals=0),
        interpret=_interp(),
    )(L.sb, L.st, L.pk, ut)
    res = out.transpose(1, 0, 2).reshape(kp, m_tiles * T)[:k, :q]
    return res.T.astype(B.dtype if B.dtype != jnp.bfloat16 else jnp.float32)


def onehot_spmm(L, B: jnp.ndarray) -> jnp.ndarray:
    """L.A @ B for the strip layout (p×q) and dense B (q, k) → (p, k) f32.

    B is re-laid to a (m_tiles, KP, T) VMEM-resident stack per call (tiny:
    KP·q floats); the output accumulates in a (n_blocks, KP, R) stack and
    is unpacked by XLA. A OneHotStripsT view dispatches to the transposed
    kernel over the same strips.
    """
    if isinstance(L, OneHotStripsT):
        return onehot_spmm_t(L.base, B)
    p, q = L.shape
    R, T = ROW_BLOCK, COL_TILE
    E = int(L.pk.shape[2])
    G = STRIP_G
    S = int(L.pk.shape[0])
    k = B.shape[1]
    kp = _kp_for(k, L.dot_bf16)
    n_blocks = -(-p // R)
    m_tiles = -(-q // T)
    if L.dot_bf16:
        dot_dt, prec = jnp.bfloat16, jax.lax.Precision.DEFAULT
    else:
        # f32 storage keeps true-f32 MXU passes (the bell.py convention):
        # a default single bf16 pass costs ~3e-3 relative error
        dot_dt, prec = jnp.float32, jax.lax.Precision.HIGHEST
    Btp = jnp.zeros((kp, m_tiles * T), jnp.float32)
    Btp = jax.lax.dynamic_update_slice(
        Btp, B.T.astype(jnp.float32), (0, 0))
    bt = Btp.reshape(kp, m_tiles, T).transpose(1, 0, 2)

    out = pl.pallas_call(
        _make_kernel(R, T, E, G, dot_dt, prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S // G,),
            in_specs=[
                pl.BlockSpec((G, 8, E), lambda s, sb, st: (s, 0, 0)),
                pl.BlockSpec((m_tiles, kp, T), lambda s, sb, st: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((n_blocks, kp, R),
                                   lambda s, sb, st: (0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, kp, R), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * E * kp * (T + R),
            bytes_accessed=int(L.pk.size * 4 + (m_tiles * T
                               + n_blocks * R) * kp * 4),
            transcendentals=0),
        interpret=_interp(),
    )(L.sb, L.st, L.pk, bt)
    res = out.transpose(1, 0, 2).reshape(kp, n_blocks * R)[:k, :p]
    return res.T.astype(B.dtype if B.dtype != jnp.bfloat16 else jnp.float32)
