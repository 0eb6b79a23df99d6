"""Block-sparse (block-CSR / "block-ELL") SpMM — the MXU-shaped sparse path.

Why this design (round-2 replacement for the per-nonzero kernel in
spmm.py): TPUs have no fast gather — any per-nonzero formulation serializes
≥~10 VPU cycles per element, while the MXU performs dense 128×128 FLOPs
essentially for free at CMF ranks (docs/PERFORMANCE.md). So the sparse
matrix is re-laid-out ONCE at fit time into dense (R×C) = (128×128)
sub-blocks at the positions that contain nonzeros; the kernel is then a
stream of dense MXU contractions:

    out[rb] += blk[j] @ B[cb(j)]        for blocks j sorted by row-block rb

- Block indices (rb, cb) ride PrefetchScalarGridSpec scalar prefetch, so
  the B tile and the output tile are selected by data-dependent index maps
  — no gather instructions anywhere.
- Consecutive grid steps that map to the same output row-block accumulate
  in VMEM (the revisited-output pattern); the pipeline writes the block
  back when the row changes. Rows are sorted by construction, and EVERY
  row-block has ≥1 block (empty ones get an explicit zero block) so no
  output row is left uninitialized.
- HBM traffic ≈ stored-block bytes, so the roofline is set by the BLOCK
  fill ratio (nnz / (n_blocks·R·C)) — this layout wins when sparsity is
  clustered (block-structured). For uniformly scattered sparsity at high
  dilution the block storage approaches the dense size, in which case the
  converter refuses (returns None with a logged reason) and the caller
  falls back: densify below the threshold, row-shard across chips above it
  (each shard densifies locally) — see docs/PERFORMANCE.md "sparse
  decision tree".

The scalar inner product ⟨A, M Bᵀ⟩ needed by factored linear losses is
computed WITHOUT a separate SDDMM kernel via the transpose identity
⟨A, M Bᵀ⟩ = Σ (AᵀM ⊙ B) — one bell_spmm over the transposed layout.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 128
BLOCK_C = 128


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BlockEll:
    """Dense-block CSR layout (static shapes).

    blocks : (NB, R, C) — dense sub-blocks at nonzero positions (0-padded)
    brows  : (NB,) int32 — row-block index of each block, sorted ascending
    bcols  : (NB,) int32 — column-block index
    shape  : static logical (p, q) of the original matrix
    fill   : static float — nnz / (NB·R·C), the padding diagnostic
    """

    blocks: jnp.ndarray
    brows: jnp.ndarray
    bcols: jnp.ndarray
    shape: Tuple[int, int]
    fill: float

    def tree_flatten(self):
        return (self.blocks, self.brows, self.bcols), (self.shape, self.fill)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        blocks, brows, bcols = leaves
        return cls(blocks, brows, bcols, aux[0], aux[1])

    @property
    def nbytes(self) -> int:
        return int(self.blocks.size * self.blocks.dtype.itemsize)


def bell_from_scipy(A, dtype=jnp.float32, *,
                    max_bytes: Optional[int] = None,
                    min_fill: float = 0.0,
                    return_numpy: bool = False) -> Optional[BlockEll]:
    """Convert a scipy.sparse matrix to BlockEll (host, once per fit).

    Returns None (caller falls back) when the block layout would exceed
    ``max_bytes`` or fill below ``min_fill`` — i.e. the sparsity is too
    scattered for dense sub-blocks to pay off.

    return_numpy: keep the arrays on the host (numpy) — for callers that
    post-process the layout (e.g. the sharded runner stacks per-shard
    layouts) before uploading ONCE; the default uploads to device.
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    A.sum_duplicates()
    p, q = A.shape
    R, C = BLOCK_R, BLOCK_C
    nrb = -(-p // R)
    ncb = -(-q // C)
    coo = A.tocoo()
    rb = coo.row // R
    cb = coo.col // C
    keys = rb.astype(np.int64) * ncb + cb
    uniq = np.unique(keys)
    # ensure every row-block appears (zero block at column 0) so the kernel
    # initializes every output row
    present_rows = np.unique(uniq // ncb)
    missing = np.setdiff1d(np.arange(nrb, dtype=np.int64), present_rows)
    if missing.size:
        uniq = np.unique(np.concatenate([uniq, missing * ncb]))
    nb = int(uniq.size)
    nnz = int(A.nnz)
    fill = nnz / float(nb * R * C) if nb else 0.0
    nbytes = nb * R * C * jnp.dtype(dtype).itemsize
    if max_bytes is not None and nbytes > max_bytes:
        return None
    if fill < min_fill:
        return None

    blocks = np.zeros((nb, R, C), dtype=np.float64)
    slot = np.searchsorted(uniq, keys)
    blocks[slot, coo.row % R, coo.col % C] = coo.data
    brows = (uniq // ncb).astype(np.int32)
    bcols = (uniq % ncb).astype(np.int32)
    if return_numpy:
        return BlockEll(blocks.astype(jnp.dtype(dtype)), brows, bcols,
                        (p, q), fill)
    return BlockEll(
        jnp.asarray(blocks, dtype=dtype),
        jnp.asarray(brows),
        jnp.asarray(bcols),
        (p, q), fill)


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _spmm_kernel(brows_ref, bcols_ref, blk_ref, b_ref, out_ref):
    j = pl.program_id(0)
    row = brows_ref[j]
    prev = brows_ref[jnp.maximum(j - 1, 0)]
    is_first = jnp.logical_or(j == 0, row != prev)

    @pl.when(is_first)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    # f32 blocks: request true-f32 MXU passes — the kernel is bandwidth-
    # bound on block bytes, so the extra passes are free, and the default
    # single bf16 pass costs ~3e-3 relative error (measured on chip).
    # bf16 blocks keep the native single pass (HIGHEST would emulate).
    prec = (jax.lax.Precision.HIGHEST
            if blk_ref.dtype in (jnp.float32, jnp.float64)
            else jax.lax.Precision.DEFAULT)
    out_ref[:] += jax.lax.dot_general(
        blk_ref[0], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype, precision=prec)


def bell_spmm(A: BlockEll, B: jnp.ndarray) -> jnp.ndarray:
    """A @ B for BlockEll A (p×q) and dense B (q×k) → dense (p, k).

    One MXU contraction per stored block; HBM traffic ≈ block bytes.
    """
    p, q = A.shape
    nb = A.blocks.shape[0]
    R, C = A.blocks.shape[1], A.blocks.shape[2]
    k = B.shape[1]
    acc_dt = jnp.float64 if B.dtype == jnp.float64 else jnp.float32
    q_pad = -(-q // C) * C
    p_pad = -(-p // R) * R
    Bp = B.astype(A.blocks.dtype)
    if q_pad != q:
        Bp = jnp.pad(Bp, ((0, q_pad - q), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, R, C), lambda j, br, bc: (j, 0, 0)),
            pl.BlockSpec((C, k), lambda j, br, bc: (bc[j], 0)),
        ],
        out_specs=pl.BlockSpec((R, k), lambda j, br, bc: (br[j], 0)),
    )
    out = pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p_pad, k), acc_dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * R * C * k,
            bytes_accessed=A.nbytes + p_pad * k * 4,
            transcendentals=0),
        interpret=_interp(),
    )(A.brows, A.bcols, A.blocks, Bp)
    return out[:p] if p_pad != p else out


def bell_inner(At_bell: BlockEll, M: jnp.ndarray, B: jnp.ndarray):
    """⟨A, M Bᵀ⟩ via the transpose identity Σ((AᵀM) ⊙ B).

    At_bell is the BlockEll layout of Aᵀ; M (p, k), B (q, k).
    """
    return jnp.sum(bell_spmm(At_bell, M) * B.astype(M.dtype))
