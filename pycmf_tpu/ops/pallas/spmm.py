"""Tiled CSR SpMM / SDDMM — Pallas TPU kernels.

Why: XLA lowers segment_sum/scatter-add to serialized per-element scatters
on TPU, which measured ~100-1000× slower than these kernels at 20NG scale
(the reference's sparse path is scipy spmm on CPU; BASELINE.json mandates a
"tiled CSR spmm kernel" for the TPU build).

Design (SURVEY.md §7 hard part #3: CSR irregularity vs MXU tiles):
- Host-side, once per fit: rows are grouped into fixed-size row blocks; each
  block's nonzeros are padded to the per-matrix max block nnz
  (value 0 @ (last_row, col 0) → exact no-ops). This "tiled CSR" has fully
  static shapes — no indptr arithmetic on device.
- Kernel: 1-D grid over row blocks. The dense operand B lives entirely in
  VMEM (k is small for CMF, so even a 100k-row B fits; the wrapper falls
  back to the segment-sum path when it wouldn't). Each program walks its
  block's nonzeros with a fori_loop doing a dynamic VMEM row-gather from B
  and a VPU FMA into the (R, k) output tile — no HBM traffic per nonzero.
- sddmm_rowdots is the mirror kernel for the factored sparse losses and
  Newton line search: per-nonzero dot of M[row]·B[col], accumulated per row.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sparse import CsrMatrix

ROW_BLOCK = 256
# B (q, k_pad<=128) f32 must fit comfortably in ~16MB VMEM next to the tile
# buffers; cap its footprint.
_VMEM_B_BUDGET = 12 * 1024 * 1024


def tpu_spmm_kernel_enabled() -> bool:
    """Whether the per-nonzero CSR kernels may be dispatched on real TPU.

    EXPERIMENTAL: the scalar-gather inner loop lowers correctly (validated
    at small scale) but exhibits pathological compile/runtime behavior at
    larger tile configurations on the current Mosaic toolchain — and an
    in-flight pathological dispatch cannot be cancelled over the device
    link. TPUs have no fast gather; the supported sparse-input paths are
    the auto-densify policy (dense MXU matmuls win at CMF ranks even at
    ~0.1% density) and the block-ELL kernel (ops/pallas/bell.py) for
    block-structured sparsity too big to densify. Interpreter mode (tests)
    is always allowed. Force with PYCMF_TPU_KERNEL_SPMM_TILED=1.
    """
    import jax as _jax

    from .policy import kernel_enabled

    return (_jax.default_backend() != "tpu"
            or kernel_enabled("spmm_tiled"))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TiledCsr:
    """Row-block-padded CSR for the Pallas kernels (static shapes).

    rows : (nb, S, 128) int32 — row index *within the block* of each nonzero
    cols : (nb, S, 128) int32 — column index
    data : (nb, S, 128) float — value (0 for padding)
    shape: static (p, q); block: static row-block size R

    The per-block nonzero stream is laid out (S, 128) with S a multiple of 8
    so VMEM blocks satisfy the TPU (8, 128) tiling constraint; the kernels
    walk it with a dynamic sublane index and a statically unrolled lane
    index (dynamic lane indexing does not lower on TPU).
    """

    rows: jnp.ndarray
    cols: jnp.ndarray
    data: jnp.ndarray
    shape: Tuple[int, int]
    block: int
    col_offset: int = 0  # static: first global column this chunk covers

    def tree_flatten(self):
        return (self.rows, self.cols, self.data), (self.shape, self.block,
                                                   self.col_offset)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        rows, cols, data = leaves
        return cls(rows, cols, data, aux[0], aux[1], aux[2])


def tile_csr_host(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                  shape, block: int = ROW_BLOCK, dtype=jnp.float32,
                  col_offset: int = 0) -> TiledCsr:
    """Build the tiled layout on the host (fit-time, pattern is static)."""
    p, q = int(shape[0]), int(shape[1])
    indptr = np.asarray(indptr)
    nb = max(1, -(-p // block))
    counts = [int(indptr[min((b + 1) * block, p)] - indptr[min(b * block, p)])
              for b in range(nb)]
    L = max(1, max(counts))
    lanes_needed = -(-L // 128)                    # ceil(L / 128)
    S = max(8, -(-lanes_needed // 8) * 8)          # round up to sublane mult
    L_pad = S * 128
    rows = np.full((nb, L_pad), block - 1, dtype=np.int32)
    cols = np.zeros((nb, L_pad), dtype=np.int32)
    vals = np.zeros((nb, L_pad), dtype=np.float64)
    row_of_nnz = np.repeat(np.arange(p, dtype=np.int64), np.diff(indptr))
    for b in range(nb):
        lo = int(indptr[min(b * block, p)])
        hi = int(indptr[min((b + 1) * block, p)])
        c = hi - lo
        rows[b, :c] = (row_of_nnz[lo:hi] - b * block).astype(np.int32)
        cols[b, :c] = indices[lo:hi]
        vals[b, :c] = data[lo:hi]
    rows = rows.reshape(nb, S, 128)
    cols = cols.reshape(nb, S, 128)
    vals = vals.reshape(nb, S, 128)
    return TiledCsr(jnp.asarray(rows), jnp.asarray(cols),
                    jnp.asarray(vals, dtype=dtype), (p, q), block,
                    col_offset)


def tile_csr_from_matrix(A: CsrMatrix, block: int = ROW_BLOCK) -> TiledCsr:
    return tile_csr_host(np.asarray(jax.device_get(A.indptr)),
                         np.asarray(jax.device_get(A.indices)),
                         np.asarray(jax.device_get(A.data)),
                         A.shape, block=block, dtype=A.dtype)


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _spmm_kernel(rows_ref, cols_ref, data_ref, b_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    S = rows_ref.shape[1]

    def body(s, _):
        # dynamic sublane s, statically unrolled lanes j (TPU-legal indexing)
        for j in range(128):
            r = rows_ref[0, s, j]
            c = cols_ref[0, s, j]
            d = data_ref[0, s, j]
            out_ref[pl.ds(r, 1), :] += d * b_ref[pl.ds(c, 1), :]
        return 0

    jax.lax.fori_loop(0, S, body, 0)


def _spmm_kernel_interp(rows_ref, cols_ref, data_ref, b_ref, out_ref):
    """Interpreter-mode variant: flat fori_loop (dynamic lane indexing is
    fine off-TPU and ~128× cheaper to trace/run than the unrolled body)."""
    out_ref[:] = jnp.zeros_like(out_ref)
    S = rows_ref.shape[1]

    def body(i, _):
        s, j = i // 128, i % 128
        r = rows_ref[0, s, j]
        c = cols_ref[0, s, j]
        d = data_ref[0, s, j]
        out_ref[pl.ds(r, 1), :] += d * b_ref[pl.ds(c, 1), :]
        return 0

    jax.lax.fori_loop(0, S * 128, body, 0)


def spmm_tiled(T: TiledCsr, B: jnp.ndarray) -> jnp.ndarray:
    """T @ B → (p, k). B must fit in VMEM (checked by the caller)."""
    p, q = T.shape
    k = B.shape[1]
    nb, S, _ = T.rows.shape
    R = T.block
    out = pl.pallas_call(
        _spmm_kernel_interp if _interp() else _spmm_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B.shape[0], k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * R, k), B.dtype),
        interpret=_interp(),
    )(T.rows, T.cols, T.data, B)
    return out[:p]


def _sddmm_kernel(rows_ref, cols_ref, data_ref, m_ref, b_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    S = rows_ref.shape[1]

    def body(s, _):
        for j in range(128):
            r = rows_ref[0, s, j]
            c = cols_ref[0, s, j]
            d = data_ref[0, s, j]
            e = jnp.sum(m_ref[pl.ds(r, 1), :] * b_ref[pl.ds(c, 1), :])
            out_ref[pl.ds(r, 1), 0] += d * e
        return 0

    jax.lax.fori_loop(0, S, body, 0)


def _sddmm_kernel_interp(rows_ref, cols_ref, data_ref, m_ref, b_ref,
                         out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    S = rows_ref.shape[1]

    def body(i, _):
        s, j = i // 128, i % 128
        r = rows_ref[0, s, j]
        c = cols_ref[0, s, j]
        d = data_ref[0, s, j]
        e = jnp.sum(m_ref[pl.ds(r, 1), :] * b_ref[pl.ds(c, 1), :])
        out_ref[pl.ds(r, 1), 0] += d * e
        return 0

    jax.lax.fori_loop(0, S * 128, body, 0)


def sddmm_rowdots_tiled(T: TiledCsr, M: jnp.ndarray, B: jnp.ndarray
                        ) -> jnp.ndarray:
    """Per-row Σ_nnz a_ij · (M[i]·B[j]) → (p,) without densifying."""
    p, q = T.shape
    k = B.shape[1]
    nb, S, _ = T.rows.shape
    R = T.block
    Mp = jnp.pad(M, ((0, nb * R - p), (0, 0)))
    out = pl.pallas_call(
        _sddmm_kernel_interp if _interp() else _sddmm_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B.shape[0], k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * R, 1), B.dtype),
        interpret=_interp(),
    )(T.rows, T.cols, T.data, Mp, B)
    return out[:p, 0]


def b_fits_vmem(q: int, k: int = 128, itemsize: int = 4) -> bool:
    k_pad = -(-k // 128) * 128
    return q * k_pad * itemsize <= _VMEM_B_BUDGET


# ---------------------------------------------------------------------------
# Column chunking: when the dense operand B (q×k) exceeds the VMEM budget,
# the matrix is split by column ranges on the host; each chunk is a
# self-contained TiledCsr over local columns and the products are summed:
#     A @ B = Σ_c A[:, lo_c:hi_c] @ B[lo_c:hi_c]
# Chunks are a *tuple* (a static pytree), so the whole structure jits.
# ---------------------------------------------------------------------------

# target per-chunk footprint of B in VMEM (f32, 128 padded lanes)
_CHUNK_TARGET = 8 * 1024 * 1024


def tile_csr_chunks_host(indptr, indices, data, shape,
                         block: int = ROW_BLOCK, dtype=jnp.float32,
                         target_bytes: int = _CHUNK_TARGET):
    """Tile a host CSR into (TiledCsr, col_lo, col_hi) column chunks."""
    import scipy.sparse as sp

    p, q = int(shape[0]), int(shape[1])
    bytes_full = q * 128 * 4
    nsplit = max(1, -(-bytes_full // target_bytes))
    if nsplit == 1:
        return (tile_csr_host(indptr, indices, data, shape, block, dtype),)
    A = sp.csr_matrix((data, indices, indptr), shape=(p, q))
    q_loc = -(-q // nsplit)
    chunks = []
    for c in range(nsplit):
        lo, hi = c * q_loc, min((c + 1) * q_loc, q)
        if lo >= q:
            break
        blk = sp.csr_matrix(A[:, lo:hi])
        chunks.append(tile_csr_host(blk.indptr, blk.indices, blk.data,
                                    (p, hi - lo), block, dtype,
                                    col_offset=lo))
    return tuple(chunks)


def spmm_chunks(chunks, B: jnp.ndarray) -> jnp.ndarray:
    """Σ_c chunk_c @ B[lo_c : lo_c+q_c] — the chunked tiled SpMM.
    Accepts a bare TiledCsr as a single chunk."""
    if isinstance(chunks, TiledCsr):
        chunks = (chunks,)
    out = None
    for T in chunks:
        lo = T.col_offset
        part = spmm_tiled(T, B[lo:lo + T.shape[1]])
        out = part if out is None else out + part
    return out


def sddmm_rowdots_chunks(chunks, M: jnp.ndarray, B: jnp.ndarray
                         ) -> jnp.ndarray:
    if isinstance(chunks, TiledCsr):
        chunks = (chunks,)
    out = None
    for T in chunks:
        lo = T.col_offset
        part = sddmm_rowdots_tiled(T, M, B[lo:lo + T.shape[1]])
        out = part if out is None else out + part
    return out


def spmm_pallas(A, B: jnp.ndarray):
    """Drop-in for ops.sparse.spmm: tile on the fly if needed.

    Prefer passing pre-tiled chunks (fit time); a CsrMatrix argument is
    tiled host-side on first use (slow path, tests only — fails under jit).
    """
    if isinstance(A, tuple):
        return spmm_chunks(A, B)
    if isinstance(A, TiledCsr):
        return spmm_tiled(A, B)
    return spmm_tiled(tile_csr_from_matrix(A), B)
