"""Fused MU U-pass — the flagship dense-CMF Pallas kernel.

One MU iteration reads the data matrix X twice in the unfused form:
X·V for U's numerator, then Xᵀ·U_new for V's numerator. At CMF ranks the
iteration is HBM-bandwidth-bound on exactly those two passes (measured
~4 ms/iter at 20NG scale, f32, vs a ~3.4 ms two-pass roofline). This kernel
streams each row tile of X through VMEM ONCE and produces, in a single grid:

    U_new                  = U ⊙ (X V) ⊘ (U VᵀV + l1 + l2·U + ε)
    numVᵀ (k×m)           += U_newᵀ X        (X-side of V's numerator)
    gramU (k×k)           += U_newᵀ U_new    (X-side of V's denominator)

i.e. the whole X-dependent part of the iteration at ~half the HBM traffic
(one X pass). The V/Z updates complete outside the kernel from these
accumulators, bit-identical in structure to the unfused U→Z→V order.

Performance notes (round 2 — this is why the kernel now beats the two-pass):
- NO per-call jnp.pad of X, EVER. Round 1 padded X (and U) to a tile
  multiple on every iteration, which re-materialized the whole data matrix
  in HBM — a full extra read+write pass that made the "one-pass" kernel
  ~1.5× MORE traffic than the two-pass it replaced. The wrapper now runs a
  ceil grid over the true n: out-of-bounds rows of the partial edge tile
  read GARBAGE (measured on hardware — not zeros), so the edge step masks
  them out of the accumulators in-kernel; per-row results are unaffected
  and out-of-bounds output rows are dropped by the partial write.
- V is passed ALREADY transposed and cast to X's dtype ((k, m), bf16 for
  the bf16 data path); the f32 V never enters VMEM and nothing is cast
  per grid step. The U-denominator uses the k×k VᵀV in f32.
- Accumulators live in scratch (persist across the sequential grid) and
  flush to the outputs once at the last step — accumulating in a revisited
  output block miscompiled under output double-buffering on this Mosaic
  toolchain (observed round 1).

Layout notes (TPU-first):
- V and the numV accumulator live TRANSPOSED (k, m): with k ≈ 20, the
  natural (m, k) layout pads lanes 20→128 (6.4× VMEM waste); (k, m) pads
  sublanes 20→24 only, so both fit VMEM at m ~ 100k.
- X tiles may be bfloat16 (data_dtype fast path): MXU runs bf16×bf16 with
  float32 accumulation; factors and accumulators stay float32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..matmul import FP8_DTYPES


def _kernel(scal_ref, nv_ref, x_ref, u_ref, vtx_ref, vtv_ref,
            unew_ref, numvt_ref, gramu_ref,
            numvt_acc, gramu_acc):
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)
    l1 = scal_ref[0, 0]
    l2 = scal_ref[0, 1]
    eps = scal_ref[0, 2]

    x = x_ref[:]                       # (R, m) data dtype
    if x.dtype in FP8_DTYPES:
        # fp8 data path: X is stored at 1 byte/elt (half the HBM traffic of
        # bf16); the MXU contracts in bf16, so upcast the tile in-register.
        # V/factors/accumulators are never quantized below bf16/f32.
        x = x.astype(jnp.bfloat16)
    u = u_ref[:]                       # (R, k) f32

    acc = u.dtype  # f32 accumulation (f64 under the x64 parity tests)
    # numU = X Vᵀᵀ → contract m on the MXU (both operands in X's dtype)
    num_u = jax.lax.dot_general(
        x, vtx_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=acc)

    den = jnp.dot(u, vtv_ref[:], preferred_element_type=acc)
    unew = u * num_u / (den + l1 + l2 * u + eps)
    # Zero the rows past nv (shard padding and the edge tile's OOB reads):
    # padding rows are 0·0/0 = NaN when l1 = eps = 0, and a NaN row would
    # poison the accumulators (0·NaN = NaN) and the returned factors.
    rows = i * x.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, (x.shape[0], 1), 0)
    valid = rows < nv_ref[0, 0]
    unew = jnp.where(valid, unew, 0.0)
    unew_ref[:] = unew

    @pl.when(i == 0)
    def _init():
        numvt_acc[:] = jnp.zeros_like(numvt_acc)
        gramu_acc[:] = jnp.zeros_like(gramu_acc)

    def accumulate(unew_f, x_t):
        # numVᵀ += U_newᵀ X  → contract the row-tile dim
        numvt_acc[:] += jax.lax.dot_general(
            unew_f.astype(x.dtype), x_t, (((0,), (0,)), ((), ())),
            preferred_element_type=acc)
        gramu_acc[:] += jax.lax.dot_general(
            unew_f, unew_f, (((0,), (0,)), ((), ())),
            preferred_element_type=acc)

    @pl.when(i < n_prog - 1)
    def _acc_full():
        accumulate(unew, x)

    @pl.when(i == n_prog - 1)
    def _acc_edge():
        # Non-divisible n: the last tile's out-of-bounds rows read GARBAGE
        # (measured on hardware — not zeros), so mask X too (unew is
        # already zeroed above). Valid rows' per-row results are unaffected
        # and out-of-bounds output rows are dropped by the partial write.
        accumulate(unew, jnp.where(valid, x, jnp.zeros_like(x)))
        numvt_ref[:] = numvt_acc[:]
        gramu_ref[:] = gramu_acc[:]


def _interp() -> bool:
    return jax.default_backend() != "tpu"


# X-tile VMEM budget. The tile is double-buffered by the pipeline; with the
# raised scoped-vmem limit (v5e has far more than the 16 MB default cap)
# 16 MB tiles measured fastest at 20NG scale: bigger tiles amortize the
# per-grid-step overhead, which dominated the round-1 kernel (rt=400 →
# 2.43 ms/iter vs rt=240 → 2.67 and rt≈136 → 6.2 round 1, bf16).
_TILE_BUDGET_BYTES = 16_000_000


def _pick_row_tile(n: int, m: int, itemsize: int) -> int:
    """Largest row tile ≤ budget that divides n, multiple of the dtype's
    sublane granularity (8 f32 / 16 bf16 / 32 fp8 — use 16 for ≥2-byte
    dtypes, 32 for 1-byte). When n has no suitable divisor, returns the
    budget tile — the kernels handle the partial edge tile in-kernel
    (masked accumulation), so no padding pass is ever needed."""
    step = 32 if itemsize == 1 else 16
    lanes = -(-m // 128) * 128           # VMEM pads the lane dim to 128
    max_rows = max(step, _TILE_BUDGET_BYTES // (lanes * itemsize))
    best = 0
    for r in range(step, min(1024, max_rows) + 1, step):
        if n % r == 0:
            best = r
    if best == 0:
        best = max(step, min(512, max_rows) // step * step)
    return best


def fused_mu_u_pass(X: jnp.ndarray, U: jnp.ndarray, V: jnp.ndarray,
                    VtV: jnp.ndarray, l1, l2, eps,
                    row_tile: int | None = None, n_valid=None):
    """Single-X-pass MU U-update + V-numerator accumulation.

    X: (n, m) dense (f32 or bf16); U: (n, k) f32; V: (m, k) f32.
    Returns (U_new (n,k), numV (m,k), gramU (k,k)) — all float32-family.

    n_valid (static or traced int): rows past it are zeroed in-kernel —
    sharded callers pass the shard's true row count so zero-padding rows
    (0·0/0 = NaN at l1 = eps = 0) cannot poison the factors/accumulators.
    """
    n, m = X.shape
    k = U.shape[1]
    fdtype = U.dtype
    if row_tile is None:
        row_tile = _pick_row_tile(n, m, X.dtype.itemsize)
    nb = -(-n // row_tile)
    # (k, m), cast ONCE per call. fp8 X contracts in bf16 (the kernel
    # upcasts the tile in-register) — V is never quantized below bf16.
    vt_dt = jnp.bfloat16 if X.dtype in FP8_DTYPES else X.dtype
    Vtx = V.T.astype(vt_dt)
    scal = jnp.stack([jnp.asarray(l1, fdtype), jnp.asarray(l2, fdtype),
                      jnp.asarray(eps, fdtype)]).reshape(1, 3)
    nv = jnp.asarray(n if n_valid is None else n_valid,
                     jnp.int32).reshape(1, 1)
    acc_dt = jnp.float64 if fdtype == jnp.float64 else jnp.float32

    unew, numvt, gramu = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((row_tile, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), fdtype),
            jax.ShapeDtypeStruct((k, m), acc_dt),
            jax.ShapeDtypeStruct((k, k), acc_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, m), acc_dt),
            pltpu.VMEM((k, k), acc_dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * m * k,
            bytes_accessed=n * m * X.dtype.itemsize * 2,
            transcendentals=0),
        # The revisited (k, m) accumulator output is double-buffered by the
        # pipeline on top of the X-tile double buffer; the default 16 MB
        # scoped-vmem cap is ~1 MB short at m ≈ 11k with 240-row tiles.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interp(),
    )(scal, nv, X, U, Vtx, VtV)
    return unew, numvt.T.astype(fdtype), gramu.astype(fdtype)
