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

Layout notes (TPU-first):
- V and the numV accumulator live TRANSPOSED (k, m): with k ≈ 20, the
  natural (m, k) layout pads lanes 20→128 (6.4× VMEM waste); (k, m) pads
  sublanes 20→24 only, so both fit VMEM at m ~ 100k.
- X tiles may be bfloat16 (data_dtype fast path): MXU runs bf16×bf16 with
  float32 accumulation; factors and accumulators stay float32.
- Accumulator outputs map to the same block every grid step (init at
  program 0) — the standard Pallas revisited-output reduction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(scal_ref, x_ref, u_ref, vt_ref, vtv_ref,
            unew_ref, numvt_ref, gramu_ref,
            numvt_acc, gramu_acc):
    # Accumulation lives in SCRATCH (persists across sequential grid steps)
    # and is written to the outputs once, at the last step. Accumulating
    # directly in a revisited output block interacts with output
    # double-buffering on some Mosaic versions (observed wrong results).
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)
    l1 = scal_ref[0, 0]
    l2 = scal_ref[0, 1]
    eps = scal_ref[0, 2]

    x = x_ref[:]                       # (R, m) data dtype
    vt = vt_ref[:]                     # (k, m) f32
    u = u_ref[:]                       # (R, k) f32
    vtc = vt.astype(x.dtype)

    acc = u.dtype  # f32 accumulation (f64 under the x64 parity tests)
    # numU = X Vᵀᵀ → contract m on the MXU
    num_u = jax.lax.dot_general(
        x, vtc, (((1,), (1,)), ((), ())), preferred_element_type=acc)

    den = jnp.dot(u, vtv_ref[:], preferred_element_type=acc)
    unew = u * num_u / (den + l1 + l2 * u + eps)
    unew_ref[:] = unew

    @pl.when(i == 0)
    def _init():
        numvt_acc[:] = jnp.zeros_like(numvt_acc)
        gramu_acc[:] = jnp.zeros_like(gramu_acc)

    unew_c = unew.astype(x.dtype)
    # numVᵀ += U_newᵀ X  → contract the row-tile dim
    numvt_acc[:] += jax.lax.dot_general(
        unew_c, x, (((0,), (0,)), ((), ())), preferred_element_type=acc)
    gramu_acc[:] += jax.lax.dot_general(
        unew, unew, (((0,), (0,)), ((), ())), preferred_element_type=acc)

    @pl.when(i == n_prog - 1)
    def _flush():
        numvt_ref[:] = numvt_acc[:]
        gramu_ref[:] = gramu_acc[:]


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def fused_mu_u_pass(X: jnp.ndarray, U: jnp.ndarray, V: jnp.ndarray,
                    VtV: jnp.ndarray, l1, l2, eps,
                    row_tile: int | None = None):
    """Single-X-pass MU U-update + V-numerator accumulation.

    X: (n, m) dense (f32 or bf16); U: (n, k) f32; V: (m, k) f32.
    Returns (U_new (n,k), numV (m,k), gramU (k,k)) — all float32-family.
    """
    n, m = X.shape
    k = U.shape[1]
    fdtype = U.dtype
    if row_tile is None:
        # keep the double-buffered X tile ≲ 3 MB
        bytes_per_row = m * X.dtype.itemsize
        row_tile = max(8, min(512, (3 << 20) // max(1, bytes_per_row) // 8 * 8))
    nb = -(-n // row_tile)
    pad = nb * row_tile - n
    Xp = jnp.pad(X, ((0, pad), (0, 0)))
    Up = jnp.pad(U, ((0, pad), (0, 0)))
    Vt = V.T
    scal = jnp.stack([jnp.asarray(l1, fdtype), jnp.asarray(l2, fdtype),
                      jnp.asarray(eps, fdtype)]).reshape(1, 3)

    unew, numvt, gramu = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
            jax.ShapeDtypeStruct((nb * row_tile, k), fdtype),
            jax.ShapeDtypeStruct((k, m), jnp.float32 if fdtype != jnp.float64
                                 else jnp.float64),
            jax.ShapeDtypeStruct((k, k), jnp.float32 if fdtype != jnp.float64
                                 else jnp.float64),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, m), fdtype),
            pltpu.VMEM((k, k), fdtype),
        ],
        interpret=_interp(),
    )(scal, Xp, Up, Vt, VtV)
    return unew[:n], numvt.T.astype(fdtype), gramu.astype(fdtype)
