"""Fused sigmoid-link Newton passes — no (n, m) prediction matrix ever
touches HBM.

The XLA dense sigmoid path materializes σ(M Bᵀ) (and its elementwise
children P, W, R⊙f′) as full (n, m) f32 arrays — once for the g/H build
and once PER LINE-SEARCH TRIAL. Measured at 20NG scale (30000×11314,
k=20, f32): 35 ms for the g/H build (einsum at HIGHEST) and 8.7 ms per
trial → ~115 ms per factor update, all HBM-bound on intermediates
(benchmarks/probe_sigmoid_chunked.py's component probe).

These two kernels compute the same quantities tile-by-tile with the
predictions living only in VMEM/registers:

- `sigmoid_gh_pass`: one X pass → per-row gradient G = (R⊙f′)B and the
  stacked Gauss-Newton Hessians H[p] = Bᵀdiag(W_p)B, emitted as an
  (n, k²) row-major table (XLA reshapes to (n, k, k) for the batched
  solve). The k² contraction unrolls over the first Hessian index:
  H[:, a, :] = ((W ⊙ B̂ᵀ[a]) Xᵀ-style dot) — k dot_generals per tile,
  exactly the einsum FLOPs, on the MXU.
- `sigmoid_phi_pass`: one X pass → the per-row line-search objectives
  φ(candidate) for ALL trials at once (slot 0 = φ(M), slot t = the
  backtracking candidate project(M − 0.5^{t-1} d)), so the 8-trial
  search costs one data pass instead of nine.

Between them sits the existing batched SPD Cholesky kernel
(ops/pallas/batched_solve.py). Gauss-Newton form only (W = f′² ≥ 0 —
'full' can go indefinite, which needs the XLA LU path anyway).

Used by solvers/newton.py's dense-sigmoid fast path for BOTH factor
orientations (V's update streams the transposed operand), single-chip
AND sharded: fused_sigmoid_update(axis_name=...) psums these kernels'
G/H/φ partials over a mesh axis for the layouts that shard the data
axis (cols U/Z, grid U/Z/V), with penalties added once post-reduction.
Zero-padded rows produce g = σ-residual terms that are NOT zero
(σ(0) = ½), so callers must mask padding rows after selection — same
contract as the jnp chunked sigmoid pass (solvers/newton_chunked.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..matmul import FP8_DTYPES
from .mu_fused import _interp, _pick_row_tile


def _tile_x(x):
    if x.dtype in FP8_DTYPES:
        return x.astype(jnp.bfloat16)
    return x


def _gh_kernel(scal_ref, x_ref, m_ref, bt_ref, g_ref, h_ref, *, k: int):
    l1 = scal_ref[0, 0]
    l2 = scal_ref[0, 1]
    x = _tile_x(x_ref[:])               # (R, m) data dtype
    mrow = m_ref[:]                     # (R, k) f32
    bt = bt_ref[:]                      # (k, m) f32
    acc = mrow.dtype
    # f32 factors: true-f32 MXU passes for the PREDICTION and GRADIENT
    # dots — the default single bf16 pass's ~3e-3 logit noise biases G at
    # small residuals and stalls convergence far from the f32 optimum
    # (measured: 500.3 vs 180.7 final loss on a 4000×1200 sigmoid-X fit,
    # kernels vs XLA). The k-unrolled Hessian dots below stay DEFAULT:
    # they carry the kernel's dominant n·m·k² FLOPs, and H noise only
    # perturbs the damped Newton direction, not the accept decisions.
    fprec = (jax.lax.Precision.HIGHEST
             if acc in (jnp.float32, jnp.float64)
             else jax.lax.Precision.DEFAULT)

    p = jax.nn.sigmoid(jnp.dot(mrow, bt, preferred_element_type=acc,
                               precision=fprec))
    r = p - x.astype(acc)
    fp = p * (1.0 - p)
    w = fp * fp                          # gauss form: W ≥ 0
    g_ref[:] = jax.lax.dot_general(
        r * fp, bt, (((1,), (1,)), ((), ())), preferred_element_type=acc,
        precision=fprec) \
        + l1 * jnp.sign(mrow) + l2 * mrow
    # H[p, a, :] = Σ_q W[p, q]·B[q, a]·B[q, :] — unroll a (k dot_generals,
    # the einsum's FLOPs on the MXU); emit the k² lanes row-major.
    cols = []
    for a in range(k):
        wa = w * bt[a, :][None, :]
        cols.append(jax.lax.dot_general(
            wa, bt, (((1,), (1,)), ((), ())), preferred_element_type=acc))
    h_ref[:] = jnp.concatenate(cols, axis=1)


def sigmoid_gh_pass(X, M, B, l1, l2, row_tile: int | None = None):
    """One-X-pass sigmoid G/H build (Gauss-Newton).

    X: (n, m) dense (f32/bf16/fp8); M: (n, k) f32; B: (m, k) f32.
    Returns (G (n, k) incl. the elastic-net gradient, H (n, k, k) the
    DATA Hessians — caller adds (l2+pert)·I before solving)."""
    n, m = X.shape
    k = M.shape[1]
    fdtype = M.dtype
    if row_tile is None:
        # budget at 4 bytes/elt regardless of X's storage dtype: the f32
        # prediction/weight tiles dominate the kernel's VMEM live set
        row_tile = _pick_row_tile(n, m, 4)
    nb = -(-n // row_tile)
    bt = B.T.astype(fdtype)
    scal = jnp.stack([jnp.asarray(l1, fdtype),
                      jnp.asarray(l2, fdtype)]).reshape(1, 2)

    g, h = pl.pallas_call(
        partial(_gh_kernel, k=k),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((row_tile, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, k * k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), fdtype),
            jax.ShapeDtypeStruct((n, k * k), fdtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * k * (k + 2),
            bytes_accessed=n * m * X.dtype.itemsize,
            transcendentals=n * m),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interp(),
    )(scal, X, M, bt)
    return g, h.reshape(n, k, k)


def _phi_kernel(scal_ref, x_ref, m_ref, d_ref, bt_ref, phi_ref, *,
                trials: int, non_negative: bool):
    l1 = scal_ref[0, 0]
    l2 = scal_ref[0, 1]
    x = _tile_x(x_ref[:]).astype(m_ref.dtype)
    mrow = m_ref[:]
    d = d_ref[:]
    bt = bt_ref[:]
    acc = mrow.dtype
    # true-f32 prediction dots: the accept rule compares φ differences
    # far below the default bf16 pass's noise floor (see _gh_kernel)
    fprec = (jax.lax.Precision.HIGHEST
             if acc in (jnp.float32, jnp.float64)
             else jax.lax.Precision.DEFAULT)

    def phi(mc):
        p = jax.nn.sigmoid(jnp.dot(mc, bt, preferred_element_type=acc,
                                   precision=fprec))
        r = x - p
        return (l1 * jnp.sum(jnp.abs(mc), axis=1)
                + 0.5 * l2 * jnp.sum(mc * mc, axis=1)
                + 0.5 * jnp.sum(r * r, axis=1))

    def project(mc):
        return jnp.maximum(mc, 0.0) if non_negative else mc

    cols = [phi(mrow)]                  # slot 0 = φ(M), no projection
    for t in range(trials):             # static unroll, largest step first
        cols.append(phi(project(mrow - (0.5 ** t) * d)))
    phi_ref[:] = jnp.stack(cols, axis=1)


def sigmoid_phi_pass(X, M, d, B, l1, l2, *, trials: int,
                     non_negative: bool, row_tile: int | None = None):
    """One-X-pass evaluation of ALL backtracking objectives.

    Returns phis (n, trials+1): slot 0 = φ(M), slot t = φ of the
    candidate project(M − 0.5^{t-1}·d) — the caller selects the first
    strictly-decreasing slot per row and rebuilds that candidate (same
    f32 formula → identical values)."""
    n, m = X.shape
    k = M.shape[1]
    fdtype = M.dtype
    if row_tile is None:
        row_tile = _pick_row_tile(n, m, 4)
    nb = -(-n // row_tile)
    bt = B.T.astype(fdtype)
    scal = jnp.stack([jnp.asarray(l1, fdtype),
                      jnp.asarray(l2, fdtype)]).reshape(1, 2)

    phis = pl.pallas_call(
        partial(_phi_kernel, trials=int(trials),
                non_negative=bool(non_negative)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((row_tile, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((row_tile, trials + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, trials + 1), fdtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m * k * (trials + 1),
            bytes_accessed=n * m * X.dtype.itemsize,
            transcendentals=n * m * (trials + 1)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interp(),
    )(scal, X, M, d, bt)[0]
    return phis
