"""Fused Newton U-pass — batched row-wise Newton in one data pass.

The Newton iteration's cost at CMF ranks is two HBM passes over X
(DB = X·V for U's update, then Xᵀ·U_new for V's update) plus small per-row
solves. For the all-linear-link U update the per-row Hessian is SHARED
(H = VᵀV + (l2+pert)·I — no per-row curvature weights), so the entire
update is expressible per row tile:

    DB    = X_tile V                               (MXU, the data pass)
    g     = U BtB − DB + l1·sign(U) + l2·U         (VPU)
    d     = g H⁻¹                                  (MXU, k×k)
    U_new = backtracking line search over proj(U − s·d)
            with φᵢ(M) = l1‖Mᵢ‖₁ + ½l2‖Mᵢ‖² +
                         ½(‖xᵢ‖² − 2⟨DBᵢ, Mᵢ⟩ + Mᵢ BtB Mᵢᵀ)
    numVᵀ += U_newᵀ X_tile                          (X-side of V's update)
    gramU += U_newᵀ U_new

— i.e. the whole Newton U update AND V's X-side gradient terms in a single
X pass (the unfused path pays two). H⁻¹ is computed once outside via the
same Cholesky the jnp path uses (k×k, trivial). The backtracking search is
the identical semantics of solvers/newton.py: steps 1, ½, ¼, …, first
strictly-decreasing step accepted, row kept unchanged if none.

Applies when: x_link='linear', dense X, full-batch (sg_sample_ratio=1).
Zero-padded rows are exact no-ops (g=0 → d=0 → φ ties → row stays 0).

Layout mirrors ops/pallas/mu_fused.py (same tiling, (k, m) transposed
accumulators, scratch-based reduction flushed at the last grid step).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..matmul import FP8_DTYPES
from .mu_fused import _TILE_BUDGET_BYTES, _interp, _pick_row_tile


def _kernel(scal_ref, nv_ref, x_ref, u_ref, vtx_ref, btb_ref, hinv_ref,
            rsq_ref, unew_ref, numvt_ref, gramu_ref, numvt_acc, gramu_acc,
            *, trials: int, non_negative: bool, batched_trials: bool):
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)
    l1 = scal_ref[0, 0]
    l2 = scal_ref[0, 1]

    x = x_ref[:]                        # (R, m) data dtype
    if x.dtype in FP8_DTYPES:
        # fp8 data path: upcast the tile in-register; the MXU contracts in
        # bf16 (same policy as mu_fused._kernel).
        x = x.astype(jnp.bfloat16)
    u = u_ref[:]                        # (R, k) f32
    btb = btb_ref[:]                    # (k, k) f32
    acc = u.dtype
    # f32 operands: request true-f32 MXU passes — the kernel is HBM-bound
    # on the X stream, so the extra passes are free, while the default
    # single bf16 pass costs ~3e-3 relative error, which swamps the line
    # search's small late-stage improvements (measured: a 4000×1200
    # sigmoid-Y fit stalled at +22% objective vs the XLA path — see
    # docs/PERFORMANCE.md). bf16/fp8 data keeps the native single pass.
    xprec = (jax.lax.Precision.HIGHEST
             if x.dtype in (jnp.float32, jnp.float64)
             else jax.lax.Precision.DEFAULT)
    fprec = (jax.lax.Precision.HIGHEST
             if acc in (jnp.float32, jnp.float64)
             else jax.lax.Precision.DEFAULT)

    db = jax.lax.dot_general(           # X V — THE data pass
        x, vtx_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=acc,
        precision=xprec)
    g = jnp.dot(u, btb, preferred_element_type=acc, precision=fprec) - db \
        + l1 * jnp.sign(u) + l2 * u
    d = jnp.dot(g, hinv_ref[:], preferred_element_type=acc, precision=fprec)

    def project(mc):
        return jnp.maximum(mc, 0.0) if non_negative else mc

    if trials <= 0:
        unew = project(u - d)
    elif batched_trials:
        rs = rsq_ref[:, 0]              # (R,)

        # ALL candidates' φ in ONE batched MXU dot: the unrolled form
        # below issues `trials`+1 sequential (R, k) × (k, k) dots; this
        # form stacks the candidates into one ((trials+1)·R, k) × (k, k)
        # dot. Per-row results are bit-identical (same contraction, same
        # precision, rows independent), so the accepted step — and the
        # trajectory — cannot change. Slot 0 is φ(u) UNPROJECTED,
        # matching the unrolled form. MEASURED SLOWER on v5e at the 20NG
        # shape (1.57 vs 1.46 ms/iter fused-pass anchor — the 3D
        # relayouts cost more than the dot serialization they remove;
        # see docs/PERFORMANCE.md "Newton per-iteration decomposition"),
        # kept as a measured negative result and A/B hook.
        nt = trials + 1
        rr, k = u.shape
        # steps 1, ½, ¼, … built in-kernel (a host-side jnp.array would be
        # a captured constant, which pallas_call rejects). 1 / (1 << j) is
        # exact in every float dtype, unlike a VPU exp2 approximation.
        pw = jax.lax.broadcasted_iota(jnp.int32, (trials, 1, 1), 0)
        steps = 1.0 / jnp.left_shift(1, pw).astype(acc)
        mc_all = jnp.concatenate(
            [u[None], project(u[None] - steps * d[None])], axis=0)
        mc_flat = mc_all.reshape(nt * rr, k)
        quad = jnp.sum(
            jnp.dot(mc_flat, btb, preferred_element_type=acc,
                    precision=fprec) * mc_flat, axis=1).reshape(nt, rr)
        lin = jnp.sum(db[None] * mc_all, axis=2)
        pen = l1 * jnp.sum(jnp.abs(mc_all), axis=2) \
            + 0.5 * l2 * jnp.sum(mc_all * mc_all, axis=2)
        phis = pen + 0.5 * (rs[None] - 2.0 * lin + quad)   # (nt, R)

        phi0 = phis[0]
        best = u
        taken = jnp.zeros(phi0.shape, jnp.bool_)
        for j in range(trials):         # selection only — no dots left
            take = jnp.logical_and(jnp.logical_not(taken),
                                   phis[j + 1] < phi0)
            best = jnp.where(take[:, None], mc_all[j + 1], best)
            taken = jnp.logical_or(taken, take)
        unew = best
    else:
        rs = rsq_ref[:, 0]              # (R,)

        def phi(mc):
            quad = jnp.sum(
                jnp.dot(mc, btb, preferred_element_type=acc,
                        precision=fprec) * mc, axis=1)
            lin = jnp.sum(db * mc, axis=1)
            pen = l1 * jnp.sum(jnp.abs(mc), axis=1) \
                + 0.5 * l2 * jnp.sum(mc * mc, axis=1)
            return pen + 0.5 * (rs - 2.0 * lin + quad)

        phi0 = phi(u)
        best = u
        taken = jnp.zeros(phi0.shape, jnp.bool_)
        for j in range(trials):         # static unroll; largest step first
            mc = project(u - (0.5 ** j) * d)
            take = jnp.logical_and(jnp.logical_not(taken), phi(mc) < phi0)
            best = jnp.where(take[:, None], mc, best)
            taken = jnp.logical_or(taken, take)
        unew = best

    unew_ref[:] = unew

    @pl.when(i == 0)
    def _init():
        numvt_acc[:] = jnp.zeros_like(numvt_acc)
        gramu_acc[:] = jnp.zeros_like(gramu_acc)

    def accumulate(unew_f, x_t):
        numvt_acc[:] += jax.lax.dot_general(
            unew_f.astype(x.dtype), x_t, (((0,), (0,)), ((), ())),
            preferred_element_type=acc, precision=xprec)
        gramu_acc[:] += jax.lax.dot_general(
            unew_f, unew_f, (((0,), (0,)), ((), ())),
            preferred_element_type=acc, precision=fprec)

    @pl.when(i < n_prog - 1)
    def _acc_full():
        accumulate(unew, x)

    @pl.when(i == n_prog - 1)
    def _acc_edge():
        # Mask the partial edge tile's garbage rows out of the accumulators
        # (same hardware behavior as mu_fused.py: OOB reads are not zeros).
        rows = i * x.shape[0] + jax.lax.broadcasted_iota(
            jnp.int32, (x.shape[0], 1), 0)
        valid = rows < nv_ref[0, 0]
        accumulate(jnp.where(valid, unew, 0),
                   jnp.where(valid, x, jnp.zeros_like(x)))
        numvt_ref[:] = numvt_acc[:]
        gramu_ref[:] = gramu_acc[:]


def fused_newton_linear_u_pass(X, U, V, BtB, Hinv, row_sq, l1, l2, *,
                               trials: int, non_negative: bool,
                               row_tile: int | None = None,
                               batched_trials: bool = False):
    """One-X-pass Newton update of U (linear link, shared Hessian).

    X: (n, m) dense (f32/bf16); U: (n, k) f32; V: (m, k) f32;
    BtB = VᵀV (k,k); Hinv = (BtB + (l2+pert)I)⁻¹ (k,k) from the host-side
    Cholesky; row_sq: (n,) per-row ‖xᵢ‖² in f32 (the SAME precomputed
    values the jnp line search uses, for trajectory parity).
    Returns (U_new (n,k), numV (m,k) = XᵀU_new, gramU (k,k) = U_newᵀU_new).
    """
    n, m = X.shape
    k = U.shape[1]
    fdtype = U.dtype
    if row_tile is None:
        row_tile = _pick_row_tile(n, m, X.dtype.itemsize)
    nb = -(-n // row_tile)
    vt_dt = jnp.bfloat16 if X.dtype in FP8_DTYPES else X.dtype
    Vtx = V.T.astype(vt_dt)
    # (n, 1) column layout: a (row_tile, 1) block satisfies the TPU tiling
    # rule (sublane dim divisible by 8; lane dim equal to the array's).
    rsq = row_sq.astype(fdtype).reshape(n, 1)
    scal = jnp.stack([jnp.asarray(l1, fdtype),
                      jnp.asarray(l2, fdtype)]).reshape(1, 2)
    nv = jnp.asarray(n, jnp.int32).reshape(1, 1)
    acc_dt = jnp.float64 if fdtype == jnp.float64 else jnp.float32

    unew, numvt, gramu = pl.pallas_call(
        partial(_kernel, trials=int(trials), non_negative=bool(non_negative),
                batched_trials=bool(batched_trials)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((row_tile, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interp(),
    )(scal, nv, X, U, Vtx, BtB, Hinv, rsq)
    return unew, numvt.T.astype(fdtype), gramu.astype(fdtype)
