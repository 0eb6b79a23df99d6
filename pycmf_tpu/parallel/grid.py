"""2-D grid-sharded MU: X sharded over BOTH axes of a (rows × cols) mesh.

The 1-D layouts (parallel/sharded.py) shard either n (rows) or m (cols);
a problem that is jointly huge in n AND m has no 1-D layout whose
replicated factor fits a chip. The grid layout (SURVEY.md §7 anticipated
"double psum"; round-2 VERDICT item 7) shards:

    X[i,j] : (n/r, m/c) block on mesh position (i, j)
    U_i    : row-sharded over the ROW axis, replicated over COL
    V_j    : sharded over the COL axis (the shared dimension), replicated
             over ROW
    Y_j    : row-sharded over COL (Y's rows index m), Z replicated

Each factor's MU terms reduce over the OTHER axis only — psums stay
k-shaped ((n_loc,k)/(m_loc,k)/(k,k)) and axis-local, which maps onto a
TPU torus as ring all-reduces over each hardware dimension:

    U: numU_i = Σ_j X[i,j] V_j      → psum over COL;  VᵀV → psum over COL
    Z: numZ   = Σ_j Y_jᵀ V_j        → psum over COL
    V: numV_j = Σ_i X[i,j]ᵀ U_i     → psum over ROW;  UᵀU → psum over ROW
               (+ local Y_j Z — no collective)

Zero padding is exact for the linear-link MU math (padded rows/cols of
X/U/V/Y contribute 0 and stay 0 under the ratio update), so no masks.
Prototype scope: MU, dense X, linear links — Newton and sparse blocks
follow the same sharding and are future work (documented in STATUS.md).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.losses import penalty
from ..ops.matmul import gram, matmul
from ..solvers.common import Hyper, SolverConfig, run_solver_loop
from ..solvers.mu import mu_ratio_update
from .mesh import COL_AXIS, ROW_AXIS, make_grid_mesh


def factor_grid(n_devices: int) -> tuple[int, int]:
    """Near-square (rows, cols) factorization of a device count."""
    r = int(np.sqrt(n_devices))
    while n_devices % r:
        r -= 1
    return r, n_devices // r


def _prepare_grid(X, Y, U0, V0, r, c, dtype):
    n, m = X.shape
    n_loc, m_loc = -(-n // r), -(-m // c)
    n_pad, m_pad = r * n_loc, c * m_loc
    Xh = np.zeros((n_pad, m_pad), dtype=np.float64)
    Xh[:n, :m] = np.asarray(X)
    k = U0.shape[1]
    U_pad = np.zeros((n_pad, k))
    U_pad[:n] = U0
    V_pad = np.zeros((m_pad, k))
    V_pad[:m] = V0
    if Y is None:
        # zero-column placeholder: shard_map specs stay uniform and the
        # cfg.has_Y gate keeps it out of every computation
        Yd = jnp.zeros((m_pad, 0), dtype=dtype)
    else:
        Yh = np.zeros((m_pad, Y.shape[1]))
        Yh[:m] = np.asarray(Y)
        Yd = jnp.asarray(Yh, dtype=dtype)
    a_sq = jnp.asarray(np.sum(Xh * Xh),
                       dtype=jnp.float32 if jnp.dtype(dtype) ==
                       jnp.dtype(jnp.bfloat16) else dtype)
    return (jnp.asarray(Xh, dtype=dtype), Yd, a_sq,
            jnp.asarray(U_pad, dtype=dtype), jnp.asarray(V_pad, dtype=dtype),
            n, m)


def _mu_grid_iter(Xl, Yl, U, V, Z, cfg: SolverConfig, hyper: Hyper):
    """One MU iteration on local blocks (inside shard_map). Pinned
    U → Z → V order (solvers/mu.py): V's numerator sees U_new."""
    l1 = hyper.alpha * hyper.l1_ratio
    l2 = hyper.alpha * (1.0 - hyper.l1_ratio)
    eps = hyper.eps

    VtV = (jax.lax.psum(gram(V), COL_AXIS)
           if (cfg.update_U or (cfg.has_Y and cfg.update_Z)) else None)
    if cfg.update_U:
        num = jax.lax.psum(matmul(Xl, V), COL_AXIS)
        U = mu_ratio_update(U, VtV, num, l1, l2, eps)
    if cfg.has_Y and cfg.update_Z:
        num = jax.lax.psum(matmul(Yl.T, V), COL_AXIS)
        Z = mu_ratio_update(Z, VtV, num, l1, l2, eps)
    if cfg.update_V:
        num = jax.lax.psum(matmul(Xl.T, U), ROW_AXIS)
        S = jax.lax.psum(gram(U), ROW_AXIS)
        if cfg.has_Y:
            num = num + matmul(Yl, Z)   # Y_j rows are local — no psum
            S = S + gram(Z)
        V = mu_ratio_update(V, S, num, l1, l2, eps)
    return U, V, Z


def _loss_grid(Xl, Yl, a_sq, U, V, Z, cfg: SolverConfig, hyper: Hyper):
    """L(U,V,Z) via the factored identity; the double-sharded inner
    product Σ_ij ⟨X[i,j], U_i V_jᵀ⟩ psums over BOTH axes."""
    inner = jnp.sum(matmul(Xl, V) * U)
    inner = jax.lax.psum(jax.lax.psum(inner, COL_AXIS), ROW_AXIS)
    gU = jax.lax.psum(gram(U), ROW_AXIS)
    gV = jax.lax.psum(gram(V), COL_AXIS)
    loss = 0.5 * (a_sq - 2.0 * inner + jnp.sum(gU * gV))
    loss = loss + jax.lax.psum(
        penalty(U, hyper.alpha, hyper.l1_ratio), ROW_AXIS)
    loss = loss + jax.lax.psum(
        penalty(V, hyper.alpha, hyper.l1_ratio), COL_AXIS)
    if cfg.has_Y:
        y_sq = jax.lax.psum(jnp.sum(Yl.astype(U.dtype) ** 2), COL_AXIS)
        y_inner = jax.lax.psum(
            jnp.sum(matmul(Yl.T, V) * Z), COL_AXIS)
        loss = loss + 0.5 * (y_sq - 2.0 * y_inner
                             + jnp.sum(gV * gram(Z)))
        loss = loss + penalty(Z, hyper.alpha, hyper.l1_ratio)
    return loss


def _make_grid_block(cfg: SolverConfig, mesh):
    in_specs = (P(ROW_AXIS, COL_AXIS), P(COL_AXIS, None), P(),
                P(ROW_AXIS, None), P(COL_AXIS, None), P(), P())
    out_specs = ((P(ROW_AXIS, None), P(COL_AXIS, None), P()), P())

    def body(Xl, Yl, a_sq, U, V, Z, hyper, n_steps):
        def one(_, fac):
            return _mu_grid_iter(Xl, Yl, *fac, cfg, hyper)

        U, V, Z = jax.lax.fori_loop(0, n_steps, one, (U, V, Z))
        loss = _loss_grid(Xl, Yl, a_sq, U, V, Z, cfg, hyper)
        return (U, V, Z), loss

    @partial(jax.jit, static_argnames=("n_steps",))
    def block(state, hyper, rng, n_steps):
        Xl, Yl, a_sq, U, V, Z = state
        sm = jax.shard_map(partial(body, n_steps=n_steps), mesh=mesh,
                           in_specs=in_specs, out_specs=out_specs,
                           check_vma=False)
        (U, V, Z), loss = sm(Xl, Yl, a_sq, U, V, Z, hyper)
        return (Xl, Yl, a_sq, U, V, Z), loss, rng

    def loss_fn(state, hyper):
        Xl, Yl, a_sq, U, V, Z = state
        sm = jax.shard_map(
            lambda Xl, Yl, a_sq, U, V, Z, h: _loss_grid(
                Xl, Yl, a_sq, U, V, Z, cfg, h),
            mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False)
        return sm(Xl, Yl, a_sq, U, V, Z, hyper)

    return block, jax.jit(loss_fn)


def run_grid(X, Y, U0, V0, Z0, cfg: SolverConfig, hyper: Hyper, *,
             grid: tuple[int, int], dtype=jnp.float32, mesh=None,
             max_iter: int = 200, tol: float = 1e-4, eval_every: int = 10,
             verbose: int = 0):
    """Grid-sharded MU fit driver (dense X, linear links).

    Returns the same tuple as run_mu. grid=(rows, cols) must multiply to
    the mesh's device count.
    """
    import scipy.sparse as sp

    if cfg.x_link != "linear" or (cfg.has_Y and cfg.y_link != "linear"):
        raise ValueError("layout='grid' currently supports linear links "
                         "only (MU)")
    r, c = grid
    if mesh is None:
        mesh = make_grid_mesh(r, c)
    if sp.issparse(X):
        # prototype scope: the host densifies; per-block sparse layouts
        # (CSR/BlockEll per grid cell) are the planned extension
        X = np.asarray(X.todense())
    if Y is not None and sp.issparse(Y):
        Y = np.asarray(Y.todense())
    Xd, Yd, a_sq, U_pad, V_pad, n, m = _prepare_grid(
        X, Y, U0, V0, r, c, dtype)
    k = U_pad.shape[1]
    Z = (jnp.asarray(Z0, dtype=dtype) if Z0 is not None and cfg.has_Y
         else jnp.zeros((0, k), dtype=dtype))
    block, loss_fn = _make_grid_block(cfg, mesh)
    state = (Xd, Yd, a_sq, U_pad, V_pad, Z)
    state, n_iter, losses, iters, times = run_solver_loop(
        block, state, hyper, None, max_iter=max_iter, tol=tol,
        eval_every=eval_every, verbose=verbose, initial_loss_fn=loss_fn)
    _, _, _, U, V, Z = state
    return U[:n], V[:m], Z, n_iter, losses, iters, times
