"""Batched k×k SPD solve — Pallas TPU kernel.

The Newton solver produces one damped SPD Hessian per row (p systems of
size k×k, k ~ 10-100; SURVEY.md §0 note (a): "the Hessian is k×k per row —
tiny, so the TPU win is batching"). XLA's batched LU is generic and
pivoting; this kernel instead runs an unrolled Cholesky + triangular solves
in a structure-of-arrays layout — systems live in the *lane* dimension, so
every scalar step of the factorization is a full-width VPU op over 512
systems at once. No pivoting is needed: H ⪰ (l2 + hessian_pertubation)·I by
construction.

Layout: H (p,k,k) → A (k², p_pad); G (p,k) → b (k, p_pad); grid over lane
blocks. Padding systems are identity/0 so they solve to 0 (no NaNs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 512
_MAX_UNROLL_K = 32


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _chol_solve_kernel(a_ref, b_ref, out_ref, *, k: int):
    A = a_ref[:]          # (k*k, B)
    b = b_ref[:]          # (k, B)

    def row(M, i):
        return M[i:i + 1, :]

    L = [[None] * k for _ in range(k)]
    inv_diag = [None] * k
    for j in range(k):
        s = row(A, j * k + j)
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        Ljj = jnp.sqrt(s)
        L[j][j] = Ljj
        inv_diag[j] = 1.0 / Ljj
        for i in range(j + 1, k):
            s = row(A, i * k + j)
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            L[i][j] = s * inv_diag[j]

    y = [None] * k
    for i in range(k):
        s = row(b, i)
        for t in range(i):
            s = s - L[i][t] * y[t]
        y[i] = s * inv_diag[i]

    x = [None] * k
    for i in reversed(range(k)):
        s = y[i]
        for t in range(i + 1, k):
            s = s - L[t][i] * x[t]
        x[i] = s * inv_diag[i]

    out_ref[:] = jnp.concatenate(x, axis=0)


def batched_spd_solve(H: jnp.ndarray, G: jnp.ndarray) -> jnp.ndarray:
    """Solve H[i] d[i] = G[i] for all i. H: (p,k,k) SPD, G: (p,k) → (p,k)."""
    p, k, _ = H.shape
    if k > _MAX_UNROLL_K:
        # Unrolled factorization would bloat the kernel — XLA's batched
        # solve is acceptable at large k (rare for CMF ranks).
        return jnp.linalg.solve(H, G[..., None])[..., 0]

    dtype = H.dtype
    nb = max(1, -(-p // _LANES))
    pb = nb * _LANES
    pad = pb - p

    A = jnp.transpose(H, (1, 2, 0)).reshape(k * k, p)
    b = G.T
    if pad:
        eye = jnp.eye(k, dtype=dtype).reshape(k * k, 1)
        A = jnp.concatenate([A, jnp.broadcast_to(eye, (k * k, pad))], axis=1)
        b = jnp.concatenate([b, jnp.zeros((k, pad), dtype)], axis=1)

    out = pl.pallas_call(
        functools.partial(_chol_solve_kernel, k=k),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((k * k, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, pb), dtype),
        interpret=_interp(),
    )(A, b)
    return out[:, :p].T
