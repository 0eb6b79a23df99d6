"""Fused MU factor update — Pallas TPU kernel.

BASELINE.json north_star mandate: "numerator/denominator matmuls plus the
elementwise ratio update in one pass over HBM-resident factor tiles".

One MU factor update is  M ← M ⊙ num ⊘ (M S + l1 + l2·M + ε)  where S is a
tiny k×k Gram matrix. The unfused XLA version writes M S (p×k) to HBM and
reads it back for the ratio; this kernel streams row tiles of M/num through
VMEM once, does the (tile×k)·(k×k) product on the MXU and the ratio on the
VPU, and writes only the updated tile — one HBM pass instead of three.

Falls back to interpreter mode off-TPU (the jnp path in solvers/mu.py stays
the oracle, SURVEY.md §7 stage 5).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512


def _kernel(scal_ref, m_ref, s_ref, num_ref, out_ref):
    l1 = scal_ref[0, 0]
    l2 = scal_ref[0, 1]
    eps = scal_ref[0, 2]
    m = m_ref[:]
    ms = jnp.dot(m, s_ref[:], preferred_element_type=m.dtype)
    out_ref[:] = m * num_ref[:] / (ms + l1 + l2 * m + eps)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=())
def fused_mu_update(M: jnp.ndarray, S: jnp.ndarray, num: jnp.ndarray,
                    l1, l2, eps) -> jnp.ndarray:
    """M ⊙ num ⊘ (M S + l1 + l2·M + ε), single fused pass over row tiles."""
    p, k = M.shape
    dtype = M.dtype
    scal = jnp.stack([jnp.asarray(l1, dtype), jnp.asarray(l2, dtype),
                      jnp.asarray(eps, dtype)]).reshape(1, 3)

    tile = min(_TILE, max(8, p))
    nb = -(-p // tile)
    pad = nb * tile - p
    Mp = jnp.pad(M, ((0, pad), (0, 0)))
    Np = jnp.pad(num, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * tile, k), dtype),
        interpret=_should_interpret(),
    )(scal, Mp, S, Np)
    return out[:p]
