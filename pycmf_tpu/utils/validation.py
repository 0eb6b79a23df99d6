"""Input/parameter validation for the CMF estimator.

Mirrors the reference's sklearn-style checks (SURVEY.md §2 component 2:
``check_array``-based validation including scipy.sparse acceptance) while
producing device-ready operands: dense inputs become jnp arrays, sparse
inputs become CsrMatrix pytrees with precomputed transposes
(SURVEY.md §7 stage 4).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..ops.links import LINEAR, SIGMOID
from ..ops.sparse import csr_transpose_host
from ..solvers.common import Coupled


def as_coupled(A, dtype, densify_threshold: int = 0) -> Coupled:
    """Convert a host matrix to a device operand pair."""
    if sp.issparse(A):
        C, Ct = csr_transpose_host(A, dtype=dtype)
        return Coupled(C, Ct)
    return Coupled(jnp.asarray(np.asarray(A), dtype=dtype), None)


def check_matrix(A, name: str, *, require_non_negative: bool,
                 require_finite: bool = True):
    if sp.issparse(A):
        data = A.data
    else:
        A = np.asarray(A)
        if A.ndim != 2:
            raise ValueError(f"{name} must be 2-D, got shape {A.shape}")
        data = A
    if data.size and require_finite and not np.all(np.isfinite(data)):
        raise ValueError(f"{name} contains NaN or infinity")
    if require_non_negative and data.size and (data < 0).any():
        raise ValueError(
            f"{name} contains negative entries, which the multiplicative-"
            "update solver cannot handle; use solver='newton'")
    return A


def validate_cmf_params(*, n_components, solver, x_link, y_link,
                        U_non_negative, V_non_negative, Z_non_negative,
                        alpha, l1_ratio, tol, max_iter, sg_sample_ratio):
    if n_components is not None and (not isinstance(n_components, (int, np.integer))
                                     or n_components <= 0):
        raise ValueError(f"n_components must be a positive int, got {n_components!r}")
    if solver not in ("mu", "newton"):
        raise ValueError(f"solver must be 'mu' or 'newton', got {solver!r}")
    for nm, link in (("x_link", x_link), ("y_link", y_link)):
        if link not in (LINEAR, SIGMOID):
            raise ValueError(f"{nm} must be 'linear' or 'sigmoid', got {link!r}")
    if solver == "mu":
        # As in the reference: MU is the Lee–Seung scheme — it requires the
        # linear link and non-negativity on every factor (SURVEY.md §0).
        if x_link != LINEAR or y_link != LINEAR:
            raise ValueError("solver='mu' supports only linear links; "
                             "use solver='newton' for sigmoid links")
        if not (U_non_negative and V_non_negative and Z_non_negative):
            raise ValueError("solver='mu' requires all factors non-negative; "
                             "use solver='newton' to allow negative factors")
    if not (0 <= l1_ratio <= 1):
        raise ValueError(f"l1_ratio must be in [0, 1], got {l1_ratio}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if max_iter <= 0:
        raise ValueError(f"max_iter must be positive, got {max_iter}")
    if tol < 0:
        raise ValueError(f"tol must be >= 0, got {tol}")
    if not (0.0 < sg_sample_ratio <= 1.0):
        raise ValueError(f"sg_sample_ratio must be in (0, 1], got {sg_sample_ratio}")
