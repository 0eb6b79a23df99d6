"""Checked-in golden parity fixtures (SURVEY.md §4b).

The fixtures in tests/goldens/ hold fixed inputs, initial factors, the
final factors, and the full loss trajectory produced by the independent
NumPy implementation of the reference's update rules. The jitted solvers
must reproduce them to float64 tolerance — this pins solver behavior
against refactors of BOTH implementations (regenerate only with
justification; see the generation script in the git history of this file's
commit).

These goldens share the repo's pinned conventions (PINNED_ASSUMPTIONS.md);
the EXTERNAL cross-check is tests/test_mu.py::TestSklearnTrajectoryParity,
which matches sklearn's independent MU implementation to 1e-15 in the
degenerate no-Y case."""
from pathlib import Path

import numpy as np
import pytest

from pycmf_tpu import CMF

GOLDENS = Path(__file__).parent / "goldens"


def test_mu_dense_regularized_golden():
    g = np.load(GOLDENS / "mu_dense_reg.npz")
    m = CMF(n_components=g["U0"].shape[1], solver="mu",
            alpha=float(g["alpha"]), l1_ratio=float(g["l1_ratio"]),
            max_iter=int(g["n_iter"]), tol=0.0, eval_every=1,
            dtype="float64")
    m.fit(g["X"], g["Y"], U=g["U0"], V=g["V0"], Z=g["Z0"])
    assert np.allclose(m.loss_history_, g["losses"], rtol=1e-9)
    assert np.allclose(m.U_, g["U"], rtol=1e-8, atol=1e-11)
    assert np.allclose(m.V_, g["V"], rtol=1e-8, atol=1e-11)
    assert np.allclose(m.Z_, g["Z"], rtol=1e-8, atol=1e-11)


def test_newton_sigmoid_golden():
    g = np.load(GOLDENS / "newton_sigmoid.npz")
    m = CMF(n_components=g["U0"].shape[1], solver="newton",
            alpha=0.05, l1_ratio=0.2, hessian_pertubation=0.3,
            y_link="sigmoid", U_non_negative=False, V_non_negative=False,
            Z_non_negative=False, line_search_trials=6,
            max_iter=int(g["n_iter"]), tol=0.0, eval_every=1,
            dtype="float64")
    m.fit(g["X"], g["Y"], U=g["U0"], V=g["V0"], Z=g["Z0"])
    assert np.allclose(m.loss_history_, g["losses"], rtol=1e-8)
    assert np.allclose(m.U_, g["U"], rtol=1e-7, atol=1e-10)
    assert np.allclose(m.V_, g["V"], rtol=1e-7, atol=1e-10)
    assert np.allclose(m.Z_, g["Z"], rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("loop", ["host", "device"])
def test_mu_golden_both_loops(loop):
    g = np.load(GOLDENS / "mu_dense_reg.npz")
    m = CMF(n_components=4, solver="mu", alpha=float(g["alpha"]),
            l1_ratio=float(g["l1_ratio"]), max_iter=int(g["n_iter"]),
            tol=0.0, eval_every=5, dtype="float64", loop=loop)
    m.fit(g["X"], g["Y"], U=g["U0"], V=g["V0"], Z=g["Z0"])
    assert abs(m.reconstruction_err_ - g["losses"][-1]) \
        / g["losses"][-1] < 1e-9
