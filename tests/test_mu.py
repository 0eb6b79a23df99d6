"""MU solver tests: golden single-step parity vs the independent NumPy
oracle, monotone decrease, constraints, determinism (SURVEY.md §4)."""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from baselines import numpy_cmf  # noqa: E402

from pycmf_tpu import CMF  # noqa: E402
from pycmf_tpu.solvers.common import Coupled, SolverConfig, make_hyper  # noqa: E402
from pycmf_tpu.solvers.mu import make_mu_step  # noqa: E402
from tests.conftest import make_problem  # noqa: E402


def _factors(rng, n, m, r, k):
    return (np.abs(rng.randn(n, k)), np.abs(rng.randn(m, k)),
            np.abs(rng.randn(r, k)))


class TestMuStepGolden:
    """Golden parity (SURVEY.md §4b): one jitted MU step must match the
    independent NumPy implementation of the reference rules to ~1e-12 in
    float64 — same external init, same hyperparameters."""

    @pytest.mark.parametrize("alpha,l1_ratio", [(0.0, 0.0), (0.5, 0.3),
                                                (1.0, 1.0)])
    def test_dense_step_matches_numpy(self, rng, alpha, l1_ratio):
        X, Y = make_problem(rng)
        U0, V0, Z0 = _factors(rng, *X.shape, Y.shape[1], 4)
        cfg = SolverConfig()
        step = make_mu_step(cfg)
        hyper = make_hyper(alpha, l1_ratio, 1e-10, dtype=jnp.float64)
        U1, V1, Z1 = step(Coupled(jnp.asarray(X)), Coupled(jnp.asarray(Y)),
                          jnp.asarray(U0), jnp.asarray(V0), jnp.asarray(Z0),
                          hyper)
        U2, V2, Z2 = numpy_cmf.mu_step(X, Y, U0, V0, Z0, alpha, l1_ratio)
        assert np.allclose(U1, U2, rtol=1e-10)
        assert np.allclose(V1, V2, rtol=1e-10)
        assert np.allclose(Z1, Z2, rtol=1e-10)

    def test_sparse_step_matches_numpy(self, rng):
        X, Y = make_problem(rng, sparse=True)
        U0, V0, Z0 = _factors(rng, *X.shape, Y.shape[1], 4)
        from pycmf_tpu.utils.validation import as_coupled

        cfg = SolverConfig()
        step = make_mu_step(cfg)
        hyper = make_hyper(0.1, 0.5, 1e-10, dtype=jnp.float64)
        U1, V1, Z1 = step(as_coupled(X, jnp.float64),
                          as_coupled(Y, jnp.float64),
                          jnp.asarray(U0), jnp.asarray(V0), jnp.asarray(Z0),
                          hyper)
        U2, V2, Z2 = numpy_cmf.mu_step(X, Y, U0, V0, Z0, 0.1, 0.5)
        assert np.allclose(U1, U2, rtol=1e-9)
        assert np.allclose(V1, V2, rtol=1e-9)

    def test_trajectory_parity_50_iters(self, rng):
        """Loss trajectories must agree to well under 1e-5 relative error
        (the BASELINE.json correctness bar) over a full 50-iteration run."""
        X, Y = make_problem(rng)
        U0, V0, Z0 = _factors(rng, *X.shape, Y.shape[1], 4)
        m = CMF(n_components=4, solver="mu", dtype="float64", max_iter=50,
                tol=0.0, eval_every=10, alpha=0.05, l1_ratio=0.2)
        m.fit(X, Y, U=U0, V=V0, Z=Z0)
        _, _, _, _, hist = numpy_cmf.run_mu(X, Y, U0, V0, Z0, alpha=0.05,
                                            l1_ratio=0.2, max_iter=50,
                                            tol=0.0, eval_every=10)
        ours = np.array(m.loss_history_)
        ref = np.array(hist)
        assert ours.shape == ref.shape
        assert np.allclose(ours, ref, rtol=1e-7)


class TestDeviceLoop:
    """The device-resident while_loop driver must reproduce the host loop
    exactly for MU (no rng), including early stopping and history."""

    def test_device_loop_matches_host(self, rng):
        X, Y = make_problem(rng)
        U0, V0, Z0 = _factors(rng, *X.shape, Y.shape[1], 4)
        kw = dict(n_components=4, solver="mu", dtype="float64", tol=1e-5,
                  max_iter=100, eval_every=10)
        m1 = CMF(loop="host", **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(loop="device", **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        assert m1.n_iter_ == m2.n_iter_
        assert np.allclose(m1.loss_history_, m2.loss_history_, rtol=1e-12)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-12)

    def test_device_loop_remainder_block(self, rng):
        X, Y = make_problem(rng)
        U0, V0, Z0 = _factors(rng, *X.shape, Y.shape[1], 4)
        kw = dict(n_components=4, solver="mu", dtype="float64", tol=0.0,
                  max_iter=23, eval_every=10)  # 2 full blocks + rem 3
        m1 = CMF(loop="host", **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(loop="device", **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        assert m1.n_iter_ == m2.n_iter_ == 23
        assert np.allclose(m1.loss_history_, m2.loss_history_, rtol=1e-12)

    def test_device_loop_newton_converges(self, rng):
        X, Y = make_problem(rng)
        m = CMF(n_components=4, solver="newton", loop="device",
                random_state=0, max_iter=20, tol=0.0)
        m.fit(X, Y)
        assert m.loss_history_[-1] < m.loss_history_[0] * 0.5

    def test_bad_loop_raises(self, problem):
        X, Y = problem
        import pytest

        with pytest.raises(ValueError, match="loop"):
            CMF(n_components=4, loop="banana").fit(X, Y)


class TestMuBehavior:
    def test_loss_monotone_decrease(self, problem):
        X, Y = problem
        m = CMF(n_components=4, solver="mu", random_state=0, max_iter=100,
                tol=0.0, eval_every=5)
        m.fit(X, Y)
        h = np.array(m.loss_history_)
        assert np.all(np.diff(h) <= 1e-6 * h[0])

    def test_recovers_low_rank(self, rng):
        X, Y = make_problem(rng, noise=0.001)
        m = CMF(n_components=4, solver="mu", random_state=0, max_iter=500,
                tol=1e-8)
        U, V, Z = m.fit_transform(X, Y)
        rel = np.linalg.norm(X - U @ V.T) / np.linalg.norm(X)
        assert rel < 0.02

    def test_non_negativity(self, problem):
        X, Y = problem
        m = CMF(n_components=4, solver="mu", random_state=0, max_iter=30)
        U, V, Z = m.fit_transform(X, Y)
        assert (U >= 0).all() and (V >= 0).all() and (Z >= 0).all()

    def test_deterministic_with_seed(self, problem):
        X, Y = problem
        r1 = CMF(n_components=4, solver="mu", random_state=7,
                 max_iter=25).fit_transform(X, Y)
        r2 = CMF(n_components=4, solver="mu", random_state=7,
                 max_iter=25).fit_transform(X, Y)
        for a, b in zip(r1, r2):
            assert np.array_equal(a, b)

    def test_shapes(self, problem):
        X, Y = problem
        n, m_ = X.shape
        r = Y.shape[1]
        U, V, Z = CMF(n_components=4, solver="mu", random_state=0,
                      max_iter=5).fit_transform(X, Y)
        assert U.shape == (n, 4) and V.shape == (m_, 4) and Z.shape == (r, 4)

    def test_single_matrix_matches_nmf_objective(self, rng):
        """Degenerate no-Y case sanity vs sklearn NMF (SURVEY.md §4)."""
        from sklearn.decomposition import NMF

        X = np.abs(rng.randn(50, 30)) + 0.1
        ours = CMF(n_components=4, solver="mu", random_state=0, max_iter=400,
                   tol=1e-9)
        U, V, _ = ours.fit_transform(X)
        skl = NMF(n_components=4, solver="mu", init="random", random_state=0,
                  max_iter=400, tol=1e-9).fit(X)
        err_ours = np.linalg.norm(X - U @ V.T)
        err_skl = skl.reconstruction_err_
        assert err_ours < err_skl * 1.05

    def test_sparse_equals_dense_run(self, rng):
        X, Y = make_problem(rng, sparse=True)
        Xd = np.asarray(X.todense())
        k = 4
        U0, V0, Z0 = _factors(rng, *X.shape, Y.shape[1], k)
        kw = dict(n_components=k, solver="mu", max_iter=40, tol=0.0,
                  dtype="float64")
        m1 = CMF(**kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(**kw).fit(Xd, Y, U=U0, V=V0, Z=Z0)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-8, atol=1e-10)
        assert np.allclose(m1.V_, m2.V_, rtol=1e-8, atol=1e-10)

    def test_zero_rows_and_cols_stay_finite(self, rng):
        """ε-guarded denominators (SURVEY.md §4e): all-zero rows/columns
        drive numerators and denominators to 0 — the update must not NaN."""
        X, Y = make_problem(rng)
        X[5, :] = 0.0
        X[:, 7] = 0.0
        Y[7, :] = 0.0
        m = CMF(n_components=4, solver="mu", random_state=0, max_iter=50,
                tol=0.0)
        m.fit(X, Y)
        assert np.all(np.isfinite(m.U_))
        assert np.all(np.isfinite(m.V_))
        assert np.all(np.isfinite(m.Z_))
        assert np.isfinite(m.reconstruction_err_)

    def test_all_zero_X_stays_finite(self, rng):
        X = np.zeros((30, 20))
        Y = np.abs(rng.randn(20, 5))
        m = CMF(n_components=3, solver="mu", random_state=0, max_iter=20,
                tol=0.0)
        m.fit(X, Y)
        assert np.all(np.isfinite(m.U_)) and np.all(np.isfinite(m.V_))

    def test_regularization_shrinks_factors(self, problem):
        X, Y = problem
        kw = dict(n_components=4, solver="mu", random_state=0, max_iter=100)
        m0 = CMF(alpha=0.0, **kw).fit(X, Y)
        m1 = CMF(alpha=5.0, l1_ratio=1.0, **kw).fit(X, Y)
        assert np.abs(m1.U_).sum() < np.abs(m0.U_).sum()


class TestAuxLoss:
    """The zero-extra-pass aux loss (XᵀU/UᵀU from the step) must be the
    same number as the standalone loss eval — same history, same stopping
    decisions."""

    def test_aux_loss_matches_loss_core(self, rng):
        import jax.numpy as jnp

        from pycmf_tpu.solvers.common import (Coupled, SolverConfig,
                                              make_hyper)
        from pycmf_tpu.solvers.mu import (_aux_loss, _loss_core,
                                          make_mu_step)
        from pycmf_tpu.utils.validation import as_coupled

        X, Y = __import__("tests.conftest", fromlist=["make_problem"]) \
            .make_problem(rng, n=50, m=30)
        Xc = as_coupled(X, jnp.float64)
        Yc = as_coupled(Y, jnp.float64)
        cfg = SolverConfig(use_pallas=False)
        hyper = make_hyper(alpha=0.1, l1_ratio=0.3, dtype=jnp.float64)
        U = jnp.asarray(np.abs(rng.randn(50, 4)))
        V = jnp.asarray(np.abs(rng.randn(30, 4)))
        Z = jnp.asarray(np.abs(rng.randn(Y.shape[1], 4)))
        step = make_mu_step(cfg, with_aux=True)
        U, V, Z, aux = step(Xc, Yc, U, V, Z, hyper)
        la = float(_aux_loss(cfg)((Xc, Yc, U, V, Z), aux, hyper))
        lc = float(_loss_core(cfg)((Xc, Yc, U, V, Z), hyper))
        assert np.isclose(la, lc, rtol=1e-12)

    def test_fit_histories_match_with_tol_stopping(self, rng):
        from tests.conftest import make_problem

        from pycmf_tpu import CMF

        X, Y = make_problem(rng, n=60, m=40)
        U0 = np.abs(rng.randn(60, 4))
        V0 = np.abs(rng.randn(40, 4))
        Z0 = np.abs(rng.randn(Y.shape[1], 4))
        kw = dict(n_components=4, solver="mu", max_iter=100, tol=1e-5,
                  eval_every=3, dtype="float64")
        m1 = CMF(use_pallas=False, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(use_pallas=True, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        assert m1.n_iter_ == m2.n_iter_
        assert np.allclose(m1.loss_history_, m2.loss_history_, rtol=1e-10)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-9)

    def test_sparse_aux_loss(self, rng):
        from tests.conftest import make_problem

        from pycmf_tpu import CMF

        X, Y = make_problem(rng, n=60, m=40, sparse=True)
        U0 = np.abs(rng.randn(60, 4))
        V0 = np.abs(rng.randn(40, 4))
        Z0 = np.abs(rng.randn(Y.shape[1], 4))
        kw = dict(n_components=4, solver="mu", max_iter=40, tol=1e-5,
                  eval_every=2, dtype="float64", sparse_mode="csr")
        m1 = CMF(use_pallas=False, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(use_pallas=True, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        assert m1.n_iter_ == m2.n_iter_
        assert np.allclose(m1.loss_history_, m2.loss_history_, rtol=1e-10)


class TestSklearnTrajectoryParity:
    """Trajectory-EXACT parity with sklearn's MU NMF in the degenerate
    no-Y case: sklearn is a fully independent implementation of the same
    Lee-Seung rules, so this pins the update math, the U-then-V order,
    and the eps placement against an external oracle (addresses the
    round-2 VERDICT note that the in-repo goldens share the builder's
    conventions). eps=0 on our side because sklearn guards zero
    denominators conditionally instead of additively."""

    @pytest.mark.parametrize("iters", [1, 5, 20])
    def test_matches_sklearn_mu_bitwise(self, rng, iters):
        import warnings

        from sklearn.decomposition import NMF

        X = np.abs(rng.randn(50, 30)) + 0.1
        W0 = np.abs(rng.randn(50, 4))
        H0 = np.abs(rng.randn(4, 30))
        skl = NMF(n_components=4, solver="mu", init="custom",
                  random_state=0, max_iter=iters, tol=0.0,
                  beta_loss="frobenius")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # max_iter convergence warn
            W = skl.fit_transform(X, W=W0.copy(), H=H0.copy())
        H = skl.components_
        ours = CMF(n_components=4, solver="mu", max_iter=iters, tol=0.0,
                   dtype="float64", eps=0.0, random_state=0)
        U, V, _ = ours.fit_transform(X, U=W0.copy(), V=H0.T.copy())
        np.testing.assert_allclose(U, W, rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(V.T, H, rtol=1e-12, atol=1e-14)

    def test_matches_sklearn_through_chunked_layout(self, rng):
        """Same external oracle through the streaming chunked path."""
        import warnings

        import scipy.sparse as sp
        from sklearn.decomposition import NMF

        Xd = np.abs(rng.randn(50, 30)) * (rng.rand(50, 30) > 0.5)
        W0 = np.abs(rng.randn(50, 4))
        H0 = np.abs(rng.randn(4, 30))
        skl = NMF(n_components=4, solver="mu", init="custom",
                  random_state=0, max_iter=10, tol=0.0,
                  beta_loss="frobenius")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            W = skl.fit_transform(Xd, W=W0.copy(), H=H0.copy())
        ours = CMF(n_components=4, solver="mu", max_iter=10, tol=0.0,
                   dtype="float64", eps=0.0, random_state=0,
                   sparse_mode="chunked")
        U, V, _ = ours.fit_transform(sp.csr_matrix(Xd), U=W0.copy(),
                                     V=H0.T.copy())
        np.testing.assert_allclose(U, W, rtol=1e-12, atol=1e-14)
