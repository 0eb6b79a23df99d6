"""Estimator API tests: sklearn conventions, validation, transform,
attributes, analysis helpers (SURVEY.md §1 table, §3.2-3.5, §4)."""
import numpy as np
import pytest

from pycmf_tpu import CMF
from tests.conftest import make_problem


class TestParams:
    def test_sklearn_get_set_params(self):
        m = CMF(n_components=5, alpha=0.1)
        p = m.get_params()
        assert p["n_components"] == 5 and p["alpha"] == 0.1
        m.set_params(alpha=0.7)
        assert m.alpha == 0.7

    def test_clone(self):
        from sklearn.base import clone

        m = CMF(n_components=3, solver="newton", sg_sample_ratio=0.5)
        c = clone(m)
        assert c.get_params() == m.get_params()

    @pytest.mark.parametrize("kw,err", [
        (dict(n_components=0), ValueError),
        (dict(n_components=3, solver="lbfgs"), ValueError),
        (dict(n_components=3, x_link="probit"), ValueError),
        (dict(n_components=3, l1_ratio=2.0), ValueError),
        (dict(n_components=3, alpha=-1.0), ValueError),
        (dict(n_components=3, max_iter=0), ValueError),
        (dict(n_components=3, sg_sample_ratio=0.0), ValueError),
        (dict(n_components=3, solver="mu", x_link="sigmoid"), ValueError),
        (dict(n_components=3, solver="mu", U_non_negative=False), ValueError),
    ])
    def test_invalid_params_raise(self, problem, kw, err):
        X, Y = problem
        with pytest.raises(err):
            CMF(**kw).fit(X, Y)

    def test_negative_data_rejected_by_mu(self, rng):
        X, Y = make_problem(rng, non_negative=False)
        with pytest.raises(ValueError, match="negative"):
            CMF(n_components=3, solver="mu").fit(X, Y)

    def test_mismatched_shapes_raise(self, rng):
        X = np.abs(rng.randn(20, 10))
        Ybad = np.abs(rng.randn(11, 4))
        with pytest.raises(ValueError, match="couples"):
            CMF(n_components=3).fit(X, Ybad)

    def test_nan_rejected(self, problem):
        X, Y = problem
        Xb = X.copy()
        Xb[0, 0] = np.nan
        with pytest.raises(ValueError, match="NaN"):
            CMF(n_components=3).fit(Xb, Y)

    def test_missing_n_components(self, problem):
        X, Y = problem
        with pytest.raises(ValueError, match="n_components"):
            CMF().fit(X, Y)


class TestFitAPI:
    def test_fit_returns_self_and_attrs(self, problem):
        X, Y = problem
        m = CMF(n_components=4, random_state=0, max_iter=20)
        out = m.fit(X, Y)
        assert out is m
        assert m.U_.shape == (X.shape[0], 4)
        assert m.V_.shape == (X.shape[1], 4)
        assert m.Z_.shape == (Y.shape[1], 4)
        assert isinstance(m.n_iter_, int) and m.n_iter_ > 0
        assert isinstance(m.reconstruction_err_, float)
        assert len(m.loss_history_) == len(m.loss_iters_)
        assert len(m.step_times_) >= 1

    def test_external_init_is_used(self, problem, rng):
        X, Y = problem
        k = 4
        U0 = np.abs(rng.randn(X.shape[0], k))
        V0 = np.abs(rng.randn(X.shape[1], k))
        Z0 = np.abs(rng.randn(Y.shape[1], k))
        m = CMF(n_components=k, max_iter=1, tol=0.0, dtype="float64")
        m.fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(n_components=k, max_iter=1, tol=0.0, dtype="float64")
        m2.fit(X, Y, U=U0, V=V0, Z=Z0)
        assert np.array_equal(m.U_, m2.U_)

    def test_bad_init_shape_raises(self, problem, rng):
        X, Y = problem
        with pytest.raises(ValueError, match="shape"):
            CMF(n_components=4).fit(X, Y, U=rng.rand(3, 4),
                                    V=np.abs(rng.rand(X.shape[1], 4)))

    def test_tol_stops_early(self, problem):
        X, Y = problem
        m = CMF(n_components=4, random_state=0, max_iter=1000, tol=1e-2,
                eval_every=5)
        m.fit(X, Y)
        assert m.n_iter_ < 1000

    @pytest.mark.parametrize("x_init", ["random", "svd", "nndsvd", "nndsvda",
                                        "nndsvdar"])
    def test_init_methods(self, problem, x_init):
        X, Y = problem
        m = CMF(n_components=4, x_init=x_init, y_init=x_init, random_state=0,
                max_iter=10)
        m.fit(X, Y)
        assert np.isfinite(m.reconstruction_err_)

    def test_warm_start_resumes(self, problem):
        """Checkpoint/resume semantics (SURVEY.md §5): fitting from the
        previous factors continues improving from the stored loss."""
        X, Y = problem
        m1 = CMF(n_components=4, random_state=0, max_iter=20, tol=0.0)
        m1.fit(X, Y)
        m2 = CMF(n_components=4, random_state=0, max_iter=20, tol=0.0)
        m2.fit(X, Y, U=m1.U_, V=m1.V_, Z=m1.Z_)
        assert m2.loss_history_[0] <= m1.reconstruction_err_ * (1 + 1e-6)
        assert m2.reconstruction_err_ <= m1.reconstruction_err_


class TestDataDtype:
    def test_bf16_data_f32_factors(self, rng):
        """data_dtype='bfloat16' keeps factors/accumulation in float32 and
        converges close to the full-precision run (noise above the bf16
        quantization floor of X — ~0.4% relative)."""
        X, Y = make_problem(rng, noise=0.05)
        U0 = np.abs(rng.randn(X.shape[0], 4))
        V0 = np.abs(rng.randn(X.shape[1], 4))
        Z0 = np.abs(rng.randn(Y.shape[1], 4))
        kw = dict(n_components=4, solver="mu", max_iter=100, tol=0.0,
                  dtype="float32")
        m1 = CMF(**kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(data_dtype="bfloat16", **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        assert m2.U_.dtype == np.float64  # host-side export unchanged
        # trajectories diverge (quantized numerators), but quality must be
        # comparable-or-better at the same iteration budget
        assert m2.reconstruction_err_ < m1.reconstruction_err_ * 1.15
        r1 = np.linalg.norm(X - m1.U_ @ m1.V_.T) / np.linalg.norm(X)
        r2 = np.linalg.norm(X - m2.U_ @ m2.V_.T) / np.linalg.norm(X)
        assert r2 < r1 * 1.15

    def test_bf16_data_newton_sigmoid(self, rng):
        X, Y = make_problem(rng, non_negative=False, binary_y=True)
        m = CMF(n_components=4, solver="newton", y_link="sigmoid",
                U_non_negative=False, V_non_negative=False,
                Z_non_negative=False, data_dtype="bfloat16",
                random_state=0, max_iter=15, tol=0.0)
        m.fit(X, Y)
        assert m.loss_history_[-1] < m.loss_history_[0] * 0.7


class TestTransform:
    def test_transform_shape_and_quality(self, rng):
        X, Y = make_problem(rng, n=80)
        m = CMF(n_components=4, random_state=0, max_iter=200, tol=1e-7)
        m.fit(X, Y)
        Unew = m.transform(X[:15])
        assert Unew.shape == (15, 4)
        rel = np.linalg.norm(X[:15] - Unew @ m.V_.T) / np.linalg.norm(X[:15])
        assert rel < 0.05

    def test_transform_before_fit_raises(self, problem):
        X, _ = problem
        with pytest.raises(RuntimeError, match="fit"):
            CMF(n_components=4).transform(X)

    def test_transform_wrong_width_raises(self, problem):
        X, Y = problem
        m = CMF(n_components=4, random_state=0, max_iter=5).fit(X, Y)
        with pytest.raises(ValueError, match="columns"):
            m.transform(X[:, :-1])

    def test_newton_transform(self, problem):
        X, Y = problem
        m = CMF(n_components=4, solver="newton", random_state=0, max_iter=30)
        m.fit(X, Y)
        Unew = m.transform(X[:10])
        assert Unew.shape == (10, 4)


class TestSklearnCompat:
    def test_components_and_inverse_transform(self, rng):
        X, Y = make_problem(rng, noise=0.001)
        m = CMF(n_components=4, random_state=0, max_iter=300, tol=1e-8)
        U, V, Z = m.fit_transform(X, Y)
        assert m.components_.shape == (4, X.shape[1])
        Xr = m.inverse_transform(U)
        assert Xr.shape == X.shape
        rel = np.linalg.norm(X - Xr) / np.linalg.norm(X)
        assert rel < 0.05

    def test_components_before_fit_raises(self):
        with pytest.raises(AttributeError):
            CMF(n_components=2).components_

    def test_pipeline_usage(self, rng):
        """CMF as a transformer in an sklearn pipeline (single-matrix)."""
        from sklearn.pipeline import Pipeline

        X = np.abs(rng.randn(40, 25))
        pipe = Pipeline([("cmf", CMF(n_components=3, random_state=0,
                                     max_iter=30))])
        U = pipe.fit_transform(X)
        # fit_transform returns the factor tuple; transform returns U
        U2 = pipe.transform(X)
        assert U2.shape == (40, 3)


class TestAnalysis:
    def test_print_topic_terms(self, problem, capsys):
        X, Y = problem
        m = CMF(n_components=3, random_state=0, max_iter=10).fit(X, Y)
        vocab = [f"word{i}" for i in range(X.shape[0])]
        s = m.print_topic_terms(vocabulary=vocab, factor="U", n_top_words=4)
        assert "Topic #0" in s and "Topic #2" in s
        assert len(s.splitlines()) == 3
        top = s.splitlines()[0].split(": ")[1].split()
        idx = [vocab.index(t) for t in top]
        w = m.U_[:, 0]
        assert np.all(np.diff(w[idx]) <= 1e-12)  # descending weights

    def test_unfitted_raises(self):
        with pytest.raises(RuntimeError):
            CMF(n_components=3).print_topic_terms(vocabulary=["a"])


class TestPycmfAlias:
    """The reference package name works as a drop-in alias."""

    def test_reference_import_line_works(self, rng):
        from pycmf import CMF as AliasCMF

        from pycmf_tpu import CMF as RealCMF

        assert AliasCMF is RealCMF
        X = np.abs(rng.randn(20, 12))
        Y = np.abs(rng.randn(12, 5))
        m = AliasCMF(n_components=3, max_iter=5)
        U, V, Z = m.fit_transform(X, Y)
        assert U.shape == (20, 3) and V.shape == (12, 3)

    def test_analysis_helpers_exported(self):
        import pycmf

        assert callable(pycmf.top_terms_per_component)
        assert callable(pycmf.topic_terms_string)
