"""Checkpoint/resume, profiling, datasets tests (SURVEY.md §5)."""
import os

import numpy as np
import pytest

from pycmf_tpu import CMF
from pycmf_tpu.utils.checkpoint import (load_checkpoint, load_model,
                                        save_checkpoint, save_model)
from pycmf_tpu.utils.datasets import load_20ng, synthetic_20ng
from pycmf_tpu.utils.profiling import StepTimer
from tests.conftest import make_problem


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, rng):
        U, V, Z = rng.rand(10, 3), rng.rand(8, 3), rng.rand(4, 3)
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, U, V, Z, n_iter=17, loss_history=[3.0, 2.0],
                        params={"n_components": 3})
        ck = load_checkpoint(p)
        assert np.array_equal(ck["U"], U)
        assert np.array_equal(ck["Z"], Z)
        assert ck["n_iter"] == 17
        assert ck["params"]["n_components"] == 3

    def test_model_roundtrip_and_resume(self, tmp_path, rng):
        X, Y = make_problem(rng)
        m = CMF(n_components=4, random_state=0, max_iter=20, tol=0.0)
        m.fit(X, Y)
        p = str(tmp_path / "model.npz")
        save_model(p, m)
        m2 = load_model(p)
        assert np.array_equal(m2.U_, m.U_)
        assert m2.get_params() == m.get_params()
        # resume: warm-start from the checkpointed factors
        m3 = CMF(n_components=4, random_state=0, max_iter=10, tol=0.0)
        m3.fit(X, Y, U=m2.U_, V=m2.V_, Z=m2.Z_)
        assert m3.reconstruction_err_ <= m.reconstruction_err_ * (1 + 1e-6)
        # transform works on a restored model (no refit needed)
        Unew = m2.transform(X[:5])
        assert Unew.shape == (5, 4)

    def test_unfitted_save_raises(self, tmp_path):
        with pytest.raises(RuntimeError, match="unfitted"):
            save_model(str(tmp_path / "x.npz"), CMF(n_components=2))


class TestDatasets:
    def test_synthetic_20ng_shape_and_stats(self):
        X, Y = synthetic_20ng(n_docs=200, n_terms=500, n_labels=7,
                              random_state=0)
        assert X.shape == (500, 200) and Y.shape == (200, 7)
        assert (Y.sum(axis=1) == 1).all()          # one-hot
        assert (X.data > 0).all()
        density = X.nnz / (500 * 200)
        assert 0.001 < density < 0.6

    def test_load_20ng_falls_back(self):
        X, Y, source = load_20ng()
        assert X.shape[1] == Y.shape[0]
        assert "20" in source or "synthetic" in source

    def test_cmf_fits_synthetic_20ng(self):
        X, Y = synthetic_20ng(n_docs=150, n_terms=400, n_labels=5,
                              random_state=0)
        m = CMF(n_components=5, solver="mu", random_state=0, max_iter=50)
        m.fit(X, Y)
        h = m.loss_history_
        assert h[-1] < h[0]


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer()
        with t.measure("a"):
            pass
        with t.measure("a"):
            pass
        with t.measure("b"):
            pass
        assert len(t.events) == 3
        assert t.total("a") <= t.total()
