"""Regression tests for the round-4 fixes (VERDICT.md r03 items):
per-eval step_times_ on the device loop (#5), amortize_step_times unit
behavior, and the load_20ng download gate (#6)."""
import numpy as np
import pytest

from pycmf_tpu import CMF
from pycmf_tpu.solvers.common import amortize_step_times
from tests.conftest import make_problem


class TestAmortizeStepTimes:
    def test_uniform_blocks(self):
        # 3 full blocks of 5 iters: equal shares of the wall time
        times = amortize_step_times(0.9, [0, 5, 10, 15])
        assert len(times) == 3
        np.testing.assert_allclose(times, [0.3, 0.3, 0.3])
        assert abs(sum(times) - 0.9) < 1e-12

    def test_remainder_block_pro_rated(self):
        # 2 full blocks of 10 + a remainder of 5 → 25 iters total
        times = amortize_step_times(1.0, [0, 10, 20, 25])
        np.testing.assert_allclose(times, [0.4, 0.4, 0.2])

    def test_empty_history(self):
        assert amortize_step_times(1.0, [0]) == []


class TestDeviceLoopStepTimes:
    """VERDICT r03 weak #5: the device loop reported ONE wall-clock entry
    for the whole fit; the §5 observability contract is
    len(step_times_) == len(loss_history_) - 1 on every path."""

    def _check(self, m):
        assert len(m.step_times_) == len(m.loss_history_) - 1
        assert all(t >= 0 for t in m.step_times_)

    def test_mu_device(self, rng):
        X, Y = make_problem(rng, n=40, m=24)
        m = CMF(n_components=3, solver="mu", loop="device", max_iter=20,
                eval_every=5, tol=0.0, random_state=0).fit(X, Y)
        assert m.n_iter_ == 20
        assert len(m.loss_history_) == 5  # init + 4 eval points
        self._check(m)

    def test_mu_device_early_stop(self, rng):
        X, Y = make_problem(rng, n=40, m=24)
        m = CMF(n_components=3, solver="mu", loop="device", max_iter=200,
                eval_every=5, tol=1e-2, random_state=0).fit(X, Y)
        assert m.n_iter_ < 200  # must actually stop early
        self._check(m)

    def test_mu_device_remainder_block(self, rng):
        X, Y = make_problem(rng, n=40, m=24)
        m = CMF(n_components=3, solver="mu", loop="device", max_iter=12,
                eval_every=5, tol=0.0, random_state=0).fit(X, Y)
        # 2 full blocks + remainder of 2: times pro-rated 5/5/2
        assert m.loss_iters_ == [0, 5, 10, 12]
        self._check(m)
        np.testing.assert_allclose(
            np.asarray(m.step_times_) / sum(m.step_times_),
            np.array([5, 5, 2]) / 12.0)

    def test_newton_device(self, rng):
        X, Y = make_problem(rng, n=40, m=24)
        m = CMF(n_components=3, solver="newton", loop="device", max_iter=8,
                eval_every=4, tol=0.0, random_state=0).fit(X, Y)
        self._check(m)

    def test_sharded_device(self, rng):
        X, Y = make_problem(rng, n=48, m=24)
        m = CMF(n_components=3, solver="mu", loop="device", n_shards=8,
                max_iter=20, eval_every=5, tol=0.0, random_state=0)
        m.fit(X, Y)
        self._check(m)

    def test_grid_device(self, rng):
        X, Y = make_problem(rng, n=48, m=24)
        m = CMF(n_components=3, solver="mu", loop="device",
                n_shards=(2, 4), shard_layout="grid", max_iter=20,
                eval_every=5, tol=0.0, random_state=0)
        m.fit(X, Y)
        self._check(m)


class TestLoad20ngGate:
    def test_no_download_env_falls_back(self, monkeypatch):
        monkeypatch.setenv("PYCMF_NO_DOWNLOAD", "1")
        from pycmf_tpu.utils.datasets import load_20ng

        X, Y, source = load_20ng()
        # either a real on-disk cache or the surrogate with the reason
        assert ("sklearn cache" in source) or ("download disabled" in source)

    def test_download_failure_reason_in_source(self, monkeypatch):
        import pycmf_tpu.utils.datasets as ds

        monkeypatch.setenv("PYCMF_NO_DOWNLOAD", "0")

        def boom(download):
            raise OSError("no network")

        monkeypatch.setattr(ds, "_fetch_20ng", boom)
        X, Y, source = ds.load_20ng()
        assert "download failed: OSError" in source
