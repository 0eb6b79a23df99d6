"""Config-matrix sweep: every supported option combination either fits to
a finite loss or raises a documented, clean error — no crashes, no NaNs.

Guards the estimator surface against regressions when individual paths are
refactored (each combination is tiny: 3 iterations on a 24×16 problem)."""
import itertools

import jax
import numpy as np
import pytest
import scipy.sparse as sp

from pycmf_tpu import CMF
from tests.conftest import make_problem


def _data(rng, sparse, binary, negatives):
    X, Y = make_problem(rng, n=24, m=16, r=6,
                        non_negative=not negatives,
                        binary_y=binary)
    if sparse:
        X = sp.csr_matrix(np.where(np.abs(X) > np.quantile(np.abs(X), 0.5),
                                   X, 0.0))
    return X, Y


SOLVERS = ["mu", "newton"]
LINKS = ["linear", "sigmoid"]
SPARSE = [False, True]
MODES = ["auto", "csr", "dense", "chunked"]


class TestConfigMatrix:
    @pytest.mark.parametrize(
        "solver,y_link,sparse,mode",
        list(itertools.product(SOLVERS, LINKS, SPARSE, MODES)))
    def test_single_chip_combos(self, rng, solver, y_link, sparse, mode):
        if solver == "mu" and y_link == "sigmoid":
            pytest.skip("MU is linear-link only (validated separately)")
        X, Y = _data(rng, sparse, binary=(y_link == "sigmoid"),
                     negatives=False)
        m = CMF(n_components=3, solver=solver, y_link=y_link,
                sparse_mode=mode, max_iter=3, tol=0.0, random_state=0)
        m.fit(X, Y)
        assert np.isfinite(m.reconstruction_err_)
        assert np.all(np.isfinite(m.U_))
        assert np.all(np.isfinite(m.V_))

    @pytest.mark.parametrize(
        "solver,layout,loop_mode",
        list(itertools.product(SOLVERS, ["rows", "cols"],
                               ["host", "device"])))
    def test_sharded_combos(self, rng, solver, layout, loop_mode):
        if len(jax.devices()) < 4:
            pytest.skip("needs virtual devices")
        X, Y = _data(rng, sparse=False, binary=False, negatives=False)
        m = CMF(n_components=3, solver=solver, n_shards=4,
                shard_layout=layout, loop=loop_mode, max_iter=3, tol=0.0,
                random_state=0)
        m.fit(X, Y)
        assert np.isfinite(m.reconstruction_err_)

    @pytest.mark.parametrize("solver", SOLVERS)
    @pytest.mark.parametrize("ddt", ["bfloat16", "fp8"])
    def test_data_dtype_combos(self, rng, solver, ddt):
        X, Y = _data(rng, sparse=False, binary=False, negatives=False)
        m = CMF(n_components=3, solver=solver, data_dtype=ddt,
                max_iter=3, tol=0.0, random_state=0)
        m.fit(X, Y)
        assert np.isfinite(m.reconstruction_err_)

    @pytest.mark.parametrize("solver", SOLVERS)
    def test_no_y_combos(self, rng, solver):
        X, _ = _data(rng, sparse=False, binary=False, negatives=False)
        m = CMF(n_components=3, solver=solver, max_iter=3, tol=0.0,
                random_state=0)
        m.fit(X)
        assert np.isfinite(m.reconstruction_err_)
        assert m.Z_ is None

    def test_newton_negatives_and_sampling(self, rng):
        X, Y = _data(rng, sparse=False, binary=False, negatives=True)
        m = CMF(n_components=3, solver="newton", U_non_negative=False,
                V_non_negative=False, Z_non_negative=False,
                sg_sample_ratio=0.5, max_iter=3, tol=0.0, random_state=0)
        m.fit(X, Y)
        assert np.isfinite(m.reconstruction_err_)

    def test_mu_rejects_sigmoid_and_negatives(self, rng):
        X, Y = _data(rng, sparse=False, binary=False, negatives=False)
        with pytest.raises(ValueError):
            CMF(n_components=3, solver="mu", y_link="sigmoid",
                max_iter=2).fit(X, Y)
        Xn, Yn = _data(rng, sparse=False, binary=False, negatives=True)
        with pytest.raises(ValueError, match="negative"):
            CMF(n_components=3, solver="mu", max_iter=2).fit(Xn, Yn)


class TestGridConfigMatrix:
    """Grid-layout sweep: solver x loop x data_dtype combos fit clean."""

    @pytest.mark.parametrize(
        "solver,loop_mode,ddt",
        list(itertools.product(SOLVERS, ["host", "device"],
                               [None, "bfloat16"])))
    def test_grid_combos(self, rng, solver, loop_mode, ddt):
        if len(jax.devices()) < 4:
            pytest.skip("needs virtual devices")
        X, Y = _data(rng, sparse=False, binary=False, negatives=False)
        m = CMF(n_components=3, solver=solver, n_shards=(2, 2),
                shard_layout="grid", loop=loop_mode, max_iter=3, tol=0.0,
                random_state=0, data_dtype=ddt)
        m.fit(X, Y)
        assert np.isfinite(m.reconstruction_err_)
        assert np.all(np.isfinite(m.U_))
        assert np.all(np.isfinite(m.V_))

    @pytest.mark.parametrize(
        "solver,sparse_mode",
        list(itertools.product(SOLVERS, ["csr", "chunked"])))
    def test_grid_sparse_combos(self, rng, solver, sparse_mode):
        if len(jax.devices()) < 4:
            pytest.skip("needs virtual devices")
        X, Y = _data(rng, sparse=True, binary=False, negatives=False)
        m = CMF(n_components=3, solver=solver, n_shards=(2, 2),
                shard_layout="grid", sparse_mode=sparse_mode, max_iter=3,
                tol=0.0, random_state=0)
        m.fit(X, Y)
        assert np.isfinite(m.reconstruction_err_)
        assert np.all(np.isfinite(m.U_))
