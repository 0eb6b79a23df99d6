"""Sparse-Y streamed carrier (round-3 VERDICT item 7).

A sigmoid-linked sparse Y previously densified on the HOST before a
sharded fit (and on device single-chip) — fine for label matrices, a
hole when Y is a second big matrix. Now Y rides the SAME chunked-COO
carrier as X: the Z update consumes the transposed-orientation streamed
sigmoid terms, V's Y-term the forward ones (solvers/newton_chunked.py),
and no dense Y ever exists on host or device. Oracle = the dense-Y path
(same math, different carrier) at f64.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from pycmf_tpu import CMF


def _problem(rng, n=90, m=64, r=40, density=0.3):
    """Dense-ish X, BIG-ish sparse binary Y (m x r) — Y is the matrix
    under test; r is sized so Y is not a trivial label matrix."""
    X = np.abs(rng.randn(n, m))
    Yd = (rng.rand(m, r) < density).astype(np.float64)
    Ys = sp.csr_matrix(Yd)
    inits = (np.abs(rng.randn(n, 5)), np.abs(rng.randn(m, 5)),
             np.abs(rng.randn(r, 5)))
    return X, Yd, Ys, inits


def _fit(X, Y, inits, **kw):
    U0, V0, Z0 = inits
    kw.setdefault("max_iter", 12)
    m = CMF(n_components=5, solver="newton", y_link="sigmoid", tol=0.0,
            dtype="float64", random_state=0, **kw)
    m.fit(X, Y, U=U0, V=V0, Z=Z0)
    return m


def _assert_match(ma, mb, rtol=1e-9):
    np.testing.assert_allclose(ma.components_, mb.components_, rtol=rtol,
                               atol=1e-12)
    np.testing.assert_allclose(ma.loss_history_, mb.loss_history_,
                               rtol=rtol)


class _NoDensify(sp.csr_matrix):
    """CSR that refuses to produce its dense form — the 'no dense Y on
    host' spy. (Conversions that keep it sparse — tocoo/tocsr — pass
    through untouched.)"""

    def todense(self, *a, **kw):  # noqa: D102
        raise AssertionError("dense Y materialized on host (todense)")

    def toarray(self, *a, **kw):  # noqa: D102
        raise AssertionError("dense Y materialized on host (toarray)")


class TestChunkedSigmoidY:
    def test_single_chip_matches_dense_y(self, rng):
        X, Yd, Ys, inits = _problem(rng)
        md = _fit(X, Yd, inits)                      # dense-ndarray Y
        mc = _fit(X, Ys, inits, sparse_mode="chunked")
        _assert_match(md, mc)

    def test_single_chip_chunked_x_and_y(self, rng):
        """Both carriers chunked at once: sparse linear X streams beside
        the streamed sigmoid Y."""
        X, Yd, Ys, inits = _problem(rng)
        Xs = sp.csr_matrix(X * (rng.rand(*X.shape) > 0.7))
        md = _fit(np.asarray(Xs.todense()), Yd, inits)
        mc = _fit(Xs, Ys, inits, sparse_mode="chunked")
        _assert_match(md, mc)

    def test_single_chip_sampled(self, rng):
        """Stochastic Newton: the masked subsample draws identically on
        the chunked and dense Y carriers."""
        X, Yd, Ys, inits = _problem(rng)
        md = _fit(X, Yd, inits, sg_sample_ratio=0.5)
        mc = _fit(X, Ys, inits, sparse_mode="chunked", sg_sample_ratio=0.5)
        _assert_match(md, mc)

    def test_rows_sharded_matches_dense(self, rng):
        X, Yd, Ys, inits = _problem(rng)
        md = _fit(X, Yd, inits)                      # single-device dense
        ms = _fit(X, Ys, inits, sparse_mode="chunked", n_shards=8,
                  shard_layout="rows")
        _assert_match(md, ms)

    def test_rows_sharded_device_loop(self, rng):
        X, Yd, Ys, inits = _problem(rng)
        mh = _fit(X, Ys, inits, sparse_mode="chunked", n_shards=8,
                  shard_layout="rows", loop="host")
        mdv = _fit(X, Ys, inits, sparse_mode="chunked", n_shards=8,
                   shard_layout="rows", loop="device")
        _assert_match(mh, mdv, rtol=1e-11)

    def test_no_dense_y_on_host_sharded(self, rng):
        X, Yd, Ys, inits = _problem(rng)
        spy = _NoDensify(Ys)
        m = _fit(X, spy, inits, sparse_mode="chunked", n_shards=8,
                 shard_layout="rows", max_iter=3)
        assert np.isfinite(m.reconstruction_err_)

    def test_no_dense_y_single_chip(self, rng):
        X, Yd, Ys, inits = _problem(rng)
        m = _fit(X, _NoDensify(Ys), inits, sparse_mode="chunked",
                 max_iter=3)
        assert np.isfinite(m.reconstruction_err_)

    def test_auto_resolves_chunked_past_threshold(self, rng, monkeypatch):
        """sparse_mode='auto' streams Y once its dense copy exceeds the
        densify threshold — no explicit opt-in needed."""
        import pycmf_tpu.utils.validation as val

        monkeypatch.setattr(val, "DENSIFY_THRESHOLD", 64)  # bytes
        X, Yd, Ys, inits = _problem(rng, n=40, m=32, r=16)
        # X dense ndarray: only Y is affected by the tiny threshold
        m = _fit(X, _NoDensify(Ys), inits, max_iter=3)
        assert np.isfinite(m.reconstruction_err_)

    def test_small_sparse_y_still_densifies(self, rng):
        """Below the threshold under 'auto', sparse sigmoid Y keeps the
        dense fast path (device-side densify) — same trajectory, and the
        chunked carrier is NOT engaged."""
        X, Yd, Ys, inits = _problem(rng, r=8)
        md = _fit(X, Yd, inits)
        ma = _fit(X, Ys, inits)          # sparse_mode default 'auto'
        _assert_match(md, ma, rtol=1e-12)

    def test_cols_layout_chunked_carrier(self, rng):
        """Round 5 (VERDICT r04 #4): cols shards Y's rows with m — each
        shard streams its LOCAL row slice through the chunked carrier; Z
        consumes the transposed orientation (psummed over the m shards),
        V's Y-term the forward one. Oracle = the single-device dense-Y
        fit."""
        X, Yd, Ys, inits = _problem(rng)
        md = _fit(X, Yd, inits)
        ms = _fit(X, _NoDensify(Ys), inits, sparse_mode="chunked",
                  n_shards=8, shard_layout="cols")
        _assert_match(md, ms)

    def test_grid_layout_chunked_carrier(self, rng):
        """Same carrier on the 2-D grid: Y's row slices are COL-sharded,
        replicated over ROW."""
        X, Yd, Ys, inits = _problem(rng)
        md = _fit(X, Yd, inits)
        ms = _fit(X, _NoDensify(Ys), inits, sparse_mode="chunked",
                  n_shards=(2, 4), shard_layout="grid")
        _assert_match(md, ms)

    def test_cols_small_sparse_y_device_densifies(self, rng):
        """Below the threshold under 'auto' the cols layout keeps the
        dense fast path but densifies ON DEVICE (scatter_densify) — no
        dense Y on the host even then."""
        X, Yd, Ys, inits = _problem(rng, r=8)
        md = _fit(X, Yd, inits, n_shards=8, shard_layout="cols")
        ms = _fit(X, _NoDensify(Ys), inits, n_shards=8,
                  shard_layout="cols")
        _assert_match(md, ms, rtol=1e-12)

    def test_cols_sampled_chunked_y(self, rng):
        """Stochastic Newton on the cols chunked-Y carrier draws the
        same per-shard masks as the dense-Y sharded fit."""
        X, Yd, Ys, inits = _problem(rng)
        md = _fit(X, Yd, inits, n_shards=8, shard_layout="cols",
                  sg_sample_ratio=0.5)
        ms = _fit(X, _NoDensify(Ys), inits, sparse_mode="chunked",
                  n_shards=8, shard_layout="cols", sg_sample_ratio=0.5)
        _assert_match(md, ms)
