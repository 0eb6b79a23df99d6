"""One-hot strip SpMM (ops/pallas/onehot.py) — the scattered-sparsity
MXU path (round-3 VERDICT item #2).

Oracle = scipy/dense math (interpret mode on CPU). Estimator-level tests
pin that a scattered CSR fit with BlockEll disabled routes through the
layout and matches the plain segment-sum trajectory.
"""
import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from pycmf_tpu import CMF
from pycmf_tpu.ops.pallas.onehot import (OneHotStrips, onehot_from_scipy,
                                         onehot_ok, onehot_spmm)


def _rand_csr(rng, p, q, density):
    A = sp.random(p, q, density=density, random_state=rng, format="csr")
    A.sum_duplicates()
    return A


class TestKernelOracle:
    @pytest.mark.parametrize("p,q,density", [
        (700, 530, 0.01),     # non-divisible shapes, strips span cells
        (512, 512, 0.05),
        (1025, 300, 0.002),   # nearly-empty cells
        (64, 40, 0.3),        # tiny, dense-ish
    ])
    def test_matches_scipy_f32(self, rng, p, q, density):
        A = _rand_csr(rng, p, q, density)
        L = onehot_from_scipy(A, jnp.float32)
        assert L is not None
        B = rng.randn(q, 20).astype(np.float32)
        got = np.asarray(onehot_spmm(L, jnp.asarray(B)))
        want = A @ B
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-5)

    def test_transposed_orientation(self, rng):
        A = _rand_csr(rng, 600, 450, 0.02)
        Lt = onehot_from_scipy(A.T.tocsr(), jnp.float32)
        M = rng.randn(600, 12).astype(np.float32)
        got = np.asarray(onehot_spmm(Lt, jnp.asarray(M)))
        np.testing.assert_allclose(got, A.T @ M, rtol=2e-6, atol=1e-5)

    def test_transposed_view_same_strips(self, rng):
        """Round 5: OneHotStripsT runs Aᵀ @ B from A's OWN strips (the
        transposed kernel) — no second layout. Oracle = scipy."""
        from pycmf_tpu.ops.pallas.onehot import OneHotStripsT

        A = _rand_csr(rng, 600, 450, 0.02)
        L = onehot_from_scipy(A, jnp.float32)
        M = rng.randn(600, 12).astype(np.float32)
        got = np.asarray(onehot_spmm(OneHotStripsT(L), jnp.asarray(M)))
        np.testing.assert_allclose(got, A.T @ M, rtol=2e-6, atol=1e-5)
        assert OneHotStripsT(L).shape == (450, 600)
        assert onehot_ok(OneHotStripsT(L), 12) == onehot_ok(L, 12)

    def test_as_coupled_builds_one_layout(self, rng):
        """as_coupled's transposed orientation is a VIEW of the forward
        strips — half the host packing and HBM of the round-4 dual
        layout."""
        from pycmf_tpu.ops.pallas.onehot import OneHotStripsT
        from pycmf_tpu.utils.validation import as_coupled

        A = _rand_csr(rng, 300, 220, 0.02)
        import os
        os.environ["PYCMF_TPU_KERNEL_BELL_SPMM"] = "0"
        try:
            C = as_coupled(A, jnp.float32, use_pallas=True,
                           sparse_mode="csr")
        finally:
            del os.environ["PYCMF_TPU_KERNEL_BELL_SPMM"]
        assert C.A_onehot is not None
        assert isinstance(C.At_onehot, OneHotStripsT)
        assert C.At_onehot.base is C.A_onehot

    def test_bf16_storage_quantizes_values(self, rng):
        """Packed values reproduce what a bf16-densified copy contracts."""
        A = _rand_csr(rng, 300, 200, 0.05)
        L = onehot_from_scipy(A, jnp.bfloat16)
        B = rng.randn(200, 8).astype(np.float32)
        got = np.asarray(onehot_spmm(L, jnp.asarray(B)))
        Ab = np.asarray(jnp.asarray(A.toarray(), jnp.bfloat16)
                        .astype(jnp.float32))
        # two bf16 roundings (packed values + the Wt recast) vs one in the
        # dense reference: near-cancelling sums need the absolute slack
        np.testing.assert_allclose(got, Ab @ B, rtol=2e-2, atol=8e-2)

    def test_duplicate_coordinates_summed(self, rng):
        rows = np.array([0, 0, 3, 3, 7])
        cols = np.array([1, 1, 2, 2, 0])
        vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
        A = sp.coo_matrix((vals, (rows, cols)), shape=(10, 6)).tocsr()
        L = onehot_from_scipy(A, jnp.float32)
        B = rng.randn(6, 4).astype(np.float32)
        np.testing.assert_allclose(np.asarray(onehot_spmm(L, jnp.asarray(B))),
                                   A @ B, rtol=2e-6, atol=1e-5)

    def test_refusals(self, rng):
        A = _rand_csr(rng, 50, 40, 0.1)
        assert onehot_from_scipy(A, jnp.float64) is None      # parity mode
        assert onehot_from_scipy(sp.csr_matrix((10, 10)),
                                 jnp.float32) is None          # empty
        assert onehot_from_scipy(A, jnp.float32,
                                 max_bytes=16) is None         # budget

    def test_vmem_gate(self, rng):
        A = _rand_csr(rng, 200, 100, 0.05)
        L = onehot_from_scipy(A, jnp.float32)
        assert onehot_ok(L, 20)
        huge = OneHotStrips(L.pk, L.sb, L.st, (4_000_000, 4_000_000),
                            L.nnz, L.dot_bf16)
        assert not onehot_ok(huge, 20)

    def test_pad_factor_reported(self, rng):
        A = _rand_csr(rng, 700, 530, 0.01)
        L = onehot_from_scipy(A, jnp.float32)
        assert 1.0 <= L.pad_factor < 60.0


def _scattered_problem(rng, n=300, m=220, r=12, k=5):
    """Scattered-sparse X (uniform pattern — BlockEll-hostile) + dense Y."""
    X = sp.random(n, m, density=0.03, random_state=rng, format="csr")
    X.data[:] = np.abs(X.data) + 0.1
    Y = np.abs(rng.randn(m, r))
    inits = (np.abs(rng.randn(n, k)), np.abs(rng.randn(m, k)),
             np.abs(rng.randn(r, k)))
    return X, Y, inits


def _fit(X, Y, inits, *, solver, monkey=None, **kw):
    U0, V0, Z0 = inits
    kw.setdefault("max_iter", 10)
    m = CMF(n_components=U0.shape[1], solver=solver, tol=0.0,
            dtype="float32", random_state=0, sparse_mode="csr",
            use_pallas=True, **kw)
    m.fit(X, Y, U=U0, V=V0, Z=Z0)
    return m


class TestEstimatorIntegration:
    @pytest.mark.parametrize("solver", ["mu", "newton"])
    def test_layout_built_and_matches_segment_sum(self, rng, solver,
                                                  monkeypatch):
        """With BlockEll disabled, the scattered CSR fit routes through
        the one-hot layout (spy) and matches the plain segment-sum
        trajectory at f32."""
        import pycmf_tpu.ops.pallas.onehot as oh
        import pycmf_tpu.ops.pallas.policy as pol

        X, Y, inits = _scattered_problem(rng)
        monkeypatch.setenv("PYCMF_TPU_KERNEL_BELL_SPMM", "0")
        monkeypatch.setenv("PYCMF_TPU_KERNEL_SPMM_TILED", "0")

        calls = []
        orig = oh.onehot_spmm

        def spy(L, B):
            calls.append(L.shape)
            return orig(L, B)

        monkeypatch.setattr(oh, "onehot_spmm", spy)
        m_oh = _fit(X, Y, inits, solver=solver)
        assert calls, "one-hot kernel was not dispatched"

        monkeypatch.setenv("PYCMF_TPU_KERNEL_ONEHOT_SPMM", "0")
        m_ss = _fit(X, Y, inits, solver=solver)
        # f32 summation-order drift amplified over 10 iterations (both
        # paths are exact-f32, just differently associated)
        np.testing.assert_allclose(m_oh.components_, m_ss.components_,
                                   rtol=5e-3, atol=1e-3)
        np.testing.assert_allclose(m_oh.loss_history_, m_ss.loss_history_,
                                   rtol=1e-4)

    @pytest.mark.parametrize("solver,layout", [
        ("mu", "rows"), ("mu", "cols"),
        ("newton", "rows"), ("newton", "cols"),
    ])
    def test_sharded_layout_routes_and_matches(self, rng, solver, layout,
                                               monkeypatch):
        """Per-shard one-hot layouts on the 1-D sharded layouts: the
        stacked strips dispatch inside shard_map (spy) and the fit
        matches the same sharded fit with the kernel disabled (both
        paths exact-f32, differently associated)."""
        import pycmf_tpu.ops.pallas.onehot as oh

        X, Y, inits = _scattered_problem(rng)
        monkeypatch.setenv("PYCMF_TPU_KERNEL_BELL_SPMM", "0")
        monkeypatch.setenv("PYCMF_TPU_KERNEL_SPMM_TILED", "0")

        calls = []
        orig = oh.onehot_spmm

        def spy(L, B):
            calls.append(L.shape)
            return orig(L, B)

        monkeypatch.setattr(oh, "onehot_spmm", spy)
        m_oh = _fit(X, Y, inits, solver=solver, n_shards=4,
                    shard_layout=layout)
        assert calls, "one-hot kernel was not dispatched in shard_map"

        monkeypatch.setenv("PYCMF_TPU_KERNEL_ONEHOT_SPMM", "0")
        m_ss = _fit(X, Y, inits, solver=solver, n_shards=4,
                    shard_layout=layout)
        np.testing.assert_allclose(m_oh.components_, m_ss.components_,
                                   rtol=5e-3, atol=1e-3)
        np.testing.assert_allclose(m_oh.loss_history_, m_ss.loss_history_,
                                   rtol=1e-4)

    def test_sharded_f64_keeps_segment_sum(self, rng, monkeypatch):
        """f64 parity fits never build the strips (no TPU dot path) —
        the sharded CSR path stays exactly-associative segment-sum."""
        import pycmf_tpu.ops.pallas.onehot as oh

        X, Y, inits = _scattered_problem(rng)
        monkeypatch.setenv("PYCMF_TPU_KERNEL_BELL_SPMM", "0")
        called = []
        monkeypatch.setattr(oh, "onehot_spmm",
                            lambda L, B: called.append(1))
        U0, V0, Z0 = inits
        m = CMF(n_components=U0.shape[1], solver="mu", tol=0.0,
                dtype="float64", random_state=0, sparse_mode="csr",
                use_pallas=True, n_shards=4, max_iter=3)
        m.fit(X, Y, U=U0, V=V0, Z=Z0)
        assert not called

    def test_sampled_newton_routes_through_layout(self, rng, monkeypatch):
        """Masked stochastic Newton's DB also rides the layout."""
        import pycmf_tpu.ops.pallas.onehot as oh

        X, Y, inits = _scattered_problem(rng)
        monkeypatch.setenv("PYCMF_TPU_KERNEL_BELL_SPMM", "0")
        calls = []
        orig = oh.onehot_spmm

        def spy(L, B):
            calls.append(L.shape)
            return orig(L, B)

        monkeypatch.setattr(oh, "onehot_spmm", spy)
        m1 = _fit(X, Y, inits, solver="newton", sg_sample_ratio=0.5)
        assert calls
        monkeypatch.setenv("PYCMF_TPU_KERNEL_ONEHOT_SPMM", "0")
        m2 = _fit(X, Y, inits, solver="newton", sg_sample_ratio=0.5)
        np.testing.assert_allclose(m1.components_, m2.components_,
                                   rtol=5e-4, atol=1e-5)
