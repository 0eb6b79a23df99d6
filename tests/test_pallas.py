"""Pallas kernel tests vs pure-jnp oracles (SURVEY.md §4c), run in
interpreter mode on the CPU backend."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycmf_tpu.ops.matmul import matmul
from pycmf_tpu.ops.pallas.batched_solve import batched_spd_solve
from pycmf_tpu.ops.pallas.mu_update import fused_mu_update
from pycmf_tpu.ops.pallas.spmm import (spmm_pallas, sddmm_rowdots_tiled,
                                       tile_csr_from_matrix)
from pycmf_tpu.ops.sparse import csr_from_dense, sddmm_rowdots, spmm


class TestFusedMuUpdate:
    @pytest.mark.parametrize("p,k", [(37, 4), (600, 20), (8, 8)])
    def test_matches_jnp(self, rng, p, k):
        M = jnp.asarray(np.abs(rng.randn(p, k)))
        S = jnp.asarray(np.abs(rng.randn(k, k)))
        num = jnp.asarray(np.abs(rng.randn(p, k)))
        l1, l2, eps = 0.3, 0.7, 1e-9
        got = fused_mu_update(M, S, num, l1, l2, eps)
        want = M * num / (matmul(M, S) + l1 + l2 * M + eps)
        assert np.allclose(got, want, rtol=1e-6)

    def test_float32(self, rng):
        M = jnp.asarray(np.abs(rng.randn(100, 6)), jnp.float32)
        S = jnp.asarray(np.abs(rng.randn(6, 6)), jnp.float32)
        num = jnp.asarray(np.abs(rng.randn(100, 6)), jnp.float32)
        got = fused_mu_update(M, S, num, 0.0, 0.0, 1e-9)
        want = M * num / (matmul(M, S) + 1e-9)
        assert np.allclose(got, want, rtol=1e-5)


class TestBatchedSolve:
    def _spd(self, rng, p, k):
        A = rng.randn(p, k, k)
        H = np.einsum("pij,pkj->pik", A, A) + 0.5 * np.eye(k)
        return jnp.asarray(H), jnp.asarray(rng.randn(p, k))

    @pytest.mark.parametrize("p,k", [(5, 3), (130, 8), (1000, 20)])
    def test_matches_jnp_solve(self, rng, p, k):
        H, G = self._spd(rng, p, k)
        got = batched_spd_solve(H, G)
        want = jnp.linalg.solve(H, G[..., None])[..., 0]
        assert np.allclose(got, want, rtol=1e-7, atol=1e-9)

    def test_large_k_fallback(self, rng):
        H, G = self._spd(rng, 7, 40)  # k > unroll cap → jnp path
        got = batched_spd_solve(H, G)
        want = jnp.linalg.solve(H, G[..., None])[..., 0]
        assert np.allclose(got, want, rtol=1e-7)

    def test_damped_near_singular(self, rng):
        # rank-deficient + damping: exactly the Newton Hessian structure
        v = rng.randn(50, 6, 1)
        H = jnp.asarray(v @ v.transpose(0, 2, 1) + 0.2 * np.eye(6))
        G = jnp.asarray(rng.randn(50, 6))
        got = batched_spd_solve(H, G)
        assert np.all(np.isfinite(got))
        want = jnp.linalg.solve(H, G[..., None])[..., 0]
        assert np.allclose(got, want, rtol=1e-6, atol=1e-8)


class TestTiledSpmm:
    def _mk(self, rng, p=300, q=120, density=0.1):
        Ad = rng.rand(p, q)
        Ad[Ad > density] = 0.0
        A = csr_from_dense(Ad, dtype=jnp.float64)
        return Ad, A

    def test_spmm_matches_segment(self, rng):
        Ad, A = self._mk(rng)
        B = jnp.asarray(rng.randn(120, 5))
        got = spmm_pallas(A, B)
        want = spmm(A, B)
        assert np.allclose(got, want, rtol=1e-10)
        assert np.allclose(got, Ad @ np.asarray(B), rtol=1e-10)

    def test_spmm_empty_and_dense_rows(self, rng):
        Ad = np.zeros((70, 40))
        Ad[3] = rng.rand(40)           # fully dense row
        Ad[68, 5] = 2.0                # lone nnz near the end
        A = csr_from_dense(Ad, dtype=jnp.float64)
        B = jnp.asarray(rng.randn(40, 3))
        assert np.allclose(spmm_pallas(A, B), Ad @ np.asarray(B), rtol=1e-10)

    def test_tiling_roundtrip_blocks(self, rng):
        Ad, A = self._mk(rng, p=513, q=64)  # p straddles block boundary
        T = tile_csr_from_matrix(A, block=128)
        B = jnp.asarray(rng.randn(64, 4))
        from pycmf_tpu.ops.pallas.spmm import spmm_tiled

        assert np.allclose(spmm_tiled(T, B), Ad @ np.asarray(B), rtol=1e-10)

    def test_sddmm_rowdots_matches(self, rng):
        Ad, A = self._mk(rng)
        T = tile_csr_from_matrix(A)
        M = jnp.asarray(rng.randn(300, 5))
        B = jnp.asarray(rng.randn(120, 5))
        got = sddmm_rowdots_tiled(T, M, B)
        want = sddmm_rowdots(A, M, B)
        assert np.allclose(got, want, rtol=1e-9)


class TestFusedMuPass:
    def test_matches_unfused_math(self, rng):
        from pycmf_tpu.ops.pallas.mu_fused import fused_mu_u_pass

        n, m, k = 90, 70, 5
        X = jnp.asarray(np.abs(rng.randn(n, m)))
        U = jnp.asarray(np.abs(rng.randn(n, k)))
        V = jnp.asarray(np.abs(rng.randn(m, k)))
        VtV = matmul(V.T, V)
        l1, l2, eps = 0.2, 0.5, 1e-10
        Un, numV, gramU = fused_mu_u_pass(X, U, V, VtV, l1, l2, eps,
                                          row_tile=32)
        Un_want = U * matmul(X, V) / (matmul(U, VtV) + l1 + l2 * U + eps)
        assert np.allclose(Un, Un_want, rtol=1e-10)
        assert np.allclose(numV, matmul(X.T, Un_want), rtol=1e-9)
        assert np.allclose(gramU, matmul(Un_want.T, Un_want), rtol=1e-10)

    def test_full_fit_matches_unfused(self, rng):
        """use_pallas dense MU (fused single-pass path) ≡ jnp path."""
        from tests.conftest import make_problem
        from pycmf_tpu import CMF

        X, Y = make_problem(rng)
        U0 = np.abs(rng.randn(X.shape[0], 4))
        V0 = np.abs(rng.randn(X.shape[1], 4))
        Z0 = np.abs(rng.randn(Y.shape[1], 4))
        kw = dict(n_components=4, solver="mu", max_iter=25, tol=0.0,
                  dtype="float64", alpha=0.1, l1_ratio=0.3)
        m1 = CMF(use_pallas=False, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(use_pallas=True, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-9)
        assert np.allclose(m1.V_, m2.V_, rtol=1e-9)
        assert np.allclose(m1.loss_history_, m2.loss_history_, rtol=1e-10)

    def test_single_matrix_fused(self, rng):
        from pycmf_tpu import CMF

        X = np.abs(rng.randn(50, 30))
        m1 = CMF(n_components=3, use_pallas=True, max_iter=20,
                 random_state=0, dtype="float64").fit(X)
        m2 = CMF(n_components=3, use_pallas=False, max_iter=20,
                 random_state=0, dtype="float64").fit(X)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-9)


class TestSolverIntegration:
    def test_mu_with_pallas_matches(self, rng):
        from tests.conftest import make_problem
        from pycmf_tpu import CMF

        X, Y = make_problem(rng)
        U0 = np.abs(rng.randn(X.shape[0], 4))
        V0 = np.abs(rng.randn(X.shape[1], 4))
        Z0 = np.abs(rng.randn(Y.shape[1], 4))
        kw = dict(n_components=4, solver="mu", max_iter=20, tol=0.0,
                  dtype="float64")
        m1 = CMF(use_pallas=False, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(use_pallas=True, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-8)
        assert np.allclose(m1.V_, m2.V_, rtol=1e-8)

    def test_sparse_mu_with_pallas_matches(self, rng):
        from tests.conftest import make_problem
        from pycmf_tpu import CMF

        X, Y = make_problem(rng, sparse=True)
        U0 = np.abs(rng.randn(X.shape[0], 4))
        V0 = np.abs(rng.randn(X.shape[1], 4))
        Z0 = np.abs(rng.randn(Y.shape[1], 4))
        kw = dict(n_components=4, solver="mu", max_iter=15, tol=0.0,
                  dtype="float64", sparse_mode="csr")
        m1 = CMF(use_pallas=False, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(use_pallas=True, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-8)
        assert np.allclose(m1.V_, m2.V_, rtol=1e-8)
        assert np.allclose(m1.loss_history_, m2.loss_history_, rtol=1e-9)

    def test_sparse_newton_with_pallas_matches(self, rng):
        from tests.conftest import make_problem
        from pycmf_tpu import CMF

        X, Y = make_problem(rng, sparse=True)
        U0 = np.abs(rng.randn(X.shape[0], 4))
        V0 = np.abs(rng.randn(X.shape[1], 4))
        Z0 = np.abs(rng.randn(Y.shape[1], 4))
        kw = dict(n_components=4, solver="newton", max_iter=6, tol=0.0,
                  dtype="float64", sparse_mode="csr")
        m1 = CMF(use_pallas=False, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(use_pallas=True, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-7, atol=1e-9)
        assert np.allclose(m1.V_, m2.V_, rtol=1e-7, atol=1e-9)

    def test_sparse_mode_dense_matches_csr(self, rng):
        from tests.conftest import make_problem
        from pycmf_tpu import CMF

        X, Y = make_problem(rng, sparse=True)
        U0 = np.abs(rng.randn(X.shape[0], 4))
        V0 = np.abs(rng.randn(X.shape[1], 4))
        Z0 = np.abs(rng.randn(Y.shape[1], 4))
        kw = dict(n_components=4, solver="mu", max_iter=15, tol=0.0,
                  dtype="float64", use_pallas=False)
        m1 = CMF(sparse_mode="csr", **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(sparse_mode="dense", **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-8, atol=1e-10)
        assert np.allclose(m1.V_, m2.V_, rtol=1e-8, atol=1e-10)

    def test_chunked_spmm_matches(self, rng):
        """Force column chunking (tiny target bytes) and check exactness."""
        import scipy.sparse as sp
        from pycmf_tpu.ops.pallas.spmm import (spmm_chunks,
                                               sddmm_rowdots_chunks,
                                               tile_csr_chunks_host)
        from pycmf_tpu.ops.sparse import csr_from_dense, sddmm_rowdots

        Ad = rng.rand(90, 200)
        Ad[Ad < 0.8] = 0
        Ah = sp.csr_matrix(Ad)
        chunks = tile_csr_chunks_host(Ah.indptr, Ah.indices, Ah.data,
                                      Ah.shape, block=32, dtype=jnp.float64,
                                      target_bytes=200 * 64)
        assert len(chunks) > 1
        B = jnp.asarray(rng.randn(200, 5))
        assert np.allclose(spmm_chunks(chunks, B), Ad @ np.asarray(B),
                           rtol=1e-10)
        A = csr_from_dense(Ad, dtype=jnp.float64)
        M = jnp.asarray(rng.randn(90, 5))
        assert np.allclose(sddmm_rowdots_chunks(chunks, M, B),
                           sddmm_rowdots(A, M, B), rtol=1e-9)

    def test_newton_with_pallas_matches(self, rng):
        from tests.conftest import make_problem
        from pycmf_tpu import CMF

        X, Y = make_problem(rng, non_negative=False, binary_y=True)
        kw = dict(n_components=4, solver="newton", y_link="sigmoid",
                  U_non_negative=False, V_non_negative=False,
                  Z_non_negative=False, max_iter=6, tol=0.0, dtype="float64",
                  random_state=0)
        m1 = CMF(use_pallas=False, **kw).fit(X, Y)
        m2 = CMF(use_pallas=True, **kw).fit(X, Y)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-6, atol=1e-8)
        assert np.allclose(m1.V_, m2.V_, rtol=1e-6, atol=1e-8)
