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

    @pytest.mark.parametrize("n", [97, 33])
    def test_partial_edge_tile_masked(self, rng, n):
        """n not a multiple of the row tile: the partial edge tile's
        out-of-bounds rows must not leak into the accumulators (on
        hardware they read garbage, not zeros — masked in-kernel)."""
        from pycmf_tpu.ops.pallas.mu_fused import fused_mu_u_pass

        m, k = 40, 4
        X = jnp.asarray(np.abs(rng.randn(n, m)))
        U = jnp.asarray(np.abs(rng.randn(n, k)))
        V = jnp.asarray(np.abs(rng.randn(m, k)))
        VtV = matmul(V.T, V)
        Un, numV, gramU = fused_mu_u_pass(X, U, V, VtV, 0.1, 0.2, 1e-10,
                                          row_tile=32)
        Un_want = U * matmul(X, V) / (matmul(U, VtV) + 0.1 + 0.2 * U
                                      + 1e-10)
        assert Un.shape == (n, k)
        assert np.allclose(Un, Un_want, rtol=1e-10)
        assert np.allclose(numV, matmul(X.T, Un_want), rtol=1e-9)
        assert np.allclose(gramU, matmul(Un_want.T, Un_want), rtol=1e-10)

    def test_partial_edge_tile_newton(self, rng):
        from pycmf_tpu.ops.pallas.newton_fused import \
            fused_newton_linear_u_pass

        n, m, k = 97, 40, 4
        X = jnp.asarray(np.abs(rng.randn(n, m)))
        U = jnp.asarray(np.abs(rng.randn(n, k)))
        V = jnp.asarray(np.abs(rng.randn(m, k)))
        BtB = matmul(V.T, V)
        H = BtB + 0.21 * jnp.eye(k, dtype=BtB.dtype)
        Hinv = jnp.linalg.inv(H)
        rsq = jnp.sum(X * X, axis=1)
        Un, numV, gramU = fused_newton_linear_u_pass(
            X, U, V, BtB, Hinv, rsq, 0.0, 0.01, trials=4,
            non_negative=True, row_tile=32)
        assert Un.shape == (n, k)
        assert np.all(np.isfinite(np.asarray(Un)))
        assert np.allclose(numV, matmul(X.T, Un), rtol=1e-9)
        assert np.allclose(gramU, matmul(Un.T, Un), rtol=1e-10)


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


class TestFusedNewtonUPass:
    """Oracle tests for ops/pallas/newton_fused.py (interpret mode): the
    single-X-pass Newton U update must match newton_update_factor exactly
    (same solve, same line-search semantics), and its accumulators must be
    XᵀU_new and U_newᵀU_new."""

    def _operands(self, rng, n, m, k, dtype=jnp.float64):
        import jax.scipy.linalg as jsl
        from pycmf_tpu.solvers.common import make_hyper

        X = jnp.asarray(np.abs(rng.randn(n, m)), dtype)
        U = jnp.asarray(np.abs(rng.randn(n, k)), dtype)
        V = jnp.asarray(np.abs(rng.randn(m, k)), dtype)
        hyper = make_hyper(alpha=0.1, l1_ratio=0.4, dtype=dtype)
        row_sq = jnp.sum(X * X, axis=1)
        l2 = hyper.alpha * (1.0 - hyper.l1_ratio)
        BtB = V.T @ V
        H = BtB + (l2 + hyper.hessian_pertubation) * jnp.eye(k, dtype=dtype)
        c, low = jsl.cho_factor(H)
        Hinv = jsl.cho_solve((c, low), jnp.eye(k, dtype=dtype))
        return X, U, V, hyper, row_sq, BtB, Hinv

    @pytest.mark.parametrize("trials,nonneg", [(8, True), (8, False),
                                               (0, True), (3, False)])
    def test_matches_unfused_update(self, rng, trials, nonneg):
        from pycmf_tpu.ops.pallas.newton_fused import \
            fused_newton_linear_u_pass
        from pycmf_tpu.solvers.newton import Term, newton_update_factor

        n, m, k = 67, 45, 5  # n prime → exercises the padding fallback
        X, U, V, hyper, row_sq, BtB, Hinv = self._operands(rng, n, m, k)
        l1 = hyper.alpha * hyper.l1_ratio
        l2 = hyper.alpha * (1.0 - hyper.l1_ratio)
        Un, numv, gramu = fused_newton_linear_u_pass(
            X, U, V, BtB, Hinv, row_sq, l1, l2,
            trials=trials, non_negative=nonneg)
        Uref = newton_update_factor(
            jax.random.PRNGKey(0), U, (Term(X, V, None, row_sq),),
            ("linear",), hyper, non_negative=nonneg, trials=trials,
            hessian_form="gauss", sample_ratio=1.0, use_pallas=False)
        assert np.allclose(Un, Uref, rtol=1e-9, atol=1e-11)
        assert np.allclose(numv, X.T @ Un, rtol=1e-9, atol=1e-11)
        assert np.allclose(gramu, Un.T @ Un, rtol=1e-9, atol=1e-11)

    @pytest.mark.parametrize("trials,nonneg", [(8, True), (8, False),
                                               (3, True)])
    def test_batched_trials_matches_unrolled(self, rng, trials, nonneg):
        """batched_trials=True stacks all line-search candidates into one
        MXU dot; per-row math is identical, so the selected update and the
        accumulators must match the unrolled form to fp round-off. (The
        batched form measured SLOWER on v5e and is OFF by default — this
        pins the A/B hook stays correct.)"""
        from pycmf_tpu.ops.pallas.newton_fused import \
            fused_newton_linear_u_pass

        n, m, k = 67, 45, 5
        X, U, V, hyper, row_sq, BtB, Hinv = self._operands(rng, n, m, k)
        l1 = hyper.alpha * hyper.l1_ratio
        l2 = hyper.alpha * (1.0 - hyper.l1_ratio)
        outs = [fused_newton_linear_u_pass(
            X, U, V, BtB, Hinv, row_sq, l1, l2, trials=trials,
            non_negative=nonneg, batched_trials=b) for b in (False, True)]
        for a, b in zip(outs[0], outs[1]):
            assert np.allclose(a, b, rtol=1e-12, atol=1e-13)

    def test_divisible_rows_no_padding(self, rng):
        from pycmf_tpu.ops.pallas.newton_fused import \
            fused_newton_linear_u_pass
        from pycmf_tpu.solvers.newton import Term, newton_update_factor

        n, m, k = 64, 30, 4
        X, U, V, hyper, row_sq, BtB, Hinv = self._operands(rng, n, m, k)
        l1 = hyper.alpha * hyper.l1_ratio
        l2 = hyper.alpha * (1.0 - hyper.l1_ratio)
        Un, numv, gramu = fused_newton_linear_u_pass(
            X, U, V, BtB, Hinv, row_sq, l1, l2, trials=8, non_negative=True,
            row_tile=16)  # multiple grid steps exercise the accumulators
        Uref = newton_update_factor(
            jax.random.PRNGKey(0), U, (Term(X, V, None, row_sq),),
            ("linear",), hyper, non_negative=True, trials=8,
            hessian_form="gauss", sample_ratio=1.0, use_pallas=False)
        assert np.allclose(Un, Uref, rtol=1e-9, atol=1e-11)
        assert np.allclose(numv, X.T @ Un, rtol=1e-9, atol=1e-11)

    def test_estimator_fused_matches_unfused(self, rng):
        """Full Newton fit: use_pallas=True (fused U pass + precomputed
        DB/BtB in the V update) must track use_pallas=False."""
        from tests.conftest import make_problem

        from pycmf_tpu import CMF

        X, Y = make_problem(rng, n=50, m=30, binary_y=True)
        kw = dict(n_components=4, solver="newton", y_link="sigmoid",
                  max_iter=6, tol=0.0, dtype="float64", random_state=0,
                  sparse_mode="dense")
        m1 = CMF(use_pallas=False, **kw).fit(X, Y)
        m2 = CMF(use_pallas=True, **kw).fit(X, Y)
        assert np.allclose(m1.loss_history_, m2.loss_history_, rtol=1e-9)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-7, atol=1e-9)
        assert np.allclose(m1.V_, m2.V_, rtol=1e-7, atol=1e-9)

    def test_sharded_fused_matches_unfused(self, rng):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from tests.conftest import make_problem

        from pycmf_tpu import CMF

        X, Y = make_problem(rng, n=67, m=40)
        U0 = np.abs(rng.randn(67, 4))
        V0 = np.abs(rng.randn(40, 4))
        Z0 = np.abs(rng.randn(Y.shape[1], 4))
        kw = dict(n_components=4, solver="newton", max_iter=6, tol=0.0,
                  dtype="float64", n_shards=8)
        m1 = CMF(use_pallas=False, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        m2 = CMF(use_pallas=True, **kw).fit(X, Y, U=U0, V=V0, Z=Z0)
        assert np.allclose(m1.loss_history_, m2.loss_history_, rtol=1e-9)
        assert np.allclose(m1.U_, m2.U_, rtol=1e-7, atol=1e-9)
        assert np.allclose(m1.V_, m2.V_, rtol=1e-7, atol=1e-9)


class TestBlockEll:
    """ops/pallas/bell.py: the MXU block-sparse SpMM (interpret mode)."""

    def _block_sparse(self, rng, p, q, frac=0.2):
        import scipy.sparse as sp

        A = np.zeros((p, q))
        nrb, ncb = -(-p // 128), -(-q // 128)
        for i in range(nrb):
            for j in range(ncb):
                if rng.rand() < frac:
                    r0, c0 = i * 128, j * 128
                    A[r0:min(r0 + 128, p), c0:min(c0 + 128, q)] = \
                        rng.rand(min(128, p - r0), min(128, q - c0))
        return sp.csr_matrix(A), A

    def test_spmm_matches_scipy(self, rng):
        from pycmf_tpu.ops.pallas.bell import bell_from_scipy, bell_spmm

        As, Ad = self._block_sparse(rng, 300, 260)
        bell = bell_from_scipy(As, dtype=jnp.float64)
        assert bell is not None
        B = jnp.asarray(rng.randn(260, 5))
        out = bell_spmm(bell, B)
        assert out.shape == (300, 5)
        assert np.allclose(out, Ad @ np.asarray(B), rtol=1e-10, atol=1e-12)

    def test_empty_row_blocks_are_zero(self, rng):
        """Row blocks with no nonzeros must come out exactly zero (the
        converter inserts explicit zero blocks so the kernel initializes
        every output row)."""
        import scipy.sparse as sp

        from pycmf_tpu.ops.pallas.bell import bell_from_scipy, bell_spmm

        A = np.zeros((400, 200))
        A[5, 7] = 3.0       # only the first row block has data
        A[385, 100] = 2.0   # ...and the last
        bell = bell_from_scipy(sp.csr_matrix(A), dtype=jnp.float64)
        B = jnp.asarray(rng.randn(200, 4))
        out = bell_spmm(bell, B)
        assert np.allclose(out, A @ np.asarray(B), rtol=1e-12, atol=1e-12)
        assert np.all(np.asarray(out[128:384]) == 0.0)

    def test_inner_matches_direct(self, rng):
        from pycmf_tpu.ops.pallas.bell import bell_from_scipy, bell_inner

        As, Ad = self._block_sparse(rng, 290, 140)
        bell_t = bell_from_scipy(As.T.tocsr(), dtype=jnp.float64)
        M = jnp.asarray(rng.randn(290, 4))
        B = jnp.asarray(rng.randn(140, 4))
        ref = float(np.sum(Ad * (np.asarray(M) @ np.asarray(B).T)))
        assert np.allclose(float(bell_inner(bell_t, M, B)), ref, rtol=1e-10)

    def test_converter_refuses_over_budget(self, rng):
        from pycmf_tpu.ops.pallas.bell import bell_from_scipy

        As, _ = self._block_sparse(rng, 300, 260, frac=0.5)
        assert bell_from_scipy(As, dtype=jnp.float64, max_bytes=100) is None

    def test_fill_diagnostic(self, rng):
        from pycmf_tpu.ops.pallas.bell import bell_from_scipy

        As, _ = self._block_sparse(rng, 256, 256, frac=1.0)
        bell = bell_from_scipy(As, dtype=jnp.float64)
        assert 0.0 < bell.fill <= 1.0

    def test_estimator_csr_pallas_matches_dense(self, rng):
        """Full MU + Newton fits through the BlockEll path (sparse_mode=
        'csr', use_pallas=True) must match the dense path."""
        import scipy.sparse as sp

        from pycmf_tpu import CMF

        As, Ad = self._block_sparse(rng, 280, 180, frac=0.3)
        Y = np.abs(rng.randn(180, 6))
        U0 = np.abs(rng.randn(280, 4))
        V0 = np.abs(rng.randn(180, 4))
        Z0 = np.abs(rng.randn(6, 4))
        for solver, iters in (("mu", 15), ("newton", 5)):
            kw = dict(n_components=4, solver=solver, max_iter=iters,
                      tol=0.0, dtype="float64")
            m1 = CMF(sparse_mode="dense", use_pallas=False, **kw).fit(
                sp.csr_matrix(As), Y, U=U0, V=V0, Z=Z0)
            m2 = CMF(sparse_mode="csr", use_pallas=True, **kw).fit(
                sp.csr_matrix(As), Y, U=U0, V=V0, Z=Z0)
            assert np.allclose(m1.loss_history_, m2.loss_history_,
                               rtol=1e-9), solver
            assert np.allclose(m1.U_, m2.U_, rtol=1e-7, atol=1e-9), solver
            assert np.allclose(m1.V_, m2.V_, rtol=1e-7, atol=1e-9), solver


class TestFusedSigmoidNewton:
    """sigmoid_gh_pass / sigmoid_phi_pass (ops/pallas/sigmoid_newton.py)
    vs the jnp math of newton._accumulate_term / _phi_term."""

    def _parts(self, rng, n, m, k):
        X = jnp.asarray((rng.rand(n, m) < 0.3).astype(np.float64))
        M = jnp.asarray(rng.randn(n, k))
        B = jnp.asarray(rng.randn(m, k))
        return X, M, B

    @pytest.mark.parametrize("n,m,k", [(137, 90, 5), (64, 300, 8)])
    def test_gh_matches_jnp(self, rng, n, m, k):
        from pycmf_tpu.ops.pallas.sigmoid_newton import sigmoid_gh_pass

        X, M, B = self._parts(rng, n, m, k)
        l1, l2 = 0.05, 0.2
        G, H = sigmoid_gh_pass(X, M, B, l1, l2)
        P = jax.nn.sigmoid(matmul(M, B.T))
        R = P - X
        fp = P * (1 - P)
        W = fp * fp
        G_want = matmul(R * fp, B) + l1 * jnp.sign(M) + l2 * M
        H_want = jnp.einsum("pq,qk,ql->pkl", W, B, B)
        np.testing.assert_allclose(np.asarray(G), np.asarray(G_want),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(H), np.asarray(H_want),
                                   rtol=1e-10, atol=1e-12)

    @pytest.mark.parametrize("nonneg", [False, True])
    def test_phi_matches_jnp(self, rng, nonneg):
        from pycmf_tpu.ops.pallas.sigmoid_newton import sigmoid_phi_pass

        n, m, k, T = 137, 90, 5, 6
        X, M, B = self._parts(rng, n, m, k)
        if nonneg:
            M = jnp.abs(M)
        d = jnp.asarray(rng.randn(n, k))
        l1, l2 = 0.05, 0.2
        phis = sigmoid_phi_pass(X, M, d, B, l1, l2, trials=T,
                                non_negative=nonneg)
        assert phis.shape == (n, T + 1)

        def phi(Mc):
            r = X - jax.nn.sigmoid(matmul(Mc, B.T))
            return (l1 * jnp.sum(jnp.abs(Mc), axis=1)
                    + 0.5 * l2 * jnp.sum(Mc * Mc, axis=1)
                    + 0.5 * jnp.sum(r * r, axis=1))

        def project(Mc):
            return jnp.maximum(Mc, 0.0) if nonneg else Mc

        np.testing.assert_allclose(np.asarray(phis[:, 0]),
                                   np.asarray(phi(M)), rtol=1e-10)
        for t in range(T):
            want = phi(project(M - (0.5 ** t) * d))
            np.testing.assert_allclose(np.asarray(phis[:, t + 1]),
                                       np.asarray(want), rtol=1e-10)

    def test_update_matches_generic_trajectory(self, rng):
        """fused_sigmoid_update vs newton_update_factor — same data,
        same accept rule, bit-close at f64 (interpret mode)."""
        from pycmf_tpu.solvers.common import make_hyper
        from pycmf_tpu.solvers.newton import (Term, fused_sigmoid_update,
                                              newton_update_factor)

        n, m, k, r = 137, 90, 5, 7
        X, M, B = self._parts(rng, n, m, k)
        Yd = jnp.asarray(np.abs(rng.randn(n, r)))
        Zf = jnp.asarray(rng.randn(r, k))
        hyper = make_hyper(0.05, 0.3, 1e-9, 0.2, dtype=jnp.float64)
        key = jax.random.PRNGKey(0)
        ref = newton_update_factor(
            key, M, (Term(X, B), Term(Yd, Zf)), ("sigmoid", "linear"),
            hyper, non_negative=False, trials=8, hessian_form="gauss",
            sample_ratio=1.0, use_pallas=False)
        got = fused_sigmoid_update(
            M, X, B, hyper, trials=8, non_negative=False,
            use_pallas=False, yterm=Term(Yd, Zf), y_link="linear")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-9, atol=1e-12)

    def test_nondivisible_edge_tile(self, rng):
        """n not divisible by the row tile: OOB rows must not corrupt
        valid rows' outputs."""
        from pycmf_tpu.ops.pallas.sigmoid_newton import sigmoid_gh_pass

        n, m, k = 137, 90, 5
        X, M, B = self._parts(rng, n, m, k)
        G1, H1 = sigmoid_gh_pass(X, M, B, 0.0, 0.0, row_tile=48)
        G2, H2 = sigmoid_gh_pass(X, M, B, 0.0, 0.0, row_tile=137)
        np.testing.assert_allclose(np.asarray(G1), np.asarray(G2),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H2),
                                   rtol=1e-10)
