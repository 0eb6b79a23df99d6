"""Unit tests for links, losses, and sparse primitives (SURVEY.md §4a/§4e)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycmf_tpu.ops import losses
from pycmf_tpu.ops.links import apply_link, link_and_grad, link_second_deriv
from pycmf_tpu.ops.sparse import (csr_from_dense, row_sq_norms, sddmm_dot,
                                  sddmm_rowdots, spmm, to_dense)


class TestLinks:
    def test_linear_identity(self):
        t = jnp.linspace(-3, 3, 11)
        assert np.allclose(apply_link("linear", t), t)

    def test_sigmoid_values(self):
        t = jnp.array([0.0, 100.0, -100.0])
        p = apply_link("sigmoid", t)
        assert np.allclose(p, [0.5, 1.0, 0.0])
        assert np.all(np.isfinite(p))

    def test_sigmoid_grad_matches_autodiff(self):
        t = jnp.linspace(-4, 4, 21, dtype=jnp.float64)
        _, fp = link_and_grad("sigmoid", t)
        fp_ad = jax.vmap(jax.grad(lambda x: jax.nn.sigmoid(x)))(t)
        assert np.allclose(fp, fp_ad, atol=1e-12)

    def test_sigmoid_second_deriv_matches_autodiff(self):
        t = jnp.linspace(-4, 4, 21, dtype=jnp.float64)
        p = jax.nn.sigmoid(t)
        fpp = link_second_deriv("sigmoid", p)
        fpp_ad = jax.vmap(jax.grad(jax.grad(jax.nn.sigmoid)))(t)
        assert np.allclose(fpp, fpp_ad, atol=1e-12)


class TestLosses:
    def test_linear_term_matches_naive(self, rng):
        A = jnp.asarray(rng.randn(30, 20))
        M = jnp.asarray(rng.randn(30, 4))
        B = jnp.asarray(rng.randn(20, 4))
        got = losses.reconstruction_term(A, M, B, "linear")
        want = 0.5 * np.sum((np.asarray(A) - np.asarray(M) @ np.asarray(B).T) ** 2)
        assert np.allclose(got, want, rtol=1e-10)

    def test_sigmoid_term_matches_naive(self, rng):
        A = jnp.asarray((rng.rand(30, 20) > 0.5).astype(float))
        M = jnp.asarray(rng.randn(30, 4))
        B = jnp.asarray(rng.randn(20, 4))
        got = losses.reconstruction_term(A, M, B, "sigmoid")
        S = 1 / (1 + np.exp(-np.asarray(M) @ np.asarray(B).T))
        want = 0.5 * np.sum((np.asarray(A) - S) ** 2)
        assert np.allclose(got, want, rtol=1e-8)

    def test_sparse_linear_term_matches_dense(self, rng):
        Ad = rng.rand(25, 18)
        Ad[Ad < 0.6] = 0
        A = csr_from_dense(Ad, dtype=jnp.float64)
        M = jnp.asarray(rng.randn(25, 3))
        B = jnp.asarray(rng.randn(18, 3))
        got = losses.reconstruction_term(A, M, B, "linear")
        want = losses.reconstruction_term(jnp.asarray(Ad), M, B, "linear")
        assert np.allclose(got, want, rtol=1e-10)

    def test_sparse_sigmoid_term_matches_dense(self, rng):
        Ad = (rng.rand(25, 18) > 0.7).astype(float)
        A = csr_from_dense(Ad, dtype=jnp.float64)
        M = jnp.asarray(rng.randn(25, 3))
        B = jnp.asarray(rng.randn(18, 3))
        got = losses.reconstruction_term(A, M, B, "sigmoid")
        want = losses.reconstruction_term(jnp.asarray(Ad), M, B, "sigmoid")
        assert np.allclose(got, want, rtol=1e-8)

    def test_penalty(self, rng):
        M = jnp.asarray(rng.randn(10, 4))
        alpha, l1r = 0.7, 0.3
        got = losses.penalty(M, alpha, l1r)
        Mn = np.asarray(M)
        want = alpha * (l1r * np.abs(Mn).sum() + 0.5 * (1 - l1r) * (Mn ** 2).sum())
        assert np.allclose(got, want, rtol=1e-10)

    def test_total_loss_no_y(self, rng):
        X = jnp.asarray(np.abs(rng.randn(20, 15)))
        U = jnp.asarray(np.abs(rng.randn(20, 3)))
        V = jnp.asarray(np.abs(rng.randn(15, 3)))
        got = losses.total_loss(X, None, U, V, None, "linear", "linear",
                                0.0, 0.0)
        want = 0.5 * np.sum((np.asarray(X) - np.asarray(U) @ np.asarray(V).T) ** 2)
        assert np.allclose(got, want, rtol=1e-10)

    def test_blocked_sigmoid_matches_direct(self, rng, monkeypatch):
        # Force the streaming path and compare against the direct formula.
        monkeypatch.setattr(losses, "_BLOCK_ELEMS", 64)
        A = jnp.asarray((rng.rand(23, 11) > 0.5).astype(float))
        M = jnp.asarray(rng.randn(23, 3))
        B = jnp.asarray(rng.randn(11, 3))
        got = losses.reconstruction_term(A, M, B, "sigmoid")
        S = 1 / (1 + np.exp(-np.asarray(M) @ np.asarray(B).T))
        want = 0.5 * np.sum((np.asarray(A) - S) ** 2)
        assert np.allclose(got, want, rtol=1e-8)


class TestSparse:
    def _mk(self, rng, p=21, q=17):
        Ad = rng.rand(p, q)
        Ad[Ad < 0.65] = 0
        return Ad, csr_from_dense(Ad, dtype=jnp.float64)

    def test_roundtrip(self, rng):
        Ad, A = self._mk(rng)
        assert np.allclose(to_dense(A), Ad)

    def test_spmm(self, rng):
        Ad, A = self._mk(rng)
        B = jnp.asarray(rng.randn(17, 5))
        assert np.allclose(spmm(A, B), Ad @ np.asarray(B), rtol=1e-10)

    def test_sddmm(self, rng):
        Ad, A = self._mk(rng)
        M = jnp.asarray(rng.randn(21, 5))
        B = jnp.asarray(rng.randn(17, 5))
        want = np.sum(Ad * (np.asarray(M) @ np.asarray(B).T))
        assert np.allclose(sddmm_dot(A, M, B), want, rtol=1e-10)
        want_rows = np.sum(Ad * (np.asarray(M) @ np.asarray(B).T), axis=1)
        assert np.allclose(sddmm_rowdots(A, M, B), want_rows, rtol=1e-10)

    def test_row_sq_norms(self, rng):
        Ad, A = self._mk(rng)
        assert np.allclose(row_sq_norms(A), (Ad ** 2).sum(axis=1), rtol=1e-10)

    def test_empty_rows(self):
        Ad = np.zeros((5, 4))
        Ad[1, 2] = 3.0
        A = csr_from_dense(Ad, dtype=jnp.float64)
        B = jnp.ones((4, 2), dtype=jnp.float64)
        out = spmm(A, B)
        assert np.allclose(out, Ad @ np.ones((4, 2)))
