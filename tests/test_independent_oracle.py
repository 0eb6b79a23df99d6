"""Independent mathematical oracles for the Newton solver.

The in-repo NumPy goldens share this build's pinned conventions
(VERDICT r02 "golden tests are self-referential in convention"), and
sklearn-NMF only covers the MU/no-Y case. These tests validate the
Newton *calculus* against oracles that share NOTHING with the solver's
hand-derived code paths:

- ``jax.autodiff`` of an independently-written per-row objective
  (gradient for both links; exact Hessian for ``hessian_form='full'``);
- the closed-form ridge solution of the convex linear-link subproblem
  (solved with ``scipy.linalg``);
- ``scipy.optimize.minimize`` on the sigmoid-link row subproblem.

SURVEY.md §4 (test plan item a/e); BASELINE.json north_star correctness.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
import scipy.optimize

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pycmf_tpu.solvers.common import Hyper, make_hyper  # noqa: E402
from pycmf_tpu.solvers.newton import (  # noqa: E402
    Term, _accumulate_term, newton_update_factor)

ALPHA, L1_RATIO, PERT = 0.07, 0.4, 0.2
L1 = ALPHA * L1_RATIO
L2 = ALPHA * (1.0 - L1_RATIO)


def _row_objective(link: str, l1=L1, l2=L2):
    """½‖d − f(B m)‖² + l1‖m‖₁ + ½ l2‖m‖² written straight from the math
    (no shared code with the solver's term machinery)."""

    def phi(m, d, B):
        pred = B @ m
        if link == "sigmoid":
            pred = 1.0 / (1.0 + jnp.exp(-pred))
        resid = d - pred
        return (0.5 * jnp.sum(resid * resid)
                + l1 * jnp.sum(jnp.abs(m)) + 0.5 * l2 * jnp.sum(m * m))

    return phi


def _problem(rng, p=7, q=11, k=4):
    M = rng.randn(p, k) + 0.3 * np.sign(rng.randn(p, k))  # keep |m| off 0
    B = rng.randn(q, k)
    D = rng.randn(p, q)
    return (jnp.asarray(M), jnp.asarray(B), jnp.asarray(D))


class TestGradientAutodiff:
    """The solver's assembled gradient == jax.grad of the written-out
    objective, for each link (away from the l1 kink)."""

    @pytest.mark.parametrize("link", ["linear", "sigmoid"])
    def test_gradient_matches_autodiff(self, rng, link):
        M, B, D = _problem(rng)
        if link == "sigmoid":
            D = (D > 0).astype(jnp.float64)
        G_term, _, _, _ = _accumulate_term(
            M, D, B, link, "gauss", None, False)
        G = G_term + L1 * jnp.sign(M) + L2 * M

        phi = _row_objective(link)
        G_ad = jax.vmap(jax.grad(phi), in_axes=(0, 0, None))(M, D, B)
        assert np.allclose(G, G_ad, rtol=1e-10, atol=1e-12)

    def test_full_hessian_matches_autodiff(self, rng):
        """hessian_form='full' claims the EXACT sigmoid Hessian
        Bᵀdiag(f'² + r·f'')B; check it against jax.hessian."""
        M, B, D = _problem(rng)
        D = (D > 0).astype(jnp.float64)
        _, _, H_rows, _ = _accumulate_term(
            M, D, B, "sigmoid", "full", None, False)
        H = H_rows + L2 * jnp.eye(M.shape[1])  # + smooth penalty curvature

        phi = _row_objective("sigmoid")
        H_ad = jax.vmap(jax.hessian(phi), in_axes=(0, 0, None))(M, D, B)
        assert np.allclose(H, H_ad, rtol=1e-9, atol=1e-11)

    def test_gauss_newton_psd(self, rng):
        """The 'gauss' Hessian drops the r·f'' term; what remains must be
        PSD (the property _solve_direction's Cholesky kernel relies on)."""
        M, B, D = _problem(rng)
        D = (D > 0).astype(jnp.float64)
        _, _, H_rows, _ = _accumulate_term(
            M, D, B, "sigmoid", "gauss", None, False)
        eig = np.linalg.eigvalsh(np.asarray(H_rows))
        assert eig.min() >= -1e-12


def _iterate_factor(M, terms, links, hyper: Hyper, iters: int,
                    non_negative=False, trials=12):
    key = jax.random.PRNGKey(0)
    for i in range(iters):
        M = newton_update_factor(
            jax.random.fold_in(key, i), M, terms, links, hyper,
            non_negative=non_negative, trials=trials,
            hessian_form="gauss", sample_ratio=1.0)
    return M


class TestMUSharedVStationarity:
    """The shared-V MU generalization validated by autodiff: MU fixed
    points with strictly positive entries are stationary points of the
    FULL coupled objective (for M_ij > 0 the update ratio num/denom = 1
    means denom − num = ∂L/∂M_ij = 0). The degenerate no-Y case already
    matches sklearn-NMF to 1e-15 (test_mu.py); this pins the Y-coupling
    terms — the one piece of MU math that previously rested solely on
    the in-repo NumPy oracle (PINNED_ASSUMPTIONS.md 'Independent
    evidence')."""

    def test_mu_fixed_point_is_stationary(self, rng):
        from pycmf_tpu import CMF

        n, m, q, k = 24, 18, 7, 3
        X = jnp.asarray(np.abs(rng.rand(n, m)) + 0.05)
        Y = jnp.asarray(np.abs(rng.rand(m, q)) + 0.05)
        alpha, l1r = 0.03, 0.0  # smooth penalty only (l1 kinks at 0)

        est = CMF(n_components=k, solver="mu", alpha=alpha, l1_ratio=l1r,
                  max_iter=20000, tol=1e-14, eps=0.0, dtype="float64",
                  random_state=0)
        U, V, Z = est.fit_transform(np.asarray(X), np.asarray(Y))

        l2 = alpha * (1.0 - l1r)

        def L(U, V, Z):
            rx = X - U @ V.T
            ry = Y - V @ Z.T
            pen = 0.5 * l2 * (jnp.sum(U * U) + jnp.sum(V * V)
                              + jnp.sum(Z * Z))
            return 0.5 * jnp.sum(rx * rx) + 0.5 * jnp.sum(ry * ry) + pen

        gU, gV, gZ = jax.grad(L, argnums=(0, 1, 2))(
            jnp.asarray(U), jnp.asarray(V), jnp.asarray(Z))
        scale = float(L(jnp.asarray(U), jnp.asarray(V), jnp.asarray(Z)))
        for M, g, name in ((U, gU, "U"), (V, gV, "V"), (Z, gZ, "Z")):
            free = np.asarray(M) > 1e-8
            if not free.any():
                continue
            gmax = float(np.abs(np.asarray(g)[free]).max())
            assert gmax < 5e-6 * max(scale, 1.0), (
                f"{name}: max free-entry gradient {gmax:.3e} "
                f"(loss scale {scale:.3e}) — MU fixed point is not a "
                "stationary point of the coupled objective")
            # entries pinned at 0 must satisfy the KKT sign condition
            pinned = ~free
            if pinned.any():
                gmin = float(np.asarray(g)[pinned].min())
                assert gmin > -5e-6 * max(scale, 1.0), (
                    f"{name}: negative gradient {gmin:.3e} at a zero "
                    "entry — KKT violated")


class TestSubproblemFixedPoint:
    """Iterated row-wise Newton must land on independently-computed
    minimizers of the (V,Z)-frozen subproblem."""

    def test_linear_reaches_closed_form_ridge(self, rng):
        """Linear link, l1=0: the subproblem is ridge regression with the
        closed form mᵢ = (BᵀB + l2·I)⁻¹ Bᵀ dᵢ (scipy.linalg, independent
        of every solver code path). Damping slows steps but must not move
        the fixed point."""
        M, B, D = _problem(rng, p=9, q=14, k=5)
        hyper = make_hyper(alpha=ALPHA, l1_ratio=0.0,
                           hessian_pertubation=PERT, dtype=jnp.float64)
        Mn = _iterate_factor(M, [Term(D, B)], ["linear"], hyper, iters=60)

        Bh, Dh = np.asarray(B), np.asarray(D)
        A = Bh.T @ Bh + ALPHA * np.eye(B.shape[1])
        M_star = scipy.linalg.solve(A, Bh.T @ Dh.T, assume_a="pos").T
        # Tolerance: the backtracking accept rule compares f64 objective
        # values, so iterates freeze once δφ ~ λ‖δm‖² hits the f64
        # roundoff floor of φ — measured plateau 1.9e-9 abs (flat from
        # 60 to 200 iterations); 1e-7 gives 50× headroom.
        assert np.allclose(Mn, M_star, rtol=1e-6, atol=1e-7)

    def test_linear_coupled_terms_reach_closed_form(self, rng):
        """Shared-V shape: TWO coupled linear terms (X's columns and Y's
        rows both constrain V). Closed form stacks the designs."""
        k, p = 4, 8
        V = jnp.asarray(rng.randn(p, k))
        Bu = jnp.asarray(rng.randn(12, k))   # U (X side, via Xᵀ)
        Bz = jnp.asarray(rng.randn(6, k))    # Z (Y side)
        Dx = jnp.asarray(rng.randn(p, 12))   # Xᵀ rows
        Dy = jnp.asarray(rng.randn(p, 6))    # Y rows
        hyper = make_hyper(alpha=ALPHA, l1_ratio=0.0,
                           hessian_pertubation=PERT, dtype=jnp.float64)
        Vn = _iterate_factor(V, [Term(Dx, Bu), Term(Dy, Bz)],
                             ["linear", "linear"], hyper, iters=60)

        Bs = np.vstack([np.asarray(Bu), np.asarray(Bz)])
        Ds = np.hstack([np.asarray(Dx), np.asarray(Dy)])
        A = Bs.T @ Bs + ALPHA * np.eye(k)
        V_star = scipy.linalg.solve(A, Bs.T @ Ds.T, assume_a="pos").T
        # line-search roundoff floor; see the ridge test above
        assert np.allclose(Vn, V_star, rtol=1e-6, atol=1e-7)

    def test_nonneg_inert_projection_matches_closed_form(self, rng):
        """Non-negative flag with a problem whose unconstrained ridge
        minimizer is strictly positive: the clip never binds, so the
        solver must land on the same closed-form ridge solution."""
        k, p, q = 4, 10, 16
        M_true = jnp.asarray(0.5 + rng.rand(p, k))       # strictly positive
        B = jnp.asarray(np.abs(rng.randn(q, k)))
        D = M_true @ B.T + 0.01 * jnp.asarray(rng.randn(p, q))
        Bh, Dh = np.asarray(B), np.asarray(D)
        A = Bh.T @ Bh + ALPHA * np.eye(k)
        M_star = scipy.linalg.solve(A, Bh.T @ Dh.T, assume_a="pos").T
        assert M_star.min() > 0.01, "precondition: projection must be inert"

        M0 = jnp.asarray(0.5 + rng.rand(p, k))
        hyper = make_hyper(alpha=ALPHA, l1_ratio=0.0,
                           hessian_pertubation=PERT, dtype=jnp.float64)
        Mn = _iterate_factor(M0, [Term(D, B)], ["linear"], hyper,
                             iters=80, non_negative=True, trials=20)
        assert np.allclose(Mn, M_star, rtol=1e-6, atol=1e-7)

    def test_nonneg_binding_is_feasible_fixed_point(self, rng):
        """Binding case. PINNED_ASSUMPTIONS.md A8 pins PyCMF's clip-AFTER-
        the-Newton-step convention, whose fixed points satisfy a SCALED
        stationarity (clip(m − s·H⁻¹g) = m), NOT the raw KKT conditions —
        naive projected Newton can stall with gᵢ ≠ 0 at interior
        coordinates (classic Bertsekas counterexample; observed here,
        |g|≈3 at the stall). The honest guarantees for this algorithm
        class are what we assert: feasibility, monotone objective
        decrease from the start, and that the iterate is a genuine fixed
        point of the projected update map."""
        M, B, D = _problem(rng, p=10, q=16, k=4)
        D = -jnp.abs(D)          # pull rows negative so clipping binds
        M = jnp.abs(M)
        hyper = make_hyper(alpha=ALPHA, l1_ratio=0.0,
                           hessian_pertubation=PERT, dtype=jnp.float64)
        phi = _row_objective("linear", l1=0.0, l2=ALPHA)
        phi_total = jax.jit(lambda Mv: jnp.sum(
            jax.vmap(phi, in_axes=(0, 0, None))(Mv, D, B)))

        Mn = _iterate_factor(M, [Term(D, B)], ["linear"], hyper,
                             iters=120, non_negative=True, trials=20)
        Mn2 = _iterate_factor(Mn, [Term(D, B)], ["linear"], hyper,
                              iters=1, non_negative=True, trials=20)
        Mh = np.asarray(Mn)
        assert (Mh >= 0).all()
        assert (Mh == 0).any(), "precondition: the constraint must bind"
        assert float(phi_total(Mn)) < float(phi_total(M))
        assert np.allclose(Mn2, Mn, rtol=1e-9, atol=1e-9), (
            "converged iterate must be a fixed point of the projected map")
        # Zero coordinates must still satisfy the one KKT half that clip-
        # after-step DOES guarantee in the separable direction: no descent
        # by increasing a clipped coordinate alone would contradict the
        # line search only if H were diagonal — so assert only feasibility
        # + fixed point above, and stationarity for rows with NO clipped
        # coordinate (those rows ran unconstrained Newton).
        G = np.asarray(jax.vmap(jax.grad(phi), in_axes=(0, 0, None))(
            Mn, D, B))
        free_rows = (Mh > 0).all(axis=1)
        if free_rows.any():
            assert np.abs(G[free_rows]).max() < 1e-6

    def test_sigmoid_matches_scipy_minimize(self, rng):
        """Sigmoid link: iterate Gauss-Newton rows to stationarity, then
        check scipy.optimize (BFGS from the same start, independent
        implementation) finds no lower objective AND our point is
        stationary under autodiff."""
        M, B, D = _problem(rng, p=6, q=20, k=3)
        D = (D > 0).astype(jnp.float64)
        hyper = make_hyper(alpha=ALPHA, l1_ratio=0.0,
                           hessian_pertubation=PERT, dtype=jnp.float64)
        Mn = _iterate_factor(M, [Term(D, B)], ["sigmoid"], hyper,
                             iters=150, trials=20)
        phi = _row_objective("sigmoid", l1=0.0, l2=ALPHA)
        G = np.asarray(jax.vmap(jax.grad(phi), in_axes=(0, 0, None))(
            Mn, D, B))
        assert np.abs(G).max() < 1e-7, "Gauss-Newton fixed point must be " \
            "a stationary point of the true objective"

        phi_np = jax.jit(phi)
        for i in range(M.shape[0]):
            di = D[i]
            res = scipy.optimize.minimize(
                lambda m: float(phi_np(jnp.asarray(m), di, B)),
                np.asarray(M[i]), method="BFGS",
                options={"gtol": 1e-10, "maxiter": 500})
            ours = float(phi_np(Mn[i], di, B))
            # same basin from the same start: equal minima (tiny band for
            # the two optimizers' different stopping rules)
            assert ours <= res.fun + 1e-8, (
                f"row {i}: scipy found {res.fun:.12g} < ours {ours:.12g}")
