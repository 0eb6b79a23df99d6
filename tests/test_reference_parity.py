"""True-parity tests against the upstream PyCMF reference.

The binding spec (BASELINE.json north_star) requires matching PyCMF to
1e-5 relative error under identical initializations. The reference mount
`/root/reference/` is EMPTY in this environment and the package is not
pip-installable (no network) — see SURVEY.md's provenance notice — so
these tests SKIP cleanly today. If a later round finds the mount
populated (or `pycmf` upstream importable), they activate automatically
and pin the parity bar with zero extra work.

Import isolation: this repo ships a `pycmf` alias package that shadows
the upstream name, so the reference is loaded explicitly from the mount
path with the repo paths removed from sys.path for the duration.
"""
import os
import sys

import numpy as np
import pytest

# Overridable so `python -m pycmf_tpu.parity_check` (and its mocked-mini-
# reference test) can point the same machinery at another tree.
REFERENCE_ROOT = os.environ.get("PYCMF_REFERENCE_ROOT", "/root/reference")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_reference_cmf():
    """Import the UPSTREAM pycmf.CMF from the reference mount, or None."""
    pkg = os.path.join(REFERENCE_ROOT, "pycmf")
    if not os.path.isfile(os.path.join(pkg, "__init__.py")):
        return None
    saved_path = list(sys.path)
    saved_mods = {k: v for k, v in sys.modules.items()
                  if k == "pycmf" or k.startswith("pycmf.")}
    try:
        for k in saved_mods:
            del sys.modules[k]
        sys.path = ([REFERENCE_ROOT]
                    + [p for p in sys.path
                       if os.path.abspath(p or ".") != _REPO])
        import pycmf as upstream  # noqa: PLC0415

        return getattr(upstream, "CMF", None)
    except Exception:  # noqa: BLE001 — unknown upstream state: skip, don't fail
        return None
    finally:
        for k in [k for k in sys.modules
                  if k == "pycmf" or k.startswith("pycmf.")]:
            del sys.modules[k]
        sys.modules.update(saved_mods)
        sys.path = saved_path


_REF_CMF = _load_reference_cmf()

pytestmark = pytest.mark.skipif(
    _REF_CMF is None,
    reason="reference mount /root/reference is empty (see SURVEY.md "
           "provenance notice); parity activates when it is populated")


def _problem(seed=0, n=40, m=30, r=8, k=4):
    rng = np.random.RandomState(seed)
    X = np.abs(rng.randn(n, m))
    Y = np.abs(rng.randn(m, r))
    U0 = np.abs(rng.randn(n, k))
    V0 = np.abs(rng.randn(m, k))
    Z0 = np.abs(rng.randn(r, k))
    return X, Y, U0, V0, Z0


class TestReferenceParity:
    """Identical external inits → factors/loss match to 1e-5 rel. error.

    NOTE for the activating round: the reference's exact kwarg spelling
    for external inits must be confirmed against its fit signature (the
    build accepts fit(X, Y, U=, V=, Z=)); adapt the call below, then run
    in float64 (tests/conftest.py already enables x64 on CPU)."""

    def test_mu_matches_reference(self):
        from pycmf_tpu import CMF

        X, Y, U0, V0, Z0 = _problem()
        ref = _REF_CMF(n_components=4, solver="mu", alpha=0.0, tol=0.0,
                       max_iter=25, random_state=0)
        Ur, Vr, Zr = ref.fit_transform(
            X, Y, U=U0.copy(), V=V0.copy(), Z=Z0.copy())
        ours = CMF(n_components=4, solver="mu", alpha=0.0, tol=0.0,
                   max_iter=25, dtype="float64", random_state=0)
        Uo, Vo, Zo = ours.fit_transform(
            X, Y, U=U0.copy(), V=V0.copy(), Z=Z0.copy())
        assert np.allclose(Uo, Ur, rtol=1e-5)
        assert np.allclose(Vo, Vr, rtol=1e-5)
        assert np.allclose(Zo, Zr, rtol=1e-5)

    def test_newton_matches_reference(self):
        from pycmf_tpu import CMF

        X, Y, U0, V0, Z0 = _problem()
        Yb = (Y > np.median(Y)).astype(float)
        kw = dict(n_components=4, solver="newton", alpha=0.0, tol=0.0,
                  max_iter=8, random_state=0, y_link="sigmoid")
        Ur, Vr, Zr = _REF_CMF(**kw).fit_transform(
            X, Yb, U=U0.copy(), V=V0.copy(), Z=Z0.copy())
        Uo, Vo, Zo = CMF(dtype="float64", **kw).fit_transform(
            X, Yb, U=U0.copy(), V=V0.copy(), Z=Z0.copy())
        assert np.allclose(Uo, Ur, rtol=1e-5, atol=1e-8)
        assert np.allclose(Vo, Vr, rtol=1e-5, atol=1e-8)
        assert np.allclose(Zo, Zr, rtol=1e-5, atol=1e-8)


def _fit_both(X, Y, inits, ref_kw=None, our_kw=None, **kw):
    """Fit reference and our CMF from identical inits; return both models."""
    from pycmf_tpu import CMF

    U0, V0, Z0 = inits
    ref = _REF_CMF(**{**kw, **(ref_kw or {})})
    ref.fit_transform(X, Y, U=U0.copy(), V=V0.copy(),
                      Z=None if Z0 is None else Z0.copy())
    ours = CMF(dtype="float64", **{**kw, **(our_kw or {})})
    ours.fit_transform(X, Y, U=U0.copy(), V=V0.copy(),
                       Z=None if Z0 is None else Z0.copy())
    return ref, ours


class TestPinnedAssumptions:
    """One test per PINNED_ASSUMPTIONS.md row (A1-A15): each failure
    points at exactly one convention to flip. All skip until the
    reference mount is populated."""

    def test_mu_single_iteration_matches(self):
        """A1 + A7: one MU iteration isolates update order and eps
        placement from every accumulation effect."""
        X, Y, U0, V0, Z0 = _problem()
        ref, ours = _fit_both(X, Y, (U0, V0, Z0), n_components=4,
                              solver="mu", alpha=0.0, tol=0.0, max_iter=1,
                              random_state=0)
        assert np.allclose(ours.U_, ref.U_, rtol=1e-10), \
            "A1/A7: first MU iteration diverges (update order or eps)"
        assert np.allclose(ours.V_, ref.V_, rtol=1e-10)

    def test_mu_trajectory_matches_reference(self):
        """A1: 50-iteration trajectory — order errors compound."""
        X, Y, U0, V0, Z0 = _problem()
        ref, ours = _fit_both(X, Y, (U0, V0, Z0), n_components=4,
                              solver="mu", alpha=0.0, tol=0.0, max_iter=50,
                              random_state=0)
        assert np.allclose(ours.U_, ref.U_, rtol=1e-5)
        assert np.allclose(ours.V_, ref.V_, rtol=1e-5)

    def test_sparse_csr_matches_reference(self):
        """A13: CSR X — zeros are data, objective sums all cells."""
        import scipy.sparse as sp

        X, Y, U0, V0, Z0 = _problem()
        Xs = sp.csr_matrix(X * (X > 0.7))
        ref, ours = _fit_both(Xs, Y, (U0, V0, Z0), n_components=4,
                              solver="mu", alpha=0.0, tol=0.0, max_iter=25,
                              random_state=0)
        assert np.allclose(ours.U_, ref.U_, rtol=1e-5), \
            "A13: sparse CSR trajectory diverges (zero-vs-missing semantics?)"
        assert np.allclose(ours.V_, ref.V_, rtol=1e-5)

    def test_newton_sigmoid_x_matches_reference(self):
        """A8 + A12: sigmoid on the BIG matrix exercises the link
        derivative path in g/H and the line-search objective."""
        X, Y, U0, V0, Z0 = _problem()
        Xb = (X > np.median(X)).astype(float)
        ref, ours = _fit_both(
            Xb, Y, (U0 - 0.5, V0 - 0.5, Z0 - 0.5), n_components=4,
            solver="newton", x_link="sigmoid", alpha=0.0, tol=0.0,
            max_iter=6, random_state=0,
            ref_kw={}, our_kw=dict(U_non_negative=False,
                                   V_non_negative=False,
                                   Z_non_negative=False))
        assert np.allclose(ours.U_, ref.U_, rtol=1e-5, atol=1e-8)
        assert np.allclose(ours.V_, ref.V_, rtol=1e-5, atol=1e-8)

    def test_regularized_mu_matches_reference(self):
        """A10: alpha/l1_ratio placement in numerator/denominator."""
        X, Y, U0, V0, Z0 = _problem()
        ref, ours = _fit_both(X, Y, (U0, V0, Z0), n_components=4,
                              solver="mu", alpha=0.1, l1_ratio=0.5,
                              tol=0.0, max_iter=25, random_state=0)
        assert np.allclose(ours.U_, ref.U_, rtol=1e-5), \
            "A10: elastic-net MU diverges (reg term placement)"
        assert np.allclose(ours.V_, ref.V_, rtol=1e-5)

    def test_tol_stop_matches_reference(self):
        """A3: same tol must stop at the same iteration count."""
        X, Y, U0, V0, Z0 = _problem()
        ref, ours = _fit_both(X, Y, (U0, V0, Z0), n_components=4,
                              solver="mu", alpha=0.0, tol=1e-4,
                              max_iter=200, random_state=0,
                              our_kw=dict(eval_every=1))
        assert ours.n_iter_ == ref.n_iter_, (
            f"A3: stopping rule differs — ours stops at {ours.n_iter_}, "
            f"reference at {ref.n_iter_} (check eval cadence + formula)")

    def test_attribute_semantics_match_reference(self):
        """A4 + A11: reconstruction_err_ meaning and history convention."""
        X, Y, U0, V0, Z0 = _problem()
        ref, ours = _fit_both(X, Y, (U0, V0, Z0), n_components=4,
                              solver="mu", alpha=0.1, l1_ratio=0.3,
                              tol=0.0, max_iter=20, random_state=0)
        assert np.isclose(ours.reconstruction_err_,
                          ref.reconstruction_err_, rtol=1e-5), \
            "A4: reconstruction_err_ differs (full objective vs bare " \
            "residual?)"
        ref_hist = getattr(ref, "loss_history_",
                           getattr(ref, "error_history_", None))
        if ref_hist is not None:
            assert np.isclose(ours.loss_history_[-1], ref_hist[-1],
                              rtol=1e-5), "A11: history convention differs"

    def test_transform_matches_reference(self):
        """A5: fold-in semantics with V frozen."""
        X, Y, U0, V0, Z0 = _problem()
        ref, ours = _fit_both(X, Y, (U0, V0, Z0), n_components=4,
                              solver="mu", alpha=0.0, tol=0.0, max_iter=25,
                              random_state=0)
        rng = np.random.RandomState(7)
        Xn = np.abs(rng.randn(12, X.shape[1]))
        Un0 = np.abs(rng.randn(12, 4))
        Ur = ref.transform(Xn, U=Un0.copy()) \
            if "U" in ref.transform.__code__.co_varnames \
            else ref.transform(Xn)
        Uo = ours.transform(Xn, U=Un0.copy())
        assert np.allclose(Uo, Ur, rtol=1e-4, atol=1e-7), \
            "A5: transform fold-in semantics differ"

    def test_fit_transform_return_convention(self):
        """A6: (U, V, Z) tuple, shapes (n,k)/(m,k)/(r,k)."""
        X, Y, U0, V0, Z0 = _problem()
        out = _REF_CMF(n_components=4, solver="mu", random_state=0,
                       max_iter=5).fit_transform(X, Y)
        assert isinstance(out, tuple) and len(out) == 3, \
            "A6: reference fit_transform does not return (U, V, Z)"
        Ur, Vr, Zr = out
        assert Ur.shape == (X.shape[0], 4)
        assert Vr.shape == (X.shape[1], 4)
        assert Zr.shape == (Y.shape[1], 4)

    def test_default_init_matches_reference(self):
        """A2: same random_state, default init → same starting factors
        (probes the V-averaging and the sqrt(mean/k) scaling)."""
        X, Y, U0, V0, Z0 = _problem()
        # max_iter=0 is invalid in both APIs; compare after ONE iteration
        # from the default init instead.
        from pycmf_tpu import CMF

        kw = dict(n_components=4, solver="mu", alpha=0.0, tol=0.0,
                  max_iter=1, random_state=0)
        r = _REF_CMF(**kw)
        Ur, Vr, Zr = r.fit_transform(X, Y)
        o = CMF(dtype="float64", **kw)
        Uo, Vo, Zo = o.fit_transform(X, Y)
        assert np.allclose(Uo, Ur, rtol=1e-6), \
            "A2: default init differs (RNG draw order / V averaging / " \
            "scaling)"

    def test_stochastic_newton_statistical_parity(self):
        """A9: RNG streams cannot match across implementations — assert
        the SAMPLED fit reaches the same loss neighborhood instead."""
        rng = np.random.RandomState(3)
        X = np.abs(rng.randn(120, 80))
        U0 = np.abs(rng.randn(120, 4))
        V0 = np.abs(rng.randn(80, 4))
        kw = dict(n_components=4, solver="newton", alpha=0.0, tol=0.0,
                  max_iter=10, random_state=0, sg_sample_ratio=0.5)
        r = _REF_CMF(**kw)
        r.fit_transform(X, None, U=U0.copy(), V=V0.copy())
        from pycmf_tpu import CMF

        o = CMF(dtype="float64", **kw)
        o.fit_transform(X, None, U=U0.copy(), V=V0.copy())
        assert np.isclose(o.reconstruction_err_, r.reconstruction_err_,
                          rtol=0.05), \
            "A9: sampled-Newton loss differs beyond statistical band " \
            "(sample-size convention or per-iteration redraw?)"

    def test_sigmoid_loss_form_probe(self):
        """A12 probe: squared vs log-loss sigmoid objective give
        DIFFERENT reconstruction_err_ magnitudes on the same fit."""
        X, Y, U0, V0, Z0 = _problem()
        Yb = (Y > np.median(Y)).astype(float)
        kw = dict(n_components=4, solver="newton", y_link="sigmoid",
                  alpha=0.0, tol=0.0, max_iter=3, random_state=0)
        r = _REF_CMF(**kw)
        r.fit_transform(X, Yb, U=U0.copy(), V=V0.copy(), Z=Z0.copy())
        from pycmf_tpu import CMF

        o = CMF(dtype="float64", **kw)
        o.fit_transform(X, Yb, U=U0.copy(), V=V0.copy(), Z=Z0.copy())
        assert np.isclose(o.reconstruction_err_, r.reconstruction_err_,
                          rtol=1e-4), \
            "A12: sigmoid objective FORM differs (squared vs log-loss)"

    def test_topic_terms_match_reference(self):
        """A15: top-terms extraction ordering."""
        X, Y, U0, V0, Z0 = _problem()
        ref, ours = _fit_both(X, Y, (U0, V0, Z0), n_components=4,
                              solver="mu", alpha=0.0, tol=0.0, max_iter=25,
                              random_state=0)
        vocab = [f"w{i}" for i in range(X.shape[0])]
        if not hasattr(ref, "print_topic_terms"):
            pytest.skip("reference has no topic-terms helper")
        import io

        buf_r, buf_o = io.StringIO(), io.StringIO()
        ref.print_topic_terms(vocabulary=vocab, file=buf_r)
        ours.print_topic_terms(vocabulary=vocab, file=buf_o)
        # exact string formats may differ; the TERM SETS per topic must not
        toks_r = set(t for t in buf_r.getvalue().split() if t in vocab)
        toks_o = set(t for t in buf_o.getvalue().split() if t in vocab)
        assert toks_r == toks_o, "A15: topic term extraction differs"
