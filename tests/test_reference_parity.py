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

REFERENCE_ROOT = "/root/reference"
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
