"""Tests for the parity-day runbook (`python -m pycmf_tpu.parity_check`,
VERDICT r03 next item #8): detection, assumption mapping, and an
end-to-end run against a mocked mini-reference."""
import io
import os
import subprocess
import sys
import textwrap

from pycmf_tpu import parity_check
from pycmf_tpu.parity_check import (ASSUMPTION_MAP, ASSUMPTIONS,
                                    detect_reference, report)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestAssumptionTable:
    def test_every_mapped_assumption_exists(self):
        for ids in ASSUMPTION_MAP.values():
            for a in ids:
                assert a in ASSUMPTIONS

    def test_every_assumption_has_a_falsifying_test(self):
        mapped = {a for ids in ASSUMPTION_MAP.values() for a in ids}
        assert mapped == set(ASSUMPTIONS), (
            "PINNED_ASSUMPTIONS.md rows without a falsifying test mapping: "
            f"{set(ASSUMPTIONS) - mapped}")

    def test_mapped_tests_exist_in_parity_file(self):
        src = open(os.path.join(_REPO, "tests",
                                "test_reference_parity.py")).read()
        for name in ASSUMPTION_MAP:
            assert f"def {name}(" in src, f"{name} not in parity suite"


class TestDetect:
    def test_empty_dir_not_detected(self, tmp_path, monkeypatch):
        monkeypatch.delenv("PYCMF_REFERENCE_ROOT", raising=False)
        assert detect_reference(str(tmp_path)) is None

    def test_populated_dir_detected(self, tmp_path):
        pkg = tmp_path / "pycmf"
        pkg.mkdir()
        (pkg / "__init__.py").write_text("CMF = None\n")
        assert detect_reference(str(tmp_path)) == str(tmp_path)

    def test_repo_alias_is_not_the_reference(self, tmp_path, monkeypatch):
        # the repo root is on sys.path and ships a pycmf alias package;
        # detection must never return the repo itself
        monkeypatch.delenv("PYCMF_REFERENCE_ROOT", raising=False)
        found = detect_reference(str(tmp_path))
        assert found is None or os.path.abspath(found) != _REPO


class TestReport:
    def _run(self, outcomes):
        buf = io.StringIO()
        rc = report(outcomes, out=buf)
        return rc, buf.getvalue()

    def test_all_pass_exit_zero(self):
        rc, text = self._run({n: "passed" for n in ASSUMPTION_MAP})
        assert rc == 0
        assert "ALL PARITY TESTS PASS" in text

    def test_failure_names_assumption_and_location(self):
        rc, text = self._run({"test_tol_stop_matches_reference": "failed"})
        assert rc == 1
        assert "falsifies A3" in text
        assert "run_solver_loop" in text

    def test_unmapped_failure_flagged(self):
        rc, text = self._run({"test_某_new": "failed"})
        assert rc == 1
        assert "not mapped" in text


class TestEndToEndMockedReference:
    """Drop a deliberately-divergent mini PyCMF into a fake mount and run
    the module exactly as parity day would. A6 (return convention) is the
    one convention the mock honors, so the run must show ≥1 pass and map
    the factor-trajectory failure to A1/A7."""

    MOCK = textwrap.dedent('''
        import numpy as np

        class CMF:
            def __init__(self, n_components=2, **kw):
                self.k = n_components
            def fit_transform(self, X, Y, U=None, V=None, Z=None):
                n, m = X.shape
                r = Y.shape[1] if Y is not None else 0
                # honors A6 (tuple of correctly-shaped float64 factors)
                # but is numerically WRONG for every trajectory test
                self.U_ = np.ones((n, self.k))
                self.V_ = np.ones((m, self.k))
                self.Z_ = np.ones((r, self.k))
                self.reconstruction_err_ = 0.0
                self.n_iter_ = 1
                return self.U_, self.V_, self.Z_
    ''')

    def test_module_run_reports_falsified_assumptions(self, tmp_path):
        pkg = tmp_path / "pycmf"
        pkg.mkdir()
        (pkg / "__init__.py").write_text(self.MOCK)
        env = dict(os.environ, PYCMF_REFERENCE_ROOT=str(tmp_path),
                   PYCMF_NO_DOWNLOAD="1")
        proc = subprocess.run(
            [sys.executable, "-m", "pycmf_tpu.parity_check",
             "-k", "single_iteration or return_convention"],
            capture_output=True, text=True, env=env, cwd=_REPO,
            timeout=420)
        assert "Reference detected" in proc.stdout
        assert proc.returncode == 1, proc.stdout + proc.stderr
        assert "1 passed, 1 failed" in proc.stdout
        assert "falsifies A1" in proc.stdout
        assert "falsifies A7" in proc.stdout
        assert "mu_ratio_update" in proc.stdout

    def test_module_run_no_reference_exits_zero(self, tmp_path):
        env = dict(os.environ, PYCMF_REFERENCE_ROOT=str(tmp_path),
                   PYCMF_NO_DOWNLOAD="1")
        proc = subprocess.run(
            [sys.executable, "-m", "pycmf_tpu.parity_check"],
            capture_output=True, text=True, env=env, cwd=_REPO,
            timeout=120)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert "No reference available" in proc.stdout


# A semantically-PLAUSIBLE mini-reference: numpy_cmf-backed CMF with at
# most ONE pinned convention deliberately flipped. Unlike the all-ones mock
# above (which fails everything except A6), this is what population day
# will actually look like: a reference that agrees on almost everything
# and diverges on one subtle convention. The flip tests below prove the
# runbook maps such a divergence to EXACTLY the flipped assumption
# (round-4 VERDICT next item #6).
_PLAUSIBLE_MOCK = '''
"""numpy_cmf-backed mock reference; FLIP selects one flipped convention."""
import importlib.util
import os

import numpy as np

_REPO = {repo!r}
FLIP = {flip!r}


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_nc = _load("_mock_numpy_cmf", os.path.join("baselines", "numpy_cmf.py"))
_init = _load("_mock_init", os.path.join("pycmf_tpu", "utils", "init.py"))


def _loss(X, Y, U, V, Z, alpha, l1_ratio, x_link, y_link):
    if FLIP == "A12":
        # flipped convention: sigmoid reconstruction measured as LOG-LOSS
        # instead of squared error (the A12 "highest-risk pin")
        import scipy.sparse as sp

        def term(A, M, B, link):
            A = np.asarray(A.todense()) if sp.issparse(A) else np.asarray(A)
            T = M @ B.T
            if link == "linear":
                R = A - T
                return 0.5 * float(np.sum(R * R))
            P = 1.0 / (1.0 + np.exp(-np.clip(T, -60, 60)))
            P = np.clip(P, 1e-12, 1 - 1e-12)
            return -float(np.sum(A * np.log(P) + (1 - A) * np.log(1 - P)))

        def pen(M):
            return alpha * (l1_ratio * np.abs(M).sum()
                            + 0.5 * (1 - l1_ratio) * (M * M).sum())

        out = term(X, U, V, x_link) + pen(U) + pen(V)
        if Y is not None:
            out += term(Y, V, Z, y_link) + pen(Z)
        return out
    return _nc.loss(X, Y, U, V, Z, alpha, l1_ratio, x_link, y_link)


class CMF:
    def __init__(self, n_components=None, solver="mu", alpha=0.0,
                 l1_ratio=0.0, tol=1e-4, max_iter=200, random_state=None,
                 x_link="linear", y_link="linear", U_non_negative=True,
                 V_non_negative=True, Z_non_negative=True,
                 hessian_pertubation=0.2, sg_sample_ratio=1.0, **kw):
        self.n_components = n_components
        self.solver = solver
        self.alpha = alpha
        self.l1_ratio = l1_ratio
        self.tol = tol
        self.max_iter = max_iter
        self.random_state = random_state
        self.x_link = x_link
        self.y_link = y_link
        self.U_non_negative = U_non_negative
        self.V_non_negative = V_non_negative
        self.Z_non_negative = Z_non_negative
        self.hessian_pertubation = hessian_pertubation
        self.sg_sample_ratio = sg_sample_ratio

    def _stopped(self, loss_init, prev, cur):
        if FLIP == "A3":
            # flipped convention: tol applies to the relative decrease of
            # the error NORM sqrt(2 L), sklearn-NMF style
            return (np.sqrt(2 * prev) - np.sqrt(2 * cur)) \\
                / np.sqrt(2 * loss_init) < self.tol
        return (prev - cur) / loss_init < self.tol

    def _step(self, X, Y, U, V, Z):
        if self.solver == "mu":
            return _nc.mu_step(X, Y, U, V, Z, self.alpha, self.l1_ratio)
        return _nc.newton_step(
            X, Y, U, V, Z, alpha=self.alpha, l1_ratio=self.l1_ratio,
            hessian_pertubation=self.hessian_pertubation,
            x_link=self.x_link, y_link=self.y_link,
            non_negative=(self.U_non_negative, self.V_non_negative,
                          self.Z_non_negative))

    def fit_transform(self, X, Y=None, U=None, V=None, Z=None):
        k = self.n_components
        U0, V0, Z0 = _init.initialize_factors(
            X, Y, k, U_non_negative=self.U_non_negative,
            V_non_negative=self.V_non_negative,
            Z_non_negative=self.Z_non_negative,
            random_state=self.random_state, U=U, V=V, Z=Z)
        if FLIP == "A2" and U is None and V is None:
            # flipped convention: default random init scaled differently
            U0, V0 = 0.5 * U0, 0.5 * V0
            Z0 = None if Z0 is None else 0.5 * Z0
        la = (self.alpha, self.l1_ratio, self.x_link, self.y_link)
        loss_init = _loss(X, Y, U0, V0, Z0, *la)
        hist = [loss_init]
        prev = loss_init
        n = 0
        while n < self.max_iter:
            U0, V0, Z0 = self._step(X, Y, U0, V0, Z0)
            n += 1
            cur = _loss(X, Y, U0, V0, Z0, *la)
            hist.append(cur)
            if loss_init > 0 and self._stopped(loss_init, prev, cur):
                break
            prev = cur
        self.U_, self.V_ = U0, V0
        self.Z_ = Z0 if Y is not None else None
        self.n_iter_ = n
        self.loss_history_ = hist
        err = hist[-1]
        if FLIP == "A4":
            # flipped convention: reconstruction_err_ is the BARE residual,
            # penalties excluded
            err = _nc.loss(X, Y, U0, V0, Z0, 0.0, 0.0,
                           self.x_link, self.y_link)
        self.reconstruction_err_ = err
        return self.U_, self.V_, self.Z_

    def fit(self, X, Y=None, **kw):
        self.fit_transform(X, Y, **kw)
        return self

    def transform(self, Xn, U=None):
        k = self.n_components
        V = self.V_
        rng = np.random.RandomState(
            self.random_state if isinstance(self.random_state, int) else None)
        if U is None:
            avg = np.sqrt(max(abs(float(Xn.mean())), 1e-12) / k)
            U = np.abs(avg * rng.standard_normal((Xn.shape[0], k)))
        U = np.asarray(U, dtype=np.float64)
        loss_init = _nc.loss(Xn, None, U, V, None, self.alpha, self.l1_ratio,
                             self.x_link, "linear")
        prev = loss_init
        n = 0
        l1 = self.alpha * self.l1_ratio
        l2 = self.alpha * (1 - self.l1_ratio)
        while n < self.max_iter:
            if self.solver == "mu":
                VtV = V.T @ V
                U = U * _nc._mm(Xn, V) / (U @ VtV + l1 + l2 * U + 1e-10)
            else:
                U = _nc.newton_update_factor(
                    U, [(Xn, V, self.x_link)], alpha=self.alpha,
                    l1_ratio=self.l1_ratio,
                    hessian_pertubation=self.hessian_pertubation,
                    non_negative=self.U_non_negative)
            n += 1
            cur = _nc.loss(Xn, None, U, V, None, self.alpha, self.l1_ratio,
                           self.x_link, "linear")
            if loss_init > 0 and self._stopped(loss_init, prev, cur):
                break
            prev = cur
        return U
'''


class TestSemanticMockFlips:
    """Parametrized flip drills (round-4 VERDICT #6): a plausible
    numpy_cmf-backed mock with exactly ONE convention flipped must make
    the runbook fail EXACTLY the matching test(s) and name the flipped
    assumption, while the co-selected control tests still pass."""

    import pytest as _pytest

    # flip id, -k selection, tests expected to FAIL, control tests that
    # must PASS (all within the selection)
    CASES = [
        ("A3", "tol_stop or mu_single_iteration",
         {"test_tol_stop_matches_reference"},
         {"test_mu_single_iteration_matches"}),
        ("A2", "default_init or fit_transform_return",
         {"test_default_init_matches_reference"},
         {"test_fit_transform_return_convention"}),
        ("A4", "attribute_semantics or regularized_mu",
         {"test_attribute_semantics_match_reference"},
         {"test_regularized_mu_matches_reference"}),
        ("A12", "sigmoid_loss_form or mu_single_iteration",
         {"test_sigmoid_loss_form_probe"},
         {"test_mu_single_iteration_matches"}),
    ]

    def _run_mock(self, tmp_path, flip, select):
        pkg = tmp_path / "pycmf"
        pkg.mkdir()
        (pkg / "__init__.py").write_text(
            _PLAUSIBLE_MOCK.format(repo=_REPO, flip=flip))
        env = dict(os.environ, PYCMF_REFERENCE_ROOT=str(tmp_path),
                   PYCMF_NO_DOWNLOAD="1")
        return subprocess.run(
            [sys.executable, "-m", "pycmf_tpu.parity_check", "-k", select],
            capture_output=True, text=True, env=env, cwd=_REPO,
            timeout=600)

    @_pytest.mark.parametrize("flip,select,fails,passes",
                              CASES, ids=[c[0] for c in CASES])
    def test_flip_maps_to_exact_assumption(self, tmp_path, flip, select,
                                           fails, passes):
        proc = self._run_mock(tmp_path, flip, select)
        out = proc.stdout
        assert "Reference detected" in out, out + proc.stderr
        assert proc.returncode == 1, out + proc.stderr
        failed = {ln.split()[1] for ln in out.splitlines()
                  if ln.startswith("FAIL ")}
        assert failed == fails, (
            f"flip {flip}: expected exactly {fails} to fail, got {failed}\n"
            + out)
        assert f"falsifies {flip}" in out, out
        assert f"{len(passes)} passed" in out, out

    def test_unflipped_mock_passes_all_selected(self, tmp_path):
        """Control: with NO convention flipped the plausible mock passes
        every test the flip drills select — the failures above are caused
        by the flips alone."""
        sels = set()
        for _, sel, _, _ in self.CASES:
            sels.update(s.strip() for s in sel.split(" or "))
        union = " or ".join(sorted(sels))
        proc = self._run_mock(tmp_path, "none", union)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert "ALL PARITY TESTS PASS" in proc.stdout, proc.stdout
