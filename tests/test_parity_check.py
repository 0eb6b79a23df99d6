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
