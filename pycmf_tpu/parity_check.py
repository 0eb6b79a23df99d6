"""Parity-day runbook: `python -m pycmf_tpu.parity_check`.

The binding parity bar (BASELINE.json north_star: match upstream PyCMF to
1e-5 relative error under identical inits) is unverifiable while the
reference mount `/root/reference/` is empty (SURVEY.md provenance notice).
Fifteen behavioral conventions were therefore PINNED (PINNED_ASSUMPTIONS.md
A1–A15), each with a self-activating falsifying test in
`tests/test_reference_parity.py`.

This module makes population day a one-command diff-run (VERDICT r03 next
item #8): it detects a populated mount (or `PYCMF_REFERENCE_ROOT`
override), runs the parity suite, and prints — for every failure — exactly
which pinned assumption it falsifies, what was pinned, and where in this
repo to flip it. With no reference available it says so and exits 0.

Exit codes: 0 = no reference (skipped) or all parity tests passed;
1 = at least one parity test failed/errored (assumptions listed).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

#: test base name → pinned assumption ids it falsifies
#: (mirror of the "Falsifying test" column in PINNED_ASSUMPTIONS.md)
ASSUMPTION_MAP = {
    "test_mu_matches_reference": ("A1", "A7"),
    "test_newton_matches_reference": ("A8", "A12", "A14"),
    "test_mu_single_iteration_matches": ("A1", "A7"),
    "test_mu_trajectory_matches_reference": ("A1",),
    "test_sparse_csr_matches_reference": ("A13",),
    "test_newton_sigmoid_x_matches_reference": ("A8", "A12"),
    "test_regularized_mu_matches_reference": ("A10",),
    "test_tol_stop_matches_reference": ("A3",),
    "test_attribute_semantics_match_reference": ("A4", "A11"),
    "test_transform_matches_reference": ("A5",),
    "test_fit_transform_return_convention": ("A6",),
    "test_default_init_matches_reference": ("A2",),
    "test_stochastic_newton_statistical_parity": ("A9",),
    "test_sigmoid_loss_form_probe": ("A12",),
    "test_topic_terms_match_reference": ("A15",),
}

#: assumption id → (what was pinned, where to flip it in this repo)
ASSUMPTIONS = {
    "A1": ("update order U → Z → V within one iteration",
           "solvers/mu.py (step), solvers/newton.py factor loop"),
    "A2": ("default init averages X's and Y's V candidates, "
           "sqrt(mean/k) scaling", "utils/init.py"),
    "A3": ("stop when (L_prev − L)/L_init < tol on the SQUARED objective "
           "(sklearn-NMF uses the error NORM sqrt(2·loss) — the likeliest "
           "flip)", "solvers/common.py run_solver_loop + device_fit_core"),
    "A4": ("reconstruction_err_ = full objective incl. penalties",
           "models/cmf.py (reconstruction_err_)"),
    "A5": ("transform = fold-in with V (and Z) frozen, fresh seeded U0",
           "models/cmf.py transform"),
    "A6": ("fit_transform returns (U, V, Z) float64 NumPy tuple",
           "models/cmf.py fit_transform"),
    "A7": ("MU eps added to the DENOMINATOR only",
           "solvers/mu.py mu_ratio_update"),
    "A8": ("Gauss-Newton H, damping ADDED, backtracking-halving line "
           "search, clip AFTER step", "solvers/newton.py"),
    "A9": ("sg_sample_ratio subsamples columns, ceil(ratio·m) fixed size, "
           "fresh draw per iteration (parity is statistical)",
           "solvers/newton.py sampling"),
    "A10": ("sklearn-style elastic net on all three factors; l2·M in MU "
            "denominators, l1 constant", "ops/losses.py penalty, "
            "solvers/mu.py"),
    "A11": ("loss_history_[0] is the iteration-0 loss; entries at each "
            "eval point", "solvers/common.py run_solver_loop"),
    "A12": ("sigmoid loss is SQUARED error, not log-loss (highest-risk "
            "pin)", "ops/losses.py, ops/links.py"),
    "A13": ("CSR zeros are DATA, objective sums all n·m cells",
            "ops/sparse.py, ops/losses.py factored identity"),
    "A14": ("hessian_pertubation default 0.2, misspelling is the kwarg",
            "models/cmf.py __init__"),
    "A15": ("topic terms = top-n by descending weight, ties by index",
            "utils/analysis.py"),
}

_REPO = Path(__file__).resolve().parent.parent
_TESTS = _REPO / "tests" / "test_reference_parity.py"


def detect_reference(root: str | None = None) -> str | None:
    """Directory containing an upstream `pycmf/` package, or None.

    Checks (in order): the explicit/env root (`<root>/pycmf/__init__.py`
    — the same rule tests/test_reference_parity.py uses to self-activate),
    then every sys.path entry OUTSIDE this repo (a pip-installed upstream
    would live in site-packages; the repo's own `pycmf` drop-in alias is
    excluded by construction).
    """
    root = root or os.environ.get("PYCMF_REFERENCE_ROOT", "/root/reference")
    if os.path.isfile(os.path.join(root, "pycmf", "__init__.py")):
        return root
    for entry in sys.path:
        base = os.path.abspath(entry or ".")
        if base == str(_REPO) or not os.path.isdir(base):
            continue
        if os.path.isfile(os.path.join(base, "pycmf", "__init__.py")):
            return base
    return None


class _Collector:
    """Pytest plugin capturing one outcome per test."""

    def __init__(self):
        self.outcomes: dict[str, str] = {}

    def pytest_runtest_logreport(self, report):
        name = report.nodeid.split("::")[-1]
        if report.when == "call":
            self.outcomes[name] = report.outcome
        elif report.outcome in ("skipped", "failed"):
            # setup-time skip, or an error during setup/teardown
            out = "skipped" if report.outcome == "skipped" else "error"
            self.outcomes.setdefault(name, out)


def run_parity_suite(root: str, select: str | None = None) -> dict[str, str]:
    """Run tests/test_reference_parity.py against the mount at `root`."""
    import pytest

    os.environ["PYCMF_REFERENCE_ROOT"] = root
    collector = _Collector()
    # -p no:cacheprovider: stay read-only outside the repo; -q keeps the
    # raw pytest noise short (this module prints the real report).
    args = ["-q", "-p", "no:cacheprovider", str(_TESTS)]
    if select:
        args += ["-k", select]
    pytest.main(args, plugins=[collector])
    return collector.outcomes


def report(outcomes: dict[str, str], out=sys.stdout) -> int:
    """Print the assumption-resolution table; return the exit code."""
    w = lambda s: print(s, file=out)
    bad = {n: o for n, o in outcomes.items()
           if o in ("failed", "error")}
    passed = [n for n, o in outcomes.items() if o == "passed"]
    skipped = [n for n, o in outcomes.items() if o == "skipped"]
    w(f"parity suite: {len(passed)} passed, {len(bad)} failed/errored, "
      f"{len(skipped)} skipped")
    if not bad:
        if passed:
            w("ALL PARITY TESTS PASS — the pinned conventions hold against "
              "the real reference. Update PINNED_ASSUMPTIONS.md / SURVEY.md "
              "provenance notices to 'verified'.")
        return 0
    falsified: dict[str, list[str]] = {}
    for name in sorted(bad):
        ids = ASSUMPTION_MAP.get(name, ())
        w(f"\nFAIL {name} ({bad[name]})")
        if not ids:
            w("  (not mapped to a pinned assumption — new behavior; "
              "add a row to PINNED_ASSUMPTIONS.md)")
        for a in ids:
            falsified.setdefault(a, []).append(name)
            what, where = ASSUMPTIONS[a]
            w(f"  falsifies {a}: pinned «{what}»")
            w(f"    flip in: {where}")
    w("\nReconciliation order (PINNED_ASSUMPTIONS.md 'How to reconcile'):")
    w("  1. read the upstream source for each convention above;")
    w("  2. flip it here AND in baselines/numpy_cmf.py (shared by design);")
    w("  3. regenerate tests/goldens/, re-run the FULL suite.")
    w(f"Assumptions implicated: {', '.join(sorted(falsified))}")
    return 1


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    select = None
    if "-k" in argv:  # pytest-style selection passthrough
        select = argv[argv.index("-k") + 1]
    root = detect_reference()
    if root is None:
        print("No reference available: /root/reference is empty (or "
              "PYCMF_REFERENCE_ROOT unset/empty) and upstream pycmf is not "
              "importable. The 15 pinned conventions (PINNED_ASSUMPTIONS.md "
              "A1–A15) remain unverified; this command becomes a diff-run "
              "the day the mount is populated. Nothing to do.")
        return 0
    print(f"Reference detected at {root} — running the parity suite...")
    outcomes = run_parity_suite(root, select)
    if not outcomes:
        print("parity suite collected no tests — check the mount layout "
              f"({root}/pycmf/__init__.py) and tests/test_reference_parity.py")
        return 1
    return report(outcomes)


if __name__ == "__main__":
    sys.exit(main())
