"""TPU regression probe: fused Newton kernels must not stall with f32 inputs.

On TPU, a plain f32 `dot` inside a Pallas kernel runs ONE bf16 MXU pass
(~3e-3 relative error). Before the fix, that per-dot noise in the fused
Newton kernels' gradient/φ contractions swamped the line search's small
late-stage improvements and the f32 fit stalled far above the XLA-f32
objective (linear 7327 vs 6009; sigmoid 500.3 vs 180.7 on the repros
below). `newton_fused.py` / `sigmoid_newton.py` now request
`Precision.HIGHEST` for f32 prediction/gradient/φ dots — this probe
asserts the fused fits land within RTOL of the XLA fits' objectives.

CPU interpret-mode Pallas does true f32 math, so this regression is ONLY
observable on the real MXU — hence a TPU probe, not a pytest test
(tests/conftest.py forces the CPU backend). Run after touching any fused
Newton kernel:

    timeout 1800 python -u benchmarks/probe_f32_precision.py

Exit code 0 = both repros within tolerance. See docs/PERFORMANCE.md
"MXU f32 precision".
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RTOL = 5e-3  # fused objective may beat XLA-f32; only a STALL should fail


def run_pair(make_model, X, Y=None):
    out = {}
    for up in (True, False):
        mdl = make_model(up)
        mdl.fit(X) if Y is None else mdl.fit(X, Y)
        h = np.asarray(mdl.loss_history_, dtype=np.float64)
        out[up] = float(h[-1])
        print(f"  use_pallas={up} n_iter={mdl.n_iter_} final={h[-1]:.4f}",
              flush=True)
    gap = (out[True] - out[False]) / abs(out[False])
    print(f"  rel gap fused-vs-XLA: {gap:+.2e}", flush=True)
    return gap


def main():
    from pycmf_tpu import CMF
    from pycmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.RandomState(0)
    failures = []

    # Repro 1: linear X + sigmoid binary Y (fused linear U-pass + sigmoid
    # kernels on V/Z). Pre-fix: fused stalled ~+22% (7327 vs 6009).
    n, m, r, k = 4000, 1200, 30, 16
    Ut = rng.randn(n, k) * 0.6
    Vt = rng.randn(m, k) * 0.6
    Zt = rng.randn(r, k) * 0.6
    X = Ut @ Vt.T + 0.05 * rng.randn(n, m)
    Y = (1 / (1 + np.exp(-(Vt @ Zt.T))) > 0.5).astype(np.float32)
    print("linear X + sigmoid Y (4000x1200, k=16):", flush=True)
    gap = run_pair(
        lambda up: CMF(n_components=k, solver="newton", y_link="sigmoid",
                       U_non_negative=False, V_non_negative=False,
                       Z_non_negative=False, tol=1e-6, max_iter=30,
                       eval_every=2, random_state=0, use_pallas=up),
        X, Y)
    if gap > RTOL:
        failures.append(f"linear+sigmoidY stalled: rel gap {gap:+.2e}")

    # Repro 2: sigmoid X (fused sigmoid G/H + φ kernels on U and V).
    # Pre-fix: fused stalled at 500.3 vs XLA's 180.7.
    Ut = rng.randn(n, k) * 0.8
    Vt = rng.randn(m, k) * 0.8
    X2 = (1 / (1 + np.exp(-(Ut @ Vt.T))) > 0.5).astype(np.float32)
    print("sigmoid X (4000x1200, k=16):", flush=True)
    gap = run_pair(
        lambda up: CMF(n_components=k, solver="newton", x_link="sigmoid",
                       U_non_negative=False, V_non_negative=False,
                       Z_non_negative=False, tol=1e-7, max_iter=40,
                       eval_every=2, random_state=0, use_pallas=up),
        X2)
    if gap > RTOL:
        failures.append(f"sigmoidX stalled: rel gap {gap:+.2e}")

    if failures:
        print("FAIL:", "; ".join(failures), flush=True)
        return 1
    print("OK: fused f32 Newton objectives match XLA", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
