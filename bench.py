"""Benchmark: 20NG text+labels CMF time-to-tolerance, TPU vs CPU stand-in.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The driver metric (BASELINE.json): time-to-tolerance of the MU solver on the
20-Newsgroups text+labels workload at equal reconstruction error. PyCMF
itself is not installable here (no network), so the baseline is
baselines/numpy_cmf.py — a faithful *vectorized* NumPy implementation of the
same update rules; the reference's per-row Python/numba loops are slower, so
the reported speedup is a conservative lower bound (see BASELINE.md).

Both sides start from the same initialization and stop on the same rule
((L_prev − L)/L_init < tol, checked every eval_every iters). The run aborts
with an error JSON if the final losses diverge by more than 2% (the
"at equal reconstruction error" clause).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

TOL = 1e-4
MAX_ITER = 200
EVAL_EVERY = 10
K = 20
SEED = 0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    sys.path.insert(0, ".")
    from baselines import numpy_cmf
    from pycmf_tpu import CMF
    from pycmf_tpu.utils.datasets import load_20ng
    from pycmf_tpu.utils.init import initialize_factors

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    X, Y, source = load_20ng(random_state=SEED)
    log(f"data: {source}; X {X.shape} nnz={X.nnz} "
        f"({X.nnz / (X.shape[0] * X.shape[1]):.3%}), Y {Y.shape}")

    U0, V0, Z0 = initialize_factors(
        X, Y, K, x_init="random", y_init="random", random_state=SEED)

    def fit_tpu():
        m = CMF(n_components=K, solver="mu", tol=TOL, max_iter=MAX_ITER,
                eval_every=EVAL_EVERY, random_state=SEED)
        m.fit(X, Y, U=U0, V=V0, Z=Z0)
        return m

    # Warm-up: compile all block shapes once (cached for the timed run).
    log("warm-up fit (compilation)...")
    warm = CMF(n_components=K, solver="mu", tol=TOL, max_iter=EVAL_EVERY,
               eval_every=EVAL_EVERY, random_state=SEED)
    warm.fit(X, Y, U=U0, V=V0, Z=Z0)

    log("timed TPU fit...")
    t0 = time.perf_counter()
    m = fit_tpu()
    t_tpu = time.perf_counter() - t0
    log(f"tpu: {m.n_iter_} iters in {t_tpu:.3f}s, "
        f"loss {m.loss_history_[0]:.6g} -> {m.reconstruction_err_:.6g}")

    log("timed NumPy stand-in fit (same init, same stopping rule)...")
    t0 = time.perf_counter()
    Un, Vn, Zn, n_iter_np, hist_np = numpy_cmf.run_mu(
        X.astype(np.float64), Y.astype(np.float64), U0.copy(), V0.copy(),
        Z0.copy(), alpha=0.0, l1_ratio=0.0, max_iter=MAX_ITER, tol=TOL,
        eval_every=EVAL_EVERY)
    t_np = time.perf_counter() - t0
    log(f"numpy: {n_iter_np} iters in {t_np:.3f}s, "
        f"loss {hist_np[0]:.6g} -> {hist_np[-1]:.6g}")

    # equal-quality guard
    rel_gap = abs(m.reconstruction_err_ - hist_np[-1]) / hist_np[-1]
    log(f"final-loss relative gap: {rel_gap:.4%}")
    if rel_gap > 0.02:
        print(json.dumps({
            "metric": "20ng_mu_time_to_tol_speedup_vs_numpy_standin",
            "value": 0.0, "unit": "x", "vs_baseline": 0.0,
            "error": f"quality gap {rel_gap:.3%} exceeds 2%"}))
        return

    speedup = t_np / t_tpu
    print(json.dumps({
        "metric": "20ng_mu_time_to_tol_speedup_vs_numpy_standin",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup, 3),
    }))


if __name__ == "__main__":
    main()
