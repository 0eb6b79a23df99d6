"""Benchmark: 20NG text+labels CMF time-to-tolerance, TPU vs CPU stand-in.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Driver metric (BASELINE.json): "Time-to-tolerance (MU & Newton) on 20NG
text+labels CMF". The reported value is the GEOMEAN of the two solver
speedups, each measured time-to-tolerance from the same initialization with
the same stopping rule, with a 2% equal-final-loss guard per solver. The
baseline is baselines/numpy_cmf.py — a faithful *vectorized* NumPy
implementation of the reference's update rules (PyCMF itself is not
installable here; its per-row Python/numba loops are slower, so these
speedups are conservative lower bounds — see BASELINE.md).

The TPU side tries data_dtype float32 and bfloat16 (halved HBM traffic for
the bandwidth-bound MU passes) and reports the fastest variant that passes
the quality guard.

Env: PYCMF_BENCH_SMALL=1 shrinks the problem for smoke runs.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TOL = 1e-4
MAX_ITER = 200
EVAL_EVERY = 10
NEWTON_TOL = 1e-5
NEWTON_MAX_ITER = 50
NEWTON_EVAL = 5
K = 20
SEED = 0
QUALITY_BAR = 0.02


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from baselines import numpy_cmf
    from pycmf_tpu import CMF
    from pycmf_tpu.utils.datasets import load_20ng, synthetic_20ng
    from pycmf_tpu.utils.init import initialize_factors

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    small = os.environ.get("PYCMF_BENCH_SMALL", "0") == "1"
    if small:
        X, Y = synthetic_20ng(n_docs=500, n_terms=2000, random_state=SEED)
        source = "small synthetic smoke"
    else:
        X, Y, source = load_20ng(random_state=SEED)
    log(f"data: {source}; X {X.shape} nnz={X.nnz} "
        f"({X.nnz / (X.shape[0] * X.shape[1]):.3%}), Y {Y.shape}")

    U0, V0, Z0 = initialize_factors(
        X, Y, K, x_init="random", y_init="random", random_state=SEED)

    def timed(fit_fn):
        fit_fn(warm=True)
        t0 = time.perf_counter()
        m = fit_fn(warm=False)
        return time.perf_counter() - t0, m

    speedups = {}

    # ---- MU solver ------------------------------------------------------
    def mu_fit(data_dtype):
        def run(warm):
            m = CMF(n_components=K, solver="mu", tol=TOL,
                    max_iter=EVAL_EVERY if warm else MAX_ITER,
                    eval_every=EVAL_EVERY, random_state=SEED,
                    data_dtype=data_dtype)
            m.fit(X, Y, U=U0, V=V0, Z=Z0)
            return m
        return run

    t0 = time.perf_counter()
    Un, Vn, Zn, it_np, hist_np = numpy_cmf.run_mu(
        X.astype(np.float64), Y.astype(np.float64), U0.copy(), V0.copy(),
        Z0.copy(), max_iter=MAX_ITER, tol=TOL, eval_every=EVAL_EVERY)
    t_np_mu = time.perf_counter() - t0
    log(f"numpy MU: {it_np} iters, {t_np_mu:.3f}s, loss {hist_np[-1]:.6g}")

    best_mu = None
    for dd in (None, "bfloat16"):
        t, m = timed(mu_fit(dd))
        gap = abs(m.reconstruction_err_ - hist_np[-1]) / hist_np[-1]
        log(f"tpu MU[{dd or 'f32'}]: {m.n_iter_} iters, {t:.3f}s, "
            f"loss {m.reconstruction_err_:.6g} (gap {gap:.3%})")
        if gap <= QUALITY_BAR and (best_mu is None or t < best_mu):
            best_mu = t
    if best_mu is None:
        log("MU quality guard failed for all dtypes")
    else:
        speedups["mu"] = t_np_mu / best_mu

    # ---- Newton solver (sigmoid-linked labels, same 20NG data) ----------
    def newton_fit(data_dtype):
        def run(warm):
            m = CMF(n_components=K, solver="newton", y_link="sigmoid",
                    tol=NEWTON_TOL,
                    max_iter=NEWTON_EVAL if warm else NEWTON_MAX_ITER,
                    eval_every=NEWTON_EVAL, random_state=SEED,
                    data_dtype=data_dtype)
            m.fit(X, Y, U=U0, V=V0, Z=Z0)
            return m
        return run

    t0 = time.perf_counter()
    _, _, _, it_nn, hist_nn = numpy_cmf.run_newton(
        X.astype(np.float64), Y.astype(np.float64), U0.copy(), V0.copy(),
        Z0.copy(), max_iter=NEWTON_MAX_ITER, tol=NEWTON_TOL,
        eval_every=NEWTON_EVAL, y_link="sigmoid",
        non_negative=(True, True, True))
    t_np_nt = time.perf_counter() - t0
    log(f"numpy Newton: {it_nn} iters, {t_np_nt:.3f}s, "
        f"loss {hist_nn[-1]:.6g}")

    best_nt = None
    for dd in (None, "bfloat16"):
        t, m = timed(newton_fit(dd))
        gap = abs(m.reconstruction_err_ - hist_nn[-1]) / hist_nn[-1]
        log(f"tpu Newton[{dd or 'f32'}]: {m.n_iter_} iters, {t:.3f}s, "
            f"loss {m.reconstruction_err_:.6g} (gap {gap:.3%})")
        if gap <= QUALITY_BAR and (best_nt is None or t < best_nt):
            best_nt = t
    if best_nt is None:
        log("Newton quality guard failed for all dtypes")
    else:
        speedups["newton"] = t_np_nt / best_nt

    if not speedups:
        print(json.dumps({
            "metric": "20ng_mu_newton_time_to_tol_speedup_geomean",
            "value": 0.0, "unit": "x", "vs_baseline": 0.0}))
        return

    log(f"speedups: { {k: round(v, 2) for k, v in speedups.items()} }")
    geo = float(np.exp(np.mean(np.log(list(speedups.values())))))
    print(json.dumps({
        "metric": "20ng_mu_newton_time_to_tol_speedup_geomean",
        "value": round(geo, 3),
        "unit": "x",
        "vs_baseline": round(geo, 3),
    }))


if __name__ == "__main__":
    main()
