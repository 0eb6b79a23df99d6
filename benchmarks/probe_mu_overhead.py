"""Decompose the MU fit's effective time into kernel + fixed overhead.

Round-2 VERDICT weak #1: the bench-effective MU cost was 3.5 ms/iter vs
a 2.43 ms/iter kernel measurement — ~1 ms/iter-equivalent of fixed
overhead (dispatch, small uploads, initial loss eval, readback) on a
90-iteration fit. This probe isolates each candidate at 20NG scale:

  A. solver_run as bench.py times it (fresh factor/hyper uploads inside)
  B. factors/hyper pre-uploaded, run_mu called with device operands
  C. the jitted device-fit callable invoked directly (pure dispatch+run)
  D. C with max_iter=1 (fixed cost floor of one dispatch)
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from pycmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from pycmf_tpu.solvers import mu as mu_mod
    from pycmf_tpu.solvers.common import SolverConfig, make_hyper
    from pycmf_tpu.solvers.mu import run_mu
    from pycmf_tpu.utils.datasets import synthetic_20ng
    from pycmf_tpu.utils.init import initialize_factors
    from pycmf_tpu.utils.validation import as_coupled

    print("backend:", jax.default_backend(), flush=True)
    X, Y = synthetic_20ng(random_state=0)
    print(f"X {X.shape} nnz={X.nnz}", flush=True)
    U0, V0, Z0 = initialize_factors(X, Y, 20, x_init="random",
                                    y_init="random", random_state=0)
    cfg = SolverConfig(use_pallas=(jax.default_backend() == "tpu"))
    MAX_ITER, EVAL = 90, 10   # bf16 r02 run: 90 iters to tol

    Xc = as_coupled(X, jnp.bfloat16)
    Yc = as_coupled(Y, jnp.bfloat16)

    def timed(f, reps=3):
        f()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return min(ts), ts

    # A: bench-style — fresh uploads inside the timed region
    def run_a():
        U = jnp.asarray(U0, jnp.float32)
        V = jnp.asarray(V0, jnp.float32)
        Z = jnp.asarray(Z0, jnp.float32)
        hyper = make_hyper(dtype=jnp.float32)
        return run_mu(Xc, Yc, U, V, Z, cfg, hyper, max_iter=MAX_ITER,
                      tol=0.0, eval_every=EVAL, loop="device")

    t, ts = timed(run_a)
    print(f"A bench-style      : {t * 1e3:7.1f} ms "
          f"({t / MAX_ITER * 1e3:.2f} ms/iter) "
          f"{[round(x * 1e3) for x in ts]}", flush=True)

    # B: device-resident factors/hyper
    Ud = jnp.asarray(U0, jnp.float32)
    Vd = jnp.asarray(V0, jnp.float32)
    Zd = jnp.asarray(Z0, jnp.float32)
    hyperd = make_hyper(dtype=jnp.float32)
    jax.block_until_ready([Ud, Vd, Zd])

    def run_b():
        return run_mu(Xc, Yc, Ud, Vd, Zd, cfg, hyperd, max_iter=MAX_ITER,
                      tol=0.0, eval_every=EVAL, loop="device")

    t, ts = timed(run_b)
    print(f"B resident operands: {t * 1e3:7.1f} ms "
          f"({t / MAX_ITER * 1e3:.2f} ms/iter) "
          f"{[round(x * 1e3) for x in ts]}", flush=True)

    # C: raw jitted fit callable (skips run_mu's python + finish)
    aux = mu_mod._aux_ok(cfg, Xc, Ud)
    fitf = mu_mod._make_device_fit(cfg, aux)
    told = jnp.asarray(0.0, jnp.float32)

    def run_c():
        out = fitf(Xc, Yc, Ud, Vd, Zd, hyperd, None, told, MAX_ITER, EVAL)
        np.asarray(jax.device_get(out[4]))   # history readback only

    t, ts = timed(run_c)
    print(f"C raw dispatch     : {t * 1e3:7.1f} ms "
          f"({t / MAX_ITER * 1e3:.2f} ms/iter) "
          f"{[round(x * 1e3) for x in ts]}", flush=True)

    # D: one-iteration fit = fixed cost floor
    def run_d():
        out = fitf(Xc, Yc, Ud, Vd, Zd, hyperd, None, told, 1, 1)
        np.asarray(jax.device_get(out[4]))

    t, ts = timed(run_d)
    print(f"D 1-iter floor     : {t * 1e3:7.1f} ms "
          f"{[round(x * 1e3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
