"""Staged TPU perf probe — run ONCE after the device link is confirmed live.

Dispatches are ordered smallest-risk-first with readback syncs between
stages (an in-flight pathological dispatch cannot be cancelled over the
device link). Only the reliable paths are exercised: XLA dense solvers,
device-resident fit loop, data_dtype bf16, and the two validated Pallas
kernels (fused ratio update, batched Cholesky solve).

Usage: timeout 600 python -u benchmarks/tpu_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    say = lambda *a: print(*a, flush=True)
    say("devices:", jax.devices())
    say("alive:", float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum()))

    from pycmf_tpu import CMF
    from pycmf_tpu.utils.datasets import synthetic_20ng
    from pycmf_tpu.utils.init import initialize_factors

    # S1: tiny MU fit through the estimator (device loop) — sanity
    rng = np.random.RandomState(0)
    Xs = np.abs(rng.rand(128, 96))
    Ys = np.abs(rng.rand(96, 12))
    t0 = time.perf_counter()
    m = CMF(n_components=6, random_state=0, max_iter=30, tol=0.0).fit(Xs, Ys)
    say(f"S1 tiny MU fit: {time.perf_counter()-t0:.1f}s "
        f"loss {m.loss_history_[0]:.4g}->{m.reconstruction_err_:.4g}")

    # S2: 20NG MU, f32 vs bf16 data, device loop, timed after warm-up
    X, Y = synthetic_20ng(random_state=0)
    U0, V0, Z0 = initialize_factors(X, Y, 20, random_state=0)
    say(f"S2 data: X {X.shape} nnz={X.nnz}")
    for label, kw in (("f32", {}), ("bf16", dict(data_dtype="bfloat16"))):
        mk = lambda mi: CMF(n_components=20, solver="mu", tol=1e-4,
                            max_iter=mi, eval_every=10, random_state=0, **kw)
        t0 = time.perf_counter()
        mk(10).fit(X, Y, U=U0, V=V0, Z=Z0)   # compile warm-up
        t1 = time.perf_counter()
        mm = mk(200)
        mm.fit(X, Y, U=U0, V=V0, Z=Z0)
        t2 = time.perf_counter()
        say(f"S2 MU 20NG [{label}]: warm {t1-t0:.1f}s, fit {t2-t1:.3f}s, "
            f"{mm.n_iter_} iters -> {1000*(t2-t1)/max(1,mm.n_iter_):.2f} "
            f"ms/iter, loss {mm.reconstruction_err_:.6g}")

    # S3a: tiny Newton first (compile risk check)
    Xt_ = rng.randn(200, 100)
    Yt_ = (rng.rand(100, 10) > 0.5).astype(np.float64)
    t0 = time.perf_counter()
    mt = CMF(n_components=5, solver="newton", y_link="sigmoid",
             U_non_negative=False, V_non_negative=False,
             Z_non_negative=False, random_state=0, max_iter=10, tol=0.0)
    mt.fit(Xt_, Yt_)
    say(f"S3a tiny Newton: {time.perf_counter()-t0:.1f}s "
        f"loss {mt.loss_history_[0]:.4g}->{mt.reconstruction_err_:.4g}")

    # S3: Newton sigmoid (config #2 shapes), device loop + pallas solve
    n, mdim, r, k = 2000, 1000, 200, 20
    Vt = rng.randn(mdim, k) * 0.5
    Zt = rng.randn(r, k) * 0.5
    Xn = rng.randn(n, mdim)
    Yb = (1 / (1 + np.exp(-(Vt @ Zt.T))) > 0.5).astype(np.float64)
    U0, V0, Z0 = initialize_factors(Xn, Yb, k, random_state=0,
                                    U_non_negative=False,
                                    V_non_negative=False,
                                    Z_non_negative=False)
    for label, up in (("pallas-solve", True), ("xla-solve", False)):
        mk = lambda mi: CMF(n_components=k, solver="newton",
                            y_link="sigmoid", U_non_negative=False,
                            V_non_negative=False, Z_non_negative=False,
                            tol=1e-5, max_iter=mi, eval_every=5,
                            random_state=0, use_pallas=up)
        t0 = time.perf_counter()
        mk(5).fit(Xn, Yb, U=U0, V=V0, Z=Z0)
        t1 = time.perf_counter()
        mn = mk(50)
        mn.fit(Xn, Yb, U=U0, V=V0, Z=Z0)
        t2 = time.perf_counter()
        say(f"S3 Newton 2k×1k [{label}]: warm {t1-t0:.1f}s, "
            f"fit {t2-t1:.3f}s, {mn.n_iter_} iters -> "
            f"{1000*(t2-t1)/max(1,mn.n_iter_):.2f} ms/iter, "
            f"loss {mn.reconstruction_err_:.6g}")

    say("probe done")


if __name__ == "__main__":
    main()
