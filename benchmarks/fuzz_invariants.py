"""Randomized invariant fuzzer: cross-path properties the config fuzzer
(fuzz_configs.py) does not cover.

Per random tiny problem (shapes below/around one tile, non-divisible by
the mesh, all layouts on 8 virtual CPU devices) it checks, at f64:

1. loop='device' matches loop='host' (same config, same init) — the
   device-resident while_loop and the host tol loop share one RNG
   schedule and must produce identical trajectories (rtol 1e-9).
2. warm-start resume: fit(max_iter=4) == fit(max_iter=2) then a second
   fit warm-started from the stored factors for 2 more (full-batch only:
   a resumed fit re-seeds the sampling RNG by design, so sampled
   trajectories legitimately differ across the split).
3. eval-cadence independence: with tol=0, eval_every=1 vs 3 must not
   change the factors (loss evaluation is observation, not state).
4. transform parity: fold-in on fresh rows (explicit U0) matches between
   use_pallas on/off, and between the sharded and single-device models
   fitted from the same init.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/fuzz_invariants.py <seed> <n_cases>

Round-3 result: 80 cases (seeds 0, 1 — the latter with
chunked sigmoid/MU combos), 0 failures.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp

from pycmf_tpu import CMF

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 40
rng = np.random.RandomState(seed)
fails = 0


def close(a, b, rtol=1e-9, atol=1e-12):
    return np.allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


for t in range(N):
    if t and t % 25 == 0:
        jax.clear_caches()  # bound LLVM JIT memory (see fuzz_configs.py)
    n = int(rng.choice([3, 5, 8, 9, 17, 33, 65]))
    m = int(rng.choice([3, 5, 8, 9, 17, 33]))
    q = int(rng.choice([1, 2, 5, 9]))
    k = int(rng.choice([1, 2, 4]))
    solver = rng.choice(["mu", "newton"])
    has_y = rng.rand() < 0.8
    sparse = rng.rand() < 0.3
    alpha = float(rng.choice([0.0, 0.05]))
    lay = rng.choice(["none", "rows", "cols", "grid"])
    nonneg, xl, yl, sr = True, "linear", "linear", 1.0
    smode = "auto"
    if solver == "newton":
        xl = rng.choice(["linear", "sigmoid"])
        yl = rng.choice(["linear", "sigmoid"])
        nonneg = bool(rng.rand() < 0.5)
        if xl == "sigmoid":
            # sparse sigmoid X rides the streamed chunked layout
            if sparse:
                smode = "chunked"
        elif rng.rand() < 0.3:
            sr = 0.5
    Xd = np.abs(rng.randn(n, m))
    if xl == "sigmoid":
        Xd = (Xd > np.median(Xd)).astype(float)
    X = sp.csr_matrix(Xd * (rng.rand(n, m) > 0.5)) if sparse else Xd
    if sparse and solver == "mu" and rng.rand() < 0.4:
        smode = "chunked"
    Y = None
    if has_y:
        Y = np.abs(rng.randn(m, q))
        if yl == "sigmoid":
            Y = (Y > np.median(Y)).astype(float)
    U0 = np.abs(rng.randn(n, k))
    V0 = np.abs(rng.randn(m, k))
    Z0 = np.abs(rng.randn(q, k)) if has_y else None
    kw = dict(n_components=k, solver=solver, tol=0.0, dtype="float64",
              alpha=alpha, l1_ratio=0.5, x_link=xl, y_link=yl,
              sparse_mode=smode, sg_sample_ratio=sr,
              U_non_negative=nonneg, V_non_negative=nonneg,
              Z_non_negative=nonneg, random_state=7)
    skw = {}
    if lay != "none":
        skw = dict(n_shards=(2, 4) if lay == "grid" else 8,
                   shard_layout=lay)
    desc = (f"[{t}] n={n} m={m} q={q} k={k} {solver} x={xl} y={yl} "
            f"nn={nonneg} sp={sparse} a={alpha} sr={sr} lay={lay}")
    try:
        base = CMF(max_iter=4, **kw, **skw)
        base.fit(X, Y, U=U0, V=V0, Z=Z0)

        # 1. device loop == host loop
        dev = CMF(max_iter=4, loop="device", **kw, **skw)
        dev.fit(X, Y, U=U0, V=V0, Z=Z0)
        hst = CMF(max_iter=4, loop="host", **kw, **skw)
        hst.fit(X, Y, U=U0, V=V0, Z=Z0)
        if not (close(dev.U_, hst.U_) and close(dev.V_, hst.V_)):
            print("LOOP-MISMATCH", desc,
                  np.max(np.abs(np.asarray(dev.U_) - np.asarray(hst.U_))),
                  flush=True)
            fails += 1
            continue

        # 2. warm-start resume (full-batch only)
        if sr >= 1.0:
            half = CMF(max_iter=2, **kw, **skw)
            half.fit(X, Y, U=U0, V=V0, Z=Z0)
            res = CMF(max_iter=2, **kw, **skw)
            res.fit(X, Y, U=np.asarray(half.U_), V=np.asarray(half.V_),
                    Z=None if Z0 is None else np.asarray(half.Z_))
            if not (close(res.U_, base.U_, 1e-7, 1e-10)
                    and close(res.V_, base.V_, 1e-7, 1e-10)):
                print("RESUME-MISMATCH", desc,
                      np.max(np.abs(np.asarray(res.U_)
                                    - np.asarray(base.U_))), flush=True)
                fails += 1
                continue

        # 3. eval-cadence independence at tol=0
        ev = CMF(max_iter=4, eval_every=3, **kw, **skw)
        ev.fit(X, Y, U=U0, V=V0, Z=Z0)
        if not (close(ev.U_, base.U_) and close(ev.V_, base.V_)):
            print("CADENCE-MISMATCH", desc,
                  np.max(np.abs(np.asarray(ev.U_) - np.asarray(base.U_))),
                  flush=True)
            fails += 1
            continue

        # 4. transform parity (pallas on/off; sharded vs single)
        n2 = int(rng.choice([2, 7, 13]))
        X2 = np.abs(rng.randn(n2, m))
        if xl == "sigmoid":
            X2 = (X2 > np.median(X2)).astype(float)
        U2 = np.abs(rng.randn(n2, k))
        tp = base.transform(X2, U=U2)
        base_x = CMF(max_iter=4, use_pallas=False, **kw, **skw)
        base_x.fit(X, Y, U=U0, V=V0, Z=Z0)
        tx = base_x.transform(X2, U=U2)
        if not close(tp, tx, 1e-7, 1e-9):
            print("TRANSFORM-PALLAS-MISMATCH", desc,
                  np.max(np.abs(np.asarray(tp) - np.asarray(tx))),
                  flush=True)
            fails += 1
            continue
        if lay != "none" and sr >= 1.0:
            single = CMF(max_iter=4, **kw)
            single.fit(X, Y, U=U0, V=V0, Z=Z0)
            ts = single.transform(X2, U=U2)
            if not close(tp, ts, 1e-6, 1e-8):
                print("TRANSFORM-SHARD-MISMATCH", desc,
                      np.max(np.abs(np.asarray(tp) - np.asarray(ts))),
                      flush=True)
                fails += 1
                continue
        print("ok", desc, flush=True)
    except Exception as e:  # noqa: BLE001
        print("ERROR", desc, "->", type(e).__name__, str(e)[:200],
              flush=True)
        fails += 1
print("FAILS:", fails, "/", N, flush=True)
