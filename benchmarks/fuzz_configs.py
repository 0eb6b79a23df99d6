"""Randomized config fuzzer: pallas-vs-XLA and sharded-vs-single parity.

Draws random tiny problems across the full config space — shapes
(including n/m/q/k below one tile and not divisible by the mesh),
solver, links, non-negativity, elastic net, sparsity, sparse_mode,
sg_sample_ratio, and all four layouts (none/rows/cols/grid on 8 virtual
CPU devices) — and asserts use_pallas=True matches use_pallas=False at
f64 (rtol 1e-7) and, for full-batch fits, the sharded run matches the
single-device run (rtol 1e-6). Sampled fits (sg_sample_ratio < 1) skip
the sharded comparison: per-shard sample keys are folded with the shard
index BY DESIGN, so sharded stochastic trajectories differ from
single-device (host-vs-device loop parity is what's guaranteed — see
tests/test_sharded.py::TestShardedDeviceLoop).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/fuzz_configs.py <seed> <n_cases>

Round-3 result: 120 cases (seeds 0 and 7), 0 failures; +40 (seed 3,
with sigmoid-chunked combos on all layouts), 0 failures.
"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import itertools
import sys
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
for t in range(N):
    if t and t % 25 == 0:
        # every case compiles fresh executables (unique shapes/configs);
        # unbounded in-process accumulation exhausts LLVM JIT allocation
        # around ~145 mixed 8-device cases ("LLVM compilation error:
        # Cannot allocate memory", then a crash) — drop them periodically
        jax.clear_caches()
    n = int(rng.choice([3, 5, 8, 9, 17, 33, 65]))
    m = int(rng.choice([3, 5, 8, 9, 17, 33, 65]))
    q = int(rng.choice([1, 2, 5, 9]))
    k = int(rng.choice([1, 2, 4]))
    solver = rng.choice(["mu", "newton"])
    has_y = rng.rand() < 0.8
    sparse = rng.rand() < 0.3
    smode = "auto"
    alpha = float(rng.choice([0.0, 0.05]))
    layout, ns = ("rows", 1), ("rows", 1)
    lay = rng.choice(["none", "rows", "cols", "grid"])
    nonneg = True
    xl = yl = "linear"
    sr = 1.0
    if solver == "newton":
        xl = rng.choice(["linear", "sigmoid"])
        yl = rng.choice(["linear", "sigmoid"])
        nonneg = bool(rng.rand() < 0.5)
        if xl == "sigmoid":
            # sparse sigmoid X rides the streamed chunked layout
            # (dense-mode parity is covered by the link tests)
            if sparse:
                smode = "chunked"
        elif rng.rand() < 0.3:
            sr = 0.5
    Xd = np.abs(rng.randn(n, m))
    if xl == "sigmoid":
        Xd = (Xd > np.median(Xd)).astype(float)
    if sparse:
        X = sp.csr_matrix(Xd * (rng.rand(n, m) > 0.5))
        if solver == "mu" and rng.rand() < 0.4:
            smode = "chunked"
    else:
        X = Xd
    Y = np.abs(rng.randn(m, q)) if has_y else None
    if has_y and yl == "sigmoid":
        Y = (Y > np.median(Y)).astype(float)
    U0 = np.abs(rng.randn(n, k))
    V0 = np.abs(rng.randn(m, k))
    Z0 = np.abs(rng.randn(q, k)) if has_y else None
    kw = dict(n_components=k, solver=solver, max_iter=4, tol=0.0,
              dtype="float64", alpha=alpha, l1_ratio=0.5,
              sparse_mode=smode,
              x_link=xl, y_link=yl, sg_sample_ratio=sr,
              U_non_negative=nonneg, V_non_negative=nonneg,
              Z_non_negative=nonneg)
    desc = (f"[{t}] n={n} m={m} q={q} k={k} {solver} x={xl} y={yl} "
            f"nn={nonneg} sp={sparse} a={alpha} sr={sr} lay={lay}")
    try:
        mp = CMF(use_pallas=True, **kw)
        mp.fit(X, Y, U=U0, V=V0, Z=Z0)
        mx = CMF(use_pallas=False, **kw)
        mx.fit(X, Y, U=U0, V=V0, Z=Z0)
        ok = (np.allclose(mp.U_, mx.U_, rtol=1e-7, atol=1e-9)
              and np.allclose(mp.V_, mx.V_, rtol=1e-7, atol=1e-9))
        if not ok:
            print("PALLAS-MISMATCH", desc,
                  np.max(np.abs(np.asarray(mp.U_) - np.asarray(mx.U_))),
                  flush=True)
            fails += 1
            continue
        if lay != "none" and sr >= 1.0:
            nsv = (2, 4) if lay == "grid" else 8
            ms = CMF(use_pallas=True, n_shards=nsv, shard_layout=lay, **kw)
            ms.fit(X, Y, U=U0, V=V0, Z=Z0)
            ok = (np.allclose(mp.U_, ms.U_, rtol=1e-6, atol=1e-8)
                  and np.allclose(mp.V_, ms.V_, rtol=1e-6, atol=1e-8))
            if not ok:
                print("SHARD-MISMATCH", desc,
                      np.max(np.abs(np.asarray(mp.U_) - np.asarray(ms.U_))),
                      flush=True)
                fails += 1
                continue
        print("ok", desc, flush=True)
    except ValueError as e:
        print("ERROR", desc, "->", str(e)[:200], flush=True)
        fails += 1
    except Exception as e:  # noqa: BLE001
        print("ERROR", desc, "->", type(e).__name__, str(e)[:200],
              flush=True)
        fails += 1
print("FAILS:", fails, "/", N, flush=True)
