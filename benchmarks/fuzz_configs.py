"""Randomized config fuzzer: pallas-vs-XLA and sharded-vs-single parity.

Draws random tiny problems across the full config space (the shared
generator in fuzz_common.py) and asserts use_pallas=True matches
use_pallas=False at f64 (rtol 1e-7) and, for full-batch fits, the
sharded run matches the single-device run (rtol 1e-6). Sampled fits
(sg_sample_ratio < 1) skip the sharded comparison: per-shard sample
keys are folded with the shard index BY DESIGN, so sharded stochastic
trajectories differ from single-device (host-vs-device loop parity is
what's guaranteed — see tests/test_sharded.py::TestShardedDeviceLoop).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python benchmarks/fuzz_configs.py <seed> <n_cases>

Round-3 results: 160 cases pre-refactor (seeds 0/7 + seed 3 with the
sigmoid-chunked combos), then 40 more (seed 0) through the shared
generator — 0 failures total.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from fuzz_common import draw_case
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
    c = draw_case(rng)
    kw = dict(max_iter=4, **c["kw"])
    desc = f"[{t}] {c['desc']}"
    try:
        mp = CMF(use_pallas=True, **kw)
        mp.fit(c["X"], c["Y"], U=c["U0"], V=c["V0"], Z=c["Z0"])
        mx = CMF(use_pallas=False, **kw)
        mx.fit(c["X"], c["Y"], U=c["U0"], V=c["V0"], Z=c["Z0"])
        ok = (np.allclose(mp.U_, mx.U_, rtol=1e-7, atol=1e-9)
              and np.allclose(mp.V_, mx.V_, rtol=1e-7, atol=1e-9))
        if not ok:
            print("PALLAS-MISMATCH", desc,
                  np.max(np.abs(np.asarray(mp.U_) - np.asarray(mx.U_))),
                  flush=True)
            fails += 1
            continue
        if c["lay"] != "none" and c["sr"] >= 1.0:
            ms = CMF(use_pallas=True, **c["skw"], **kw)
            ms.fit(c["X"], c["Y"], U=c["U0"], V=c["V0"], Z=c["Z0"])
            ok = (np.allclose(mp.U_, ms.U_, rtol=1e-6, atol=1e-8)
                  and np.allclose(mp.V_, ms.V_, rtol=1e-6, atol=1e-8))
            if not ok:
                print("SHARD-MISMATCH", desc,
                      np.max(np.abs(np.asarray(mp.U_) - np.asarray(ms.U_))),
                      flush=True)
                fails += 1
                continue
        print("ok", desc, flush=True)
    except Exception as e:  # noqa: BLE001
        print("ERROR", desc, "->", type(e).__name__, str(e)[:200],
              flush=True)
        fails += 1
print("FAILS:", fails, "/", N, flush=True)
