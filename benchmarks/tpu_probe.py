"""Staged TPU perf probe — run ONCE after the device link is confirmed live.

Dispatches are ordered smallest-risk-first with readback syncs between
stages (an in-flight pathological dispatch cannot be cancelled over the
device link — see memory notes). Prints one line per stage.

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
    t0 = time.perf_counter()
    say("devices:", jax.devices(), f"({time.perf_counter()-t0:.1f}s)")
    v = float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
    say("alive:", v)

    from pycmf_tpu.ops.matmul import matmul
    from pycmf_tpu.ops.pallas.mu_fused import fused_mu_u_pass

    rng = np.random.RandomState(0)

    # stage 1: tiny fused kernel — correctness + lowering
    n, m, k = 64, 48, 8
    X = jnp.asarray(np.abs(rng.rand(n, m)), jnp.float32)
    U = jnp.asarray(np.abs(rng.rand(n, k)), jnp.float32)
    V = jnp.asarray(np.abs(rng.rand(m, k)), jnp.float32)
    VtV = matmul(V.T, V)
    f = jax.jit(lambda X, U, V, VtV: fused_mu_u_pass(
        X, U, V, VtV, 0.1, 0.2, 1e-9, row_tile=32))
    t0 = time.perf_counter()
    Un, numV, gU = f(X, U, V, VtV)
    s = float(Un.sum())
    want = np.asarray(U) * np.asarray(matmul(X, V)) / (
        np.asarray(matmul(U, VtV)) + 0.1 + 0.2 * np.asarray(U) + 1e-9)
    ok = np.allclose(np.asarray(Un), want, rtol=3e-5)
    okv = np.allclose(np.asarray(numV), np.asarray(X).T @ want, rtol=3e-4,
                      atol=1e-3)
    say(f"S1 tiny fused: {time.perf_counter()-t0:.1f}s U_ok={ok} numV_ok={okv}")
    if not (ok and okv):
        say("ABORT: fused kernel incorrect on TPU")
        return

    # stage 2: 20NG-scale fused kernel, f32 and bf16 data — slope timing
    n, m, k = 30000, 11314, 20
    Xf = jnp.asarray(np.abs(rng.rand(n, m)).astype(np.float32))
    U = jnp.asarray(np.abs(rng.rand(n, k)), jnp.float32)
    V = jnp.asarray(np.abs(rng.rand(m, k)), jnp.float32)
    VtV = matmul(V.T, V)

    def time_reps(fn, *args, reps=10):
        out = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        s = float(out[0].sum())      # true sync
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        s = float(out[0].sum())
        return (time.perf_counter() - t0) / reps * 1000

    ff = jax.jit(lambda X, U, V, VtV: fused_mu_u_pass(
        X, U, V, VtV, 0.0, 0.0, 1e-9))
    ms_f32 = time_reps(ff, Xf, U, V, VtV)
    say(f"S2 fused 20NG f32: {ms_f32:.2f} ms/pass (incl one RPC / 10 reps)")

    Xb = Xf.astype(jnp.bfloat16)
    ms_bf16 = time_reps(ff, Xb, U, V, VtV)
    say(f"S2 fused 20NG bf16: {ms_bf16:.2f} ms/pass")

    # stage 3: full MU iteration slope — device loop, dense auto policy
    from pycmf_tpu.solvers.common import Coupled, SolverConfig, make_hyper
    from pycmf_tpu.solvers.mu import _make_block

    hyper = make_hyper(dtype=jnp.float32)
    Y = jnp.asarray(np.abs(rng.rand(m, 20)), jnp.float32)
    Z = jnp.asarray(np.abs(rng.rand(20, 20)), jnp.float32)

    for label, cfgk, Xuse in (("xla f32", dict(use_pallas=False), Xf),
                              ("fused f32", dict(use_pallas=True), Xf),
                              ("fused bf16", dict(use_pallas=True), Xb)):
        blk = _make_block(SolverConfig(**cfgk))
        st = (Coupled(Xuse), Coupled(Y), U, V, Z)
        st, l, _ = blk(st, hyper, None, 10)
        l = float(l)
        t0 = time.perf_counter()
        st, l, _ = blk(st, hyper, None, 10)
        l = float(l)
        t1 = time.perf_counter()
        st2, l2, _ = blk(st, hyper, None, 110)
        l2 = float(l2)
        t2 = time.perf_counter()
        per = ((t2 - t1) - (t1 - t0)) / 100 * 1000
        say(f"S3 MU iter 20NG [{label}]: {per:.2f} ms/iter "
            f"(b10 {1000*(t1-t0):.0f} ms, b110 {1000*(t2-t1):.0f} ms) "
            f"loss={l2:.4g}")

    say("probe done")


if __name__ == "__main__":
    main()
