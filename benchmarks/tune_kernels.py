"""Consolidated kernel tuning sweep (real chip, ONE data upload).

Times, at 20NG-like dense scale (N×11314):
  a) fused MU U-pass: bf16 vs fp8 X, a few row tiles
  b) fused Newton U-pass: line-search trial counts, row tiles, fp8

Each timing chains ITERS kernel calls in one jit and device_gets a tiny
output (block_until_ready does not block on the axon platform). Data is
converted to the device dtype IN NUMPY first so the tunnel moves the
small representation, and every phase prints (diagnosing a slow tunnel).

Usage: python -u benchmarks/tune_kernels.py [N]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pycmf_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import ml_dtypes  # noqa: E402

from pycmf_tpu.ops.pallas.mu_fused import fused_mu_u_pass  # noqa: E402
from pycmf_tpu.ops.pallas.newton_fused import (  # noqa: E402
    fused_newton_linear_u_pass)

M, K = 11314, 20
ITERS = 50


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    log(f"backend={jax.default_backend()} N={N} M={M}")
    t0 = time.perf_counter()
    # chunked f32 generation with the fast PCG64 Generator: one big f64
    # randn allocates/zeroes ~5.4 GB, which takes tens of minutes under
    # this microVM's huge-page zeroing — measured, not hypothetical.
    gen = np.random.default_rng(0)
    Xh = np.empty((N, M), np.float32)
    for lo in range(0, N, 2000):
        hi = min(lo + 2000, N)
        Xh[lo:hi] = np.abs(gen.standard_normal((hi - lo, M),
                                               dtype=np.float32))
        if lo % 10000 == 0:
            log(f"  gen rows {lo}..{hi}")
    log(f"host data gen {time.perf_counter() - t0:.1f}s")
    rng = np.random.RandomState(0)

    t0 = time.perf_counter()
    X16 = jnp.asarray(Xh.astype(ml_dtypes.bfloat16))
    np.asarray(jnp.sum(X16[:1, :8]))
    log(f"bf16 upload ({X16.size * 2 / 1e9:.2f} GB) "
        f"{time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    X8 = jnp.asarray(Xh.astype(ml_dtypes.float8_e4m3fn))
    np.asarray(jnp.sum(X8[:1, :8].astype(jnp.float32)))
    log(f"fp8 upload ({X8.size / 1e9:.2f} GB) "
        f"{time.perf_counter() - t0:.1f}s")

    U = jnp.asarray(np.abs(rng.randn(N, K)), jnp.float32)
    V = jnp.asarray(np.abs(rng.randn(M, K)), jnp.float32)
    VtV = V.T @ V
    # einsum on the f32 array: no ~5.4 GB of f64 temporaries (see the
    # allocation note above — timing fidelity doesn't need f64 norms)
    rsq = jnp.asarray(np.einsum("ij,ij->i", Xh, Xh), jnp.float32)
    Hinv = jnp.linalg.inv(VtV + 0.2 * jnp.eye(K, dtype=jnp.float32))

    def timeit(name, fn, *args):
        t0 = time.perf_counter()
        try:
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
            return None
        log(f"{name}: compile+run {time.perf_counter() - t0:.1f}s")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * np.median(ts) / ITERS
        log(f"{name}: {ms:.2f} ms/iter")
        return ms

    def mu_chain(rt):
        @jax.jit
        def run(X, U, V, VtV):
            def body(_, carry):
                U, g = carry
                Un, _, gu = fused_mu_u_pass(X, U, V, VtV, 0.0, 0.0, 1e-9,
                                            row_tile=rt)
                return Un, g + gu

            return jax.lax.fori_loop(
                0, ITERS, body, (U, jnp.zeros((K, K), jnp.float32)))

        return run

    def newton_chain(rt, trials):
        @jax.jit
        def run(X, U, V, VtV, Hinv, rsq):
            def body(_, carry):
                U, g = carry
                Un, _, gu = fused_newton_linear_u_pass(
                    X, U, V, VtV, Hinv, rsq, 0.0, 0.0, trials=trials,
                    non_negative=True, row_tile=rt)
                return Un, g + gu

            return jax.lax.fori_loop(
                0, ITERS, body, (U, jnp.zeros((K, K), jnp.float32)))

        return run

    for rt in (None, 800):
        timeit(f"MU bf16 rt={rt}", mu_chain(rt), X16, U, V, VtV)
    for rt in (None, 1600):
        timeit(f"MU fp8  rt={rt}", mu_chain(rt), X8, U, V, VtV)
    for tr in (8, 4, 0):
        timeit(f"Newton bf16 tr={tr} rt=None", newton_chain(None, tr),
               X16, U, V, VtV, Hinv, rsq)
    for rt in (400, 1200):
        timeit(f"Newton bf16 tr=8 rt={rt}", newton_chain(rt, 8),
               X16, U, V, VtV, Hinv, rsq)
    timeit("Newton fp8  tr=8 rt=None", newton_chain(None, 8),
           X8, U, V, VtV, Hinv, rsq)
    log("DONE")


if __name__ == "__main__":
    main()
