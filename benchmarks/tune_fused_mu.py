"""Row-tile tuning sweep for the fused MU U-pass kernel (real chip).

The kernel is HBM-bound on the single X pass (bf16 roofline ~1.7 ms at
20NG scale, ~400 GB/s effective); grid-step overhead is the measured gap
(docs/PERFORMANCE.md). This sweep times fused_mu_u_pass at 20NG shapes
for a few row tiles that divide n exactly (no padding pass).

Usage: python benchmarks/tune_fused_mu.py [fp8|bf16|f32] [row_tile ...]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pycmf_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from pycmf_tpu.ops.pallas.mu_fused import fused_mu_u_pass  # noqa: E402

N, M, K = 30000, 11314, 20
_DTYPES = {"fp8": jnp.float8_e4m3fn, "bf16": jnp.bfloat16,
           "f32": jnp.float32}


def main():
    args = sys.argv[1:]
    dt = jnp.bfloat16
    if args and args[0] in _DTYPES:
        dt = _DTYPES[args.pop(0)]
    tiles = [int(t) for t in args] or [240, 400, 1200]
    rng = np.random.RandomState(0)
    X = jnp.asarray(np.abs(rng.randn(N, M)), dtype=dt)
    U = jnp.asarray(np.abs(rng.randn(N, K)), dtype=jnp.float32)
    V = jnp.asarray(np.abs(rng.randn(M, K)), dtype=jnp.float32)
    VtV = V.T @ V
    print(f"backend={jax.default_backend()} X={X.shape} {X.dtype}",
          flush=True)

    ITERS = 50

    for rt in tiles:
        if N % rt:
            print(f"rt={rt}: skipped (does not divide n)", flush=True)
            continue

        # Chain ITERS kernel calls in one jit (the device-resident fit
        # pattern): one dispatch, and device_get of the tiny k×k output
        # forces completion — block_until_ready alone does not block on
        # the remote axon platform (measured: it returns in ~0.05 ms).
        @jax.jit
        def run(X, U, V, VtV, rt=rt):
            def body(_, carry):
                U, g = carry
                Un, _, gu = fused_mu_u_pass(X, U, V, VtV, 0.0, 0.0, 1e-9,
                                            row_tile=rt)
                return Un, g + gu

            return jax.lax.fori_loop(
                0, ITERS, body, (U, jnp.zeros((K, K), jnp.float32)))

        try:
            _, g = run(X, U, V, VtV)
            np.asarray(g)  # warmup + force
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(f"rt={rt}: FAILED {type(e).__name__}", flush=True)
            continue
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, g = run(X, U, V, VtV)
            np.asarray(g)
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * np.median(ts) / ITERS
        gbps = X.size * X.dtype.itemsize / (np.median(ts) / ITERS) / 1e9
        print(f"rt={rt}: {ms:.2f} ms/pass  ({gbps:.0f} GB/s effective)",
              flush=True)


if __name__ == "__main__":
    main()
