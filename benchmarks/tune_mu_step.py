"""Decompose the MU device-fit iteration cost at 20NG scale (real chip).

Measures, each as one jitted fori_loop dispatch (device_get of a small
output forces completion — block_until_ready does not block on the
remote axon platform):

  a) fused kernel only            — the X-pass roofline
  b) full MU step (U, Z, V)       — adds the small-factor updates
  c) run_mu device fit, tol=0     — adds eval blocks + while_loop + readback

Gap (b)−(a) = non-kernel step work; (c)−(b) = harness overhead.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pycmf_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from pycmf_tpu.ops.pallas.mu_fused import fused_mu_u_pass  # noqa: E402
from pycmf_tpu.solvers.common import (Coupled, SolverConfig,  # noqa: E402
                                      make_hyper)
from pycmf_tpu.solvers.mu import make_mu_step, run_mu  # noqa: E402
from pycmf_tpu.utils.validation import as_coupled  # noqa: E402

N, M, R, K = 30000, 11314, 20, 20
ITERS = 90


def main():
    rng = np.random.RandomState(0)
    # sparse host gen + as_coupled's device-side densify: only the ~7 MB of
    # nonzeros cross the tunnel; the dense (N, M) device array the kernels
    # stream is identical bandwidth-wise (zeros take no shortcut).
    # randint COO, not sp.random: the latter draws without replacement via
    # a full N*M permutation (~2.7 GB alloc — minutes on this microVM)
    nnz = 880_000
    gen = np.random.default_rng(0)
    Xh = sp.coo_matrix(
        (np.abs(gen.standard_normal(nnz)),
         (gen.integers(0, N, nnz), gen.integers(0, M, nnz))),
        shape=(N, M)).tocsr()
    Yh = np.abs(rng.randn(M, R))
    X = as_coupled(Xh, jnp.bfloat16, sparse_mode="dense")
    Y = as_coupled(Yh, jnp.bfloat16)
    U = jnp.asarray(np.abs(rng.randn(N, K)), jnp.float32)
    V = jnp.asarray(np.abs(rng.randn(M, K)), jnp.float32)
    Z = jnp.asarray(np.abs(rng.randn(R, K)), jnp.float32)
    hyper = make_hyper(dtype=jnp.float32)
    cfg = SolverConfig(use_pallas=True)
    print(f"backend={jax.default_backend()}", flush=True)

    def timeit(name, fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm + force
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {1e3 * np.median(ts) / ITERS:.2f} ms/iter "
              f"(total {np.median(ts):.3f}s)", flush=True)

    VtV = V.T @ V

    @jax.jit
    def kernel_only(X, U, V, VtV):
        def body(_, c):
            U, g = c
            Un, _, gu = fused_mu_u_pass(X, U, V, VtV, 0.0, 0.0, 1e-9)
            return Un, g + gu

        return jax.lax.fori_loop(0, ITERS, body,
                                 (U, jnp.zeros((K, K), jnp.float32)))

    timeit("a) fused kernel only", kernel_only, X.A, U, V, VtV)

    step = make_mu_step(cfg)

    @jax.jit
    def full_step(X, Y, U, V, Z):
        def body(_, fac):
            return step(X, Y, *fac, hyper)

        return jax.lax.fori_loop(0, ITERS, body, (U, V, Z))

    timeit("b) full MU step", full_step, X, Y, U, V, Z)

    def device_fit():
        return run_mu(X, Y, U, V, Z, cfg, hyper, max_iter=ITERS, tol=0.0,
                      eval_every=10, loop="device")

    timeit("c) device fit (tol=0)", device_fit)


if __name__ == "__main__":
    main()
