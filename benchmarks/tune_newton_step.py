"""Decompose the Newton device-fit iteration cost at 20NG scale (real
chip) — same method as tune_mu_step.py (device_get forces completion):

  a) fused Newton U-pass kernel only     — the X-pass roofline
  b) full Newton step (U, Z, V)          — adds sigmoid-Y Z/V updates,
                                           batched solves, line searches
  c) run_newton device fit, tol=0        — adds eval blocks + harness
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

from pycmf_tpu.ops.pallas.newton_fused import (  # noqa: E402
    fused_newton_linear_u_pass)
from pycmf_tpu.solvers.common import SolverConfig, make_hyper  # noqa: E402
from pycmf_tpu.solvers.newton import make_newton_step, run_newton  # noqa: E402
from pycmf_tpu.utils.validation import as_coupled  # noqa: E402

N, M, R, K = 30000, 11314, 20, 20
ITERS = 50


def main():
    rng = np.random.RandomState(0)
    # randint-COO + device-side densify (see tune_mu_step.py): ~7 MB over
    # the tunnel instead of a 2.7 GB host alloc + 0.68 GB upload
    nnz = 880_000
    gen = np.random.default_rng(0)
    Xh = sp.coo_matrix(
        (np.abs(gen.standard_normal(nnz)),
         (gen.integers(0, N, nnz), gen.integers(0, M, nnz))),
        shape=(N, M)).tocsr()
    Yh = (rng.rand(M, R) > 0.5).astype(np.float64)
    X = as_coupled(Xh, jnp.bfloat16, sparse_mode="dense")
    Y = as_coupled(Yh, jnp.bfloat16)
    U = jnp.asarray(np.abs(rng.randn(N, K)), jnp.float32)
    V = jnp.asarray(np.abs(rng.randn(M, K)), jnp.float32)
    Z = jnp.asarray(np.abs(rng.randn(R, K)), jnp.float32)
    hyper = make_hyper(dtype=jnp.float32)
    cfg = SolverConfig(y_link="sigmoid", use_pallas=True)
    print(f"backend={jax.default_backend()}", flush=True)

    def timeit(name, fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {1e3 * np.median(ts) / ITERS:.2f} ms/iter "
              f"(total {np.median(ts):.3f}s)", flush=True)

    BtB = V.T @ V
    eye = jnp.eye(K, dtype=jnp.float32)
    H = BtB + (hyper.alpha * (1 - 0.0) + hyper.hessian_pertubation) * eye
    Hinv = jnp.linalg.inv(H)

    # sweep modes: "rt240 rt400 ..." row tiles, "tr0 tr4 tr8" trial counts
    sweep = sys.argv[1:]
    variants = [("default", None, 8)]
    if sweep:
        variants = []
        for s in sweep:
            if s.startswith("rt"):
                variants.append((s, int(s[2:]), 8))
            elif s.startswith("tr"):
                variants.append((s, None, int(s[2:])))
    for name, rt, tr in variants:
        @jax.jit
        def kernel_only(X, U, V, BtB, Hinv, rsq, rt=rt, tr=tr):
            def body(_, c):
                U, g = c
                Un, _, gu = fused_newton_linear_u_pass(
                    X, U, V, BtB, Hinv, rsq, 0.0, 0.0, trials=tr,
                    non_negative=True, row_tile=rt)
                return Un, g + gu

            return jax.lax.fori_loop(0, ITERS, body,
                                     (U, jnp.zeros((K, K), jnp.float32)))

        timeit(f"a) fused Newton U-pass only ({name})", kernel_only,
               X.A, U, V, BtB, Hinv, X.row_sq)
    if sweep:
        return

    step = make_newton_step(cfg)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def full_step(X, Y, U, V, Z):
        def body(i, fac):
            return step(X, Y, *fac, hyper, jax.random.fold_in(key, i))

        return jax.lax.fori_loop(0, ITERS, body, (U, V, Z))

    timeit("b) full Newton step", full_step, X, Y, U, V, Z)

    def device_fit():
        return run_newton(X, Y, U, V, Z, cfg, hyper, key, max_iter=ITERS,
                          tol=0.0, eval_every=5, loop="device")

    timeit("c) device fit (tol=0)", device_fit)


if __name__ == "__main__":
    main()
