"""Measure the streamed sigmoid-link Newton path at 20NG scale.

Compares ms/iter of sparse_mode='chunked' (scatter per chunk per pass)
against 'dense' (X resident in HBM) on the same binary X — the honest
cost of streaming when X *would* fit, which bounds the overhead paid
when it wouldn't. Same-process comparison (TPU timings drift ±30-100%
between minutes).

Usage: python -u benchmarks/probe_sigmoid_chunked.py
"""
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pycmf_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402

from pycmf_tpu import CMF  # noqa: E402

N, M, K = 30000, 11314, 20
rng = np.random.RandomState(0)
nnz = 873651
rows = rng.randint(0, N, nnz)
cols = rng.randint(0, M, nnz)
X = sp.csr_matrix((np.ones(nnz), (rows, cols)), shape=(N, M))
X.data[:] = 1.0
Y = (rng.rand(M, K) < 0.3).astype(float)
print(f"X {X.shape} nnz={X.nnz} ({X.nnz / N / M:.3%})", flush=True)

base = dict(n_components=K, solver="newton", x_link="sigmoid",
            y_link="sigmoid", random_state=0, tol=0.0,
            U_non_negative=False, V_non_negative=False,
            Z_non_negative=False, loop="device")


def run(tag, iters=10, **kw):
    m = CMF(max_iter=2, **base, **kw)
    t0 = time.perf_counter()
    m.fit(X, Y)
    print(f"{tag}: warm fit(2) {time.perf_counter() - t0:.1f}s "
          f"(compiles)", flush=True)
    best = np.inf
    for _ in range(2):
        m = CMF(max_iter=iters, **base, **kw)
        t0 = time.perf_counter()
        m.fit(X, Y)
        np.asarray(m.U_)
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)
    print(f"{tag}: {best * 1e3:.1f} ms/iter (min of 2x{iters}), "
          f"loss {m.reconstruction_err_:.6g}", flush=True)
    return best, m.reconstruction_err_


td, ld = run("dense  ", sparse_mode="dense", data_dtype="bfloat16")
tc, lc = run("chunked", sparse_mode="chunked", data_dtype="bfloat16")
print(f"chunked/dense: {tc / td:.2f}x; loss rel gap "
      f"{abs(lc - ld) / ld:.2e}", flush=True)


def marginal(tag, **kw):
    """Upload-free marginal: (t(25 iters) - t(5 iters)) / 20, min of 2."""
    best = np.inf
    for _ in range(2):
        ts = {}
        for it in (5, 25):
            m = CMF(max_iter=it, **base, **kw)
            t0 = time.perf_counter()
            m.fit(X, Y)
            np.asarray(m.U_)
            ts[it] = time.perf_counter() - t0
        best = min(best, (ts[25] - ts[5]) / 20)
    print(f"{tag} marginal: {best * 1e3:.1f} ms/iter "
          f"(diff quotient, min of 2)", flush=True)
    return best


if os.environ.get("PROBE_MARGINAL", "1") != "0":
    md = marginal("dense  ", sparse_mode="dense", data_dtype="bfloat16")
    mc = marginal("chunked", sparse_mode="chunked", data_dtype="bfloat16")
    print(f"marginal chunked/dense: {mc / md:.2f}x", flush=True)
