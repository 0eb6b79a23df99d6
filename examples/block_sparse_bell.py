"""Block-structured sparse CMF beyond the densify threshold.

Demonstrates the sparse decision tree (docs/PERFORMANCE.md):
- inputs whose dense copy fits ~2 GB are densified (fastest path on TPU);
- bigger inputs with CLUSTERED sparsity ride the BlockEll MXU kernel
  (ops/pallas/bell.py): dense 128×128 blocks at nonzero positions, one
  MXU contraction per block — measured 79× the segment-sum path;
- bigger inputs with scattered sparsity should be row-sharded
  (n_shards=...) so each chip's local block densifies.

This example uses a small matrix with sparse_mode='csr' to force the
BlockEll path so it runs anywhere; at real scale 'auto' picks it only
above the densify threshold.
"""
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pycmf_tpu import CMF
from pycmf_tpu.utils.cache import enable_persistent_cache

# first compiles go through a slow remote queue on this dev
# link; the persistent cache turns re-runs into disk hits
enable_persistent_cache()  # noqa: E402


def block_sparse_matrix(p, q, block_frac, rng):
    """Random block-structured sparse matrix (128-aligned dense blocks)."""
    rows, cols, vals = [], [], []
    base = np.arange(128)
    for i in range(-(-p // 128)):
        for j in range(-(-q // 128)):
            if rng.rand() > block_frac:
                continue
            r0, c0 = i * 128, j * 128
            h, w = min(128, p - r0), min(128, q - c0)
            rr = np.repeat(base[:h] + r0, w)
            cc = np.tile(base[:w] + c0, h)
            rows.append(rr)
            cols.append(cc)
            vals.append(rng.rand(h * w))
    return sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(p, q))


def main():
    rng = np.random.RandomState(0)
    X = block_sparse_matrix(1024, 768, block_frac=0.15, rng=rng)
    Y = np.abs(rng.randn(768, 12))
    print(f"X {X.shape}, nnz={X.nnz} "
          f"({X.nnz / (X.shape[0] * X.shape[1]):.2%} dense)")

    model = CMF(n_components=16, solver="mu", sparse_mode="csr",
                use_pallas=True, max_iter=100, tol=1e-4, random_state=0)
    U, V, Z = model.fit_transform(X, Y)
    print(f"converged in {model.n_iter_} iters, "
          f"loss {model.loss_history_[0]:.4g} -> "
          f"{model.reconstruction_err_:.4g}")

    # the same matrix through the dense path agrees
    dense = CMF(n_components=16, solver="mu", sparse_mode="dense",
                max_iter=100, tol=1e-4, random_state=0)
    dense.fit(X, Y)
    gap = abs(dense.reconstruction_err_ - model.reconstruction_err_) \
        / dense.reconstruction_err_
    print(f"vs dense path: loss gap {gap:.2e}")


if __name__ == "__main__":
    main()
