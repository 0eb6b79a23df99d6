"""Probe: per-iteration scatter-densify throughput on the real chip.

Measures the core loop of the planned chunked-streaming sparse path:
scatter a chunk's COO nonzeros into a zeroed (R, m) buffer, then do the
dense MXU work (Xc @ V, Xcᵀ @ Uc). Compares against the segment-sum SpMM
on the same data. Decides whether the chunked design clears the >=10x bar
(VERDICT round-2 item 1).
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from pycmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    # 20NG-ish scaled up: n=60k, m=30k => dense f32 7.2 GB (above threshold)
    n, m, k = 59 * 1024, 30_000, 20  # n divisible by the chunk size
    nnz = 6_000_000  # 0.33% density
    R = 1024         # chunk rows
    C = n // R
    rows = rng.randint(0, n, size=nnz).astype(np.int32)
    cols = rng.randint(0, m, size=nnz).astype(np.int32)
    vals = rng.rand(nnz).astype(np.float32)
    # sort by row, split into chunks, pad to max per-chunk nnz
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    chunk_id = rows // R
    counts = np.bincount(chunk_id, minlength=C)
    L = int(counts.max())
    print(f"chunks={C} R={R} L={L} (mean {counts.mean():.0f})", flush=True)
    d = np.zeros((C, L), np.float32)
    cc = np.zeros((C, L), np.int32)
    rl = np.zeros((C, L), np.int32)
    startq = np.zeros(C + 1, np.int64)
    np.cumsum(counts, out=startq[1:])
    for i in range(C):
        s, e = startq[i], startq[i + 1]
        d[i, : e - s] = vals[s:e]
        cc[i, : e - s] = cols[s:e]
        rl[i, : e - s] = rows[s:e] - i * R
        # padding: row 0, col 0, val 0 -> scatter-add of zero, harmless

    dd = jnp.asarray(d)
    ccd = jnp.asarray(cc)
    rld = jnp.asarray(rl)
    V = jnp.asarray(rng.rand(m, k).astype(np.float32))
    U = jnp.asarray(rng.rand(n, k).astype(np.float32))
    Uc = U.reshape(C, R, k)

    @jax.jit
    def chunked_pass(dd, ccd, rld, V, Uc):
        def body(carry, inp):
            numV, gramU = carry
            dv, cv, rv, uc = inp
            Xc = jnp.zeros((R, m), jnp.float32).at[rv, cv].add(dv)
            numU = Xc @ V                       # (R, k)
            numV = numV + Xc.T @ uc             # (m, k)
            gramU = gramU + uc.T @ uc
            return (numV, gramU), numU

        (numV, gramU), numU = jax.lax.scan(
            body, (jnp.zeros((m, k)), jnp.zeros((k, k))),
            (dd, ccd, rld, Uc))
        return numV, gramU, numU

    @jax.jit
    def scatter_only(dd, ccd, rld):
        def body(carry, inp):
            dv, cv, rv = inp
            Xc = jnp.zeros((R, m), jnp.float32).at[rv, cv].add(dv)
            return carry + jnp.sum(Xc[:, :8]), None

        out, _ = jax.lax.scan(body, jnp.zeros(()), (dd, ccd, rld))
        return out

    def timeit(f, *args, reps=3):
        out = f(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts), ts

    t, ts = timeit(scatter_only, dd, ccd, rld)
    print(f"scatter-only: {t * 1e3:.1f} ms  ({nnz / t / 1e9:.3f} Gnnz/s) "
          f"{[round(x * 1e3, 1) for x in ts]}", flush=True)
    t, ts = timeit(chunked_pass, dd, ccd, rld, V, Uc)
    gb = (n * m * 4 * 2) / 1e9  # two dense passes worth of traffic
    print(f"chunked full pass: {t * 1e3:.1f} ms  "
          f"({nnz / t / 1e9:.3f} Gnnz/s; dense-equiv {gb / t:.0f} GB/s) "
          f"{[round(x * 1e3, 1) for x in ts]}", flush=True)

    # segment-sum comparison (the current fallback)
    from pycmf_tpu.ops.sparse import CsrMatrix, spmm

    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
    Xcsr = CsrMatrix(jnp.asarray(vals), jnp.asarray(cols),
                     jnp.asarray(indptr.astype(np.int32)),
                     jnp.asarray(rows), jnp.asarray(np.sum(vals ** 2)),
                     (n, m))

    @jax.jit
    def seg_pass(Xcsr, V, U):
        return spmm(Xcsr, V), None

    try:
        t, ts = timeit(seg_pass, Xcsr, V, U, reps=2)
        print(f"segment-sum X@V only: {t * 1e3:.1f} ms  "
              f"({nnz / t / 1e9:.3f} Gnnz/s) "
              f"{[round(x * 1e3, 1) for x in ts]}", flush=True)
    except Exception as e:  # noqa: BLE001
        print("segment-sum failed:", repr(e)[:200], flush=True)


if __name__ == "__main__":
    main()
