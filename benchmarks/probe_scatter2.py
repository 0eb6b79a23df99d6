"""Probe 2: scatter variants + the dense-bf16 alternative at 7 GB scale.

Findings feed docs/PERFORMANCE.md's sparse decision tree:
- is a flat 1-D linear-index scatter faster than the 2-D form?
- what does ONE dense bf16 MU-style pass (X@V + XᵀU) cost at this scale
  (the densify-once-at-storage-dtype path) vs the per-iteration scatter?
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
    n, m, k = 59 * 1024, 30_000, 20   # dense f32 7.2 GB / bf16 3.6 GB
    nnz = 6_000_000
    rows = rng.randint(0, n, size=nnz).astype(np.int32)
    cols = rng.randint(0, m, size=nnz).astype(np.int32)
    vals = rng.rand(nnz).astype(np.float32)

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

    R = 1024
    C = n // R
    order = np.argsort(rows, kind="stable")
    rows_s, cols_s, vals_s = rows[order], cols[order], vals[order]
    counts = np.bincount(rows_s // R, minlength=C)
    L = int(counts.max())
    d = np.zeros((C, L), np.float32)
    lin = np.zeros((C, L), np.int32)   # linear index rl*m + cc
    start = np.zeros(C + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    for i in range(C):
        s, e = start[i], start[i + 1]
        d[i, : e - s] = vals_s[s:e]
        lin[i, : e - s] = ((rows_s[s:e] - i * R).astype(np.int64) * m
                           + cols_s[s:e]).astype(np.int32)
    dd, ld = jnp.asarray(d), jnp.asarray(lin)

    @jax.jit
    def scatter_1d(dd, ld):
        def body(carry, inp):
            dv, lv = inp
            Xf = jnp.zeros((R * m,), jnp.float32).at[lv].add(dv)
            return carry + jnp.sum(Xf[:8]), None

        out, _ = jax.lax.scan(body, jnp.zeros(()), (dd, ld))
        return out

    t, ts = timeit(scatter_1d, dd, ld)
    print(f"1-D linear scatter: {t * 1e3:.1f} ms ({nnz / t / 1e9:.3f} "
          f"Gnnz/s) {[round(x * 1e3, 1) for x in ts]}", flush=True)

    @jax.jit
    def scatter_1d_set(dd, ld):
        # positions are unique; padding uses index 0 with value 0 — but
        # .set of 0 would CLOBBER a real (0,0) value, so this variant is
        # only valid with pad index pointing at a dedicated dead slot.
        # Probe cost only.
        def body(carry, inp):
            dv, lv = inp
            Xf = jnp.zeros((R * m,), jnp.float32).at[lv].set(dv)
            return carry + jnp.sum(Xf[:8]), None

        out, _ = jax.lax.scan(body, jnp.zeros(()), (dd, ld))
        return out

    t, ts = timeit(scatter_1d_set, dd, ld)
    print(f"1-D linear scatter(.set): {t * 1e3:.1f} ms "
          f"({nnz / t / 1e9:.3f} Gnnz/s) "
          f"{[round(x * 1e3, 1) for x in ts]}", flush=True)

    # dense bf16 alternative: scatter ONCE (storage-dtype densify), then
    # time the per-iteration dense passes the fused path would run.
    rd = jnp.asarray(rows)
    cd = jnp.asarray(cols)
    vd = jnp.asarray(vals)

    @jax.jit
    def densify_once(rd, cd, vd):
        return jnp.zeros((n, m), jnp.bfloat16).at[rd, cd].add(
            vd.astype(jnp.bfloat16))

    t0 = time.perf_counter()
    Xb = densify_once(rd, cd, vd)
    np.asarray(jax.device_get(Xb[0, :4]))
    t_densify = time.perf_counter() - t0
    print(f"one-time bf16 densify: {t_densify * 1e3:.0f} ms", flush=True)

    V = jnp.asarray(rng.rand(m, k).astype(np.float32))
    U = jnp.asarray(rng.rand(n, k).astype(np.float32))

    from pycmf_tpu.ops.matmul import matmul

    @jax.jit
    def dense_mu_pass(Xb, U, V):
        numU = matmul(Xb, V)
        numV = matmul(Xb.T, U)
        return numU, numV

    t, ts = timeit(dense_mu_pass, Xb, U, V)
    gb = n * m * 2 * 2 / 1e9
    print(f"dense bf16 MU pass (X@V + XtU): {t * 1e3:.1f} ms "
          f"({gb / t:.0f} GB/s eff; {nnz / t / 1e9:.2f} Gnnz-equiv/s) "
          f"{[round(x * 1e3, 1) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
