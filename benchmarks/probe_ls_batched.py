"""A/B probe: fused Newton U-pass line search — unrolled vs batched.

The shipped kernel (ops/pallas/newton_fused.py) evaluates the 8-trial
backtracking search as a static unroll: 8 separate (R,k)@(k,k) MXU
contractions plus VPU reductions, serialized. Hypothesis (round-3 memory
note): stacking the candidates into one (R*T, k) operand turns that into
ONE contraction with 8x the rows — better MXU utilization, fewer
serialized VPU steps.

Both variants run in THIS process back to back (TPU timing drifts
±30-100% between minutes — only same-process comparisons are valid),
at the Newton bench shapes (20NG densified: 30000x11314 bf16, k=20),
and results are checked to match exactly (same semantics, same order
of floating-point ops per row).

Usage: python -u benchmarks/probe_ls_batched.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from pycmf_tpu.ops.matmul import FP8_DTYPES  # noqa: E402
from pycmf_tpu.ops.pallas.mu_fused import _interp, _pick_row_tile  # noqa: E402
from pycmf_tpu.utils.cache import enable_persistent_cache  # noqa: E402


def _kernel(scal_ref, nv_ref, x_ref, u_ref, vtx_ref, btb_ref, hinv_ref,
            rsq_ref, unew_ref, numvt_ref, gramu_ref, numvt_acc, gramu_acc,
            *, trials: int, non_negative: bool, batched_ls: bool):
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)
    l1 = scal_ref[0, 0]
    l2 = scal_ref[0, 1]

    x = x_ref[:]
    if x.dtype in FP8_DTYPES:
        x = x.astype(jnp.bfloat16)
    u = u_ref[:]
    btb = btb_ref[:]
    acc = u.dtype

    db = jax.lax.dot_general(
        x, vtx_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=acc)
    g = jnp.dot(u, btb, preferred_element_type=acc) - db \
        + l1 * jnp.sign(u) + l2 * u
    d = jnp.dot(g, hinv_ref[:], preferred_element_type=acc)

    def project(mc):
        return jnp.maximum(mc, 0.0) if non_negative else mc

    rs = rsq_ref[:, 0]

    def phi(mc):
        quad = jnp.sum(
            jnp.dot(mc, btb, preferred_element_type=acc) * mc, axis=1)
        lin = jnp.sum(db * mc, axis=1)
        pen = l1 * jnp.sum(jnp.abs(mc), axis=1) \
            + 0.5 * l2 * jnp.sum(mc * mc, axis=1)
        return pen + 0.5 * (rs - 2.0 * lin + quad)

    if not batched_ls:
        phi0 = phi(u)
        best = u
        taken = jnp.zeros(phi0.shape, jnp.bool_)
        for j in range(trials):
            mc = project(u - (0.5 ** j) * d)
            take = jnp.logical_and(jnp.logical_not(taken), phi(mc) < phi0)
            best = jnp.where(take[:, None], mc, best)
            taken = jnp.logical_or(taken, take)
        unew = best
    else:
        phi0 = phi(u)
        # (T, R, k) candidates; one contraction over k for ALL trials
        # (scalar step constants only — pallas rejects captured arrays)
        cand = jnp.stack(
            [project(u - (0.5 ** j) * d) for j in range(trials)], axis=0)
        q = jax.lax.dot_general(
            cand, btb, (((2,), (0,)), ((), ())), preferred_element_type=acc)
        quad = jnp.sum(q * cand, axis=2)                       # (T, R)
        lin = jnp.sum(db[None, :, :] * cand, axis=2)           # (T, R)
        pen = l1 * jnp.sum(jnp.abs(cand), axis=2) \
            + 0.5 * l2 * jnp.sum(cand * cand, axis=2)
        phis = pen + 0.5 * (rs[None, :] - 2.0 * lin + quad)    # (T, R)
        dec = phis < phi0[None, :]
        # first-accepted selection, unrolled (cumsum/gather don't lower
        # in Mosaic); the expensive phi part above stays batched
        unew = u
        taken = jnp.zeros(phi0.shape, jnp.bool_)
        for j in range(trials):
            take = jnp.logical_and(dec[j], jnp.logical_not(taken))
            unew = jnp.where(take[:, None], cand[j], unew)
            taken = jnp.logical_or(taken, take)

    unew_ref[:] = unew

    @pl.when(i == 0)
    def _init():
        numvt_acc[:] = jnp.zeros_like(numvt_acc)
        gramu_acc[:] = jnp.zeros_like(gramu_acc)

    def accumulate(unew_f, x_t):
        numvt_acc[:] += jax.lax.dot_general(
            unew_f.astype(x.dtype), x_t, (((0,), (0,)), ((), ())),
            preferred_element_type=acc)
        gramu_acc[:] += jax.lax.dot_general(
            unew_f, unew_f, (((0,), (0,)), ((), ())),
            preferred_element_type=acc)

    @pl.when(i < n_prog - 1)
    def _acc_full():
        accumulate(unew, x)

    @pl.when(i == n_prog - 1)
    def _acc_edge():
        rows = i * x.shape[0] + jax.lax.broadcasted_iota(
            jnp.int32, (x.shape[0], 1), 0)
        valid = rows < nv_ref[0, 0]
        accumulate(jnp.where(valid, unew, 0),
                   jnp.where(valid, x, jnp.zeros_like(x)))
        numvt_ref[:] = numvt_acc[:]
        gramu_ref[:] = gramu_acc[:]


def run_pass(X, U, V, BtB, Hinv, row_sq, l1, l2, *, trials, non_negative,
             batched_ls):
    n, m = X.shape
    k = U.shape[1]
    fdtype = U.dtype
    row_tile = _pick_row_tile(n, m, X.dtype.itemsize)
    nb = -(-n // row_tile)
    vt_dt = jnp.bfloat16 if X.dtype in FP8_DTYPES else X.dtype
    Vtx = V.T.astype(vt_dt)
    rsq = row_sq.astype(fdtype).reshape(n, 1)
    scal = jnp.stack([jnp.asarray(l1, fdtype),
                      jnp.asarray(l2, fdtype)]).reshape(1, 2)
    nv = jnp.asarray(n, jnp.int32).reshape(1, 1)
    acc_dt = jnp.float32

    return pl.pallas_call(
        partial(_kernel, trials=int(trials),
                non_negative=bool(non_negative),
                batched_ls=bool(batched_ls)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((row_tile, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((row_tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), fdtype),
            jax.ShapeDtypeStruct((k, m), acc_dt),
            jax.ShapeDtypeStruct((k, k), acc_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, m), acc_dt),
            pltpu.VMEM((k, k), acc_dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * m * k,
            bytes_accessed=n * m * X.dtype.itemsize * 2,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interp(),
    )(scal, nv, X, U, Vtx, BtB, Hinv, rsq)


def main():
    enable_persistent_cache()
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    n, m, k = 30000, 11314, 20
    # generate X ON DEVICE (the tunnel runs ~1-6 MB/s; a 0.68 GB upload
    # takes 10+ minutes — only the small factors travel by host)
    key = jax.random.PRNGKey(0)
    Xd = jnp.abs(jax.random.normal(key, (n, m), jnp.bfloat16))
    U = jnp.asarray(np.abs(rng.randn(n, k)), jnp.float32)
    V = jnp.asarray(np.abs(rng.randn(m, k)), jnp.float32)
    BtB = V.T @ V
    Hinv = jnp.linalg.inv(BtB + 0.2 * jnp.eye(k))
    row_sq = jnp.sum(Xd.astype(jnp.float32) ** 2, axis=1)
    kw = dict(trials=8, non_negative=True)

    # arrays MUST be jit ARGUMENTS: a closure constant is embedded in the
    # HLO and shipped whole to the remote compiler (observed: HTTP 413
    # "length limit exceeded" after minutes of tunnel upload)
    f_unroll = jax.jit(partial(run_pass, batched_ls=False, **kw))
    f_batch = jax.jit(partial(run_pass, batched_ls=True, **kw))
    args = (Xd, U, V, BtB, Hinv, row_sq, 0.01, 0.01)

    # correctness first
    print("compiling unrolled...", flush=True)
    t0 = time.perf_counter()
    a = f_unroll(*args)
    np.asarray(a[2])
    print(f"unrolled compiled+ran in {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    b = f_batch(*args)
    np.asarray(b[2])
    print(f"batched  compiled+ran in {time.perf_counter() - t0:.1f}s",
          flush=True)
    ua, ub = np.asarray(a[0]), np.asarray(b[0])
    print("max |dU|:", float(np.max(np.abs(ua - ub))), flush=True)
    assert np.allclose(ua, ub, rtol=1e-6, atol=1e-6), "variants disagree"

    def bench(f, tag, iters=30):
        np.asarray(f(*args)[2])  # warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*args)
            np.asarray(out[2])  # force completion (block_until_ready lies)
            dt = (time.perf_counter() - t0) / iters
            best = min(best, dt)
        print(f"{tag}: {best * 1e3:.3f} ms/pass (best of 3x{iters})",
              flush=True)
        return best

    t_u = bench(f_unroll, "unrolled ls")
    t_b = bench(f_batch, "batched  ls")
    t_u2 = bench(f_unroll, "unrolled ls (again)")
    print(f"batched/unrolled: {t_b / min(t_u, t_u2):.3f}", flush=True)


if __name__ == "__main__":
    main()
