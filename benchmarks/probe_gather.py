"""Probe: does Mosaic support dynamic gather inside a Pallas TPU kernel,
and how fast is it? Decides the scattered-sparsity SpMM design
(VERDICT r03 next #2): a working sublane gather (rows of a VMEM-resident
B panel selected by an int vector) makes a per-nnz formulation viable;
otherwise the kernel must express gather/scatter as one-hot MXU matmuls.

Variants probed (each wrapped in try/except — unsupported lowerings are
a RESULT, not a failure):
  A. jnp.take(B, idx, axis=0)       — sublane dynamic gather
  B. B[idx]                          — advanced indexing
  C. one-hot matmul gather           — (E, C) one-hot @ (C, k) panel
  D. jax.lax.fori_loop per-row copy  — per-element dynamic slice floor
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    from pycmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
except Exception:
    pass

C, K, E = 512, 128, 4096     # panel rows, panel lanes, gathered rows
REPS = 100                   # gathers per kernel call (amortize dispatch)


def bench(fn, *args, n=3):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def report(name, sec, ok, extra=""):
    if not ok:
        print(f"{name:28s}  UNSUPPORTED {extra}")
        return
    per = sec / REPS / E
    print(f"{name:28s}  {sec*1e3:8.2f} ms  {per*1e9:7.2f} ns/row  "
          f"{1.0/per/1e9:6.2f} Grow/s  {extra}")


def run_variant(name, gather_expr):
    def kernel(idx_ref, b_ref, out_ref):
        def body(i, acc):
            g = gather_expr(b_ref[:], idx_ref[:])        # (E, K)
            return acc + g

        out_ref[:] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((E, K), jnp.float32))

    @jax.jit
    def call(idx, B):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((E, K), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, B)

    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, C, size=(E,)), jnp.int32)
    B = jnp.asarray(rng.randn(C, K), jnp.float32)
    try:
        out = call(idx, B)
        ref = np.asarray(B)[np.asarray(idx)] * REPS
        err = float(np.max(np.abs(np.asarray(out) - ref)))
        sec = bench(call, idx, B)
        report(name, sec, True, f"maxerr={err:.1e}")
        return sec
    except Exception as e:  # noqa: BLE001
        report(name, 0.0, False, f"({type(e).__name__}: {str(e)[:120]})")
        return None


def run_onehot():
    def kernel(idx_ref, b_ref, out_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (E, C), 1)

        def body(i, acc):
            oh = (idx_ref[:][:, None] == iota).astype(jnp.bfloat16)
            g = jax.lax.dot_general(
                oh, b_ref[:].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + g

        out_ref[:] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((E, K), jnp.float32))

    @jax.jit
    def call(idx, B):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((E, K), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, B)

    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, C, size=(E,)), jnp.int32)
    B = jnp.asarray(rng.randn(C, K), jnp.float32)
    try:
        out = call(idx, B)
        ref = np.asarray(B)[np.asarray(idx)] * REPS
        err = float(np.max(np.abs(np.asarray(out) - ref)))
        sec = bench(call, idx, B)
        report("C one-hot MXU gather", sec, True, f"maxerr={err:.1e}")
    except Exception as e:  # noqa: BLE001
        report("C one-hot MXU gather", 0.0, False,
               f"({type(e).__name__}: {str(e)[:120]})")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  C={C} K={K} E={E} reps={REPS}")
    run_variant("A jnp.take axis=0", lambda b, i: jnp.take(b, i, axis=0))
    run_variant("B advanced indexing", lambda b, i: b[i])
    run_onehot()
