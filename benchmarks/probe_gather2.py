"""Probe 2: Mosaic dynamic_gather forms. The first probe's jnp.take /
B[idx] failed with 'Shape mismatch in input, indices and output' —
suggesting Mosaic's gather lowering requires indices shaped LIKE the
source (per-lane sublane selection, tpu.DynamicGatherOp). Probe:

  A. take_along_axis(B (C,K), idx (C,K), axis=0)  — same-shape sublane
  B. same but idx broadcast from (C,1)             — per-row selection
  C. output rows E != C via padded idx             — E-row gather from C
  D. lane-axis gather take_along_axis(axis=1)
Rates reported per gathered ROW (K lanes each).
"""
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

C, K = 512, 128
REPS = 100


def bench(fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def report(name, sec, rows, ok, extra=""):
    if not ok:
        print(f"{name:34s}  UNSUPPORTED {extra}")
        return
    per = sec / REPS / rows
    print(f"{name:34s}  {sec*1e3:8.2f} ms  {per*1e9:7.2f} ns/row  "
          f"{1.0/per/1e9:6.2f} Grow/s  {extra}")


def probe(name, rows, make_kernel, make_args, ref_fn):
    @jax.jit
    def call(*args):
        return pl.pallas_call(
            make_kernel(),
            out_shape=jax.ShapeDtypeStruct((rows, K), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)

    args = make_args()
    try:
        out = call(*args)
        ref = ref_fn(*[np.asarray(a) for a in args]) * REPS
        err = float(np.max(np.abs(np.asarray(out) - ref)))
        sec = bench(call, *args)
        report(name, sec, rows, True, f"maxerr={err:.1e}")
    except Exception as e:  # noqa: BLE001
        report(name, 0.0, rows, False,
               f"({type(e).__name__}: {str(e)[:110]})")


rng = np.random.RandomState(0)
B_np = rng.randn(C, K).astype(np.float32)
idx_np = rng.randint(0, C, size=(C,)).astype(np.int32)


def k_same_shape():
    def kernel(idx_ref, b_ref, out_ref):
        def body(i, acc):
            g = jnp.take_along_axis(b_ref[:], idx_ref[:], axis=0)
            return acc + g

        out_ref[:] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((C, K), jnp.float32))

    return kernel


probe("A take_along_axis idx(C,K) ax0", C, k_same_shape,
      lambda: (jnp.asarray(np.broadcast_to(idx_np[:, None], (C, K)).copy()),
               jnp.asarray(B_np)),
      lambda idx, b: np.take_along_axis(b, idx, axis=0))


def k_bcast():
    def kernel(idx_ref, b_ref, out_ref):
        def body(i, acc):
            idx2 = jnp.broadcast_to(idx_ref[:][:, :1], (C, K))
            g = jnp.take_along_axis(b_ref[:], idx2, axis=0)
            return acc + g

        out_ref[:] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((C, K), jnp.float32))

    return kernel


probe("B idx (C,1) broadcast in-kernel", C, k_bcast,
      lambda: (jnp.asarray(idx_np[:, None]), jnp.asarray(B_np)),
      lambda idx, b: np.take_along_axis(
          b, np.broadcast_to(idx, (C, K)), axis=0))

E = 2048


def k_bigE():
    def kernel(idx_ref, b_ref, out_ref):
        def body(i, acc):
            idx2 = jnp.broadcast_to(idx_ref[:][:, :1], (E, K))
            # source padded to E rows on host; idx < C selects real rows
            g = jnp.take_along_axis(b_ref[:], idx2, axis=0)
            return acc + g

        out_ref[:] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((E, K), jnp.float32))

    return kernel


idxE_np = rng.randint(0, C, size=(E,)).astype(np.int32)
BE_np = np.zeros((E, K), np.float32)
BE_np[:C] = B_np
probe("C E=2048 rows from C=512 (padded)", E, k_bigE,
      lambda: (jnp.asarray(idxE_np[:, None]), jnp.asarray(BE_np)),
      lambda idx, b: np.take_along_axis(
          b, np.broadcast_to(idx, (E, K)), axis=0))


def k_lane():
    def kernel(idx_ref, b_ref, out_ref):
        def body(i, acc):
            g = jnp.take_along_axis(b_ref[:], idx_ref[:], axis=1)
            return acc + g

        out_ref[:] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((C, K), jnp.float32))

    return kernel


lidx_np = rng.randint(0, K, size=(C, K)).astype(np.int32)
probe("D lane-axis take_along_axis ax1", C, k_lane,
      lambda: (jnp.asarray(lidx_np), jnp.asarray(B_np)),
      lambda idx, b: np.take_along_axis(b, idx, axis=1))

if __name__ == "__main__":
    pass
