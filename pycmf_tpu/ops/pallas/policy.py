"""Measured per-kernel enablement policy.

``use_pallas`` on the estimator/config means "allow Pallas kernels"; which
individual kernels actually dispatch on hardware is decided here, from
measurements on the target chip (docs/PERFORMANCE.md):

- fused_mu_u_pass : ON  — one X pass beats XLA's two-pass once the wrapper
  stopped re-padding X per iteration (2.4 vs 3.4 ms/iter at 20NG scale,
  bf16 data, round 2).
- batched_solve   : ON  — lane-dim batched Cholesky, ~3× over XLA batched LU
  (2.73 vs 185 ms at 30000×20×20).
- sigmoid_newton  : ON  — one-pass sigmoid G/H + one-pass all-trials φ:
  the XLA path materializes (n, m) predictions per trial; measured
  330 → 2.4-6 ms/iter at 20NG scale (round 3).
- mu_ratio        : OFF — XLA fuses the Gram-matmul + ratio epilogue itself;
  the standalone kernel only adds dispatch overhead.
- spmm_tiled      : OFF — the per-nonzero scalar-gather loop is unsafe at
  scale on the current Mosaic toolchain (multi-minute stalls).

The two OFF kernels (ops/pallas/mu_update.py, ops/pallas/spmm.py) ship in
the package deliberately: they are the interpreter-mode oracles the test
suite runs against on every backend, the documented negative results that
justify the current ON set (docs/PERFORMANCE.md), and the escape hatch if
a future Mosaic toolchain changes the trade-off (flip the env var to
re-measure without a code change).

Off-TPU every kernel is enabled: tests run them in interpreter mode against
the jnp oracles. Each kernel can be forced either way with
``PYCMF_TPU_KERNEL_<NAME>=0|1``.
"""
from __future__ import annotations

import os

import jax

_DEFAULTS_TPU = {
    "fused_mu_u_pass": True,
    "fused_newton_u_pass": True,
    "sigmoid_newton": True,
    "batched_solve": True,
    "mu_ratio": False,
    "spmm_tiled": False,
    "bell_spmm": True,
    # One-hot strip SpMM for SCATTERED sparsity (ops/pallas/onehot.py):
    # 7.5-10× the segment-sum floor at 20NG density (end-to-end MU
    # 2.5-2.7 vs ~20 ms/iter, probe_onehot_mu.py, round-5 sound-barrier
    # timing). Engaged when BlockEll refuses; below the densify
    # threshold the fused dense pass stays faster (1.6-2.4 ms/iter) —
    # this layout's regime is doesn't-fit scattered sparsity.
    "onehot_spmm": True,
}


def kernel_enabled(name: str) -> bool:
    env = os.environ.get(f"PYCMF_TPU_KERNEL_{name.upper()}")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "")
    if jax.default_backend() != "tpu":
        return True  # interpreter mode — exercise every kernel in tests
    return _DEFAULTS_TPU.get(name, False)
