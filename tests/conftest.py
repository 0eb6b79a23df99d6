"""Test configuration (SURVEY.md §4 test plan).

Tests run on the CPU backend with 8 virtual devices so the sharded
(multi-chip) paths are exercised without a pod (SURVEY.md §4d), and with
x64 enabled so parity tests can run in float64 (SURVEY.md §7 hard part #1).
These env vars must be set before jax is imported anywhere.
"""
import os

# Never attempt the 20NG network download inside the suite — the no-network
# environment would burn ~35 s of retries per run (bench.py still attempts).
os.environ.setdefault("PYCMF_NO_DOWNLOAD", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

# NB: the JAX_PLATFORMS env var is ignored when the axon TPU plugin is
# present — force the CPU backend through the config API instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: the suite's wall time is dominated by
# shard_map/pallas compiles, which are identical across runs.
from pycmf_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def make_problem(rng, n=60, m=40, r=10, k=4, noise=0.01, non_negative=True,
                 sparse=False, binary_y=False):
    """Small synthetic CMF problem with known low-rank structure."""
    import scipy.sparse as sp

    Ut = rng.randn(n, k)
    Vt = rng.randn(m, k)
    Zt = rng.randn(r, k)
    if non_negative:
        Ut, Vt, Zt = np.abs(Ut), np.abs(Vt), np.abs(Zt)
    X = Ut @ Vt.T + noise * rng.randn(n, m)
    Y = Vt @ Zt.T + noise * rng.randn(m, r)
    if non_negative:
        X = np.abs(X)
        Y = np.abs(Y)
    if binary_y:
        Y = (1.0 / (1.0 + np.exp(-(Vt @ Zt.T))) > 0.5).astype(float)
    if sparse:
        Xd = X.copy()
        thresh = np.quantile(Xd, 0.7)
        Xd[Xd < thresh] = 0.0
        X = sp.csr_matrix(Xd)
    return X, Y


@pytest.fixture
def problem(rng):
    return make_problem(rng)
