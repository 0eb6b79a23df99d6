"""Mesh construction helpers (SURVEY.md §7 stage 6).

CMF needs a single sharding axis (the baseline mandates row-sharding with
shared-V all-reduce over ICI — BASELINE.json config #5), so the mesh is 1-D.
On a real pod the devices are already ICI-ordered by jax.devices(); on the
CPU test backend the 8 virtual devices behave identically (SURVEY.md §4d).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

AXIS = "shards"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} "
                f"available ({[str(d) for d in devices]})")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))
