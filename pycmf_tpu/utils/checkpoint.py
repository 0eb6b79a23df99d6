"""Checkpoint / resume (SURVEY.md §5).

The reference has no checkpointing, but its solvers accept initial factors,
which is implicit warm-start; the build makes that explicit: snapshots are
plain ``.npz`` files holding (U, V, Z, n_iter, loss history, params) and
``fit(X, Y, U=U, V=V, Z=Z)`` *is* resume — restartability without any
distributed coordination (single-controller JAX).
"""
from __future__ import annotations

import json
from typing import Optional

import numpy as np


def save_checkpoint(path: str, U: np.ndarray, V: np.ndarray,
                    Z: Optional[np.ndarray] = None, n_iter: int = 0,
                    loss_history=None, params: Optional[dict] = None
                    ) -> None:
    payload = dict(
        U=np.asarray(U), V=np.asarray(V),
        n_iter=np.asarray(int(n_iter)),
        loss_history=np.asarray(loss_history if loss_history is not None
                                else [], dtype=np.float64),
        params_json=np.asarray(json.dumps(params or {})),
    )
    if Z is not None:
        payload["Z"] = np.asarray(Z)
    np.savez(path, **payload)


def load_checkpoint(path: str) -> dict:
    with np.load(path, allow_pickle=False) as f:
        out = dict(
            U=f["U"], V=f["V"],
            Z=f["Z"] if "Z" in f else None,
            n_iter=int(f["n_iter"]),
            loss_history=list(f["loss_history"]),
            params=json.loads(str(f["params_json"])),
        )
    return out


def save_model(path: str, model) -> None:
    """Snapshot a fitted CMF estimator (factors + constructor params)."""
    if not hasattr(model, "U_"):
        raise RuntimeError("cannot checkpoint an unfitted model")
    save_checkpoint(path, model.U_, model.V_, model.Z_,
                    n_iter=model.n_iter_,
                    loss_history=model.loss_history_,
                    params=model.get_params())


def load_model(path: str):
    """Rebuild a fitted CMF estimator from a snapshot."""
    from ..models.cmf import CMF

    ck = load_checkpoint(path)
    model = CMF(**ck["params"])
    model.U_, model.V_, model.Z_ = ck["U"], ck["V"], ck["Z"]
    model.n_iter_ = ck["n_iter"]
    model.loss_history_ = ck["loss_history"]
    model.loss_iters_ = []
    model.step_times_ = []
    model.reconstruction_err_ = (ck["loss_history"][-1]
                                 if ck["loss_history"] else float("nan"))
    model.n_components_ = model.U_.shape[1]
    return model
