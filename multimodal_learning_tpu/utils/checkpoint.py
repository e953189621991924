"""Checkpoint save/restore.

Layout parity with the reference (``train_cv_MT.py:119-130``): one file per
fold holding ``{split, opt, epoch, model_state_dict(params+batch_stats),
ema_*, optimizer_state_dict, metrics}``, plus the rolling ``<model>_k_best``
selected by the reference's rules (fused test accuracy after epoch 15 for
teachers, ``train_test_MT.py:295-307``).

Storage: orbax PyTree checkpointing when available; the pytree is converted
to host numpy first so checkpoints are portable across backends.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = {}
    for k, v in payload.items():
        if k == "opt" and dataclasses.is_dataclass(v):
            host[k] = dataclasses.asdict(v)
        elif k in ("model_state_dict", "ema_model_state_dict",
                   "optimizer_state_dict", "banks", "batch_stats",
                   "ema_batch_stats", "crd_params"):
            host[k] = _to_host(v)
        else:
            host[k] = v
    with open(path, "wb") as fh:
        pickle.dump(host, fh)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as fh:
        return pickle.load(fh)


def save_train_state(path: str, state: Any, epoch: int,
                     extra: Any = None) -> None:
    """Resumable mid-fold snapshot: the FULL train state (params, BN stats,
    optimizer moments, EMA, CRD banks) via flax.serialization, plus an
    optional host-side ``extra`` dict (e.g. the plateau-LR tracker).  The
    reference cannot resume a fold (SURVEY §5); this can."""
    from flax import serialization
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = serialization.to_bytes(state)
    with open(path, "wb") as fh:
        pickle.dump({"epoch": epoch, "state_bytes": blob,
                     "extra": extra}, fh)


def load_train_state(path: str, template: Any, with_extra: bool = False):
    """Restore a snapshot into a freshly-initialised state (structure is
    validated against the template).  Returns (state, epoch) or, with
    ``with_extra``, (state, epoch, extra) — extra is None for pre-r3
    snapshots."""
    from flax import serialization
    with open(path, "rb") as fh:
        payload = pickle.load(fh)
    state = serialization.from_bytes(template, payload["state_bytes"])
    if with_extra:
        return state, payload["epoch"], payload.get("extra")
    return state, payload["epoch"]


def save_checkpoint_orbax(path: str, payload: Dict[str, Any]) -> None:
    """Orbax-backed variant (directory checkpoint): async-safe, versioned,
    restorable across hosts.  ``path`` is used as a directory."""
    import orbax.checkpoint as ocp
    host = {}
    for k, v in payload.items():
        if k == "opt" and dataclasses.is_dataclass(v):
            host[k] = dataclasses.asdict(v)
        elif v is not None and k != "metrics":
            host[k] = _to_host(v)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), host, force=True)


def load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
