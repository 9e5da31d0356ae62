"""Checkpoint / resume for SLAM state pytrees.

The reference has NO persistence — maps live only in RAM (SURVEY.md §5.4).  Here
any framework state (CoreSlamState, HectorState, ParticleState, PoseGraphState —
all NamedTuple pytrees of arrays) round-trips through orbax when available, with
an npz fallback, enabling restart/recovery and the pod-scale resume story.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:                                   # pragma: no cover
    _HAS_ORBAX = False


def _flatten(state) -> dict:
    leaves, treedef = jax.tree.flatten(state)
    return {"leaves": [np.asarray(l) for l in leaves], "treedef": treedef}


def save(path: str, state: Any, metadata: dict | None = None) -> None:
    """Save a state pytree (+ JSON-able metadata) to `path` (a directory)."""
    os.makedirs(path, exist_ok=True)
    leaves, _ = jax.tree.flatten(state)
    np.savez(os.path.join(path, "state.npz"),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    meta = dict(metadata or {})
    meta["num_leaves"] = len(leaves)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def restore(path: str, like: Any) -> Any:
    """Restore a state saved by `save`; `like` provides the pytree structure."""
    with np.load(os.path.join(path, "state.npz")) as data:
        leaves_like, treedef = jax.tree.flatten(like)
        n = len(leaves_like)
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    import jax.numpy as jnp
    leaves = [jnp.asarray(l, leaves_like[i].dtype)
              for i, l in enumerate(leaves)]
    return jax.tree.unflatten(treedef, leaves)


def load_metadata(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def save_orbax(path: str, state: Any) -> None:
    """Orbax-backed save (async-capable, multi-host aware) when available."""
    if not _HAS_ORBAX:
        raise RuntimeError("orbax not available; use save()")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state)
    ckptr.wait_until_finished()


def restore_orbax(path: str, like: Any) -> Any:
    if not _HAS_ORBAX:
        raise RuntimeError("orbax not available; use restore()")
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
