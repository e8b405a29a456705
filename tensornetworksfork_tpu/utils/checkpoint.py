"""Checkpoint / resume.

The reference checkpoints in memory only: `node_states()` snapshots +
`load_node_states` restore (layers.py:127-148), with EarlyStopping keeping the
best snapshot (SURVEY.md §5.4). Here the same node-states-dict semantics are
serialized durably: orbax when available, .npz fallback otherwise. Works for
single layers (dict of arrays) and sum layers (list of dicts).
"""
from __future__ import annotations

import os
from typing import Union

import numpy as np
import jax.numpy as jnp

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_node_states(path: str, states: Union[dict, list]) -> None:
    """states: {name: array} or [{name: array}, ...] (sum layers)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX and not path.endswith(".npz"):
        try:
            ckptr = ocp.PyTreeCheckpointer()
            ckptr.save(path, states, force=True)
            return
        except Exception:
            pass  # orbax API drift: fall through to the npz protocol
    flat = {}
    if isinstance(states, list):
        for mi, d in enumerate(states):
            for k, v in d.items():
                flat[f"m{mi}/{k}"] = np.asarray(v)
        flat["__layout__"] = np.asarray(len(states))
    else:
        for k, v in states.items():
            flat[k] = np.asarray(v)
        flat["__layout__"] = np.asarray(-1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_node_states(path: str) -> Union[dict, list]:
    path = os.path.abspath(path)
    if _HAVE_ORBAX and not path.endswith(".npz") and os.path.isdir(path):
        try:
            ckptr = ocp.PyTreeCheckpointer()
            return ckptr.restore(path)
        except Exception:
            pass
    npz_path = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz_path) as data:
        layout = int(data["__layout__"])
        if layout < 0:
            return {k: jnp.asarray(v) for k, v in data.items()
                    if k != "__layout__"}
        out = [dict() for _ in range(layout)]
        for k, v in data.items():
            if k == "__layout__":
                continue
            mi, name = k.split("/", 1)
            out[int(mi[1:])][name] = jnp.asarray(v)
        return out
