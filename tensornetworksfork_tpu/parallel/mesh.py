"""Device-mesh data parallelism.

The reference is single-device (`.cuda()` everywhere, no torch.distributed —
SURVEY.md §2.9). The TPU-native scaling story: shard the *sample* axis of
every data chunk over a 1-D `('data',)` mesh. The Gauss-Newton accumulation
A = sum_s JᴴHJ, b = sum_s Jᴴg is a plain sum over samples, so data
parallelism is *exact*: XLA inserts the psum at the contraction over the
sharded axis automatically, and the local solve runs replicated. Collectives
ride ICI; no code in the sweep engine mentions devices at all.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_chunked(tree, mesh: Mesh, axis: str = "data"):
    """Shard (nchunks, B, ...) arrays on the per-chunk sample axis (dim 1)."""
    def put(x):
        spec = P(None, axis) if getattr(x, "ndim", 0) >= 2 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def shard_chunked_inputs(inputs: dict, mesh: Mesh, labels_by_name: dict,
                         model_labels=(), data_axis: str = "data",
                         model_axis: str = "model",
                         sample_dim: str = "s") -> dict:
    """2-D data x model sharding of a chunked input dict.

    Each value is (nchunks, B, *rest); dim 1 (samples) shards over the data
    axis and any rest-dim whose topology label is in `model_labels` (e.g.
    'patches' — this framework's sequence analogue, SURVEY.md §5.7) shards
    over the model axis. Downstream contractions over a model-sharded axis
    make XLA insert the reduction collectives — tensor parallelism without
    the engine mentioning devices."""
    out = {}
    for name, x in inputs.items():
        labels = labels_by_name.get(name, ())
        rest = [model_axis if lbl in model_labels else None
                for lbl in labels if lbl != sample_dim]
        spec = P(None, data_axis, *rest) if getattr(x, "ndim", 0) >= 2 else P()
        out[name] = jax.device_put(x, NamedSharding(mesh, spec))
    return out


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
