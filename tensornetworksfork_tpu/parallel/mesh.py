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


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
