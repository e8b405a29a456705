"""QR/RQ gauge fixing for tensor trains.

Reimplements the reference's node orthonormalization
(`/root/reference/tensor/network.py:611-707`): factor a core with QR, keep the
orthonormal factor, push the triangular factor into the neighbouring main
node. The forward map is exactly invariant (tested in tests/test_layers.py::
test_qr_gauge_preserves_forward).

The reference's right-orthonormalization uses a flip-trick RQ; here we use a
plain QR of the bond-last matrix and push Rᵀ — an equivalent gauge (the gauge
factor is only defined up to the pushed invertible matrix) with the same
orthonormality property, chosen because it lowers to a single XLA QR kernel.

Static shapes: where the reference shrinks the bond when the QR is wide
(more bond columns than remaining rows, network.py:625-707 reshapes the
node), XLA requires static shapes, so the wide case zero-pads instead:
core' = [Q | 0] and the pushed factor [R; 0] — the forward map stays exactly
invariant and the core is orthonormal on its support (Q'ᵀQ' = diag(I, 0)),
which is the conditioning property the gauge exists for.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .engine import Network


def _bond_axis(net: Network, ni: int, nj: int) -> tuple:
    t = net.topology
    shared = (set(t.node_axes[ni]) & set(t.node_axes[nj])) - {t.sample_axis}
    if len(shared) != 1:
        raise ValueError(
            f"expected exactly one bond between {t.nodes[ni].name} and "
            f"{t.nodes[nj].name}, got {len(shared)}")
    a = shared.pop()
    return t.node_axes[ni].index(a), t.node_axes[nj].index(a)


def _padded_qr(mat: jnp.ndarray) -> tuple:
    """QR with Q padded to mat's column count and R square.

    For rows >= bond this is plain reduced QR. For the wide case (rows <
    bond, where the reference shrinks the node) Q gets zero columns and R
    zero rows, so Q_pad @ R_pad == mat with static shapes.

    Caveat (inherent to keeping the static bond): a rows < bond core spans
    at most `rows` bond directions, so after gauging the extra directions
    are exactly zero and a neighbouring UNREGULARIZED solve (method='exact'
    or eps=0) sees a singular Gram — the sweep then aborts with
    success=False, the reference's LinAlgError contract. Use a ridge method
    (the TNML/benchmark protocols always do); the reference instead shrinks
    the node's shape, which XLA's static shapes disallow."""
    rows, bond = mat.shape
    Q, R = jnp.linalg.qr(mat, mode="reduced")
    if rows < bond:
        Q = jnp.concatenate(
            [Q, jnp.zeros((rows, bond - rows), Q.dtype)], axis=1)
        R = jnp.concatenate(
            [R, jnp.zeros((bond - rows, bond), R.dtype)], axis=0)
    return Q, R


def orthonormalize_left(net: Network, params: Dict, k: int) -> Dict:
    """Left-orthonormalize main node k, pushing R into main node k+1
    (reference node_orthonormalize_left, network.py:625-660)."""
    t = net.topology
    if k >= len(t.main_nodes) - 1:
        return params
    ni, nj = t.main_nodes[k], t.main_nodes[k + 1]
    pi, pj = _bond_axis(net, ni, nj)
    name_i, name_j = t.nodes[ni].name, t.nodes[nj].name
    core = params[name_i]
    moved = jnp.moveaxis(core, pi, -1)
    rows = core.size // core.shape[pi]
    mat = moved.reshape(rows, core.shape[pi])
    Q, R = _padded_qr(mat)
    new_core = jnp.moveaxis(Q.reshape(moved.shape), -1, pi)
    nxt = jnp.moveaxis(params[name_j], pj, 0)
    new_nxt = jnp.moveaxis(jnp.tensordot(R, nxt, axes=[[1], [0]]), 0, pj)
    return dict(params, **{name_i: new_core, name_j: new_nxt})


def orthonormalize_right(net: Network, params: Dict, k: int) -> Dict:
    """Right-orthonormalize main node k, pushing the triangular factor into
    main node k-1 (reference node_orthonormalize_right, network.py:662-707)."""
    t = net.topology
    if k <= 0:
        return params
    ni, nj = t.main_nodes[k], t.main_nodes[k - 1]
    pi, pj = _bond_axis(net, ni, nj)
    name_i, name_j = t.nodes[ni].name, t.nodes[nj].name
    core = params[name_i]
    moved = jnp.moveaxis(core, pi, -1)  # (rest..., bond)
    rows = core.size // core.shape[pi]
    mat = moved.reshape(rows, core.shape[pi])
    Q, R = _padded_qr(mat)
    # core = Q R  =>  keep Q (orthonormal over non-bond dims), push Rᵀ so that
    # prev'[..., i] = sum_j prev[..., j] R[i, j]  preserves the contraction.
    new_core = jnp.moveaxis(Q.reshape(moved.shape), -1, pi)
    prv = jnp.moveaxis(params[name_j], pj, -1)
    new_prv = jnp.moveaxis(jnp.tensordot(prv, R, axes=[[-1], [1]]), -1, pj)
    return dict(params, **{name_i: new_core, name_j: new_prv})


def orthonormalize_all_left(net: Network, params: Dict) -> Dict:
    """Reference orthonormalize_left over all main nodes (network.py:611-616)."""
    for k in range(len(net.topology.main_nodes)):
        params = orthonormalize_left(net, params, k)
    return params


def orthonormalize_all_right(net: Network, params: Dict) -> Dict:
    for k in range(len(net.topology.main_nodes) - 1, -1, -1):
        params = orthonormalize_right(net, params, k)
    return params
