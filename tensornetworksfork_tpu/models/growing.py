"""DMRG-style growing models.

Rebuilds the reference's rank/length growth machinery:
- `TensorTrainDMRGInfiLayer` (layers.py:480-680): a 2-site TT that grows by
  splicing a fresh two-physical-leg block into the middle (`grow_middle`,
  layers.py:556-614) and SVD-splitting it back into two cores with rank/error
  truncation (`split_node`, layers.py:616-680) — infinite-DMRG-style growth.
- `grow_cart` for the conv-TT layer (layers.py:892-947): appends a carriage
  initialised to read only the bias patch (~identity), broadcasting the old
  boundary cores up to the new bond.

Shapes change at every growth step, so each step builds a fresh static
Topology and transfers params; XLA recompiles per shape bucket (SURVEY.md §7
hard part 2 — bounded by the growth schedule).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.engine import Network
from ..core.topology import INPUT, PARAM, TopologyBuilder
from .layers import TensorConvolutionTrainLayer, TNLayer


class TensorTrainDMRGInfiLayer(TNLayer):
    """State: an ordered list of core arrays; entry k has phys dims
    `phys[k]` (1 normally, 2 for a freshly grown middle block). Core 0
    carries the output leg."""

    def __init__(self, bond_dim: int, input_features: int, output_shape=(),
                 dtype=jnp.float32, seed: int = 0):
        self.bond_dim = bond_dim
        self.input_features = input_features
        self.output_shape = (output_shape if isinstance(output_shape, tuple)
                             else (output_shape,))
        self.dtype = dtype
        self._rng = np.random.default_rng(seed)
        f = input_features
        out = self.output_shape[0] if self.output_shape else 1
        r = min(bond_dim, f)
        # cores: [(array, n_phys)]
        c1 = self._rand((out, f, r))
        c2 = self._rand((r, f))
        self._cores: List[Tuple[np.ndarray, int]] = [(c1, 1), (c2, 1)]
        self._grown_idx: Optional[int] = None
        self._rebuild(train_only=None)

    def _rand(self, shape):
        t = self._rng.standard_normal(shape)
        return (t / np.linalg.norm(t)).astype(np.float32)

    @property
    def num_carriages(self):
        return sum(np for _, np in self._cores)

    def _rebuild(self, train_only: Optional[int]):
        """Build the static topology for the current core list."""
        b = TopologyBuilder()
        f = self.input_features
        out_labels = ["s", "c1"]
        pos = 0  # physical position counter
        names = []
        for k, (arr, n_phys) in enumerate(self._cores):
            labels = []
            shape = []
            if k > 0:
                labels.append(f"r{k}")
                shape.append(arr.shape[0])
            if k == 0:
                labels.append("c1")
                shape.append(arr.shape[0])
            for j in range(n_phys):
                labels.append(f"p{pos + j}")
                shape.append(f)
            if k < len(self._cores) - 1:
                labels.append(f"r{k+1}")
                shape.append(arr.shape[-1])
            name = f"A{k+1}"
            b.node(name, labels, tuple(shape), kind=PARAM, init=arr,
                   left=(f"r{k}",) if k > 0 else (),
                   right=(f"r{k+1}",) if k < len(self._cores) - 1 else ())
            names.append(name)
            for j in range(n_phys):
                b.node(f"X{pos + j}", ("s", f"p{pos + j}"), (None, f), kind=INPUT)
                b.connect(name, f"p{pos + j}", f"X{pos + j}")
            if k > 0:
                b.connect(names[k - 1], f"r{k}", name)
            pos += n_phys
        train = [names[train_only]] if train_only is not None else names
        topo = b.finalize([f"X{j}" for j in range(pos)], names,
                          train_nodes=train, output_labels=tuple(out_labels))
        net = Network(topo)
        params = {}
        key = jax.random.PRNGKey(0)
        for spec in topo.nodes:
            if spec.kind == PARAM:
                params[spec.name] = jnp.asarray(spec.init, self.dtype)
        TNLayer.__init__(self, net, params)
        self._names = names

    def bind_x(self, x):
        """x: (S, n_positions, f) or (S, f) shared -> per-position inputs."""
        t = self.topology
        if x.ndim == 2:
            return {t.nodes[ni].name: x for ni in t.input_nodes}
        return {f"X{j}": x[:, j] for j in range(x.shape[1])}

    def _sync_cores_from_params(self):
        new = []
        for k, (arr, n_phys) in enumerate(self._cores):
            new.append((np.asarray(self.params[self._names[k]]), n_phys))
        self._cores = new

    def grow_middle(self):
        """Splice a fresh (b1, f, f, b2) block into the chain middle and make
        it the sole train node (reference layers.py:556-614)."""
        self._sync_cores_from_params()
        mid = len(self._cores) // 2
        left_arr = self._cores[mid - 1][0]
        right_arr = self._cores[mid][0]
        b1 = left_arr.shape[-1]
        b2 = right_arr.shape[0]
        f = self.input_features
        block = self._rand((b1, f, f, b2))
        self._cores.insert(mid, (block, 2))
        self._grown_idx = mid
        self._rebuild(train_only=mid)

    def split_node(self, rank: int, err: Optional[float] = None,
                   is_last: bool = False) -> float:
        """SVD-split the grown 2-site block back into two cores, truncating to
        `rank` or cumulative-singular-value error `err`
        (reference layers.py:616-680). Returns the split error."""
        if self._grown_idx is None:
            raise ValueError("no grown block to split; call grow_middle first")
        self._sync_cores_from_params()
        mid = self._grown_idx
        block, n_phys = self._cores[mid]
        assert n_phys == 2
        b1, f, f2, b2 = block.shape
        mat = block.reshape(b1 * f, f2 * b2)
        u, s, v = np.linalg.svd(mat, full_matrices=False)
        if is_last:
            v = np.diag(s) @ v
        s_cumsum = np.cumsum(s[::-1])
        if err is not None:
            rank = max(min(rank, int((s_cumsum > err).sum())), 1)
        rank = min(rank, len(s))
        split_err = float(s_cumsum[-rank])
        left = u[:, :rank].reshape(b1, f, rank)
        if is_last:
            right = v[:rank].reshape(rank, f2, b2)
        else:
            right = (np.diag(s[:rank]) @ v[:rank]).reshape(rank, f2, b2)
        self._cores[mid] = (left.astype(np.float32), 1)
        self._cores.insert(mid + 1, (right.astype(np.float32), 1))
        self._grown_idx = None
        self._rebuild(train_only=None)
        return split_err


def grow_cart(layer: TensorConvolutionTrainLayer, new_bond: Optional[int] = None,
              new_convolution_bond: Optional[int] = None
              ) -> TensorConvolutionTrainLayer:
    """Append a carriage to a conv-TT layer (reference grow_cart,
    layers.py:892-947): the new core reads only the bias patch with weight
    1/new_bond, the old boundary core/conv block broadcast up to the new
    bond. Returns a NEW layer (fresh static topology) carrying the params."""
    N = layer.num_carriages
    r_new = new_bond if new_bond is not None else layer.bond_dim
    cb_new = (new_convolution_bond if new_convolution_bond is not None
              else layer.convolution_bond)
    P, pp = layer.num_patches, layer.patch_pixels
    out_shape = tuple(
        layer.topology.axis_size[a] for a in layer.topology.output_axes)

    grown = TensorConvolutionTrainLayer(
        num_carriages=N + 1, bond_dim=layer.bond_dim, num_patches=P,
        patch_pixels=pp, output_shape=out_shape,
        convolution_bond=layer.convolution_bond, seed=0)

    params = dict(grown.params)
    # copy cores 1..N-1 verbatim
    for i in range(1, N):
        params[f"A{i}"] = layer.params[f"A{i}"]
        params[f"C{i}"] = layer.params[f"C{i}"]
    # old last core: broadcast up to the new right bond
    oldA = np.asarray(layer.params[f"A{N}"])
    tgt = np.asarray(grown.params[f"A{N}"]).shape
    params[f"A{N}"] = jnp.asarray(
        np.broadcast_to(oldA[..., None], oldA.shape + (tgt[-1],)).reshape(tgt))
    oldC = np.asarray(layer.params[f"C{N}"])
    tgtC = np.asarray(grown.params[f"C{N}"]).shape
    params[f"C{N}"] = jnp.asarray(
        np.broadcast_to(oldC[..., None], oldC.shape + (tgtC[-1],)).reshape(tgtC))
    # new carriage: zeros except the bias patch at 1/new_bond; the squeezed
    # last core has axes (r, patches) with the bias patch last
    newA = np.zeros(np.asarray(grown.params[f"A{N+1}"]).shape, np.float32)
    newA[..., -1] = 1.0 / max(r_new, 1)
    params[f"A{N+1}"] = jnp.asarray(newA)
    grown.params = params
    return grown
