"""Model zoo: tensor-network layer builders.

Rebuilds the reference layer zoo (`/root/reference/tensor/layers.py`) on the
static Topology IR. Each builder returns a `TNLayer` holding a `Network`
(structure) and an initialised params dict (state), so training and inference
stay purely functional.

Rank profiles and perturbation inits reproduce the reference's semantics:
- constrict_bond clips ranks to f^depth from both ends, grown alternately
  inward (MainNodeLayer.build_left/right, layers.py:20-73);
- perturb initialises cores as ~identity on the last physical slice with 2%
  noise on the boundary cores, so the TT starts as an approximately constant
  function and higher degrees activate progressively (layers.py:32-57).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.engine import Network
from ..core.topology import CONST, INPUT, PARAM, TopologyBuilder


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def tt_rank_profile(N: int, r: int, f, constrict_bond: bool = True
                    ) -> List[Tuple[int, int]]:
    """(left, right) bond sizes per core, reference MainNodeLayer
    (layers.py:20-73). `f` may be an int or a per-position list."""
    fs = [f] * N if isinstance(f, int) else list(f)
    if N == 1:
        return [(1, 1)]

    def clip(R, depth_cap):
        return min(R, depth_cap) if constrict_bond else R

    b0 = (1, clip(r, 1 * fs[0]))
    bn = (clip(r, 1 * fs[-1]), 1)
    left_stack = [b0]
    right_stack = [bn]
    middle = [b0, bn]
    for i in range(N - 2):
        left_r = left_stack[-1][1]
        right_r = right_stack[0][0]
        if i == N - 3:
            middle = [*left_stack, (left_r, right_r), *right_stack]
        if i % 2 == 0:
            left_stack.append((left_r, clip(r, left_r * fs[len(left_stack)])))
        else:
            right_stack.insert(0, (clip(r, right_r * fs[N - 1 - len(right_stack)]),
                                   right_r))
    return middle


def perturb_block(rl: int, f: int, rr: int, rng: Optional[np.random.Generator],
                  noise: float = 0.0) -> np.ndarray:
    """(rl, 1, f, rr) core: zero except an identity/ones block on the last
    physical slice (reference build_perturb, layers.py:32-39)."""
    if rl == 1 or rr == 1:
        block = np.ones((rl, rr))
    else:
        block = np.eye(rl, rr)
    core = np.zeros((rl, f, rr))
    core[:, -1, :] = block
    if noise and rng is not None:
        core = core * (1 + noise * rng.standard_normal(core.shape))
    return core[:, None, :, :]


def perturb_profile(N: int, r: int, f: int, constrict_bond: bool,
                    rng: np.random.Generator) -> List[np.ndarray]:
    """Perturb init cores, reference layers.py:41-57 (left-heavy growth; 2%
    noise on the two boundary cores only)."""
    def cap(R, prev):
        return min(R, prev * f) if constrict_bond else R

    if N == 1:
        return [perturb_block(1, f, 1, rng, 0.02)]
    b0 = perturb_block(1, f, cap(r, 1), rng, 0.02)
    bn = perturb_block(b0.shape[-1] if N == 2 else r, f, 1, rng, 0.02)
    if N == 2:
        return [b0, bn]
    left_stack = [b0]
    middle = None
    for i in range(N - 2):
        rl = left_stack[-1].shape[-1]
        rr = bn.shape[0]
        if i == N - 3:
            middle = [*left_stack, perturb_block(rl, f, rr, rng), bn]
        else:
            left_stack.append(perturb_block(rl, f, cap(r, rl), rng))
    return middle


class TNLayer:
    """Structure (Network) + state (params dict). Mirrors the reference
    TensorNetworkLayer surface (layers.py:114-192): forward, node_states /
    load_node_states checkpointing, num_parameters."""

    def __init__(self, network: Network, params):
        self.network = network
        self.params = params
        self._fwd = jax.jit(network.forward)

    @property
    def topology(self):
        return self.network.topology

    def __call__(self, x, params=None):
        return self._fwd(self.params if params is None else params,
                         self.network.bind_inputs(x))

    def forward_batch(self, x, batch_size: int):
        inputs = self.network.bind_inputs(x)
        S = next(iter(inputs.values())).shape[0]
        if batch_size <= 0 or batch_size >= S:
            return self(inputs)
        outs = []
        for b in range(0, S, batch_size):
            outs.append(self({k: v[b:b + batch_size] for k, v in inputs.items()}))
        return jnp.concatenate(outs, axis=0)

    def num_parameters(self) -> int:
        return self.topology.num_parameters(self.params)

    def node_states(self):
        """Snapshot of trainable tensors (reference node_states,
        layers.py:127-135)."""
        return {k: v for k, v in self.params.items()}

    def load_node_states(self, states):
        self.params = dict(states)


# ---------------------------------------------------------------------------
# Tensor train (reference TensorTrainLayer, layers.py:194-221)
# ---------------------------------------------------------------------------

class TensorTrainLayer(TNLayer):
    def __init__(self, num_carriages: int, bond_dim: int, input_features: int,
                 output_shape=(), constrict_bond: bool = True,
                 perturb: bool = False, dtype=jnp.float32, seed: int = 0):
        N, r, f = num_carriages, bond_dim, input_features
        output_shape = output_shape if isinstance(output_shape, tuple) else (output_shape,)
        self.num_carriages, self.bond_dim, self.input_features = N, r, f
        self.output_shape = output_shape
        b = TopologyBuilder()
        rng = np.random.default_rng(seed)

        if perturb:
            if any(o > 1 for o in output_shape):
                raise ValueError("perturb init requires output dims of 1")
            inits = perturb_profile(N, 1 if N == 1 else r, f, constrict_bond, rng)
            profile = [(a.shape[0], a.shape[-1]) for a in inits]
        else:
            profile = tt_rank_profile(N, 1 if N == 1 else r, f, constrict_bond)
            inits = [None] * N

        out_labels = ["s"]
        for i in range(1, N + 1):
            left, right = profile[i - 1]
            if i - 1 < len(output_shape):
                up, up_label = output_shape[i - 1], f"c{i}"
                out_labels.append(up_label)
            else:
                up, up_label = 1, "c"
            b.node(f"A{i}", (f"r{i}", up_label, f"p{i}", f"r{i+1}"),
                   (left, up, f, right), kind=PARAM,
                   left=(f"r{i}",), right=(f"r{i+1}",), init=inits[i - 1])
            b.node(f"X{i}", ("s", f"p{i}"), (None, f), kind=INPUT)
            b.connect(f"A{i}", f"p{i}", f"X{i}")
            if i > 1:
                b.connect(f"A{i-1}", f"r{i}", f"A{i}")
        for i in range(1, N + 1):
            b.squeeze(f"A{i}", exclude=out_labels)
        topo = b.finalize([f"X{i}" for i in range(1, N + 1)],
                          [f"A{i}" for i in range(1, N + 1)],
                          output_labels=tuple(out_labels))
        super().__init__(Network(topo), topo.init_params(seed, dtype))


# ---------------------------------------------------------------------------
# TT over learned linear feature maps (reference TensorTrainLinearLayer,
# layers.py:308-343)
# ---------------------------------------------------------------------------

class TensorTrainLinearLayer(TNLayer):
    def __init__(self, num_carriages: int, bond_dim: int, input_features: int,
                 linear_dim: int, output_shape=(), constrict_bond: bool = True,
                 train_linear: bool = True, perturb: bool = False,
                 dtype=jnp.float32, seed: int = 0):
        # train_linear=False freezes the linear feature maps (the old-gen
        # SumOfNetworks(train_linear=...) switch, network_with_means.py:978)
        N, r, f, ld = num_carriages, bond_dim, input_features, linear_dim
        output_shape = output_shape if isinstance(output_shape, tuple) else (output_shape,)
        self.num_carriages, self.bond_dim = N, r
        self.input_features, self.linear_dim = f, ld
        b = TopologyBuilder()
        rng = np.random.default_rng(seed)
        if perturb:
            inits = perturb_profile(N, 1 if N == 1 else r, ld, constrict_bond, rng)
            profile = [(a.shape[0], a.shape[-1]) for a in inits]
        else:
            profile = tt_rank_profile(N, 1 if N == 1 else r, ld, constrict_bond)
            inits = [None] * N

        out_labels = ["s"]
        train_order = []
        for i in range(1, N + 1):
            left, right = profile[i - 1]
            if i - 1 < len(output_shape):
                up, up_label = output_shape[i - 1], f"c{i}"
                out_labels.append(up_label)
            else:
                up, up_label = 1, "c"
            b.node(f"A{i}", (f"r{i}", up_label, f"lin{i}", f"r{i+1}"),
                   (left, up, ld, right), kind=PARAM,
                   left=(f"r{i}",), right=(f"r{i+1}",), init=inits[i - 1])
            b.node(f"L{i}", (f"lin{i}", f"p{i}"), (ld, f), kind=PARAM)
            b.node(f"X{i}", ("s", f"p{i}"), (None, f), kind=INPUT)
            b.connect(f"A{i}", f"lin{i}", f"L{i}")
            b.connect(f"L{i}", f"p{i}", f"X{i}")
            if i > 1:
                b.connect(f"A{i-1}", f"r{i}", f"A{i}")
            train_order += [f"A{i}", f"L{i}"] if train_linear else [f"A{i}"]
        for i in range(1, N + 1):
            b.squeeze(f"A{i}", exclude=out_labels)
        topo = b.finalize([f"X{i}" for i in range(1, N + 1)],
                          [f"A{i}" for i in range(1, N + 1)],
                          train_nodes=train_order,
                          output_labels=tuple(out_labels))
        super().__init__(Network(topo), topo.init_params(seed, dtype))


# ---------------------------------------------------------------------------
# CumSum MPO layer (reference get_cum_sum_operator + CumSumLayer,
# layers.py:408-477): an upper-triangular-ones x diagonal-propagator MPO makes
# the TT act on cumulative feature sums (ordered-interaction models).
# ---------------------------------------------------------------------------

def cum_sum_operator(n: int, num_carriages: int, f: int) -> np.ndarray:
    """op[i,k,l,m] = H[i,k] δ(k=l) δ(m = k or 0) with H upper-triangular
    ones — built directly in O(f²) (the equivalent dense einsum over the
    (f,f,f,f) propagator is O(f⁵) and took minutes at f=65)."""
    left_dim = 1 if n == 0 else f
    right_dim = 1 if n == num_carriages - 1 else f
    H = np.triu(np.ones((left_dim, f)))
    op = np.zeros((left_dim, f, f, right_dim))
    last = n == num_carriages - 1
    for k in range(f):
        op[:, k, k, 0 if last else k] = H[:, k]
    return op


class CumSumLayer(TNLayer):
    def __init__(self, num_carriages: int, bond_dim: int, input_features: int,
                 output_shape=(), constrict_bond: bool = True,
                 perturb: bool = False, dtype=jnp.float32, seed: int = 0):
        N, r, f = num_carriages, bond_dim, input_features
        output_shape = output_shape if isinstance(output_shape, tuple) else (output_shape,)
        self.num_carriages, self.input_features = N, f
        b = TopologyBuilder()
        rng = np.random.default_rng(seed)
        if perturb:
            inits = perturb_profile(N, 1 if N == 1 else r, f, constrict_bond, rng)
            profile = [(a.shape[0], a.shape[-1]) for a in inits]
        else:
            profile = tt_rank_profile(N, 1 if N == 1 else r, f, constrict_bond)
            inits = [None] * N

        out_labels = ["s"]
        for i in range(1, N + 1):
            left, right = profile[i - 1]
            if i - 1 < len(output_shape):
                up, up_label = output_shape[i - 1], f"c{i}"
                out_labels.append(up_label)
            else:
                up, up_label = 1, "c"
            b.node(f"A{i}", (f"r{i}", up_label, f"p{i}", f"r{i+1}"),
                   (left, up, f, right), kind=PARAM,
                   left=(f"r{i}",), right=(f"r{i+1}",), init=inits[i - 1])
            if i > 1:
                b.connect(f"A{i-1}", f"r{i}", f"A{i}")
        if N > 1:
            for i in range(1, N + 1):
                op = cum_sum_operator(i - 1, N, f)
                b.node(f"O{i}", (f"b{i}", f"p{i}", f"d{i}", f"b{i+1}"),
                       op.shape, kind=CONST,
                       left=(f"b{i}",), right=(f"b{i+1}",), init=op)
                b.node(f"X{i}", ("s", f"d{i}"), (None, f), kind=INPUT)
                b.connect(f"A{i}", f"p{i}", f"O{i}")
                b.connect(f"O{i}", f"d{i}", f"X{i}")
                if i > 1:
                    b.connect(f"O{i-1}", f"b{i}", f"O{i}")
            for i in range(1, N + 1):
                b.squeeze(f"O{i}")
        else:
            b.node("X1", ("s", "p1"), (None, f), kind=INPUT)
            b.connect("A1", "p1", "X1")
        for i in range(1, N + 1):
            b.squeeze(f"A{i}", exclude=out_labels)
        topo = b.finalize([f"X{i}" for i in range(1, N + 1)],
                          [f"A{i}" for i in range(1, N + 1)],
                          output_labels=tuple(out_labels))
        super().__init__(Network(topo), topo.init_params(seed, dtype))


# ---------------------------------------------------------------------------
# CPD layer (reference CPDLayer, layers.py:1549-1625): factors share one rank
# hyperedge 'b'; first factor carries the output leg.
# ---------------------------------------------------------------------------

class CPDLayer(TNLayer):
    def __init__(self, num_factors: int, rank: int, input_features: int,
                 output_shape=(), perturb: bool = False, dtype=jnp.float32,
                 seed: int = 0):
        Nf, R, f = num_factors, rank, input_features
        output_shape = output_shape if isinstance(output_shape, tuple) else (output_shape,)
        self.num_factors, self.rank, self.input_features = Nf, R, f
        out_dim = output_shape[0] if output_shape else 1
        b = TopologyBuilder()
        for i in range(1, Nf + 1):
            if i == 1:
                if Nf == 1:
                    b.node("A1", ("p", "o"), (f, out_dim), kind=PARAM)
                else:
                    b.node("A1", ("b", "p", "o"), (R, f, out_dim), kind=PARAM)
            else:
                init = None
                if perturb:
                    rng = np.random.default_rng(seed + i)
                    core = np.zeros((R, f))
                    core[:, -1] = 1.0
                    if i == Nf:
                        core[:, -1] += 0.02 * rng.standard_normal(R)
                    init = core
                b.node(f"A{i}", ("b", "p"), (R, f), kind=PARAM, init=init)
            b.node(f"X{i}", ("s", f"p{i}"), (None, f), kind=INPUT)
            b.connect(f"A{i}", "p", f"X{i}", f"p{i}")
        if Nf > 1:
            b.tie([(f"A{i}", "b") for i in range(1, Nf + 1)])
        topo = b.finalize([f"X{i}" for i in range(1, Nf + 1)],
                          [f"A{i}" for i in range(1, Nf + 1)],
                          output_labels=("s", "o"))
        super().__init__(Network(topo), topo.init_params(seed, dtype))


# ---------------------------------------------------------------------------
# CPD-as-TT with diagonal cores (reference CPD + CPDTensorNode,
# layers.py:1079-1142, node.py:284-298)
# ---------------------------------------------------------------------------

class CPDTrainLayer(TNLayer):
    def __init__(self, num_carriages: int, bond_dim: int, input_features: int,
                 output_shape=(), dtype=jnp.float32, seed: int = 0):
        N, r, f = num_carriages, bond_dim, input_features
        output_shape = output_shape if isinstance(output_shape, tuple) else (output_shape,)
        b = TopologyBuilder()
        rng = np.random.default_rng(seed)
        out_labels = ["s"]
        for i in range(1, N + 1):
            if i - 1 < len(output_shape):
                up, up_label = output_shape[i - 1], f"c{i}"
                out_labels.append(up_label)
            else:
                up, up_label = 1, "c"
            left = 1 if i == 1 else r
            right = 1 if i == N else r
            init = None
            if left > 1 and right > 1:
                core = np.zeros((left, up, f, right))
                for u in range(up):
                    for k in range(f):
                        core[:, u, k, :] = np.diag(rng.standard_normal(right))
                init = core
            b.node(f"A{i}", (f"r{i}", up_label, f"p{i}", f"r{i+1}"),
                   (left, up, f, right), kind=PARAM,
                   left=(f"r{i}",), right=(f"r{i+1}",), init=init, cpd_mask=True)
            b.node(f"X{i}", ("s", f"p{i}"), (None, f), kind=INPUT)
            b.connect(f"A{i}", f"p{i}", f"X{i}")
            if i > 1:
                b.connect(f"A{i-1}", f"r{i}", f"A{i}")
        for i in range(1, N + 1):
            b.squeeze(f"A{i}", exclude=out_labels)
        topo = b.finalize([f"X{i}" for i in range(1, N + 1)],
                          [f"A{i}" for i in range(1, N + 1)],
                          output_labels=tuple(out_labels))
        super().__init__(Network(topo), topo.init_params(seed, dtype))


# ---------------------------------------------------------------------------
# Image model: shared-filter conv MPS x TT over patches (reference
# TensorConvolutionTrainLayer, layers.py:791-947)
# ---------------------------------------------------------------------------

class TensorConvolutionTrainLayer(TNLayer):
    def __init__(self, num_carriages: int, bond_dim: int, num_patches: int,
                 patch_pixels: int, output_shape=(), convolution_bond: int = -1,
                 constrict_bond: bool = True, perturb: bool = False,
                 dtype=jnp.float32, seed: int = 0):
        N, r = num_carriages, bond_dim
        output_shape = output_shape if isinstance(output_shape, tuple) else (output_shape,)
        self.num_carriages, self.bond_dim = N, r
        self.num_patches, self.patch_pixels = num_patches, patch_pixels
        self.convolution_bond = convolution_bond
        b = TopologyBuilder()
        rng = np.random.default_rng(seed)

        out_labels = ["s"]
        train_order = []
        for i in range(1, N + 1):
            if i - 1 < len(output_shape):
                up, up_label = output_shape[i - 1], f"c{i}"
                out_labels.append(up_label)
            else:
                up, up_label = 1, "c"
            left = 1 if i == 1 else r
            right = 1 if i == N else r
            init = None
            if perturb:
                # reference layers.py:811-833: random first core, perturb rest
                if i == 1:
                    init = rng.standard_normal((1, 1, num_patches, right))
                else:
                    init = perturb_block(left, num_patches, right, None)
            b.node(f"A{i}", (f"r{i}", up_label, "patches", f"r{i+1}"),
                   (left, up, num_patches, right), kind=PARAM,
                   left=(f"r{i}",), right=(f"r{i+1}",), init=init)
            if convolution_bond > 0:
                cb_l = 1 if i == 1 else convolution_bond
                cb_r = 1 if i == N else convolution_bond
                b.node(f"C{i}", (f"CB{i}", "patch_pixels", f"CB{i+1}"),
                       (cb_l, patch_pixels, cb_r), kind=PARAM,
                       left=(f"CB{i}",), right=(f"CB{i+1}",))
            else:
                b.node(f"C{i}", ("patch_pixels",), (patch_pixels,), kind=PARAM)
            b.node(f"X{i}", ("s", "patches", "patch_pixels"),
                   (None, num_patches, patch_pixels), kind=INPUT)
            b.connect(f"X{i}", "patches", f"A{i}")
            b.connect(f"C{i}", "patch_pixels", f"X{i}")
            if i > 1:
                b.connect(f"A{i-1}", f"r{i}", f"A{i}")
                if convolution_bond > 0:
                    b.connect(f"C{i-1}", f"CB{i}", f"C{i}")
            train_order.append(f"A{i}")
        # reference train order: cores then conv blocks (layers.py:890)
        train_order += [f"C{i}" for i in range(1, N + 1)]
        for i in range(1, N + 1):
            b.squeeze(f"A{i}", exclude=out_labels)
            b.squeeze(f"C{i}")
        topo = b.finalize([f"X{i}" for i in range(1, N + 1)],
                          [f"A{i}" for i in range(1, N + 1)],
                          train_nodes=train_order,
                          output_labels=tuple(out_labels))
        super().__init__(Network(topo), topo.init_params(seed, dtype))


# ---------------------------------------------------------------------------
# Type-I sums (reference SumOfNetworks, network.py:988-1060): an ensemble of
# degree-1..N networks whose outputs add; members beyond the first drop the
# bias column of the input (models/tensor_train.py:143,160-171).
# ---------------------------------------------------------------------------

class SumLayer:
    def __init__(self, layers: Sequence[TNLayer],
                 input_fns: Optional[Sequence[Callable]] = None):
        self.layers = list(layers)
        if input_fns is None:
            input_fns = [_slice_adapter(l.network) for l in self.layers]
        self.input_fns = list(input_fns)

    def __call__(self, x, params_list=None):
        params_list = params_list or [l.params for l in self.layers]
        out = None
        for layer, fn, p in zip(self.layers, self.input_fns, params_list):
            y = layer(fn(x), params=p)
            out = y if out is None else out + y
        return out

    def forward_batch(self, x, batch_size: int):
        S = x.shape[0] if hasattr(x, "shape") else next(iter(x.values())).shape[0]
        if batch_size <= 0 or batch_size >= S:
            return self(x)
        outs = [self(x[b:b + batch_size]) for b in range(0, S, batch_size)]
        return jnp.concatenate(outs, axis=0)

    @property
    def params_list(self):
        return [l.params for l in self.layers]

    def set_params_list(self, params_list):
        for l, p in zip(self.layers, params_list):
            l.params = dict(p)

    def num_parameters(self):
        return sum(l.num_parameters() for l in self.layers)

    def node_states(self):
        return [l.node_states() for l in self.layers]

    def load_node_states(self, states):
        for l, s in zip(self.layers, states):
            l.load_node_states(s)


def _slice_adapter(net: Network):
    """Slices the global x down to each input node's static trailing shape —
    the reference's x[..., :shape] member routing (network.py:1012)."""
    t = net.topology

    def fn(x):
        inputs = {}
        bound = net.bind_inputs(x)
        for ni in t.input_nodes:
            spec = t.nodes[ni]
            arr = bound[spec.name]
            idx = (slice(None),) + tuple(slice(0, s) for s in spec.shape[1:])
            inputs[spec.name] = arr[idx]
        return inputs

    return fn


# ---------------------------------------------------------------------------
# Generic operator-sandwich TT (reference TensorOperatorLayer[Deprecated],
# layers.py:683-788): input -> MPO operator row -> TT spine. Used for the
# cumsum/symmetric operator studies (cum_sum_operator.py, symmetric_operator.py).
# ---------------------------------------------------------------------------

class OperatorTTLayer(TNLayer):
    def __init__(self, operator, input_features: int, bond_dim: int,
                 num_carriages: int, output_shape=1, ring: bool = False,
                 left=None, right=None, constrict_bond: bool = True,
                 train_operator: bool = False, dtype=jnp.float32, seed: int = 0):
        N, f, r = num_carriages, input_features, bond_dim
        output_shape = output_shape if isinstance(output_shape, tuple) else (output_shape,)
        b = TopologyBuilder()
        ops = []
        for i in range(N):
            if isinstance(operator, (list, tuple)):
                O = np.asarray(operator[i])
            elif ring:
                O = np.asarray(operator)
            elif i == 0 and left is not None:
                O = np.asarray(left)
            elif i == N - 1 and right is not None:
                O = np.asarray(right)
            elif i == 0:
                O = np.asarray(operator)[:1]
            elif i == N - 1:
                O = np.asarray(operator)[..., -1:]
            else:
                O = np.asarray(operator)
            ops.append(O)

        profile = tt_rank_profile(N, 1 if N == 1 else r, f, constrict_bond)
        out_labels = ["s"]
        for i in range(1, N + 1):
            O = ops[i - 1]
            bl = "br" if ring and i == 1 else f"b{i}"
            br = "br" if ring and i == N else f"b{i+1}"
            b.node(f"O{i}", (bl, f"u{i}", f"d{i}", br), O.shape,
                   kind=PARAM if train_operator else CONST,
                   left=(bl,), right=(br,), init=O)
            b.node(f"X{i}", ("s", f"d{i}"), (None, f), kind=INPUT)
            b.connect(f"O{i}", f"d{i}", f"X{i}")
            if i > 1:
                b.connect(f"O{i-1}", f"b{i}" if not (ring and i == N + 1) else "br", f"O{i}")
            lab_l = "rr" if ring and i == 1 else f"r{i}"
            lab_r = "rr" if ring and i == N else f"r{i+1}"
            if i - 1 < len(output_shape):
                up, up_label = output_shape[i - 1], f"c{i}"
                out_labels.append(up_label)
            else:
                up, up_label = 1, "c"
            lft, rgt = profile[i - 1]
            if ring:
                lft = rgt = r
            b.node(f"A{i}", (lab_l, up_label, f"u{i}", lab_r), (lft, up, O.shape[1], rgt),
                   kind=PARAM, left=(lab_l,), right=(lab_r,))
            b.connect(f"A{i}", f"u{i}", f"O{i}")
            if i > 1:
                b.connect(f"A{i-1}", lab_l, f"A{i}")
        if ring and N > 1:
            b.connect(f"A{N}", "rr", "A1")
            b.connect(f"O{N}", "br", "O1")
        for i in range(1, N + 1):
            b.squeeze(f"A{i}", exclude=out_labels)
            b.squeeze(f"O{i}")
        topo = b.finalize([f"X{i}" for i in range(1, N + 1)],
                          [f"A{i}" for i in range(1, N + 1)],
                          output_labels=tuple(out_labels))
        super().__init__(Network(topo), topo.init_params(seed, dtype))


# ---------------------------------------------------------------------------
# Complex TT (reference ComplexTensorTrainLayer, layers.py:1210-1285)
# ---------------------------------------------------------------------------

class ComplexTensorTrainLayer(TensorTrainLayer):
    """Complex TT (reference ComplexTensorTrainLayer, layers.py:1210-1285).

    The reference is complex128; TPUs have no c128, so the TPU tier is
    complex64 (default). dtype=jnp.complex128 is supported on CPU with
    jax x64 enabled — tests/test_complex128.py validates the full sweep
    path at double precision in an x64 subprocess."""

    def __init__(self, num_carriages, bond_dim, input_features, output_shape=(),
                 constrict_bond=True, dtype=jnp.complex64, seed=0):
        if not jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
            raise ValueError(f"dtype must be complex, got {dtype}")
        super().__init__(num_carriages, bond_dim, input_features,
                         output_shape=output_shape, constrict_bond=constrict_bond,
                         perturb=False, dtype=dtype, seed=seed)


# ---------------------------------------------------------------------------
# Multi-dim inputs split across consecutive cores (reference
# TensorTrainSplitInputLayer, layers.py:1144-1208): each wagon holds one input
# tensor of shape input_shape whose axes feed num_input_dims consecutive
# cores; wagon-internal bonds r, wagon-to-wagon (axle) bonds axle_bond.
# ---------------------------------------------------------------------------

class TensorTrainSplitInputLayer(TNLayer):
    def __init__(self, num_wagons: int, bond_dim: int, input_shape=(),
                 output_shape=(), axle_bond: int = 1, dtype=jnp.float32,
                 seed: int = 0):
        d = len(input_shape)
        output_shape = output_shape if isinstance(output_shape, tuple) else (output_shape,)
        b = TopologyBuilder()
        out_labels = ["s"]
        names = []
        for i in range(num_wagons):
            b.node(f"X{i}", ("s",) + tuple(f"I{i*d+j}" for j in range(d)),
                   (None,) + tuple(input_shape), kind=INPUT)
            for j in range(d):
                idx = i * d + j
                if idx < len(output_shape):
                    up, up_label = output_shape[idx], f"c{idx}"
                    out_labels.append(up_label)
                else:
                    up, up_label = 1, "c"
                first = (i == 0 and j == 0)
                last = (i == num_wagons - 1 and j == d - 1)
                lft = 1 if first else (axle_bond if j == 0 else bond_dim)
                rgt = 1 if last else (axle_bond if j == d - 1 else bond_dim)
                name = f"A{idx}"
                b.node(name, (f"r{idx}", up_label, f"I{idx}", f"r{idx+1}"),
                       (lft, up, input_shape[j], rgt), kind=PARAM,
                       left=(f"r{idx}",), right=(f"r{idx+1}",))
                b.connect(name, f"I{idx}", f"X{i}")
                if names:
                    b.connect(names[-1], f"r{idx}", name)
                names.append(name)
        for name in names:
            b.squeeze(name, exclude=out_labels)
        topo = b.finalize([f"X{i}" for i in range(num_wagons)], names,
                          output_labels=tuple(out_labels))
        super().__init__(Network(topo), topo.init_params(seed, dtype))


# ---------------------------------------------------------------------------
# Multi-layer grid (PEPS-like) conv model (reference
# TensorConvolutionGridTrainLayer, layers.py:949-1075): num_layers x
# num_carriages cores with horizontal bonds r/lin_bond and vertical bonds
# lin_dim; only the top layer carries outputs; bottom layer reads patches.
# ---------------------------------------------------------------------------

class TensorConvolutionGridTrainLayer(TNLayer):
    def __init__(self, num_carriages: int, num_layers: int, bond_dim: int,
                 lin_dim: int, lin_bond: int, num_patches: int,
                 patch_pixels: int, output_shape=(), convolution_bond: int = -1,
                 dtype=jnp.float32, seed: int = 0):
        output_shape = output_shape if isinstance(output_shape, tuple) else (output_shape,)
        NC, NL = num_carriages, num_layers
        b = TopologyBuilder()
        out_labels = ["s"]
        for i in range(1, NC + 1):
            b.node(f"X{i}", ("s", "patches", "patch_pixels"),
                   (None, num_patches, patch_pixels), kind=INPUT)
            if convolution_bond > 0:
                cb_l = 1 if i == 1 else convolution_bond
                cb_r = 1 if i == NC else convolution_bond
                b.node(f"C{i}", (f"CB{i}", "patch_pixels", f"CB{i+1}"),
                       (cb_l, patch_pixels, cb_r), kind=PARAM,
                       left=(f"CB{i}",), right=(f"CB{i+1}",))
            else:
                b.node(f"C{i}", ("patch_pixels",), (patch_pixels,), kind=PARAM)
            b.connect(f"C{i}", "patch_pixels", f"X{i}")
            if convolution_bond > 0 and i > 1:
                b.connect(f"C{i-1}", f"CB{i}", f"C{i}")

        all_nodes = []
        for l in range(NL):
            top = (l == NL - 1)
            hb = bond_dim if top else lin_bond
            for i in range(1, NC + 1):
                if top and i - 1 < len(output_shape):
                    cdim, clab = output_shape[i - 1], f"c{i}"
                    out_labels.append(clab)
                else:
                    cdim, clab = 1, "c"
                lft = 1 if i == 1 else max(hb, 1)
                rgt = 1 if i == NC else max(hb, 1)
                labels = [f"v{l}_{i}", f"r{l}_{i}", clab, f"r{l}_{i+1}",
                          f"v{l+1}_{i}"]
                vb_down = 1 if l == 0 else lin_dim
                vb_up = lin_dim if l < NL - 1 else 1
                if l == 0:
                    labels.insert(3, "patches")
                    shape = (vb_down, lft, cdim, num_patches, rgt, vb_up)
                else:
                    shape = (vb_down, lft, cdim, rgt, vb_up)
                name = f"A{l}_{i}"
                b.node(name, tuple(labels), shape, kind=PARAM,
                       left=(f"r{l}_{i}",), right=(f"r{l}_{i+1}",))
                all_nodes.append(name)
                if l == 0:
                    b.connect(name, "patches", f"X{i}")
                else:
                    b.connect(f"A{l-1}_{i}", f"v{l}_{i}", name)
                if i > 1 and (hb > 0 or top):
                    b.connect(f"A{l}_{i-1}", f"r{l}_{i}", name)
        for name in all_nodes:
            b.squeeze(name, exclude=out_labels)
        for i in range(1, NC + 1):
            b.squeeze(f"C{i}")
        main = [f"A{NL-1}_{i}" for i in range(1, NC + 1)]
        # train order: column-major bottom-to-top (reference layers.py:1058-1063)
        train = []
        for i in range(1, NC + 1):
            train.append(f"C{i}")
            for l in range(NL):
                train.append(f"A{l}_{i}")
        topo = b.finalize([f"X{i}" for i in range(1, NC + 1)], main,
                          train_nodes=train, output_labels=tuple(out_labels))
        super().__init__(Network(topo), topo.init_params(seed, dtype))


# ---------------------------------------------------------------------------
# Conv -> input -> per-position operator matrix -> TT (reference
# TensorConvOperatorLayer, layers.py:1287-1418)
# ---------------------------------------------------------------------------

class TensorConvOperatorLayer(TNLayer):
    """Conv block x fixed operator feature map x TT over patches.

    The reference version (layers.py:1287-1418) connects the conv block to a
    'patch_pixels' label the input node doesn't carry, which silently sums
    the conv block out. Here the coherent reading is implemented: the input's
    pixel axis, the operator's input leg, and the conv block's pixel axis are
    ONE hyperedge, i.e. per patch out = sum_q X[s,p,q] C[a,q,b] O[q,u] — a
    conv-modulated operator feature map. Requires patch_pixels ==
    operator.shape[0].
    """

    def __init__(self, operator, input_features: int, bond_dim: int,
                 num_carriages: int, num_patches: int, patch_pixels: int,
                 output_shape=(), convolution_bond: int = -1,
                 dtype=jnp.float32, seed: int = 0):
        N = num_carriages
        output_shape = output_shape if isinstance(output_shape, tuple) else (output_shape,)
        op0 = np.asarray(operator[0] if isinstance(operator, (list, tuple))
                         else operator)
        if patch_pixels != op0.shape[0]:
            raise ValueError("patch_pixels must equal the operator input dim")
        b = TopologyBuilder()
        out_labels = ["s"]
        for i in range(N):
            if convolution_bond > 0:
                cl = 1 if i == 0 else convolution_bond
                cr = 1 if i == N - 1 else convolution_bond
                b.node(f"C{i}", (f"CB{i+1}", f"q{i}", f"CB{i+2}"),
                       (cl, patch_pixels, cr), kind=PARAM,
                       left=(f"CB{i+1}",), right=(f"CB{i+2}",))
                if i > 0:
                    b.connect(f"C{i-1}", f"CB{i+1}", f"C{i}")
            else:
                b.node(f"C{i}", (f"q{i}",), (patch_pixels,), kind=PARAM)
            b.node(f"X{i}", ("s", "patches", f"q{i}"),
                   (None, num_patches, patch_pixels), kind=INPUT)
            O = np.asarray(operator[i] if isinstance(operator, (list, tuple))
                           else operator)
            b.node(f"O{i}", (f"q{i}", f"u{i}"), O.shape, kind=CONST, init=O)
            out_dim = output_shape[i] if i < len(output_shape) else 1
            b.node(f"A{i}", (f"r{i+1}", f"c{i+1}", "patches", f"u{i}", f"r{i+2}"),
                   (1 if i == 0 else bond_dim, out_dim, num_patches,
                    O.shape[1], 1 if i == N - 1 else bond_dim), kind=PARAM,
                   left=(f"r{i+1}",), right=(f"r{i+2}",))
            out_labels.append(f"c{i+1}")
            # hyperedge: input pixels x conv pixels x operator input leg
            b.tie([(f"X{i}", f"q{i}"), (f"C{i}", f"q{i}"), (f"O{i}", f"q{i}")])
            b.connect(f"O{i}", f"u{i}", f"A{i}")
            b.connect(f"X{i}", "patches", f"A{i}")
            if i > 0:
                b.connect(f"A{i-1}", f"r{i+1}", f"A{i}")
        for i in range(N):
            b.squeeze(f"A{i}", exclude=out_labels)
            b.squeeze(f"C{i}")
        # size-1 output labels are kept (reference keeps all c{i})
        topo = b.finalize([f"X{i}" for i in range(N)],
                          [f"A{i}" for i in range(N)],
                          output_labels=tuple(out_labels))
        super().__init__(Network(topo), topo.init_params(seed, dtype))


# ---------------------------------------------------------------------------
# TT over TT-compressed design-matrix blocks (reference
# CompressedTensorTrainLayer, layers.py:1420-1547): input nodes are the data
# TT blocks (k_i, p_i, d, k_{i+1}); the last block's right bond IS the sample
# axis.
# ---------------------------------------------------------------------------

class CompressedTensorTrainLayer(TNLayer):
    def __init__(self, data_blocks, bond_dim: int, output_shape=(),
                 constrict_bond: bool = True, perturb: bool = False,
                 dtype=jnp.float32, seed: int = 0):
        N = len(data_blocks)
        output_shape = output_shape if isinstance(output_shape, tuple) else (output_shape,)
        phys = [int(blk.shape[1]) for blk in data_blocks]
        b = TopologyBuilder()
        rng = np.random.default_rng(seed)
        if perturb:
            inits = []
            prev = 1
            for i in range(N):
                rr = 1 if i == N - 1 else bond_dim
                cap = min(bond_dim, prev * phys[i]) if constrict_bond else bond_dim
                rr = 1 if i == N - 1 else cap
                inits.append(perturb_block(prev, phys[i], rr, rng,
                                           0.02 if i in (0, N - 1) else 0.0))
                prev = rr
            profile = [(a.shape[0], a.shape[-1]) for a in inits]
        else:
            profile = tt_rank_profile(N, 1 if N == 1 else bond_dim, phys,
                                      constrict_bond)
            inits = [None] * N

        out_labels = ["s"]
        for i in range(1, N + 1):
            blk = np.asarray(data_blocks[i - 1])
            last = i == N
            labels = (f"k{i}", f"p{i}", "d", f"k{i+1}" if not last else "s")
            b.node(f"X{i}", labels, blk.shape, kind=CONST, init=blk,
                   left=(f"k{i}",), right=(f"k{i+1}",) if not last else ())
            if i > 1:
                b.connect(f"X{i-1}", f"k{i}", f"X{i}")
            lft, rgt = profile[i - 1]
            if i - 1 < len(output_shape):
                up, up_label = output_shape[i - 1], f"c{i}"
                out_labels.append(up_label)
            else:
                up, up_label = 1, "c"
            b.node(f"A{i}", (f"r{i}", up_label, f"p{i}", f"r{i+1}"),
                   (lft, up, phys[i - 1], rgt), kind=PARAM,
                   left=(f"r{i}",), right=(f"r{i+1}",), init=inits[i - 1])
            b.connect(f"A{i}", f"p{i}", f"X{i}")
            if i > 1:
                b.connect(f"A{i-1}", f"r{i}", f"A{i}")
        for i in range(1, N + 1):
            b.squeeze(f"A{i}", exclude=out_labels)
            b.squeeze(f"X{i}", exclude=("s",))
        topo = b.finalize([], [f"A{i}" for i in range(1, N + 1)],
                          output_labels=tuple(out_labels))
        super().__init__(Network(topo), topo.init_params(seed, dtype))


def concatenate_trains(tensor_layers):
    """Direct-sum several TTs into one (block-diagonal bond concat), averaged
    (reference concatenate_trains, layers.py:345-365)."""
    from ..ops.compression import train_concat

    def blocks_of(layer):
        N = layer.num_carriages
        blocks = []
        for i in range(1, N + 1):
            arr = np.asarray(layer.params[f"A{i}"])
            # normalise to (rl, c, p, rr)
            if i == 1:
                arr = arr[None] if arr.ndim < 4 else arr
            if arr.ndim == 2:  # (r, p) last core squeezed
                arr = arr[:, None, :, None]
            elif arr.ndim == 3:
                if i == 1:        # (c, p, r)
                    arr = arr[None]
                elif i == N:      # (r, p) + c? -> (r, c?, p)
                    arr = arr[:, None, :, None] if arr.shape[-1] != 1 else arr[..., None]
                else:             # (r, p, r')
                    arr = arr[:, None]
            blocks.append(jnp.asarray(arr.reshape(arr.shape[0], -1, 1,
                                                  arr.shape[-1])))
        return blocks

    first = blocks_of(tensor_layers[0])
    train = first
    for layer in tensor_layers[1:]:
        train = train_concat(train, blocks_of(layer))
    train[0] = train[0] / len(tensor_layers)

    N = len(train)
    f = tensor_layers[0].input_features
    out_shape = tensor_layers[0].output_shape
    out_dim = out_shape[0] if out_shape else 1
    new = TensorTrainLayer(N, max(b.shape[0] for b in train), f,
                           output_shape=out_shape, constrict_bond=False,
                           seed=0)
    params = {}
    for i, blk in enumerate(train, 1):
        arr = np.asarray(blk)  # (rl, c*p, 1, rr)
        arr = arr.reshape(arr.shape[0], out_dim if i == 1 else 1, f,
                          arr.shape[-1])
        tgt_shape = np.asarray(new.params[f"A{i}"]).shape
        params[f"A{i}"] = jnp.asarray(arr.reshape(tgt_shape))
    new.params = params
    return new
