"""Parity-flag tests: disconnect/without_nodes, train_linear freeze,
train_operators member switch."""
import numpy as np
import jax.numpy as jnp

from tensornetworksfork_tpu.core.engine import Network
from tensornetworksfork_tpu.core.sweep import Member, SweepConfig, Sweeper
from tensornetworksfork_tpu.models.layers import (CumSumLayer,
                                                  TensorTrainLinearLayer)
from tensornetworksfork_tpu.ops.bregman import SquareBregFunction


def test_without_nodes_inspects_subnetwork():
    """Dropping the input nodes leaves the operator/core subnetwork intact
    (reference disconnect is used to inspect operator-only networks)."""
    layer = CumSumLayer(2, 3, 3, output_shape=(1,), seed=0)
    t = layer.topology
    sub = t.without_nodes([t.nodes[ni].name for ni in t.input_nodes])
    assert len(sub.input_nodes) == 0
    assert len(sub.main_nodes) == len(t.main_nodes)
    # contracting the remaining nodes gives the full coefficient tensor
    net = Network(sub)
    params = {k: v for k, v in layer.params.items()}
    keep = tuple(a for a in sorted(set().union(*map(set, sub.node_axes)))
                 if len(sub.axis_nodes[a]) == 1)
    ops = [net.operand(ni, params, {}) for ni in range(len(sub.nodes))]
    from tensornetworksfork_tpu.core.contract import contract
    dense = contract(ops, keep)
    assert np.isfinite(np.asarray(dense)).all()


def test_train_linear_freeze():
    layer = TensorTrainLinearLayer(2, 3, 4, 2, output_shape=(1,),
                                   train_linear=False, seed=0)
    t = layer.topology
    names = [t.nodes[ni].name for ni in t.train_nodes]
    assert names == ["A1", "A2"]
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((64, 4)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((64, 1)), jnp.float32)
    L1_before = np.asarray(layer.params["L1"])
    sw = Sweeper(layer.network, SquareBregFunction(),
                 SweepConfig(num_swipes=1, eps=1e-3))
    out, ok = sw.run([layer.params], X, y)
    assert ok
    np.testing.assert_array_equal(np.asarray(out[0]["L1"]), L1_before)
    assert not np.array_equal(np.asarray(out[0]["A1"]),
                              np.asarray(layer.params["A1"]))


def test_member_main_train_switch():
    layer = TensorTrainLinearLayer(2, 3, 4, 2, output_shape=(1,), seed=0)
    m = Member(layer.network, train="main")
    t = layer.topology
    assert m.train_nodes == t.main_nodes
    m2 = Member(layer.network)
    assert m2.train_nodes == t.train_nodes
