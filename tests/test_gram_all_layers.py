"""The strongest engine oracle, across the whole zoo: for EVERY layer family
and EVERY train node, (A, b) from the engine must equal the dense Gauss-Newton
system built from the autograd Jacobian of the flattened forward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworksfork_tpu.models.layers import (
    CPDLayer, CPDTrainLayer, CumSumLayer, OperatorTTLayer,
    TensorConvolutionGridTrainLayer, TensorConvolutionTrainLayer,
    TensorTrainLayer, TensorTrainLinearLayer, TensorTrainSplitInputLayer,
    cum_sum_operator,
)
from tensornetworksfork_tpu.ops.bregman import SquareBregFunction, XEBregman


def _case_tt():
    layer = TensorTrainLayer(3, 3, 3, output_shape=(2,), seed=0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((6, 3)), jnp.float32)
    return layer, x


def _case_tt_linear():
    layer = TensorTrainLinearLayer(2, 3, 4, 2, output_shape=(1,), seed=1)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((6, 4)), jnp.float32)
    return layer, x


def _case_cumsum():
    layer = CumSumLayer(3, 3, 3, output_shape=(1,), seed=2)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((6, 3)), jnp.float32)
    return layer, x


def _case_conv():
    layer = TensorConvolutionTrainLayer(2, 3, 4, 5, output_shape=(2,),
                                        convolution_bond=2, seed=3)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((6, 4, 5)),
                    jnp.float32)
    return layer, x


def _case_grid():
    layer = TensorConvolutionGridTrainLayer(2, 2, 3, 2, 2, 4, 5,
                                            output_shape=(2,),
                                            convolution_bond=2, seed=4)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((6, 4, 5)),
                    jnp.float32)
    return layer, x


def _case_cpd():
    layer = CPDLayer(3, 4, 3, output_shape=(2,), seed=5)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((6, 3)), jnp.float32)
    return layer, x


def _case_operator():
    f, N = 3, 2
    layer = OperatorTTLayer(cum_sum_operator(1, 4, f), f, 3, N,
                            output_shape=(1,),
                            left=cum_sum_operator(0, N, f),
                            right=cum_sum_operator(N - 1, N, f), seed=6)
    x = jnp.asarray(np.random.default_rng(6).standard_normal((6, f)), jnp.float32)
    return layer, x


def _case_split():
    layer = TensorTrainSplitInputLayer(2, 3, input_shape=(2, 3),
                                       output_shape=(1,), axle_bond=2, seed=7)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((6, 2, 3)),
                    jnp.float32)
    return layer, [x, x]


CASES = {
    "tt": _case_tt,
    "tt_linear": _case_tt_linear,
    "cumsum": _case_cumsum,
    "conv": _case_conv,
    "grid": _case_grid,
    "cpd": _case_cpd,
    "operator": _case_operator,
    "split": _case_split,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_gram_matches_autograd(name):
    layer, x = CASES[name]()
    net = layer.network
    t = net.topology
    inputs = net.bind_inputs(x)
    params = layer.params
    envs_l = net.env_chain(params, inputs, "left")
    envs_r = net.env_chain(params, inputs, "right")
    ncols = len(t.columns)
    loss_fn = SquareBregFunction()

    for ni in t.train_nodes:
        node_name = t.nodes[ni].name
        ci = t.col_of[ni]
        L = envs_l[ci - 1] if ci > 0 else None
        R = envs_r[ci + 1] if ci < ncols - 1 else None
        J = net.jacobian(ni, params, inputs, L, R)
        pred = net.predict_from_jacobian(ni, J, params[node_name])
        full = net.forward(params, inputs)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(full),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"{name}:{node_name} pred!=fwd")

        y_true = jnp.zeros_like(pred)
        loss, g, H = loss_fn(pred, y_true)
        A, b = net.gram_and_rhs(ni, J, g, H)

        def fwd_flat(core_flat):
            p = dict(params, **{node_name: core_flat.reshape(
                params[node_name].shape)})
            return net.forward(p, inputs).reshape(-1)

        Ja = np.asarray(jax.jacfwd(fwd_flat)(params[node_name].reshape(-1)))
        D = params[node_name].size
        b_ref = Ja.T @ (2 * np.asarray(pred).reshape(-1))
        A_ref = 2 * Ja.T @ Ja
        np.testing.assert_allclose(np.asarray(b).reshape(D), b_ref,
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"{name}:{node_name} b")
        np.testing.assert_allclose(np.asarray(A).reshape(D, D), A_ref,
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f"{name}:{node_name} A")


def test_gram_matches_autograd_xe_full_hessian():
    """Full-Hessian (XE) path against autograd on the conv layer."""
    layer, x = _case_conv()
    net = layer.network
    t = net.topology
    inputs = net.bind_inputs(x)
    params = layer.params
    envs_l = net.env_chain(params, inputs, "left")
    envs_r = net.env_chain(params, inputs, "right")
    loss_fn = XEBregman(w=1.0)
    y = jnp.asarray(np.eye(3, dtype=np.float32)[
        np.random.default_rng(8).integers(0, 3, 6)])

    ni = t.train_nodes[1]
    node_name = t.nodes[ni].name
    ci = t.col_of[ni]
    L = envs_l[ci - 1] if ci > 0 else None
    R = envs_r[ci + 1] if ci < len(t.columns) - 1 else None
    J = net.jacobian(ni, params, inputs, L, R)
    pred = net.predict_from_jacobian(ni, J, params[node_name])
    loss, g, H = loss_fn(pred, y)
    A, b = net.gram_and_rhs(ni, J, g, H)

    def fwd_flat(core_flat):
        p = dict(params, **{node_name: core_flat.reshape(params[node_name].shape)})
        return net.forward(p, inputs)

    Ja = np.asarray(jax.jacfwd(
        lambda v: fwd_flat(v).reshape(-1))(params[node_name].reshape(-1)))
    S, C = pred.shape
    Jsc = Ja.reshape(S, C, -1)
    g_np, H_np = np.asarray(g), np.asarray(H)
    b_ref = np.einsum("sci,sc->i", Jsc, g_np)
    A_ref = np.einsum("sci,sdj,scd->ij", Jsc, Jsc, H_np)
    D = params[node_name].size
    np.testing.assert_allclose(np.asarray(b).reshape(D), b_ref, rtol=5e-3,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(A).reshape(D, D), A_ref, rtol=5e-3,
                               atol=5e-3)
