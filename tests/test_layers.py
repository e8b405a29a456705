"""Layer-zoo oracles: CPD forward vs explicit sum-of-products, CumSum MPO vs
cumulative-feature construction, conv-TT vs dense contraction, type-I sum
routing, CPD diagonal-mask invariant, QR gauge forward invariance."""
import numpy as np
import jax
import jax.numpy as jnp

from tensornetworksfork_tpu.models.layers import (
    CPDLayer, CPDTrainLayer, CumSumLayer, SumLayer, TensorConvolutionTrainLayer,
    TensorTrainLayer, TensorTrainLinearLayer,
)
from tensornetworksfork_tpu.core import gauges
from tensornetworksfork_tpu.core.sweep import (
    Member, SweepConfig, Sweeper, accumulating_sweep,
)
from tensornetworksfork_tpu.ops.bregman import SquareBregFunction


def test_cpd_forward_matches_sum_of_products():
    Nf, R, f = 3, 5, 4
    layer = CPDLayer(Nf, R, f, output_shape=(2,), seed=0)
    x = np.random.default_rng(0).standard_normal((6, f)).astype(np.float32)
    y = np.asarray(layer(jnp.asarray(x)))
    A1 = np.asarray(layer.params["A1"])  # (R, f, o)
    A2 = np.asarray(layer.params["A2"])  # (R, f)
    A3 = np.asarray(layer.params["A3"])
    expected = np.einsum("bpo,sp,bq,sq,br,sr->so", A1, x, A2, x, A3, x)
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-4)


def test_cumsum_layer_forward():
    """CumSum MPO makes the TT act on cumulative sums of features: for N=2,
    out = sum_{i<=j? } ordered interactions. Oracle: contract the MPO by hand."""
    N, r, f = 2, 3, 3
    layer = CumSumLayer(N, r, f, output_shape=(1,), seed=1)
    x = np.random.default_rng(1).standard_normal((4, f)).astype(np.float32)
    y = np.asarray(layer(jnp.asarray(x)))

    from tensornetworksfork_tpu.models.layers import cum_sum_operator
    O1 = cum_sum_operator(0, N, f)  # (1, f, f, f) -> squeezed (f,f,f)
    O2 = cum_sum_operator(1, N, f)  # (f, f, f, 1)
    A1 = np.asarray(layer.params["A1"])  # (c, p1, r2) (left bond squeezed)
    A2 = np.asarray(layer.params["A2"])  # (r2, p2)
    # effective input per carriage: u_i = O_i applied to x over (down, bond)
    expected = np.einsum(
        "cpr,rq,pdb,bqe,sd,se->sc",
        A1, A2, O1[0], O2[..., 0], x, x,
    )
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=2e-4)


def test_conv_tt_forward_matches_dense():
    N, r, P, pp, CB = 3, 4, 5, 6, 2
    layer = TensorConvolutionTrainLayer(N, r, P, pp, output_shape=(3,),
                                        convolution_bond=CB, seed=2)
    x = np.random.default_rng(2).standard_normal((4, P, pp)).astype(np.float32)
    y = np.asarray(layer(jnp.asarray(x)))
    p = {k: np.asarray(v) for k, v in layer.params.items()}
    # A1 (c, patches, r2), A2 (r2, patches, r3), A3 (r3, patches)
    # C1 (pp, CB2), C2 (CB2, pp, CB3), C3 (CB3, pp)
    expected = np.einsum(
        "cpr,rqt,tu,spa,sqb,sud,ae,ebf,fd->sc",
        p["A1"], p["A2"], p["A3"], x, x, x, p["C1"], p["C2"], p["C3"],
    )
    np.testing.assert_allclose(y, expected, rtol=1e-3, atol=1e-3)


def test_sum_layer_type1_routing():
    """Members drop the bias column; outputs add."""
    f = 4
    l1 = TensorTrainLayer(1, 1, f, output_shape=(1,), seed=0)
    l2 = TensorTrainLayer(2, 3, f - 1, output_shape=(1,), seed=1)
    sl = SumLayer([l1, l2])
    x = np.random.default_rng(3).standard_normal((5, f)).astype(np.float32)
    y = np.asarray(sl(jnp.asarray(x)))
    y1 = np.asarray(l1(jnp.asarray(x)))
    y2 = np.asarray(l2(jnp.asarray(x[:, : f - 1])))
    np.testing.assert_allclose(y, y1 + y2, rtol=1e-4, atol=1e-4)


def test_sum_sweep_trains_members():
    """Sweeping a 2-member sum reduces the joint loss."""
    rng = np.random.default_rng(4)
    S, f = 128, 4
    X1 = rng.standard_normal((S, f - 1)).astype(np.float32)
    X = np.concatenate([X1, np.ones((S, 1), np.float32)], axis=1)
    y = (X1[:, 0] + 0.5 * X1[:, 1] * X1[:, 2]).reshape(S, 1).astype(np.float32)

    l1 = TensorTrainLayer(1, 1, f, output_shape=(1,), seed=0)
    l2 = TensorTrainLayer(2, 3, f - 1, output_shape=(1,), seed=1)
    sl = SumLayer([l1, l2])
    members = [Member(l.network, fn) for l, fn in zip(sl.layers, sl.input_fns)]
    sw = Sweeper(members, SquareBregFunction(),
                 SweepConfig(num_swipes=6, method="ridge_cholesky", eps=1e-6))
    params_list, ok = sw.run([l.params for l in sl.layers], jnp.asarray(X),
                             jnp.asarray(y))
    assert ok
    sl.set_params_list(params_list)
    pred = np.asarray(sl(jnp.asarray(X)))
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    assert rmse < 5e-2, rmse


def test_cpd_as_tt_mask_keeps_cores_diagonal():
    N, r, f = 3, 3, 3
    layer = CPDTrainLayer(N, r, f, output_shape=(1,), seed=3)
    rng = np.random.default_rng(5)
    X = rng.standard_normal((64, f)).astype(np.float32)
    y = rng.standard_normal((64, 1)).astype(np.float32)
    params, ok = accumulating_sweep(
        layer.network, layer.params, jnp.asarray(X), jnp.asarray(y),
        SquareBregFunction(),
        SweepConfig(num_swipes=2, method="ridge_cholesky", eps=1e-3))
    assert ok
    mid = np.asarray(params["A2"])  # (r, p, r): off-diagonal in (r, r) stays 0
    for k in range(f):
        m = mid[:, k, :]
        off = m - np.diag(np.diag(m))
        np.testing.assert_allclose(off, 0, atol=1e-5)


def test_qr_gauge_preserves_forward():
    layer = TensorTrainLayer(3, 4, 3, output_shape=(2,), seed=6)
    net = layer.network
    x = jnp.asarray(np.random.default_rng(6).standard_normal((5, 3)), jnp.float32)
    inputs = net.bind_inputs(x)
    before = np.asarray(net.forward(layer.params, inputs))
    p = gauges.orthonormalize_all_left(net, layer.params)
    np.testing.assert_allclose(np.asarray(net.forward(p, inputs)), before,
                               rtol=1e-4, atol=1e-4)
    # left-orthonormality of non-last cores: sum over non-right-bond axes
    t = net.topology
    for k in range(len(t.main_nodes) - 1):
        ni, nj = t.main_nodes[k], t.main_nodes[k + 1]
        core = np.asarray(p[t.nodes[ni].name])
        shared = (set(t.node_axes[ni]) & set(t.node_axes[nj])) - {t.sample_axis}
        pi = t.node_axes[ni].index(shared.pop())
        mat = np.moveaxis(core, pi, -1).reshape(-1, core.shape[pi])
        np.testing.assert_allclose(mat.T @ mat, np.eye(core.shape[pi]),
                                   atol=1e-4)
    p2 = gauges.orthonormalize_all_right(net, p)
    np.testing.assert_allclose(np.asarray(net.forward(p2, inputs)), before,
                               rtol=1e-4, atol=1e-4)


def test_qr_gauge_wide_core_bond_shrink():
    """f < r: the QR is wide (rows < bond). Where the reference reshapes the
    node (network.py:625-707), the static-shape build zero-pads — forward
    must stay invariant and each core orthonormal on its support."""
    f, r = 2, 6
    layer = TensorTrainLayer(3, r, f, output_shape=(1,), seed=7,
                             constrict_bond=False)
    net = layer.network
    x = jnp.asarray(np.random.default_rng(7).standard_normal((5, f)),
                    jnp.float32)
    inputs = net.bind_inputs(x)
    before = np.asarray(net.forward(layer.params, inputs))
    p = gauges.orthonormalize_all_left(net, layer.params)
    np.testing.assert_allclose(np.asarray(net.forward(p, inputs)), before,
                               rtol=1e-4, atol=1e-4)
    t = net.topology
    for k in range(len(t.main_nodes) - 1):
        ni, nj = t.main_nodes[k], t.main_nodes[k + 1]
        core = np.asarray(p[t.nodes[ni].name])
        shared = (set(t.node_axes[ni]) & set(t.node_axes[nj])) - {t.sample_axis}
        pi = t.node_axes[ni].index(shared.pop())
        bond = core.shape[pi]
        mat = np.moveaxis(core, pi, -1).reshape(-1, bond)
        rank = min(mat.shape)
        G = mat.T @ mat
        want = np.diag(np.concatenate([np.ones(rank), np.zeros(bond - rank)]))
        np.testing.assert_allclose(G, want, atol=1e-4)
        assert rank < bond or k > 0  # the first core really was the wide case
    # right gauge on the wide chain must also stay forward-invariant
    p2 = gauges.orthonormalize_all_right(net, layer.params)
    np.testing.assert_allclose(np.asarray(net.forward(p2, inputs)), before,
                               rtol=1e-4, atol=1e-4)


def test_tt_linear_layer_trains():
    rng = np.random.default_rng(7)
    S, f, ld = 128, 6, 3
    X = np.concatenate([rng.standard_normal((S, f - 1)).astype(np.float32),
                        np.ones((S, 1), np.float32)], axis=1)
    y = (X[:, 0] * X[:, 1]).reshape(S, 1).astype(np.float32)
    layer = TensorTrainLinearLayer(2, 4, f, ld, output_shape=(1,), seed=0)
    params, ok = accumulating_sweep(
        layer.network, layer.params, jnp.asarray(X), jnp.asarray(y),
        SquareBregFunction(),
        SweepConfig(num_swipes=8, method="ridge_cholesky", eps=1e-6))
    assert ok
    pred = np.asarray(layer.network.forward(params, layer.network.bind_inputs(jnp.asarray(X))))
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    assert rmse < 5e-2, rmse
