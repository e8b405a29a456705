"""Pallas kernel oracles: weighted Gram vs einsum, engine integration."""
import numpy as np
import jax.numpy as jnp

from tensornetworksfork_tpu.ops.pallas.gram import weighted_gram


def test_weighted_gram_matches_einsum():
    rng = np.random.default_rng(0)
    B, D = 64, 200  # non-multiple of 128 exercises padding
    J = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    h = jnp.asarray(rng.uniform(0.5, 2.0, B), jnp.float32)
    A = weighted_gram(J, h, interpret=True)
    A_ref = np.einsum("sd,se,s->de", np.asarray(J), np.asarray(J),
                      np.asarray(h))
    np.testing.assert_allclose(np.asarray(A), A_ref, rtol=1e-4, atol=1e-4)


def test_engine_pallas_path_matches_dense(monkeypatch):
    """gram_and_rhs with use_pallas must equal the einsum path."""
    from tensornetworksfork_tpu.models.layers import TensorTrainLayer
    from tensornetworksfork_tpu.ops.bregman import SquareBregFunction
    from tensornetworksfork_tpu.core.engine import Network

    layer = TensorTrainLayer(3, 3, 3, output_shape=(1,), seed=0)
    t = layer.topology
    net_plain = Network(t, use_pallas=False)
    net_pallas = Network(t, use_pallas=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((16, 3)),
                    jnp.float32)
    inputs = net_plain.bind_inputs(x)
    params = layer.params
    envs_l = net_plain.env_chain(params, inputs, "left")
    envs_r = net_plain.env_chain(params, inputs, "right")
    ni = t.main_nodes[1]
    J = net_plain.jacobian(ni, params, inputs, envs_l[0], envs_r[2])
    pred = net_plain.predict_from_jacobian(ni, J, params[t.nodes[ni].name])
    _, g, H = SquareBregFunction()(pred, jnp.zeros_like(pred))
    A1, b1 = net_plain.gram_and_rhs(ni, J, g, H)
    A2, b2 = net_pallas.gram_and_rhs(ni, J, g, H)
    np.testing.assert_allclose(np.asarray(A2), np.asarray(A1), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), rtol=1e-3,
                               atol=1e-3)
