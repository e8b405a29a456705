"""Pallas kernel oracles: weighted Gram vs einsum, engine integration."""
import numpy as np
import jax.numpy as jnp
import pytest

from tensornetworksfork_tpu.ops.pallas.gram import weighted_gram


def test_weighted_gram_matches_einsum():
    rng = np.random.default_rng(0)
    B, D = 64, 200  # non-multiple of 128 exercises padding
    J = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    h = jnp.asarray(rng.uniform(0.5, 2.0, B), jnp.float32)
    A_ref = np.einsum("sd,se,s->de", np.asarray(J), np.asarray(J),
                      np.asarray(h))
    for sym in (True, False):  # syrk (default) and rectangular kernels
        A = weighted_gram(J, h, interpret=True, symmetric=sym, tile=128)
        np.testing.assert_allclose(np.asarray(A), A_ref, rtol=1e-4,
                                   atol=1e-4)


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


def test_gram_pair_matches_einsum():
    from tensornetworksfork_tpu.ops.pallas.gram import gram_pair
    rng = np.random.default_rng(1)
    B, D = 96, 150
    J1 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    J2 = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    A = gram_pair(J1, J2, interpret=True)
    A_ref = np.einsum("sd,se->de", np.asarray(J1), np.asarray(J2))
    np.testing.assert_allclose(np.asarray(A), A_ref, rtol=1e-4, atol=1e-4)


def test_gram_pair_symmetric_matches_full():
    """syrk mode (upper-triangular tiles + mirror) == rectangular kernel for
    a symmetric Gram (J2 = W J1, W symmetric PSD)."""
    from tensornetworksfork_tpu.ops.pallas.gram import gram_pair
    rng = np.random.default_rng(5)
    B, D = 80, 300  # > 1 tile at tile=128, with padding remainder
    J = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, B), jnp.float32)
    K = J * w[:, None]
    A_full = gram_pair(J, K, interpret=True, tile=128)
    A_sym = gram_pair(J, K, interpret=True, tile=128, symmetric=True)
    np.testing.assert_allclose(np.asarray(A_sym), np.asarray(A_full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(A_sym), np.asarray(A_sym).T,
                               rtol=0, atol=0)


def test_engine_pallas_big_node_branch(monkeypatch):
    """Forcing the big-node route (TNF_FLAT_GRAM_MAX_D=1) must produce the
    same Gram as the flat path WITHOUT flattening: reshaping a big multi-axis
    J materialises a tile-padded layout copy that OOMs HBM at flagship shapes
    (the round-1 'remote compiler crash'), so big nodes must stay on the
    multi-contracting-dim dot even with pallas enabled."""
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman
    from tensornetworksfork_tpu.core.engine import Network

    monkeypatch.setenv("TNF_FLAT_GRAM_MAX_D", "1")
    layer = TensorConvolutionTrainLayer(2, 3, 4, 5, output_shape=(3,),
                                        convolution_bond=2, seed=0)
    t = layer.topology
    net_plain = Network(t, use_pallas=False)
    net_pallas = Network(t, use_pallas=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 4, 5)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 8)])
    inputs = net_plain.bind_inputs(x)
    params = layer.params
    envs_l = net_plain.env_chain(params, inputs, "left")
    envs_r = net_plain.env_chain(params, inputs, "right")
    ni = t.main_nodes[1]
    ci = t.col_of[ni]
    L = envs_l[ci - 1]
    R = envs_r[ci + 1] if ci < len(t.columns) - 1 else None
    J = net_plain.jacobian(ni, params, inputs, L, R)
    pred = net_plain.predict_from_jacobian(ni, J, params[t.nodes[ni].name])
    _, g, H = XEBregman(w=1.0)(pred, y)
    A1, b1 = net_plain.gram_and_rhs(ni, J, g, H, big_flat_ok=True)
    from tensornetworksfork_tpu.ops.pallas.gram import CALLS
    before = CALLS["gram_pair"]
    A2, b2 = net_pallas.gram_and_rhs(ni, J, g, H)
    assert CALLS["gram_pair"] == before  # big nodes must NOT flatten
    np.testing.assert_allclose(np.asarray(A2), np.asarray(A1), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), rtol=2e-3,
                               atol=2e-3)


def test_sweep_routes_through_pallas(monkeypatch):
    """A real sweep on a conv-TT with pallas enabled must actually take the
    gram_pair branch (trace-time call counter) and match the plain sweep's
    updated params."""
    from tensornetworksfork_tpu.core.sweep import Member, SweepConfig, Sweeper
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman
    from tensornetworksfork_tpu.ops.pallas.gram import CALLS

    layer = TensorConvolutionTrainLayer(2, 3, 4, 5, output_shape=(3,),
                                        convolution_bond=2, seed=0)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((32, 4, 5)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 32)])
    cfg = SweepConfig(num_swipes=1, batch_size=16, method="ridge_cholesky",
                      eps=0.5)

    p_plain, okp = Sweeper(Network(layer.topology, use_pallas=False),
                           XEBregman(w=1.0), cfg).run([layer.params], x, y)
    before = CALLS["gram_pair"]
    p_pal, okq = Sweeper(Network(layer.topology, use_pallas=True),
                         XEBregman(w=1.0), cfg).run([layer.params], x, y)
    assert okp and okq
    assert CALLS["gram_pair"] > before
    for k in p_plain[0]:
        np.testing.assert_allclose(np.asarray(p_pal[0][k]),
                                   np.asarray(p_plain[0][k]),
                                   rtol=5e-3, atol=5e-3)


def test_engine_gram_dtype_bf16(monkeypatch):
    """TNF_GRAM_DTYPE=bf16 degrades only the Gram operand rounding: A must
    track the f32 path to bf16-level relative error."""
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman
    from tensornetworksfork_tpu.core.engine import Network

    layer = TensorConvolutionTrainLayer(2, 3, 4, 5, output_shape=(3,),
                                        convolution_bond=2, seed=0)
    t = layer.topology
    net_plain = Network(t, use_pallas=False)
    net_pallas = Network(t, use_pallas=True)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((16, 4, 5)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 16)])
    inputs = net_plain.bind_inputs(x)
    params = layer.params
    envs_l = net_plain.env_chain(params, inputs, "left")
    envs_r = net_plain.env_chain(params, inputs, "right")
    ni = t.main_nodes[1]
    ci = t.col_of[ni]
    L, R = envs_l[ci - 1], (envs_r[ci + 1] if ci < len(t.columns) - 1
                            else None)
    J = net_plain.jacobian(ni, params, inputs, L, R)
    pred = net_plain.predict_from_jacobian(ni, J, params[t.nodes[ni].name])
    _, g, H = XEBregman(w=1.0)(pred, y)
    A1, _ = net_plain.gram_and_rhs(ni, J, g, H)
    monkeypatch.setenv("TNF_GRAM_DTYPE", "bf16")
    A2, _ = net_pallas.gram_and_rhs(ni, J, g, H)
    scale = float(np.abs(np.asarray(A1)).max())
    np.testing.assert_allclose(np.asarray(A2) / scale,
                               np.asarray(A1) / scale, atol=3e-2)


def test_engine_pallas_full_hessian_path():
    """XE (full Hessian) gram via the pallas pair kernel == einsum path."""
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman
    from tensornetworksfork_tpu.core.engine import Network

    layer = TensorConvolutionTrainLayer(2, 3, 4, 5, output_shape=(3,),
                                        convolution_bond=2, seed=0)
    t = layer.topology
    net_plain = Network(t, use_pallas=False)
    net_pallas = Network(t, use_pallas=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 4, 5)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 8)])
    inputs = net_plain.bind_inputs(x)
    params = layer.params
    envs_l = net_plain.env_chain(params, inputs, "left")
    envs_r = net_plain.env_chain(params, inputs, "right")
    ni = t.main_nodes[1]  # second core: J carries the c axis via left env
    ci = t.col_of[ni]
    L = envs_l[ci - 1]
    R = envs_r[ci + 1] if ci < len(t.columns) - 1 else None
    J = net_plain.jacobian(ni, params, inputs, L, R)
    pred = net_plain.predict_from_jacobian(ni, J, params[t.nodes[ni].name])
    _, g, H = XEBregman(w=1.0)(pred, y)
    A1, b1 = net_plain.gram_and_rhs(ni, J, g, H)
    A2, b2 = net_pallas.gram_and_rhs(ni, J, g, H)
    np.testing.assert_allclose(np.asarray(A2), np.asarray(A1), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), rtol=2e-3,
                               atol=2e-3)


def test_packed_gram_syrk_route_matches_dot(monkeypatch):
    """The f32 packed-Gram Pallas syrk route (big-D fast path) must equal
    the multi-contracting-dim dot, for both full and diagonal Hessians."""
    import jax
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import (
        TensorConvolutionTrainLayer)
    from tensornetworksfork_tpu.ops.bregman import (SquareBregFunction,
                                                    XEBregman)

    layer = TensorConvolutionTrainLayer(3, 4, 5, 3, output_shape=(3,),
                                        convolution_bond=2, seed=0)
    t = layer.topology
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, 5, 3)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 16)])
    params = layer.params
    net_dot = Network(t, use_pallas=False)
    net_syrk = Network(t, use_pallas=True)
    inputs = net_dot.bind_inputs(x)
    envs_l = net_dot.env_chain(params, inputs, "left")
    envs_r = net_dot.env_chain(params, inputs, "right")
    # force the syrk branch at tiny D
    monkeypatch.setenv("TNF_PACKED_SYRK_MIN_D", "1")
    checked = 0
    for ni in t.train_nodes:
        ci = t.col_of[ni]
        L = envs_l[ci - 1] if ci > 0 else None
        R = envs_r[ci + 1] if ci < len(t.columns) - 1 else None
        pj = net_dot.packed_jacobian(ni, params, inputs, L, R)
        if pj is None:
            continue
        checked += 1
        pred = net_dot.packed_predict(pj, params[t.nodes[ni].name])
        for loss_fn in (XEBregman(w=1.0), SquareBregFunction()):
            yy = y if isinstance(loss_fn, XEBregman) else jnp.zeros_like(pred)
            _, g, H = loss_fn(pred, yy)
            A_dot, b_dot = net_dot.packed_gram_rhs(pj, g, H)
            A_syr, b_syr = net_syrk.packed_gram_rhs(pj, g, H)
            np.testing.assert_allclose(np.asarray(A_syr), np.asarray(A_dot),
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(np.asarray(b_syr), np.asarray(b_dot),
                                       rtol=2e-4, atol=2e-4)
    assert checked >= 2


def test_own_out_kernel_matches_dot_path(monkeypatch):
    """The fused class-pair own-out Gram kernel (own_out_gram) must equal
    the structured K=H*J dot path on an output-owning node (conv-TT A1).
    The kernel is opt-in (slower than the structured dot at flagship A1,
    engine.gram_and_rhs comment) but must stay correct."""
    monkeypatch.setenv("TNF_OWNOUT_KERNEL", "1")
    monkeypatch.setenv("TNF_OWNOUT_KERNEL_MIN_DJ", "16")
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import (
        TensorConvolutionTrainLayer)
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    layer = TensorConvolutionTrainLayer(
        num_carriages=3, bond_dim=4, num_patches=10, patch_pixels=5,
        output_shape=(3,), convolution_bond=2, seed=0)
    t = layer.network.topology
    net_dot = Network(t, use_pallas=False)
    net_ker = Network(t, use_pallas=True)
    ni = t.by_name["A1"]
    ci = t.col_of[ni]
    rng = np.random.default_rng(0)
    B = 32
    x = {t.nodes[nj].name: jnp.asarray(rng.standard_normal(
            (B,) + tuple(d for d in t.nodes[nj].shape if d is not None)),
            jnp.float32) for nj in t.input_nodes}
    inputs = net_dot.bind_inputs(x)
    envs_l = net_dot.env_chain(layer.params, inputs, "left")
    envs_r = net_dot.env_chain(layer.params, inputs, "right")
    L = envs_l[ci - 1] if ci > 0 else None
    R = envs_r[ci + 1] if ci < len(t.columns) - 1 else None
    J = net_dot.jacobian(ni, layer.params, inputs, L, R)
    core = layer.params[t.nodes[ni].name]
    pred = net_dot.predict_from_jacobian(ni, J, core)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, B)])
    _, g, H = XEBregman(w=1.0)(pred, y)
    A_dot, b_dot = net_dot.gram_and_rhs(ni, J, g, H)
    A_ker, b_ker = net_ker.gram_and_rhs(ni, J, g, H)
    np.testing.assert_allclose(np.asarray(A_ker), np.asarray(A_dot),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b_ker), np.asarray(b_dot),
                               rtol=1e-5, atol=1e-6)


def test_retile_hmix_matches_reference():
    """Fused retile+class-mix kernel: (Jt, Kt) must equal the class-major
    transpose of J and of K = H*J, for the kernel grid (interpret), the
    ragged-tail splice, and the pure-jnp fallback (odd S)."""
    from tensornetworksfork_tpu.ops.pallas.gram import retile_hmix

    rng = np.random.default_rng(7)
    for S, C, D, tile in ((32, 3, 300, 128),   # kernel + tail splice
                          (32, 4, 256, 128),   # kernel, exact tiles
                          (17, 3, 90, 128)):   # jnp fallback (S odd, D<tile)
        n = (D + tile - 1) // tile
        Dp = n * tile
        J3 = jnp.asarray(rng.standard_normal((S, C, D)), jnp.float32)
        H = rng.standard_normal((S, C, C)).astype(np.float32)
        H = jnp.asarray(H + np.transpose(H, (0, 2, 1)))  # symmetric/sample
        Jt, Kt = retile_hmix(J3, H, n, tile, interpret=True)
        assert Jt.shape == (n, C, S, tile) and Kt.shape == (n, C, S, tile)
        Jp = np.zeros((S, C, Dp), np.float32)
        Jp[:, :, :D] = np.asarray(J3)
        K_ref = np.einsum("scd,sdt->sct", np.asarray(H), Jp)
        Jt_ref = np.transpose(Jp.reshape(S, C, n, tile), (2, 1, 0, 3))
        Kt_ref = np.transpose(K_ref.reshape(S, C, n, tile), (2, 1, 0, 3))
        np.testing.assert_allclose(np.asarray(Jt), Jt_ref, rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(Kt), Kt_ref, rtol=1e-4,
                                   atol=1e-4)


def test_kmix_engine_route_matches_xla(monkeypatch):
    """packed_gram_rhs with the fused kmix kernel (default) must equal the
    slab-wise XLA K-build route (TNF_KMIX=0) at a D > tile shape that takes
    the in-interpret kernel grid."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import (
        TensorConvolutionTrainLayer)
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    monkeypatch.setenv("TNF_PACKED_SYRK_MIN_D", "1")
    monkeypatch.setenv("TNF_PALLAS_TILE", "128")
    layer = TensorConvolutionTrainLayer(3, 6, 12, 4, output_shape=(4,),
                                        convolution_bond=3, seed=1)
    t = layer.topology
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((32, 12, 4)), jnp.float32)
    y = jnp.asarray(np.eye(5, dtype=np.float32)[rng.integers(0, 5, 32)])
    params = layer.params
    net = Network(t, use_pallas=True)
    inputs = net.bind_inputs(x)
    envs_l = net.env_chain(params, inputs, "left")
    envs_r = net.env_chain(params, inputs, "right")
    checked = 0
    for ni in t.train_nodes:
        ci = t.col_of[ni]
        L = envs_l[ci - 1] if ci > 0 else None
        R = envs_r[ci + 1] if ci < len(t.columns) - 1 else None
        pj = net.packed_jacobian(ni, params, inputs, L, R)
        if pj is None or pj["a0_sz"] * pj["r_sz"] <= 128:
            continue
        checked += 1
        pred = net.packed_predict(pj, params[t.nodes[ni].name])
        _, g, H = XEBregman(w=1.0)(pred, y)
        monkeypatch.setenv("TNF_KMIX", "0")
        A_xla, b_xla = net.packed_gram_rhs(pj, g, H)
        monkeypatch.setenv("TNF_KMIX", "1")
        A_ker, b_ker = net.packed_gram_rhs(pj, g, H)
        np.testing.assert_allclose(np.asarray(A_ker), np.asarray(A_xla),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(b_ker), np.asarray(b_xla),
                                   rtol=2e-4, atol=2e-4)
    assert checked >= 1


def test_sweep_padded_raw_carry_matches_plain(monkeypatch):
    """Multi-chunk sweep through the tiled kernel route: chunks accumulate
    via the PADDED raw carry + add_packed_upper (upper-tiles-only Pallas
    add), mirrored once before the solve — must match the plain engine's
    sweep and must actually take the add kernel (trace-time counter)."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.core.sweep import Member, SweepConfig, Sweeper
    from tensornetworksfork_tpu.models.layers import (
        TensorConvolutionTrainLayer)
    from tensornetworksfork_tpu.ops.bregman import XEBregman
    from tensornetworksfork_tpu.ops.pallas.gram import CALLS

    monkeypatch.setenv("TNF_PACKED_SYRK_MIN_D", "1")
    monkeypatch.setenv("TNF_PALLAS_TILE", "128")
    layer = TensorConvolutionTrainLayer(3, 6, 12, 4, output_shape=(4,),
                                        convolution_bond=3, seed=2)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((48, 12, 4)), jnp.float32)
    y = jnp.asarray(np.eye(5, dtype=np.float32)[rng.integers(0, 5, 48)])
    cfg = SweepConfig(num_swipes=1, batch_size=16, method="ridge_cholesky",
                      eps=0.5)  # 3 chunks -> 2 in-scan adds per node

    p_plain, okp = Sweeper(Network(layer.topology, use_pallas=False),
                           XEBregman(w=1.0), cfg).run([layer.params], x, y)
    before = CALLS["add_packed_upper"]
    p_pal, okq = Sweeper(Network(layer.topology, use_pallas=True),
                         XEBregman(w=1.0), cfg).run([layer.params], x, y)
    assert okp and okq
    assert CALLS["add_packed_upper"] > before
    for k in p_plain[0]:
        np.testing.assert_allclose(np.asarray(p_pal[0][k]),
                                   np.asarray(p_plain[0][k]),
                                   rtol=5e-3, atol=5e-3)


def test_quantize_tiled_roundtrip():
    """Dequantized int8 operands reconstruct the input within half a
    quantization step of each (slab, block, column)'s absmax/127 scale."""
    from tensornetworksfork_tpu.ops.pallas.gram import quantize_tiled
    rng = np.random.default_rng(7)
    n, rows, tile = 3, 80, 128  # rows < block: sublane-rounded single block
    Jt = jnp.asarray(rng.standard_normal((n, rows, tile)) *
                     rng.uniform(0.1, 10, (1, 1, tile)), jnp.float32)
    Q, s = quantize_tiled(Jt, block=256)
    assert Q.dtype == jnp.int8 and Q.shape[1] % 32 == 0
    nb = s.shape[1]
    BS = Q.shape[1] // nb
    deq = (np.asarray(Q, np.float32).reshape(n, nb, BS, tile)
           * np.asarray(s)[:, :, None, :]).reshape(n, Q.shape[1], tile)
    err = np.abs(deq[:, :rows] - np.asarray(Jt))
    bound = np.repeat(np.asarray(s) / 2, BS, axis=1)[:, :rows] + 1e-7
    assert (err <= bound).all()
    # zero-padding rows quantize to exactly 0
    assert (np.asarray(Q)[:, rows:] == 0).all()


def test_gram_pair_tiled_q_matches_int_reference():
    """The int8 pair kernel is EXACT given the quantized operands: its raw
    upper tiles equal the numpy int64 blockwise-rescaled reference."""
    from tensornetworksfork_tpu.ops.pallas.gram import (gram_pair_tiled_q,
                                                        quantize_tiled)
    rng = np.random.default_rng(8)
    n, rows, tile = 2, 96, 128
    J = jnp.asarray(rng.standard_normal((n, rows, tile)), jnp.float32)
    K = jnp.asarray(rng.standard_normal((n, rows, tile)), jnp.float32)
    Q1, s1 = quantize_tiled(J, block=32)   # several blocks
    Q2, s2 = quantize_tiled(K, block=32)
    A = gram_pair_tiled_q(Q1, s1, Q2, s2, interpret=True, tile=tile,
                          mirror=True)
    q1 = np.asarray(Q1, np.int64)
    q2 = np.asarray(Q2, np.int64)
    nb = s1.shape[1]
    BS = q1.shape[1] // nb
    D = n * tile
    ref = np.zeros((D, D))
    for b in range(nb):
        qb1 = q1[:, b * BS:(b + 1) * BS]  # (n, BS, tile)
        qb2 = q2[:, b * BS:(b + 1) * BS]
        sc1 = np.asarray(s1)[:, b]  # (n, tile)
        sc2 = np.asarray(s2)[:, b]
        blk = np.einsum("ibd,jbe->idje", qb1, qb2).astype(np.float64)
        blk *= sc1[:, :, None, None]   # rescale rows by q1's column scales
        blk *= sc2[None, None, :, :]   # rescale cols by q2's column scales
        ref += blk.reshape(D, D)
    ref = np.triu(ref) + np.triu(ref, 1).T  # kernel mirrors the upper
    np.testing.assert_allclose(np.asarray(A), ref, rtol=1e-5, atol=1e-5)


def test_gram_pair_tiled_q_rejects_mismatched_blocks():
    """quantize_tiled's VMEM clamp is itemsize-dependent: at the flagship
    (tile=512, block=2048) a bf16 operand keeps BS=2048 while an f32 one
    halves to 1024, so the scale arrays disagree on the block count. The
    pair kernel derives ONE block size from s1 — mixed layouts must fail
    loudly (they used to silently rescale with the wrong absmax; the
    engine's diag path now casts K to Jt's dtype before quantizing)."""
    from tensornetworksfork_tpu.ops.pallas.gram import (gram_pair_tiled_q,
                                                        quantize_tiled)
    rng = np.random.default_rng(11)
    rows, tile = 2048, 512
    J = jnp.asarray(rng.standard_normal((1, rows, tile)), jnp.bfloat16)
    K = jnp.asarray(rng.standard_normal((1, rows, tile)), jnp.float32)
    Q1, s1 = quantize_tiled(J, block=2048)
    Q2, s2 = quantize_tiled(K, block=2048)
    assert s1.shape[1] != s2.shape[1]  # the divergence this guards against
    with pytest.raises(ValueError, match="quantization layout"):
        gram_pair_tiled_q(Q1, s1, Q2, s2, interpret=True, tile=tile)
    # the engine-side fix: quantizing K at Jt's dtype restores agreement
    Q2b, s2b = quantize_tiled(K.astype(J.dtype), block=2048)
    assert Q2b.shape == Q1.shape and s2b.shape == s1.shape


def test_engine_gram_dtype_int8(monkeypatch):
    """TNF_GRAM_DTYPE=int8 on the tiled route: A/b must track the f32 path
    to quantization-level error, and the q-kernel must actually be taken
    (trace-time counter) for full, diagonal and no-kmix Hessians."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import (
        TensorConvolutionTrainLayer)
    from tensornetworksfork_tpu.ops.bregman import (SquareBregFunction,
                                                    XEBregman)
    from tensornetworksfork_tpu.ops.pallas.gram import CALLS

    layer = TensorConvolutionTrainLayer(3, 4, 5, 3, output_shape=(3,),
                                        convolution_bond=2, seed=0)
    t = layer.topology
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((24, 5, 3)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 24)])
    params = layer.params
    net_f32 = Network(t, use_pallas=False)
    net_q = Network(t, use_pallas=True)
    inputs = net_f32.bind_inputs(x)
    envs_l = net_f32.env_chain(params, inputs, "left")
    envs_r = net_f32.env_chain(params, inputs, "right")
    monkeypatch.setenv("TNF_PACKED_SYRK_MIN_D", "1")
    checked = 0
    for kmix in ("1", "0"):
        monkeypatch.setenv("TNF_KMIX", kmix)
        for ni in t.train_nodes[:3]:
            ci = t.col_of[ni]
            L = envs_l[ci - 1] if ci > 0 else None
            R = envs_r[ci + 1] if ci < len(t.columns) - 1 else None
            monkeypatch.delenv("TNF_GRAM_DTYPE", raising=False)
            pj = net_f32.packed_jacobian(ni, params, inputs, L, R)
            if pj is None:
                continue
            pred = net_f32.packed_predict(pj, params[t.nodes[ni].name])
            for loss_fn in (XEBregman(w=1.0), SquareBregFunction()):
                yy = (y if isinstance(loss_fn, XEBregman)
                      else jnp.zeros_like(pred))
                _, g, H = loss_fn(pred, yy)
                A1, b1 = net_f32.packed_gram_rhs(pj, g, H)
                monkeypatch.setenv("TNF_GRAM_DTYPE", "int8")
                pjq = net_q.packed_jacobian(ni, params, inputs, L, R)
                before = CALLS["gram_pair_q"]
                A2, b2 = net_q.packed_gram_rhs(pjq, g, H)
                # every tiled form (kmix fused K, no-kmix einsum K, and
                # the diagonal-Hessian weighted form) takes the quantized
                # kernel under TNF_GRAM_DTYPE=int8
                assert CALLS["gram_pair_q"] > before
                checked += 1
                scale = float(np.abs(np.asarray(A1)).max())
                np.testing.assert_allclose(np.asarray(A2) / scale,
                                           np.asarray(A1) / scale,
                                           atol=4e-2)
                bs = float(np.abs(np.asarray(b1)).max())
                np.testing.assert_allclose(np.asarray(b2) / bs,
                                           np.asarray(b1) / bs, atol=4e-2)
    assert checked >= 4


def test_quantize_tiled_merge_matches_narrow():
    """merge=2 fuses adjacent D-slabs into one wide tile bit-exactly:
    per-column absmax scales don't depend on tile width, so Q/s are the
    merge=1 arrays rearranged — on both the Pallas kernel (interpret) and
    the XLA fallback — and the int8 Gram at the doubled tile returns the
    same mirrored A as the narrow plan (the engine's TNF_INT8_MERGE path)."""
    from tensornetworksfork_tpu.ops.pallas.gram import (gram_pair_tiled_q,
                                                        quantize_tiled)
    rng = np.random.default_rng(12)
    n, rows, tile = 4, 96, 128
    J = jnp.asarray(rng.standard_normal((n, rows, tile)), jnp.bfloat16)
    K = jnp.asarray(rng.standard_normal((n, rows, tile)), jnp.bfloat16)

    def rearrange(Q, s):  # narrow (n, Bp, tile) -> wide (n/2, Bp, 2*tile)
        Bp, nb = Q.shape[1], s.shape[1]
        Qr = np.transpose(np.asarray(Q).reshape(n // 2, 2, Bp, tile),
                          (0, 2, 1, 3)).reshape(n // 2, Bp, 2 * tile)
        sr = np.transpose(np.asarray(s).reshape(n // 2, 2, nb, tile),
                          (0, 2, 1, 3)).reshape(n // 2, nb, 2 * tile)
        return Qr, sr

    # bit-exactness holds within each lowering (Pallas kernel vs kernel,
    # XLA fallback vs fallback — across lowerings codes may differ by 1 on
    # rounding boundaries, see test_quantize_tiled_kernel_matches_xla)
    Q1, s1 = quantize_tiled(J, block=32, interpret=True)
    Qm, sm = quantize_tiled(J, block=32, interpret=True, merge=2)
    Qr, sr = rearrange(Q1, s1)
    np.testing.assert_array_equal(np.asarray(Qm), Qr)
    np.testing.assert_array_equal(np.asarray(sm), sr)
    Qx, sx = quantize_tiled(J, block=32)
    Qm2, sm2 = quantize_tiled(J, block=32, merge=2)
    Qr2, sr2 = rearrange(Qx, sx)
    np.testing.assert_array_equal(np.asarray(Qm2), Qr2)
    np.testing.assert_array_equal(np.asarray(sm2), sr2)
    # wide-tile Gram == narrow-tile Gram after the mirror
    Q2, s2 = quantize_tiled(K, block=32, interpret=True)
    Km, tm = quantize_tiled(K, block=32, interpret=True, merge=2)
    A_narrow = gram_pair_tiled_q(Q1, s1, Q2, s2, interpret=True,
                                 tile=tile, mirror=True)
    A_wide = gram_pair_tiled_q(Qm, sm, Km, tm, interpret=True,
                               tile=2 * tile, mirror=True)
    np.testing.assert_allclose(np.asarray(A_wide), np.asarray(A_narrow),
                               rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="slab count"):
        quantize_tiled(jnp.zeros((3, 32, 128), jnp.bfloat16), block=32,
                       merge=2)


def test_engine_int8_merge_matches_unmerged(monkeypatch):
    """TNF_INT8_MERGE routes a D=1024 (n=2, tile=512) node's int8 Gram
    through ONE 1024-wide tile; A/b must match the unmerged two-slab plan
    and the merged quantizer must actually be taken (trace-time counter)."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import TensorTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman
    from tensornetworksfork_tpu.ops.pallas.gram import CALLS

    layer = TensorTrainLayer(3, 16, 4, output_shape=(3,),
                             constrict_bond=False, seed=0)
    t = layer.topology
    net = Network(t, use_pallas=True)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((24, 4)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 24)])
    params = layer.params
    inputs = net.bind_inputs(x)
    envs_l = net.env_chain(params, inputs, "left")
    envs_r = net.env_chain(params, inputs, "right")
    monkeypatch.setenv("TNF_PACKED_SYRK_MIN_D", "1")
    monkeypatch.setenv("TNF_GRAM_DTYPE", "int8")
    ni = t.main_nodes[1]  # A2: 16*4*16 = 1024 = 2 slabs at tile 512
    ci = t.col_of[ni]
    L, R = envs_l[ci - 1], envs_r[ci + 1]
    pj = net.packed_jacobian(ni, params, inputs, L, R)
    assert pj is not None and int(np.prod(pj["node_shape"])) == 1024
    pred = net.packed_predict(pj, params[t.nodes[ni].name])
    _, g, H = XEBregman(w=1.0)(pred, y)
    monkeypatch.setenv("TNF_INT8_MERGE", "0")
    A0, b0 = net.packed_gram_rhs(pj, g, H)
    before = CALLS["quant_merge"]
    monkeypatch.setenv("TNF_INT8_MERGE", "1")
    A1, b1 = net.packed_gram_rhs(pj, g, H)
    assert CALLS["quant_merge"] > before
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                               rtol=1e-5, atol=1e-5)


def test_quantize_tiled_kernel_matches_xla():
    """The single-pass Pallas quantizer (interpret) computes exactly the
    XLA fallback's scales and codes."""
    from tensornetworksfork_tpu.ops.pallas.gram import quantize_tiled
    rng = np.random.default_rng(11)
    n, rows, tile = 2, 256, 128
    Jt = jnp.asarray(rng.standard_normal((n, rows, tile)), jnp.bfloat16)
    Qk, sk = quantize_tiled(Jt, block=128, interpret=True)
    Qx, sx = quantize_tiled(Jt, block=128, interpret=False)
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx), rtol=1e-6)
    # codes may differ by 1 on exact rounding boundaries (the two lowerings
    # associate j * (1/s) differently); anything more is a real bug
    diff = np.abs(np.asarray(Qk, np.int32) - np.asarray(Qx, np.int32))
    assert diff.max() <= 1 and (diff != 0).mean() < 0.01


def test_grouped_tiled_kernels_match_ungrouped(monkeypatch):
    """bf16 grouped (G=2) pair/weighted kernels == ungrouped == einsum ref
    (ADVICE r04: only the int8 grouped kernel had coverage). Also forces a
    TNF_PALLAS_GROUP_BS that does not divide the padded row count, so the
    grouped branch's re-pad path runs."""
    from tensornetworksfork_tpu.ops.pallas import gram as G
    rng = np.random.default_rng(17)
    n, rows, tile = 4, 96, 128
    D = n * tile
    J = rng.standard_normal((rows, D)).astype(np.float32)
    K = (J * rng.uniform(0.5, 2.0, rows)[:, None]).astype(np.float32)
    h = rng.uniform(0.5, 2.0, rows).astype(np.float32)
    Jb = np.asarray(jnp.asarray(J, jnp.bfloat16), np.float32)
    Kb = np.asarray(jnp.asarray(K, jnp.bfloat16), np.float32)
    A_pair_ref = Jb.T @ Kb
    A_w_ref = (Jb * h[:, None]).T @ Jb
    J1t = G._retile(jnp.asarray(J, jnp.bfloat16), n, tile)
    J2t = G._retile(jnp.asarray(K, jnp.bfloat16), n, tile)
    for forced_bs in ("", "48"):  # 48 does not divide the padded Bp=128
        if forced_bs:
            monkeypatch.setenv("TNF_PALLAS_GROUP_BS", forced_bs)
        else:
            monkeypatch.delenv("TNF_PALLAS_GROUP_BS", raising=False)
        A1 = G._gram_pair_tiled_jit(J1t, J2t, interpret=True, tile=tile,
                                    block=64, mirror=True, group=1)
        A2 = G._gram_pair_tiled_jit(J1t, J2t, interpret=True, tile=tile,
                                    block=64, mirror=True, group=2)
        np.testing.assert_allclose(np.asarray(A2), np.asarray(A1),
                                   rtol=2e-3, atol=5e-2)
        sym_ref = np.triu(A_pair_ref) + np.triu(A_pair_ref, 1).T
        np.testing.assert_allclose(np.asarray(A2)[:D, :D], sym_ref,
                                   rtol=5e-2, atol=0.25)
        W1 = G._weighted_gram_tiled_jit(J1t, jnp.asarray(h), interpret=True,
                                        tile=tile, block=64, mirror=True,
                                        group=1)
        W2 = G._weighted_gram_tiled_jit(J1t, jnp.asarray(h), interpret=True,
                                        tile=tile, block=64, mirror=True,
                                        group=2)
        np.testing.assert_allclose(np.asarray(W2), np.asarray(W1),
                                   rtol=2e-3, atol=5e-2)
        np.testing.assert_allclose(np.asarray(W2)[:D, :D], A_w_ref,
                                   rtol=5e-2, atol=0.25)


def test_clamp_group_bs_infeasible_falls_back(monkeypatch):
    """ADVICE r04 (medium): at tile=1024 the (G*tile)^2 f32 out tile alone
    (16.8 MB) exceeds every VMEM budget — _clamp_group_bs must return None
    (not an unfitting bs) and the grouped kernels must silently run the
    ungrouped schedule."""
    from tensornetworksfork_tpu.ops.pallas import gram as G
    monkeypatch.delenv("TNF_PALLAS_GROUP_BS", raising=False)
    assert G._clamp_group_bs(2, 1024, 2048, 1) is None
    assert G._clamp_group_bs(2, 1024, 2048, 2) is None
    # odd BS with an over-budget footprint must also signal, not return it
    assert G._clamp_group_bs(2, 1024, 1023, 2) is None
    # sanity: the production shape still groups
    assert G._clamp_group_bs(2, 512, 2048, 2) is not None
    # end-to-end: group=2 at tile=1024 falls back to ungrouped and stays
    # correct (int8 path, the one TNF_INT8_MERGE would drive)
    rng = np.random.default_rng(23)
    n, rows, tile = 2, 64, 1024
    J = jnp.asarray(rng.standard_normal((rows, n * tile)), jnp.bfloat16)
    Jt = G._retile(J, n, tile)
    Q, s = G.quantize_tiled(Jt, block=32, interpret=True)
    A2 = G._gram_pair_tiled_q_jit(Q, s, Q, s, interpret=True, tile=tile,
                                  mirror=True, group=2)
    A1 = G._gram_pair_tiled_q_jit(Q, s, Q, s, interpret=True, tile=tile,
                                  mirror=True, group=1)
    np.testing.assert_allclose(np.asarray(A2), np.asarray(A1), rtol=0,
                               atol=0)


def test_gram_pair_tiled_q_acc_matches_add(monkeypatch):
    """int8 in-kernel chunk accumulation (round 5): two chunks through the
    acc kernel == kernel-then-add_packed_upper, including the even-n
    duplicate-round bookkeeping (n=2 exercises the distance-n/2 twice-visit
    path) and odd n."""
    from tensornetworksfork_tpu.ops.pallas.gram import (add_packed_upper,
                                                        gram_pair_tiled_q,
                                                        quantize_tiled)
    monkeypatch.setenv("TNF_PALLAS_GROUP", "1")
    rng = np.random.default_rng(9)
    for n in (2, 3):
        rows, tile = 96, 128
        Dp = n * tile
        chunks = []
        for c in range(2):
            J = jnp.asarray(rng.standard_normal((n, rows, tile)), jnp.float32)
            K = jnp.asarray(rng.standard_normal((n, rows, tile)), jnp.float32)
            chunks.append(quantize_tiled(J, block=32)
                          + quantize_tiled(K, block=32))
        # reference: raw kernel per chunk + packed add accumulation
        acc_ref = jnp.zeros((Dp, Dp), jnp.float32)
        for Q1, s1, Q2, s2 in chunks:
            A = gram_pair_tiled_q(Q1, s1, Q2, s2, interpret=True, tile=tile)
            acc_ref = add_packed_upper(acc_ref, A, tile=tile, interpret=True)
        # acc kernel: carry flows through the kernel itself
        acc = jnp.zeros((Dp, Dp), jnp.float32)
        for Q1, s1, Q2, s2 in chunks:
            acc = gram_pair_tiled_q(Q1, s1, Q2, s2, interpret=True,
                                    tile=tile, acc=acc)
        iu = np.triu_indices(Dp)
        np.testing.assert_allclose(np.asarray(acc)[iu],
                                   np.asarray(acc_ref)[iu],
                                   rtol=1e-5, atol=1e-5)


def test_engine_int8_acc_route_matches(monkeypatch):
    """TNF_PALLAS_ACC=1 under the int8 tier: the sweep's in-kernel-acc node
    update equals the default add-pass route (both interpret-mode here)."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.core.sweep import SweepConfig, Sweeper
    from tensornetworksfork_tpu.models.layers import TensorTrainLayer
    from tensornetworksfork_tpu.ops.bregman import SquareBregFunction

    monkeypatch.setenv("TNF_GRAM_DTYPE", "int8")
    monkeypatch.setenv("TNF_PACKED_SYRK_MIN_D", "1")
    monkeypatch.setenv("TNF_FULLBATCH_MAX_BYTES", "0")  # keep chunking on
    # pin the band schedule OFF: this test targets the ACC kernel, which
    # the (default-on) band route would otherwise shadow
    monkeypatch.setenv("TNF_PALLAS_BAND", "0")
    rng = np.random.default_rng(12)
    X = jnp.asarray(rng.standard_normal((64, 4)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((64, 1)), jnp.float32)
    cfg = SweepConfig(num_swipes=1, batch_size=16, method="ridge_cholesky",
                      eps=1.0)

    def run_once():
        layer = TensorTrainLayer(2, 4, 4, output_shape=(1,), seed=3)
        net = Network(layer.topology, use_pallas=True)
        params, ok = Sweeper(net, SquareBregFunction(), cfg).run(
            [dict(layer.params)], X, y)
        assert ok
        return params[0]

    monkeypatch.setenv("TNF_PALLAS_ACC", "0")
    p_add = run_once()
    monkeypatch.setenv("TNF_PALLAS_ACC", "1")
    p_acc = run_once()
    for k in p_add:
        np.testing.assert_allclose(np.asarray(p_add[k]),
                                   np.asarray(p_acc[k]),
                                   rtol=2e-4, atol=2e-4)


def test_gram_pair_band_q_matches_packed_chain(monkeypatch):
    """Resident-band int8 chain (round 5): chained band calls over two
    chunks reconstruct (via mirror_band) exactly what the packed kernel +
    add_packed_upper + mirror_gram pipeline produces, across resident-part
    splits (nb 3 = one part, 4 = ragged tail, 9 = three parts) and both
    even/odd slab counts (even n exercises the duplicate-round zero
    tiles). Symmetric operands (Q1 == Q2): the two routes assign wrapped
    pairs to opposite triangles, so only the symmetric case is bit-exactly
    comparable — production K = H·J is symmetric up to quantization
    rounding, and the sweep-level regression test below covers that."""
    from tensornetworksfork_tpu.ops.pallas.gram import (
        add_packed_upper, band_parts, gram_pair_band_q, gram_pair_tiled_q,
        mirror_band, mirror_gram, quantize_tiled)
    rng = np.random.default_rng(3)
    for n, nb in [(4, 3), (3, 4), (6, 9)]:
        tile, BS = 128, 32
        rows, Dp = nb * BS, n * tile
        assert sum(p[1] for p in band_parts(nb)) == nb
        accU = jnp.zeros((Dp, Dp), jnp.float32)
        accB = jnp.zeros((Dp, Dp), jnp.float32)
        for _ in range(2):
            J = jnp.asarray(rng.standard_normal((n, rows, tile)),
                            jnp.float32)
            Q1, s1 = quantize_tiled(J, block=BS)
            A = gram_pair_tiled_q(Q1, s1, Q1, s1, interpret=True, tile=tile)
            accU = add_packed_upper(accU, A, tile=tile, interpret=True)
            accB = gram_pair_band_q(Q1, s1, Q1, s1, accB, interpret=True,
                                    tile=tile)
        ref = mirror_gram(np.asarray(accU))
        band = np.asarray(mirror_band(accB, n, tile))
        np.testing.assert_allclose(band, ref, rtol=1e-5,
                                   atol=1e-5 * np.abs(ref).max())


def test_engine_band_route_matches(monkeypatch):
    """TNF_PALLAS_BAND=1: the sweep's resident-band node update equals the
    default packed route (interpret mode)."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.core.sweep import SweepConfig, Sweeper
    from tensornetworksfork_tpu.models.layers import TensorTrainLayer
    from tensornetworksfork_tpu.ops.bregman import SquareBregFunction

    monkeypatch.setenv("TNF_GRAM_DTYPE", "int8")
    monkeypatch.setenv("TNF_PACKED_SYRK_MIN_D", "1")
    monkeypatch.setenv("TNF_FULLBATCH_MAX_BYTES", "0")
    rng = np.random.default_rng(12)
    X = jnp.asarray(rng.standard_normal((64, 4)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((64, 1)), jnp.float32)
    cfg = SweepConfig(num_swipes=1, batch_size=16, method="ridge_cholesky",
                      eps=1.0)

    def run_once():
        layer = TensorTrainLayer(2, 4, 4, output_shape=(1,), seed=3)
        net = Network(layer.topology, use_pallas=True)
        params, ok = Sweeper(net, SquareBregFunction(), cfg).run(
            [dict(layer.params)], X, y)
        assert ok
        return params[0]

    monkeypatch.setenv("TNF_PALLAS_BAND", "0")
    p_ref = run_once()
    monkeypatch.setenv("TNF_PALLAS_BAND", "1")
    p_band = run_once()
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_ref[k]),
                                   np.asarray(p_band[k]),
                                   rtol=2e-4, atol=2e-4)
