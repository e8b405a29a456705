"""Core engine oracles (SURVEY.md §4):
1. TT forward vs explicit polynomial expansion on tiny shapes.
2. Jacobian/get_A_b vs autograd of the flattened model.
3. One exact-solve sweep on an overdetermined linear problem reaches the
   least-squares optimum.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworksfork_tpu.models.layers import (
    TensorTrainLayer, CPDLayer, CPDTrainLayer, CumSumLayer,
    TensorConvolutionTrainLayer,
)
from tensornetworksfork_tpu.ops.bregman import SquareBregFunction, XEBregman
from tensornetworksfork_tpu.core.sweep import SweepConfig, accumulating_sweep


def dense_tt(params, N):
    """Explicitly contract TT cores to the full coefficient tensor."""
    full = None
    for i in range(1, N + 1):
        core = np.asarray(params[f"A{i}"])
        # axes per builder: (r_i, [c], p_i, r_{i+1}) with size-1 bonds squeezed
        if i == 1:
            # (c?, p, r2) or (p, r2)
            if core.ndim == 2:
                core = core[None]  # (c=1, p, r2)
            full = core  # (c, p1, r2)
        elif i < N:
            # (r_i, p_i, r_{i+1})
            full = np.einsum("c...r,rps->c...ps", full, core)
        else:
            if core.ndim == 1:
                core = core[:, None]
            # (r_N, p_N)
            full = np.einsum("c...r,rp->c...p", full, core)
    return full  # (c, p1, ..., pN)


def test_tt_forward_matches_polynomial():
    N, r, f = 3, 4, 3
    layer = TensorTrainLayer(N, r, f, output_shape=(2,), constrict_bond=True, seed=1)
    x = np.random.default_rng(0).standard_normal((5, f)).astype(np.float32)
    y = np.asarray(layer(jnp.asarray(x)))
    full = dense_tt(layer.params, N)  # (c, p1, p2, p3)
    expected = np.einsum("cpqr,sp,sq,sr->sc", full, x, x, x)
    np.testing.assert_allclose(y, expected, rtol=2e-4, atol=2e-4)


def test_jacobian_and_gram_match_autograd():
    N, r, f = 3, 3, 3
    layer = TensorTrainLayer(N, r, f, output_shape=(2,), seed=2)
    net = layer.network
    t = net.topology
    x = jnp.asarray(np.random.default_rng(1).standard_normal((6, f)), jnp.float32)
    inputs = net.bind_inputs(x)
    params = layer.params

    envs_l = net.env_chain(params, inputs, "left")
    envs_r = net.env_chain(params, inputs, "right")
    for k, ni in enumerate(t.main_nodes):
        name = t.nodes[ni].name
        L = envs_l[k - 1] if k > 0 else None
        R = envs_r[k + 1] if k < len(t.main_nodes) - 1 else None
        J = net.jacobian(ni, params, inputs, L, R)

        # autograd jacobian of flattened forward w.r.t. this core
        def fwd_flat(core_flat):
            p = dict(params, **{name: core_flat.reshape(params[name].shape)})
            return net.forward(p, inputs).reshape(-1)

        J_auto = jax.jacfwd(fwd_flat)(params[name].reshape(-1))  # (S*C, D)

        # engine-side: predict_from_jacobian must equal forward
        pred = net.predict_from_jacobian(ni, J, params[name])
        np.testing.assert_allclose(
            np.asarray(pred), np.asarray(net.forward(params, inputs)),
            rtol=1e-4, atol=1e-4)

        # A,b against dense construction from J_auto with square loss
        y_true = jnp.zeros(pred.shape)
        loss, g, H = SquareBregFunction()(pred, y_true)
        A, b = net.gram_and_rhs(ni, J, g, H)
        D = params[name].size
        A_f = np.asarray(A).reshape(D, D)
        b_f = np.asarray(b).reshape(D)
        Ja = np.asarray(J_auto)
        # square loss: grad=2*pred, hess=2I per sample-output
        b_ref = Ja.T @ (2 * np.asarray(pred).reshape(-1))
        A_ref = 2 * Ja.T @ Ja
        np.testing.assert_allclose(b_f, b_ref, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(A_f, A_ref, rtol=1e-3, atol=1e-3)


def test_exact_sweep_reaches_least_squares_optimum():
    """N=1 TT is plain linear regression: one exact solve must hit the
    pseudoinverse optimum."""
    rng = np.random.default_rng(3)
    S, f = 64, 4
    X = rng.standard_normal((S, f)).astype(np.float32)
    w_true = rng.standard_normal(f).astype(np.float32)
    y = (X @ w_true).astype(np.float32).reshape(S, 1)

    layer = TensorTrainLayer(1, 1, f, output_shape=(1,), seed=0)
    cfg = SweepConfig(num_swipes=1, method="exact", eps=0.0, skip_second=True)
    params, ok = accumulating_sweep(layer.network, layer.params, jnp.asarray(X),
                                    jnp.asarray(y), SquareBregFunction(), cfg)
    assert ok
    pred = layer.network.forward(params, layer.network.bind_inputs(jnp.asarray(X)))
    np.testing.assert_allclose(np.asarray(pred), y, rtol=1e-3, atol=1e-3)


def test_multi_sweep_fits_quadratic():
    """Rank-full N=2 TT can represent x^T W x exactly; sweeps should converge."""
    rng = np.random.default_rng(4)
    S, f = 256, 4
    X1 = rng.standard_normal((S, f - 1)).astype(np.float32)
    X = np.concatenate([X1, np.ones((S, 1), np.float32)], axis=1)  # bias col
    W = rng.standard_normal((f, f)).astype(np.float32)
    y = np.einsum("si,ij,sj->s", X, W, X).reshape(S, 1).astype(np.float32)

    layer = TensorTrainLayer(2, f, f, output_shape=(1,), constrict_bond=False, seed=5)
    cfg = SweepConfig(num_swipes=8, method="ridge_cholesky", eps=1e-6,
                      batch_size=64)
    params, ok = accumulating_sweep(layer.network, layer.params, jnp.asarray(X),
                                    jnp.asarray(y), SquareBregFunction(), cfg)
    assert ok
    pred = np.asarray(layer.network.forward(params, layer.network.bind_inputs(jnp.asarray(X))))
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    assert rmse < 1e-2, rmse


def test_packed_jacobian_matches_standard():
    """packed_jacobian/packed_predict/packed_gram_rhs == the standard path
    for conv-TT middle nodes (full XE Hessian and diagonal square loss).
    The packed build is the layout fix for the flagship's dominant cost
    (tile-padded multi-axis J materialisation)."""
    import numpy as np
    import jax.numpy as jnp
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import SquareBregFunction, XEBregman

    layer = TensorConvolutionTrainLayer(3, 4, 5, 3, output_shape=(3,),
                                        convolution_bond=2, seed=0)
    t = layer.topology
    net = Network(t, use_pallas=False)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((16, 5, 3)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 16)])
    inputs = net.bind_inputs(x)
    params = layer.params
    envs_l = net.env_chain(params, inputs, "left")
    envs_r = net.env_chain(params, inputs, "right")
    checked = 0
    for ni in t.train_nodes:
        ci = t.col_of[ni]
        L = envs_l[ci - 1] if ci > 0 else None
        R = envs_r[ci + 1] if ci < len(t.columns) - 1 else None
        pj = net.packed_jacobian(ni, params, inputs, L, R)
        if pj is None:
            continue
        checked += 1
        core = params[t.nodes[ni].name]
        J = net.jacobian(ni, params, inputs, L, R)
        pred_ref = net.predict_from_jacobian(ni, J, core)
        pred_pk = net.packed_predict(pj, core)
        np.testing.assert_allclose(np.asarray(pred_pk), np.asarray(pred_ref),
                                   rtol=1e-4, atol=1e-4)
        for loss_fn in (XEBregman(w=1.0), SquareBregFunction()):
            yy = y if isinstance(loss_fn, XEBregman) else jnp.zeros_like(pred_ref)
            _, g, H = loss_fn(pred_ref, yy)
            A1, b1 = net.gram_and_rhs(ni, J, g, H)
            A2, b2 = net.packed_gram_rhs(pj, g, H)  # flat (D, D), (D,)
            np.testing.assert_allclose(np.asarray(A2),
                                       np.asarray(A1).reshape(A2.shape),
                                       rtol=2e-3, atol=2e-3)
            np.testing.assert_allclose(np.asarray(b2),
                                       np.asarray(b1).reshape(-1),
                                       rtol=2e-3, atol=2e-3)
    assert checked >= 2, f"packed path covered only {checked} nodes"


def test_flat_gram_block_size_unroll_cap(monkeypatch):
    """The statically unrolled block loop in _flat_gram must stay bounded:
    compile time scales linearly in nb = S/bs (VERDICT r02 weak #5)."""
    from tensornetworksfork_tpu.core.engine import (_flat_gram,
                                                    _flat_gram_block_size)
    # pathological S: small divisors only -> round-2 logic picked bs=128
    # and nb = 1024 unrolled blocks; the cap must grow bs instead
    S = 128 * 1024
    bs = _flat_gram_block_size(S, max_block=512)
    assert S % bs == 0 and S // bs <= 64
    # prime S: only divisors are 1 and S -> one block
    assert _flat_gram_block_size(100003, max_block=512) == 100003
    # the cap is tunable
    monkeypatch.setenv("TNF_FLAT_GRAM_MAX_UNROLL", "8")
    bs = _flat_gram_block_size(4096, max_block=16)
    assert 4096 % bs == 0 and 4096 // bs <= 8
    monkeypatch.delenv("TNF_FLAT_GRAM_MAX_UNROLL")
    # numerically: blocked path == single dot on a >max_elems case
    rng = np.random.default_rng(0)
    J3 = jnp.asarray(rng.standard_normal((96, 1, 8)), jnp.float32)
    W = jnp.asarray(rng.random((96, 1)), jnp.float32)
    import jax.lax
    A_blocked = _flat_gram(J3, W, True, jax.lax.Precision.HIGHEST,
                           max_block=16, max_elems=1)
    A_direct = _flat_gram(J3, W, True, jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(A_blocked), np.asarray(A_direct),
                               rtol=1e-5, atol=1e-5)


def test_update_jit_cache_keys_include_numeric_env(monkeypatch):
    """TNF_PACKED_J / TNF_GRAM_DTYPE are read at trace time inside cached
    update programs; toggling them must retrace, not reuse stale programs."""
    from tensornetworksfork_tpu.core.sweep import SweepConfig, Sweeper
    layer = TensorTrainLayer(2, 3, 3, output_shape=(2,), seed=0)
    sw = Sweeper(layer.network, SquareBregFunction(), SweepConfig())
    ni = layer.topology.train_nodes[0]
    monkeypatch.setenv("TNF_GRAM_DTYPE", "f32")
    f1 = sw._jit_update(0, ni, "ridge_cholesky", False, False, 4)
    monkeypatch.setenv("TNF_GRAM_DTYPE", "bf16")
    f2 = sw._jit_update(0, ni, "ridge_cholesky", False, False, 4)
    assert f1 is not f2
    monkeypatch.setenv("TNF_GRAM_DTYPE", "f32")
    assert sw._jit_update(0, ni, "ridge_cholesky", False, False, 4) is f1
    monkeypatch.setenv("TNF_PACKED_J", "0")
    f3 = sw._jit_update(0, ni, "ridge_cholesky", False, False, 4)
    assert f3 is not f1


def test_aux_precision_default_still_converges(monkeypatch):
    """The benchmark numerics mode (TNF_AUX_PRECISION=default: env chains,
    Jacobian builds, predictions and rhs dots run single-pass bf16-operand;
    TNF_GRAM_DTYPE=bf16: Gram operands cast) must still fit a representable
    target accurately — solves stay f32, so only operand rounding is lost."""
    monkeypatch.setenv("TNF_AUX_PRECISION", "default")
    monkeypatch.setenv("TNF_GRAM_DTYPE", "bf16")
    rng = np.random.default_rng(4)
    S, f = 256, 4
    X1 = rng.standard_normal((S, f - 1)).astype(np.float32)
    X = np.concatenate([X1, np.ones((S, 1), np.float32)], axis=1)
    W = rng.standard_normal((f, f)).astype(np.float32)
    y = np.einsum("si,ij,sj->s", X, W, X).reshape(S, 1).astype(np.float32)

    layer = TensorTrainLayer(2, f, f, output_shape=(1,), seed=5)
    cfg = SweepConfig(num_swipes=8, method="ridge_cholesky", eps=1e-6,
                      batch_size=64)
    params, ok = accumulating_sweep(layer.network, layer.params,
                                    jnp.asarray(X), jnp.asarray(y),
                                    SquareBregFunction(), cfg)
    assert ok
    pred = np.asarray(layer.network.forward(
        params, layer.network.bind_inputs(jnp.asarray(X))))
    rel = float(np.sqrt(np.mean((pred - y) ** 2)) / np.std(y))
    assert rel < 0.05, rel


def test_env_step_staged_matches_generic(monkeypatch):
    """The staged conv-column env advance (engine._env_step_conv_fast,
    TNF_ENV_STAGED=1 default) must match the generic einsum lowering for
    every column of a conv-TT, both directions — and must actually engage
    (no silent fallback) for at least one middle column each way."""
    import numpy as np

    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import (
        TensorConvolutionTrainLayer)

    layer = TensorConvolutionTrainLayer(3, 4, 6, 5, output_shape=(3,),
                                        convolution_bond=2, seed=3)
    net = Network(layer.topology)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((16, 6, 5)), jnp.float32)
    inputs = net.bind_inputs(x)
    engaged = 0
    for direction in ("left", "right"):
        monkeypatch.setenv("TNF_ENV_STAGED", "0")
        ref = net.env_chain(layer.params, inputs, direction)
        monkeypatch.setenv("TNF_ENV_STAGED", "1")
        fast = net.env_chain(layer.params, inputs, direction)
        for e0, e1 in zip(ref, fast):
            if e0 is None:
                assert e1 is None
                continue
            assert e0[0] == e1[0]
            np.testing.assert_allclose(np.asarray(e1[1]), np.asarray(e0[1]),
                                       rtol=2e-5, atol=2e-5)
        # engagement probe: the middle columns must take the fast path
        ncols = len(net.topology.columns)
        cols = (list(range(ncols)) if direction == "left"
                else list(range(ncols - 1, -1, -1)))
        prev = None
        seen = []
        for ci in cols:
            seen.append(ci)
            ops = net.column_operands(ci, layer.params, inputs)
            keep = net.env_keep(seen)
            if prev is not None:
                out = net._env_step_conv_fast(prev, ops, keep)
                if out is not None:
                    engaged += 1
            prev = net.env_step(prev, ci, layer.params, inputs, seen)
    assert engaged >= 2


def test_env_step_staged_rejects_shared_bridge_hyperedge():
    """A column whose two non-input operands bridge prev through the SAME
    axis (3-way hyperedge, e.g. a CPD rank contracted at this column) or
    keep the same axis must fall back (return None) from the staged path,
    not crash building an invalid permutation at trace time."""
    from types import SimpleNamespace

    from tensornetworksfork_tpu.core.engine import Network

    B, Pn, Qn, H, Ak, Bk = 4, 3, 5, 2, 6, 7
    sizes = {0: B, 1: Pn, 2: Qn, 3: Ak, 4: Bk, 8: H, 9: H}
    fake = SimpleNamespace(
        topology=SimpleNamespace(sample_axis=0, axis_size=sizes),
        aux_precision=jax.lax.Precision.HIGHEST)
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32)

    X = ((0, 1, 2), arr(B, Pn, Qn))
    # shared bridge axis 9 on BOTH operands
    prev = ((0, 9), arr(B, H))
    ops = [X, ((1, 9, 3), arr(Pn, H, Ak)), ((2, 9, 4), arr(Qn, H, Bk))]
    assert Network._env_step_conv_fast(fake, prev, ops, (0, 3, 4)) is None
    # both operands KEEP the same axis 3
    prev2 = ((0, 8, 9), arr(B, H, H))
    ops2 = [X, ((1, 8, 3), arr(Pn, H, Ak)), ((2, 9, 3), arr(Qn, H, Ak))]
    assert Network._env_step_conv_fast(fake, prev2, ops2, (0, 3)) is None


def test_env_step_staged_promotes_dtypes_like_einsum(monkeypatch):
    """bf16 inputs with f32 params: the staged advance must promote UP to
    f32 like the generic einsum lowering, not downcast params to bf16."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import (
        TensorConvolutionTrainLayer)

    layer = TensorConvolutionTrainLayer(3, 4, 6, 5, output_shape=(3,),
                                        convolution_bond=2, seed=5)
    net = Network(layer.topology)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((8, 6, 5)), jnp.bfloat16)
    inputs = net.bind_inputs(x)
    monkeypatch.setenv("TNF_ENV_STAGED", "0")
    ref = net.env_chain(layer.params, inputs, "left")
    monkeypatch.setenv("TNF_ENV_STAGED", "1")
    fast = net.env_chain(layer.params, inputs, "left")
    for e0, e1 in zip(ref, fast):
        if e0 is None:
            continue
        assert e1[1].dtype == e0[1].dtype
        np.testing.assert_allclose(np.asarray(e1[1], np.float32),
                                   np.asarray(e0[1], np.float32),
                                   rtol=3e-5, atol=3e-5)


def test_contract_beyond_52_axes():
    """A 30-core MPS (one core per tabular feature, reference tnml.py usage)
    needs >52 distinct einsum axes; the Labeler must spill past ascii into
    opt_einsum-style unicode symbols instead of raising."""
    from tensornetworksfork_tpu.core.contract import contract, einsum_expr

    n = 60  # 61 distinct axis ids > 52 ascii letters
    rng = np.random.default_rng(0)
    mats = [rng.standard_normal((2, 2)).astype(np.float32) for _ in range(n)]
    operands = [((i, i + 1), jnp.asarray(m)) for i, m in enumerate(mats)]
    expr = einsum_expr([axes for axes, _ in operands], (0, n))
    assert "->" in expr and len(set(expr.replace(",", "").replace("->", ""))) > 52
    out = contract(operands, (0, n))
    ref = mats[0]
    for m in mats[1:]:
        ref = ref @ m
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_wide_mps_forward_and_sweep():
    """End-to-end: a 28-feature TNML-style network (30 cores incl. output)
    trains without hitting an einsum symbol limit (zoo regression:
    breast_cancer has 30 features)."""
    from tensornetworksfork_tpu.models.tnml import TNMLRegressor

    rng = np.random.default_rng(3)
    X = rng.uniform(0.0, 1.0, size=(64, 28)).astype(np.float32)
    y = (X[:, 0] + X[:, 7] > 1.0).astype(np.int64)
    m = TNMLRegressor(r=3, num_swipes=1, task="classification", seed=0,
                      verbose=0, input_scale="minmax")
    m.fit(X, y)
    acc = m.score(X, y)
    assert acc > 0.6


def test_env_step_staged_role_choice_big_bond(monkeypatch):
    """When the staged conv-column advance's default (operand-order) role
    assignment would exceed TNF_ENV_STAGED_MAX_BYTES, it must SWAP the
    conv/core roles instead of materialising the big intermediate: at the
    reference CIFAR_minres shape (r=100, CB=5, pixels=193) the default
    choice builds a (B, 193, 10000) U buffer — the round-3 15 GB HBM OOM in
    the far-env program — where the swap is (B, 17, 25). The flagship's
    roles (its measured + replication-validated lowering) stay unchanged
    because they fit the cap. Checked via a dot-operand size spy + equality
    vs the generic einsum at a scaled-down asymmetric shape."""
    import jax

    from tensornetworksfork_tpu.core.sweep import SweepConfig, Sweeper
    from tensornetworksfork_tpu.models.layers import (
        TensorConvolutionTrainLayer)
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    N, r, CB, P, pp, C = 3, 24, 3, 5, 49, 3  # r >> CB, pp >> P like CIFAR
    B = 32
    # cap chosen so the default roles' U (B*pp*r*r = 903k el = 3.6 MB)
    # exceeds it while the swapped roles (max ~35k el) fit
    monkeypatch.setenv("TNF_ENV_STAGED_MAX_BYTES", str(1_000_000))
    layer = TensorConvolutionTrainLayer(
        num_carriages=N, bond_dim=r, num_patches=P, patch_pixels=pp,
        output_shape=(C,), convolution_bond=CB, seed=0)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((B, P, pp)), jnp.float32)
    y = jnp.asarray(np.eye(C + 1, dtype=np.float32)[
        rng.integers(0, C + 1, B)])
    cfg = SweepConfig(num_swipes=1, batch_size=B, method="ridge_cholesky",
                      eps=1.0)

    big = [0]
    orig = jax.lax.dot_general

    def spy(lhs, rhs, *a, **k):
        big[0] = max(big[0], int(np.prod(lhs.shape)), int(np.prod(rhs.shape)))
        return orig(lhs, rhs, *a, **k)

    sw = Sweeper(layer.network, XEBregman(w=1.0), cfg)
    data = sw._prepare(X, y, None)
    try:
        jax.lax.dot_general = spy
        fn = sw._jit_far_envs(0, "left")
        out_staged = fn(layer.params, data["inputs"][0])
    finally:
        jax.lax.dot_general = orig
    # the default role choice feeds a 903k-element U into the next dot;
    # the swapped one keeps every dot operand small
    assert big[0] < 200_000, big[0]

    monkeypatch.setenv("TNF_ENV_STAGED", "0")
    sw2 = Sweeper(layer.network, XEBregman(w=1.0), cfg)
    out_generic = sw2._jit_far_envs(0, "left")(layer.params,
                                               data["inputs"][0])
    for a, b in zip(jax.tree_util.tree_leaves(out_staged),
                    jax.tree_util.tree_leaves(out_generic)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-4, atol=2e-4)


def test_ownout_defer_matches_full(monkeypatch):
    """Deferred own-out Gram: raw upper class-pair accumulation + one-time
    expansion (engine.gram_and_rhs defer_ownout / expand_ownout, carried
    through the sweep's chunk scan) must reproduce the full-C² structured
    path — engine-level on one chunk, and end-to-end through a multi-chunk
    sweep with TNF_OWNOUT_DEFER on vs off."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.core.sweep import accumulating_sweep

    layer = TensorConvolutionTrainLayer(3, 4, 10, 5, output_shape=(3,),
                                        convolution_bond=2, seed=0)
    t = layer.network.topology
    net = Network(t, use_pallas=False)
    ni = t.by_name["A1"]
    ci = t.col_of[ni]
    rng = np.random.default_rng(3)
    B = 32
    x = jnp.asarray(rng.standard_normal((B, 10, 5)), jnp.float32)
    inputs = net.bind_inputs(x)
    envs_l = net.env_chain(layer.params, inputs, "left")
    envs_r = net.env_chain(layer.params, inputs, "right")
    L = envs_l[ci - 1] if ci > 0 else None
    R = envs_r[ci + 1] if ci < len(t.columns) - 1 else None
    J = net.jacobian(ni, layer.params, inputs, L, R)
    core = layer.params[t.nodes[ni].name]
    pred = net.predict_from_jacobian(ni, J, core)
    y1h = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, B)])
    _, g, H = XEBregman(w=1.0)(pred, y1h)
    A_full, b_full = net.gram_and_rhs(ni, J, g, H)
    cell = {"plan": None}
    A_raw, b_raw = net.gram_and_rhs(ni, J, g, H, defer_ownout=cell)
    assert cell["plan"] is not None
    C = cell["plan"][0]
    assert A_raw.shape[0] == C * (C + 1) // 2  # pair blocks, not C²
    A_exp = net.expand_ownout(A_raw, cell["plan"])
    assert A_exp.shape == A_full.shape
    np.testing.assert_allclose(np.asarray(A_exp), np.asarray(A_full),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_raw), np.asarray(b_full),
                               rtol=1e-6, atol=1e-7)
    # cross-class blocks of the expansion are bit-identical transposed
    # copies of their upper mirror; diagonal class blocks are symmetric to
    # rounding only (same as the full path — their [d, d'] and [d', d]
    # entries come from different product orders)
    D = core.size
    A2 = np.asarray(A_exp).reshape(D, D)
    np.testing.assert_allclose(A2, A2.T, rtol=1e-5, atol=1e-7)

    # end-to-end: multi-chunk sweep (full-batch merge disabled so the scan
    # really carries the raw accumulator across chunks)
    monkeypatch.setenv("TNF_FULLBATCH_MAX_BYTES", "0")
    S = 64
    X = jnp.asarray(rng.standard_normal((S, 10, 5)), jnp.float32)
    Y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, S)])
    cfg = SweepConfig(num_swipes=2, method="ridge_cholesky", eps=1e-1,
                      batch_size=16)
    layer2 = TensorConvolutionTrainLayer(3, 4, 10, 5, output_shape=(3,),
                                         convolution_bond=2, seed=1)
    monkeypatch.setenv("TNF_OWNOUT_DEFER", "0")
    p_ref, ok0 = accumulating_sweep(layer2.network, layer2.params, X, Y,
                                    XEBregman(w=1.0), cfg)
    monkeypatch.setenv("TNF_OWNOUT_DEFER", "1")
    p_def, ok1 = accumulating_sweep(layer2.network, layer2.params, X, Y,
                                    XEBregman(w=1.0), cfg)
    assert ok0 and ok1
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_def[k]), np.asarray(p_ref[k]),
                                   rtol=5e-4, atol=5e-5)
