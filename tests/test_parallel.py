"""Data-parallel tests on the virtual 8-device CPU mesh: sharded sweep equals
single-device sweep (psum accumulation is exact, SURVEY.md §5.8), and the
driver entry points compile.

These tests need >= 8 devices (the conftest's virtual CPU mesh). On real
hardware with a single chip (TNF_TEST_PLATFORM=tpu) they skip — this is
the documented CPU-mesh-only skip-list for the on-TPU suite run."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="needs the 8-device virtual CPU mesh (single-chip TPU run)")

from tensornetworksfork_tpu.core.sweep import SweepConfig, Sweeper
from tensornetworksfork_tpu.models.layers import TensorTrainLayer
from tensornetworksfork_tpu.ops.bregman import SquareBregFunction
from tensornetworksfork_tpu.parallel.mesh import make_mesh


def _data(S=128, f=4, seed=0):
    rng = np.random.default_rng(seed)
    X = np.concatenate([rng.standard_normal((S, f - 1)).astype(np.float32),
                        np.ones((S, 1), np.float32)], axis=1)
    y = (X[:, 0] * X[:, 1] + X[:, 2]).reshape(S, 1).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(y)


def test_sharded_sweep_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    X, y = _data()
    cfg = SweepConfig(num_swipes=2, method="ridge_cholesky", eps=1e-4,
                      batch_size=32)

    l1 = TensorTrainLayer(2, 4, 4, output_shape=(1,), seed=3)
    p_single, ok1 = Sweeper(l1.network, SquareBregFunction(), cfg).run(
        [dict(l1.params)], X, y)
    assert ok1

    mesh = make_mesh(8)
    l2 = TensorTrainLayer(2, 4, 4, output_shape=(1,), seed=3)
    p_mesh, ok2 = Sweeper(l2.network, SquareBregFunction(), cfg).run(
        [dict(l2.params)], X, y, mesh=mesh)
    assert ok2

    for k in p_single[0]:
        np.testing.assert_allclose(np.asarray(p_single[0][k]),
                                   np.asarray(p_mesh[0][k]),
                                   rtol=5e-3, atol=5e-3)


def test_sharded_iterative_matches_single_device():
    """The matrix-free tier (reference scipy_swipe, network.py:709-932 —
    the CIFAR CG/MINRES path) under a data mesh: every Krylov matvec
    contracts over the sharded sample axis, so GSPMD must insert the psum
    inside the lax.while_loop body. Sharded == single-device."""
    assert len(jax.devices()) >= 8
    X, y = _data()
    mesh = make_mesh(8)
    for method in ("cg", "minres"):
        cfg = SweepConfig(num_swipes=1, method=method, eps=1e-1,
                          batch_size=32, max_iter=40, tol=1e-8)
        l1 = TensorTrainLayer(2, 4, 4, output_shape=(1,), seed=3)
        p_single, ok1 = Sweeper(l1.network, SquareBregFunction(), cfg).run(
            [dict(l1.params)], X, y)
        assert ok1, method

        l2 = TensorTrainLayer(2, 4, 4, output_shape=(1,), seed=3)
        p_mesh, ok2 = Sweeper(l2.network, SquareBregFunction(), cfg).run(
            [dict(l2.params)], X, y, mesh=mesh)
        assert ok2, method

        # Krylov iterates amplify fp-reassociation differences along
        # near-null directions of A, so params are compared loosely and the
        # MODEL (predictions) tightly — the functionally meaningful contract.
        for k in p_single[0]:
            np.testing.assert_allclose(np.asarray(p_single[0][k]),
                                       np.asarray(p_mesh[0][k]),
                                       rtol=5e-3, atol=5e-3, err_msg=method)
        np.testing.assert_allclose(
            np.asarray(l1.network.forward(p_single[0], X)),
            np.asarray(l2.network.forward(p_mesh[0], X)),
            rtol=1e-4, atol=1e-4, err_msg=method)


def test_graft_entry_forward():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    fn, (params, x) = ge.entry()
    out = jax.jit(fn)(params, x)
    assert out.shape == (64, 9)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_sum_network_matches_single():
    """Type-I sum sweep under the 8-device mesh == single device."""
    from tensornetworksfork_tpu.core.sweep import Member
    from tensornetworksfork_tpu.models.layers import SumLayer
    rng = np.random.default_rng(11)
    S, f = 64, 4
    X = jnp.asarray(np.concatenate(
        [rng.standard_normal((S, f - 1)).astype(np.float32),
         np.ones((S, 1), np.float32)], axis=1))
    y = jnp.asarray((np.asarray(X[:, 0]) * np.asarray(X[:, 1])
                     ).reshape(-1, 1).astype(np.float32))
    cfg = SweepConfig(num_swipes=2, eps=1e-3, batch_size=32)

    def build():
        l1 = TensorTrainLayer(1, 1, f, output_shape=(1,), seed=0)
        l2 = TensorTrainLayer(2, 3, f - 1, output_shape=(1,), seed=1)
        sl = SumLayer([l1, l2])
        members = [Member(l.network, fn)
                   for l, fn in zip(sl.layers, sl.input_fns)]
        return sl, members

    sl1, m1 = build()
    p_single, ok1 = Sweeper(m1, SquareBregFunction(), cfg).run(
        [dict(l.params) for l in sl1.layers], X, y)
    sl2, m2 = build()
    p_mesh, ok2 = Sweeper(m2, SquareBregFunction(), cfg).run(
        [dict(l.params) for l in sl2.layers], X, y, mesh=make_mesh(8))
    assert ok1 and ok2
    for pa, pb in zip(p_single, p_mesh):
        for k in pa:
            np.testing.assert_allclose(np.asarray(pa[k]), np.asarray(pb[k]),
                                       rtol=5e-3, atol=5e-3)


def test_model_axis_sharded_training_matches_single():
    """2-D (data, model) mesh: conv-TT Gauss-Newton sweep with the patches
    axis sharded over 'model' == single-device sweep (SURVEY.md §2.9 TP row).
    XLA inserts the reduction collectives at the Gram contractions."""
    from jax.sharding import Mesh
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    rng = np.random.default_rng(5)
    S, P, pp, C = 32, 8, 5, 3  # P divisible by the model axis (4)
    x = jnp.asarray(rng.standard_normal((S, P, pp)), jnp.float32)
    y = jnp.asarray(np.eye(C + 1, dtype=np.float32)[rng.integers(0, C + 1, S)])
    cfg = SweepConfig(num_swipes=1, eps=1.0, method="ridge_cholesky",
                      batch_size=16)

    def build():
        return TensorConvolutionTrainLayer(
            num_carriages=2, bond_dim=3, num_patches=P, patch_pixels=pp,
            output_shape=(C,), convolution_bond=2, seed=7)

    l1 = build()
    p_single, ok1 = Sweeper(l1.network, XEBregman(w=1.0), cfg).run(
        [dict(l1.params)], x, y)
    assert ok1

    mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
    l2 = build()
    p_tp, ok2 = Sweeper(l2.network, XEBregman(w=1.0), cfg).run(
        [dict(l2.params)], x, y, mesh=mesh2, model_axis_labels=("patches",))
    assert ok2
    for k in p_single[0]:
        np.testing.assert_allclose(np.asarray(p_single[0][k]),
                                   np.asarray(p_tp[0][k]),
                                   rtol=5e-3, atol=5e-3)


def test_sharded_sweep_with_pallas_matches_single(monkeypatch):
    """VERDICT r02 item 2: the Pallas tier must survive a 1-D data mesh.
    engine._kernel_gram wraps the kernels in shard_map (per-shard kernel +
    psum on the partial Gram); the sharded-with-pallas sweep must (a) actually
    route through the kernels (trace-time call counters) and (b) equal the
    single-device plain sweep."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman
    from tensornetworksfork_tpu.ops.pallas.gram import CALLS

    # force the packed syrk route at tiny D so the kernels are exercised
    monkeypatch.setenv("TNF_PACKED_SYRK_MIN_D", "1")
    layer = TensorConvolutionTrainLayer(2, 3, 4, 5, output_shape=(3,),
                                        convolution_bond=2, seed=0)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((32, 4, 5)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 32)])
    cfg = SweepConfig(num_swipes=1, batch_size=16, method="ridge_cholesky",
                      eps=0.5)

    p_plain, okp = Sweeper(Network(layer.topology, use_pallas=False),
                           XEBregman(w=1.0), cfg).run([layer.params], x, y)
    before = dict(CALLS)
    net = Network(layer.topology, use_pallas=True)
    p_mesh, okq = Sweeper(net, XEBregman(w=1.0), cfg).run(
        [layer.params], x, y, mesh=make_mesh(8))
    assert okp and okq
    assert sum(CALLS.values()) > sum(before.values()), \
        "mesh run did not route through the Pallas kernels"
    assert net.mesh is None and net.use_pallas  # restored after the run
    for k in p_plain[0]:
        np.testing.assert_allclose(np.asarray(p_mesh[0][k]),
                                   np.asarray(p_plain[0][k]),
                                   rtol=5e-3, atol=5e-3)


def test_tp_mesh_pallas_active_matches_single(monkeypatch):
    """Pallas under a 2-D (data × model) mesh (round-3 VERDICT weak #6,
    closed in round 4): the tiled kernel pipeline reshards J's rows over
    ALL mesh axes inside shard_map (sample sums are exact under any row
    partition) and psums the raw (A, b) over both axes, so tensor
    parallelism keeps the kernel ladder. Kernels asserted ACTIVE on the
    TP run; TP result == single-device; flags restored after."""
    from jax.sharding import Mesh
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman
    from tensornetworksfork_tpu.ops.pallas.gram import CALLS

    monkeypatch.setenv("TNF_PACKED_SYRK_MIN_D", "1")
    rng = np.random.default_rng(5)
    S, P, pp, C = 32, 8, 5, 3
    x = jnp.asarray(rng.standard_normal((S, P, pp)), jnp.float32)
    y = jnp.asarray(np.eye(C + 1, dtype=np.float32)[rng.integers(0, C + 1, S)])
    cfg = SweepConfig(num_swipes=1, eps=1.0, method="ridge_cholesky",
                      batch_size=16)
    # N=3: the middle core is packed-eligible (tiled kernel route)
    layer = TensorConvolutionTrainLayer(
        num_carriages=3, bond_dim=3, num_patches=P, patch_pixels=pp,
        output_shape=(C,), convolution_bond=2, seed=7)
    p_single, ok1 = Sweeper(Network(layer.topology, use_pallas=True),
                            XEBregman(w=1.0), cfg).run([layer.params], x, y)
    net = Network(layer.topology, use_pallas=True)
    mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
    before = CALLS["gram_pair"]
    p_tp, ok2 = Sweeper(net, XEBregman(w=1.0), cfg).run(
        [layer.params], x, y, mesh=mesh2, model_axis_labels=("patches",))
    assert CALLS["gram_pair"] > before, "kernel tier inactive under TP"
    assert ok1 and ok2
    assert net.use_pallas and net.mesh is None  # restored
    for k in p_single[0]:
        np.testing.assert_allclose(np.asarray(p_tp[0][k]),
                                   np.asarray(p_single[0][k]),
                                   rtol=5e-3, atol=5e-3)


def test_inputless_member_mesh_with_pallas_no_crash():
    """Regression (round-3 review): an input-less (baked-data) network under
    a data mesh with Pallas enabled must not shard_map over its raw row
    count (60 rows, 8 devices) — the member keeps mesh=None and the XLA
    paths partition; result equals the single-device run."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import CompressedTensorTrainLayer
    from tensornetworksfork_tpu.ops.compression import (DataCompression,
                                                        train_compress)

    rng = np.random.default_rng(3)
    S, f = 60, 4  # 60 rows: NOT a multiple of 8 devices
    Xd = np.concatenate([rng.standard_normal((S, f - 1)).astype(np.float32),
                         np.ones((S, 1), np.float32)], axis=1)
    y = (Xd[:, 0] * Xd[:, 1]).reshape(S, 1).astype(np.float32)
    blocks, _ = train_compress(list(DataCompression(Xd).non_compressed(2)),
                               rank=16)

    def fit(mesh):
        layer = CompressedTensorTrainLayer(blocks, bond_dim=4,
                                           output_shape=(1,), seed=0)
        net = Network(layer.topology, use_pallas=True)
        sw = Sweeper(net, SquareBregFunction(),
                     SweepConfig(num_swipes=4, eps=1e-3))
        out, ok = sw.run([dict(layer.params)], {}, jnp.asarray(y), mesh=mesh)
        assert ok
        return np.asarray(net.forward(out[0], {}))

    pred_single = fit(None)
    pred_mesh = fit(make_mesh(8))
    # the local Gram systems are ill-conditioned, so params can wander;
    # the fitted function must agree
    np.testing.assert_allclose(pred_mesh, pred_single, rtol=5e-3, atol=5e-3)
    assert float(np.sqrt(np.mean((pred_single - y) ** 2))) < 0.1


def test_mesh_tiled_kmix_matches_single(monkeypatch):
    """The tiled pipeline (retile + packed grid, and the fused kmix kernel)
    now runs under a 1-D data mesh via shard_map — per-shard tiled kernels
    with a psum on the raw (A, b). Sharded == single-device."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import (
        TensorConvolutionTrainLayer)
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    monkeypatch.setenv("TNF_PACKED_SYRK_MIN_D", "1")
    monkeypatch.setenv("TNF_KMIX", "1")
    layer = TensorConvolutionTrainLayer(2, 3, 4, 5, output_shape=(3,),
                                        convolution_bond=2, seed=1)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((32, 4, 5)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 32)])
    cfg = SweepConfig(num_swipes=1, batch_size=16, method="ridge_cholesky",
                      eps=0.5)
    p_single, ok1 = Sweeper(Network(layer.topology, use_pallas=True),
                            XEBregman(w=1.0), cfg).run([layer.params], x, y)
    net = Network(layer.topology, use_pallas=True)
    p_mesh, ok2 = Sweeper(net, XEBregman(w=1.0), cfg).run(
        [layer.params], x, y, mesh=make_mesh(8))
    assert ok1 and ok2
    for k in p_single[0]:
        np.testing.assert_allclose(np.asarray(p_mesh[0][k]),
                                   np.asarray(p_single[0][k]),
                                   rtol=5e-3, atol=5e-3)


def _params_close_int8(p_mesh, p_single):
    # NOT bit-identical: sharding changes the quantization blocks (each
    # shard's absmax scales differ from the single-device blocks), so the
    # two runs see different quantization noise. Equality here is
    # statistical — both must land within int8-rounding distance.
    for k in p_single:
        np.testing.assert_allclose(np.asarray(p_mesh[k]),
                                   np.asarray(p_single[k]),
                                   rtol=5e-2, atol=5e-2)


def test_mesh_tiled_int8_matches_single(monkeypatch):
    """TNF_GRAM_DTYPE=int8 under a 1-D data mesh: the per-shard quantize +
    int8 pair kernels run inside shard_map with a psum on the raw (A, b).
    Sharded == single-device (both on the int8 tier), and the quantized
    route is actually taken on both."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import (
        TensorConvolutionTrainLayer)
    from tensornetworksfork_tpu.ops.bregman import XEBregman
    from tensornetworksfork_tpu.ops.pallas.gram import CALLS

    monkeypatch.setenv("TNF_PACKED_SYRK_MIN_D", "1")
    monkeypatch.setenv("TNF_GRAM_DTYPE", "int8")
    # N=3: the middle core is packed-eligible (the N=2 layer's nodes all
    # fall back to gram_and_rhs, which has no quantized form)
    layer = TensorConvolutionTrainLayer(3, 4, 5, 3, output_shape=(3,),
                                        convolution_bond=2, seed=1)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((32, 5, 3)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 32)])
    cfg = SweepConfig(num_swipes=1, batch_size=16, method="ridge_cholesky",
                      eps=0.5)
    before = CALLS["gram_pair_q"]
    p_single, ok1 = Sweeper(Network(layer.topology, use_pallas=True),
                            XEBregman(w=1.0), cfg).run([layer.params], x, y)
    assert CALLS["gram_pair_q"] > before
    net = Network(layer.topology, use_pallas=True)
    before = CALLS["gram_pair_q"]
    p_mesh, ok2 = Sweeper(net, XEBregman(w=1.0), cfg).run(
        [layer.params], x, y, mesh=make_mesh(8))
    assert CALLS["gram_pair_q"] > before
    assert ok1 and ok2
    _params_close_int8(p_mesh[0], p_single[0])


def test_mesh_ownout_defer_matches_single(monkeypatch):
    """The deferred own-out Gram (engine.gram_and_rhs defer_ownout) under a
    1-D data mesh: the raw upper class-pair dot contracts over the SHARDED
    sample axis (GSPMD inserts the psum), the scan carries the raw (P, DJ,
    DJ) accumulator, and expand_ownout runs once on the replicated result.
    Asserts the deferral is actually TAKEN on both runs (spy on
    expand_ownout) and sharded == single-device."""
    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import (
        TensorConvolutionTrainLayer)
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    monkeypatch.setenv("TNF_OWNOUT_DEFER", "1")
    calls = {"n": 0}
    orig = Network.expand_ownout

    def spy(A_raw, plan):
        calls["n"] += 1
        return orig(A_raw, plan)

    monkeypatch.setattr(Network, "expand_ownout", staticmethod(spy))
    layer = TensorConvolutionTrainLayer(3, 4, 5, 3, output_shape=(3,),
                                        convolution_bond=2, seed=2)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((64, 5, 3)), jnp.float32)
    y = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 64)])
    cfg = SweepConfig(num_swipes=2, batch_size=32, method="ridge_cholesky",
                      eps=0.5)
    p_single, ok1 = Sweeper(Network(layer.topology, use_pallas=False),
                            XEBregman(w=1.0), cfg).run([layer.params], x, y)
    assert calls["n"] > 0, "single-device run never took the deferral"
    calls["n"] = 0
    p_mesh, ok2 = Sweeper(Network(layer.topology, use_pallas=False),
                          XEBregman(w=1.0), cfg).run(
        [layer.params], x, y, mesh=make_mesh(8))
    assert calls["n"] > 0, "mesh run never took the deferral"
    assert ok1 and ok2
    for k in p_single[0]:
        np.testing.assert_allclose(np.asarray(p_mesh[0][k]),
                                   np.asarray(p_single[0][k]),
                                   rtol=5e-3, atol=5e-3)
