"""Sweep-driver semantics: eps schedules (list / decay / per-node), timeout
abort, r2l direction, skip_second, gradient method, node_order."""
import numpy as np
import jax.numpy as jnp

from tensornetworksfork_tpu.core.sweep import (SweepConfig, Sweeper,
                                               accumulating_sweep)
from tensornetworksfork_tpu.models.layers import TensorTrainLayer
from tensornetworksfork_tpu.ops.bregman import SquareBregFunction


def _problem(S=64, f=4, seed=0):
    rng = np.random.default_rng(seed)
    X = np.concatenate([rng.standard_normal((S, f - 1)).astype(np.float32),
                        np.ones((S, 1), np.float32)], axis=1)
    y = (X[:, 0] * X[:, 1]).reshape(-1, 1).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(y)


def test_eps_schedules():
    sw = Sweeper(TensorTrainLayer(2, 3, 4, seed=0).network,
                 SquareBregFunction(), SweepConfig(eps=[1.0, 0.5, 0.25]))
    # per-half-sweep list indexing (reference network.py:411-416)
    assert sw._eps_for(0, 0, 2, False) == 1.0
    assert sw._eps_for(2, 1, 2, False) == 0.25
    # decay multiplies eps_decay**NS (network.py:416)
    sw.cfg = SweepConfig(eps=2.0, eps_decay=0.5)
    assert sw._eps_for(0, 0, 2, False) == 2.0
    assert sw._eps_for(3, 0, 2, False) == 0.25
    # eps_per_node indexes by node position (network.py:427-431)
    sw.cfg = SweepConfig(eps=[0.1, 0.2], eps_per_node=True)
    assert sw._eps_for(5, 0, 2, False) == 0.1
    assert sw._eps_for(5, 1, 2, False) == 0.2


def test_eps_per_node_reversed_pass():
    """On the reversed half-sweep each node keeps ITS eps: the list indexes
    the canonical train order in both directions (network.py:427-431 and the
    second-pass mirror at :528-533)."""
    X, y = _problem()
    layer = TensorTrainLayer(2, 3, 4, output_shape=(1,), seed=3)
    cfg = SweepConfig(num_swipes=1, eps=[10.0, 0.5], eps_per_node=True)
    sw = Sweeper(layer.network, SquareBregFunction(), cfg)
    names = [layer.network.topology.nodes[ni].name
             for ni in sw.members[0].train_nodes]
    seen = []  # (node position in pass order -> eps) via the real call sites
    orig = sw._eps_for

    def spy(NS, i, n, reverse):
        e = orig(NS, i, n, reverse)
        seen.append((NS, i, reverse, e))
        return e

    sw._eps_for = spy
    _, ok = sw.run([layer.params], X, y)
    assert ok
    fwd = [(i, e) for NS, i, rev, e in seen if NS == 0]
    bwd = [(i, e) for NS, i, rev, e in seen if NS == 1]
    # forward pass: order == canonical, eps[i]
    assert fwd == [(0, 10.0), (1, 0.5)]
    # reversed pass: position 0 is the LAST canonical node -> eps flipped.
    # (junction rule skips the first node of the reversed pass only when it
    # shares a column with the previous pass's last node — here it does, so
    # only position 1 runs; it must get the canonical eps of node 0.)
    assert all(e == 10.0 for i, e in bwd if i == 1)
    assert all(e == 0.5 for i, e in bwd if i == 0)
    assert len(names) == 2


def test_timeout_aborts():
    X, y = _problem()
    layer = TensorTrainLayer(2, 3, 4, output_shape=(1,), seed=1)
    cfg = SweepConfig(num_swipes=50, eps=1e-3, timeout=0.0)
    params, ok = accumulating_sweep(layer.network, layer.params, X, y,
                                    SquareBregFunction(), cfg)
    assert not ok  # timed out immediately, reference return-False contract


def test_r2l_direction_and_skip_second():
    X, y = _problem()
    layer = TensorTrainLayer(2, 4, 4, output_shape=(1,),
                             constrict_bond=False, seed=2)
    cfg = SweepConfig(num_swipes=4, eps=1e-4, direction="r2l",
                      skip_second=True)
    params, ok = accumulating_sweep(layer.network, layer.params, X, y,
                                    SquareBregFunction(), cfg)
    assert ok
    pred = np.asarray(layer.network.forward(params,
                                            layer.network.bind_inputs(X)))
    assert float(np.sqrt(np.mean((pred - np.asarray(y)) ** 2))) < 0.1


def test_gradient_method_descends():
    X, y = _problem(S=128)
    layer = TensorTrainLayer(2, 3, 4, output_shape=(1,), seed=3)
    losses = []
    cfg = SweepConfig(num_swipes=4, method="gradient", lr=0.05,
                      batch_size=32, adaptive_step=True)
    params, ok = accumulating_sweep(
        layer.network, layer.params, X, y, SquareBregFunction(), cfg,
        loss_callback=lambda ns, n, l: losses.append(l))
    assert ok
    assert losses[-1] < losses[0], losses


def test_node_order_single_block():
    """node_order restricted to one node updates only that node (the batch
    regressor's per-block usage, module.py:413-428)."""
    X, y = _problem()
    layer = TensorTrainLayer(2, 3, 4, output_shape=(1,), seed=4)
    t = layer.topology
    sw = Sweeper(layer.network, SquareBregFunction(),
                 SweepConfig(num_swipes=1, eps=1e-3, skip_second=True))
    before = {k: np.asarray(v) for k, v in layer.params.items()}
    out, ok = sw.run([dict(layer.params)], X, y,
                     node_order=[(0, t.train_nodes[1])])
    assert ok
    a1_name = t.nodes[t.train_nodes[0]].name
    a2_name = t.nodes[t.train_nodes[1]].name
    np.testing.assert_array_equal(np.asarray(out[0][a1_name]), before[a1_name])
    assert not np.array_equal(np.asarray(out[0][a2_name]), before[a2_name])


def test_max_norm_projection():
    X, y = _problem()
    layer = TensorTrainLayer(2, 3, 4, output_shape=(1,), seed=5)
    cfg = SweepConfig(num_swipes=2, eps=1e-6, max_norm=0.5)
    params, ok = accumulating_sweep(layer.network, layer.params, X, y,
                                    SquareBregFunction(), cfg)
    assert ok
    for k, v in params.items():
        assert float(jnp.linalg.norm(v.reshape(-1))) <= 0.5 + 1e-4


def test_packed_sweep_matches_standard(monkeypatch):
    """A sweep with the layout-packed Jacobian path (default) matches one
    with packing disabled (TNF_PACKED_J=0) — the two builds are
    algebraically identical."""
    X, y = _problem(S=96, f=4, seed=11)
    cfg = SweepConfig(num_swipes=2, eps=1e-3, batch_size=32)

    monkeypatch.setenv("TNF_PACKED_J", "0")
    l1 = TensorTrainLayer(3, 3, 4, output_shape=(1,), seed=7)
    p_std, ok1 = accumulating_sweep(l1.network, dict(l1.params), X, y,
                                    SquareBregFunction(), cfg)
    assert ok1

    monkeypatch.setenv("TNF_PACKED_J", "1")
    l2 = TensorTrainLayer(3, 3, 4, output_shape=(1,), seed=7)
    p_pk, ok2 = accumulating_sweep(l2.network, dict(l2.params), X, y,
                                   SquareBregFunction(), cfg)
    assert ok2
    for k in p_std:
        np.testing.assert_allclose(np.asarray(p_pk[k]),
                                   np.asarray(p_std[k]), rtol=2e-4, atol=2e-4)


def test_env_history_reuse_matches_fresh_sweeper(monkeypatch):
    """Two-sided stack reuse: a run's near-env history serves as the next
    opposite-direction run's far chain (validated by param-array identity).
    A multi-epoch run on ONE Sweeper (reuse engaged) must match running each
    epoch on a FRESH Sweeper (every chain recomputed), and must actually
    skip far-chain computations."""
    import numpy as np
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    monkeypatch.setenv("TNF_SWEEP_TIMERS", "1")
    rng = np.random.default_rng(0)
    S, P, pp, C = 48, 5, 4, 3
    x = jnp.asarray(rng.standard_normal((S, P, pp)), jnp.float32)
    y = jnp.asarray(np.eye(C + 1, dtype=np.float32)[rng.integers(0, C + 1, S)])
    cfg = SweepConfig(num_swipes=1, batch_size=16, method="ridge_cholesky",
                      eps=1.0)

    def build():
        return TensorConvolutionTrainLayer(
            num_carriages=3, bond_dim=3, num_patches=P, patch_pixels=pp,
            output_shape=(C,), convolution_bond=2, seed=5)

    n_epochs = 3
    # one sweeper across epochs: history + data cache reused
    l1 = build()
    sw = Sweeper(l1.network, XEBregman(w=1.0), cfg)
    p_reuse = [dict(l1.params)]
    for _ in range(n_epochs):
        p_reuse, ok = sw.run(p_reuse, x, y)
        assert ok
    chains_reused = sw.timers["far_envs"][1]

    # fresh sweeper per epoch: no history survives
    l2 = build()
    p_fresh = [dict(l2.params)]
    chains_fresh = 0
    for _ in range(n_epochs):
        sw2 = Sweeper(l2.network, XEBregman(w=1.0), cfg)
        p_fresh, ok = sw2.run(p_fresh, x, y)
        assert ok
        chains_fresh += sw2.timers["far_envs"][1]

    assert chains_reused < chains_fresh, (chains_reused, chains_fresh)
    for k in p_reuse[0]:
        np.testing.assert_allclose(np.asarray(p_reuse[0][k]),
                                   np.asarray(p_fresh[0][k]),
                                   rtol=5e-3, atol=5e-3)


def test_env_history_reuse_with_gauges(monkeypatch):
    """orthonormalize=True swaps the updated node's NEIGHBOR mid-run — the
    id-validated history must treat those entries as stale. Multi-epoch
    reuse run == fresh-sweeper-per-epoch run, with gauges on."""
    import numpy as np
    monkeypatch.setenv("TNF_SWEEP_TIMERS", "1")
    rng = np.random.default_rng(1)
    S, f = 64, 4
    X = jnp.asarray(np.concatenate(
        [rng.standard_normal((S, f - 1)).astype(np.float32),
         np.ones((S, 1), np.float32)], axis=1))
    y = jnp.asarray((np.asarray(X[:, 0]) * np.asarray(X[:, 1])
                     ).reshape(-1, 1).astype(np.float32))
    cfg = SweepConfig(num_swipes=1, batch_size=32, eps=1e-4,
                      orthonormalize=True)

    def build():
        return TensorTrainLayer(3, 4, f, output_shape=(1,), seed=2)

    l1 = build()
    sw = Sweeper(l1.network, SquareBregFunction(), cfg)
    p_reuse = [dict(l1.params)]
    for _ in range(3):
        p_reuse, ok = sw.run(p_reuse, X, y)
        assert ok

    l2 = build()
    p_fresh = [dict(l2.params)]
    for _ in range(3):
        sw2 = Sweeper(l2.network, SquareBregFunction(), cfg)
        p_fresh, ok = sw2.run(p_fresh, X, y)
        assert ok

    pred_a = np.asarray(l1.network.forward(p_reuse[0],
                                           l1.network.bind_inputs(X)))
    pred_b = np.asarray(l2.network.forward(p_fresh[0],
                                           l2.network.bind_inputs(X)))
    np.testing.assert_allclose(pred_a, pred_b, rtol=5e-3, atol=5e-3)


def test_fullbatch_merge_matches_chunked(monkeypatch):
    """Small-D nodes merge all chunks into one full-batch scan step
    (TNF_FULLBATCH_MAX_BYTES gate). Results must match the chunked scan up
    to accumulation order — same data, same programs, one launch."""
    X, y = _problem(S=80)  # 80 samples, batch 32 -> 3 chunks with padding
    cfg = SweepConfig(num_swipes=2, batch_size=32, eps=1e-4)

    def run(cap):
        monkeypatch.setenv("TNF_FULLBATCH_MAX_BYTES", cap)
        layer = TensorTrainLayer(3, 4, 4, output_shape=(1,), seed=3)
        sw = Sweeper(layer.network, SquareBregFunction(), cfg)
        params, ok = sw.run([dict(layer.params)], X, y)
        assert ok
        return layer.network.forward(params[0],
                                     layer.network.bind_inputs(X))

    pred_merged = np.asarray(run(""))     # default cap: merge active
    pred_chunked = np.asarray(run("0"))   # 0 disables the merge
    np.testing.assert_allclose(pred_merged, pred_chunked,
                               rtol=1e-4, atol=1e-4)


def test_fullbatch_merge_iterative_and_pred(monkeypatch):
    """The merge also covers the matrix-free tier and the return_pred path
    (type-I sums consume chunked predictions — layout must be restored)."""
    X, y = _problem(S=80)
    cfg = SweepConfig(num_swipes=2, batch_size=32, eps=1e-4,
                      method="cg", max_iter=40)

    def run(cap):
        monkeypatch.setenv("TNF_FULLBATCH_MAX_BYTES", cap)
        layer = TensorTrainLayer(3, 4, 4, output_shape=(1,), seed=4)
        sw = Sweeper(layer.network, SquareBregFunction(), cfg)
        params, ok = sw.run([dict(layer.params)], X, y)
        assert ok
        return layer.network.forward(params[0],
                                     layer.network.bind_inputs(X))

    pred_merged = np.asarray(run(""))
    pred_chunked = np.asarray(run("0"))
    np.testing.assert_allclose(pred_merged, pred_chunked,
                               rtol=5e-4, atol=5e-4)


def test_fullbatch_merge_in_sum_restores_pred_layout(monkeypatch):
    """In a type-I sum the update returns chunked (nc, B, *out) predictions
    that feed the other members' rest cache — the full-batch merge must
    restore that layout. Merged sum sweep == merge-disabled sum sweep."""
    from tensornetworksfork_tpu.core.sweep import Member

    rng = np.random.default_rng(12)
    S, f = 80, 4
    X = jnp.asarray(np.concatenate(
        [rng.standard_normal((S, f - 1)).astype(np.float32),
         np.ones((S, 1), np.float32)], axis=1))
    y = jnp.asarray((np.asarray(X[:, 0]) * np.asarray(X[:, 1])
                     + 0.3 * np.asarray(X[:, 2])).reshape(S, 1))
    cfg = SweepConfig(num_swipes=3, batch_size=32, eps=1e-4)

    def run(cap):
        monkeypatch.setenv("TNF_FULLBATCH_MAX_BYTES", cap)
        la = TensorTrainLayer(2, 3, f, output_shape=(1,), seed=5)
        lb = TensorTrainLayer(2, 3, f, output_shape=(1,), seed=6)
        sw = Sweeper([Member(la.network), Member(lb.network)],
                     SquareBregFunction(), cfg)
        (pa, pb), ok = sw.run([dict(la.params), dict(lb.params)], X, y)
        assert ok
        return (np.asarray(la.network.forward(pa, la.network.bind_inputs(X)))
                + np.asarray(lb.network.forward(pb,
                                                lb.network.bind_inputs(X))))

    np.testing.assert_allclose(run(""), run("0"), rtol=1e-4, atol=1e-4)


def test_singular_abort_deferred_and_core_guarded():
    """A singular local system must (a) make run() return success=False —
    the reference's LinAlgError abort (network.py:481-484) — and (b) leave
    every core UNCHANGED: updates self-guard with where(ok, new, old) so the
    ok fetch can be deferred to one flush per half-pass without a NaN core
    poisoning later updates."""
    layer = TensorTrainLayer(2, 3, 4, seed=0)
    X = jnp.zeros((32, 4), jnp.float32)  # all-zero inputs -> A == 0
    y = jnp.ones((32, 1), jnp.float32)
    cfg = SweepConfig(num_swipes=1, method="exact", eps=0.0)
    sw = Sweeper(layer.network, SquareBregFunction(), cfg)
    params, ok = sw.run([layer.params], X, y)
    assert ok is False
    for k, v in layer.params.items():
        np.testing.assert_array_equal(np.asarray(params[0][k]),
                                      np.asarray(v))


def test_prepare_dedupes_identical_member_inputs():
    """Type-I image sums slice the SAME patch tensor for members 2..N —
    _prepare must keep ONE device copy of content-equal member inputs
    (reference AAMNST.py builds each member from the same conv tensor; at
    the CIFAR r=100 config duplicate copies cost ~1 GB of HBM)."""
    from tensornetworksfork_tpu.core.sweep import Member

    rng = np.random.default_rng(0)
    S, f = 40, 4
    X = rng.standard_normal((S, f)).astype(np.float32)
    y = rng.standard_normal((S, 1)).astype(np.float32)
    la = TensorTrainLayer(2, 3, f, output_shape=(1,), seed=1)
    lb = TensorTrainLayer(2, 3, f, output_shape=(1,), seed=2)

    # two members whose input_fns return content-equal fresh arrays
    def fn_a(x):
        return la.network.bind_inputs(np.array(x))

    def fn_b(x):
        return lb.network.bind_inputs(np.array(x))

    sw = Sweeper([Member(la.network, fn_a), Member(lb.network, fn_b)],
                 SquareBregFunction(), SweepConfig(num_swipes=1, eps=1e-3))
    data = sw._prepare(X, y, None)
    da, db = data["inputs"]
    assert set(da) == set(db)
    for k in da:
        assert da[k] is db[k]  # one device buffer serves both members
    # and the sweep still runs on the deduped data
    (pa, pb), ok = sw.run([dict(la.params), dict(lb.params)], X, y)
    assert ok
