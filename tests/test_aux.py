"""Auxiliary component tests: feature maps, symmetric CPD, TT-natural-gradient
module, reporting tables, default_train variants, TNML estimator, module-tier
estimators, growing drivers."""
import numpy as np
import pytest
import jax.numpy as jnp
import pandas as pd

from tensornetworksfork_tpu.ops import feature_maps


@pytest.mark.complex_dtype
def test_feature_maps_shapes():
    X = np.random.default_rng(0).uniform(-1, 1, (8, 3)).astype(np.float32)
    F = feature_maps.fourier_basis(X, 2)
    assert F.shape == (8, 3, 5) and F.dtype == jnp.complex64
    Fs = feature_maps.fourier_basis(X, 3, dense=False)
    assert Fs.shape[-1] == 4
    R = feature_maps.gaussian_rbf_basis(X, num_centers=6)
    assert R.shape == (8, 3, 6)
    L = feature_maps.legendre_basis(X, 3)
    assert L.shape == (8, 3, 4)
    # Legendre P2(x) = (3x^2 - 1)/2
    np.testing.assert_allclose(np.asarray(L[..., 2]),
                               (3 * X ** 2 - 1) / 2, rtol=1e-5, atol=1e-5)


def test_symmetric_cpd_fits():
    from tensornetworksfork_tpu.models.symmetric_cpd import SymmetricCPD
    rng = np.random.default_rng(1)
    d, R, m = 4, 3, 2
    W_true = rng.standard_normal((R, d))
    lam_true = rng.standard_normal(R)
    X = rng.standard_normal((256, d)).astype(np.float32)
    y = ((X @ W_true.T) ** m) @ lam_true
    model = SymmetricCPD(d, R + 1, m, seed=0).fit(X, y, iters=60, eps=1e-6)
    pred = model.predict(X)
    rel = np.sqrt(np.mean((pred - y) ** 2)) / y.std()
    assert rel < 0.05, rel


def test_tt_natural_gradient_steps():
    from tensornetworksfork_tpu.models.tt_nn import TTNaturalGradient
    from tensornetworksfork_tpu.ops.bregman import SquareBregFunction
    rng = np.random.default_rng(2)
    X = rng.standard_normal((128, 3)).astype(np.float32)
    y = (X[:, 0] * X[:, 1]).reshape(-1, 1).astype(np.float32)
    model = TTNaturalGradient(3, (1,), N=2, r=3, seed=0)
    params = model.params
    losses = []
    loss_fn = SquareBregFunction()
    for _ in range(12):
        params, loss = model.train_step(params, jnp.asarray(X),
                                        jnp.asarray(y), loss_fn)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses


def test_reporting_tables():
    from tensornetworksfork_tpu.experiments import reporting
    df = pd.DataFrame([
        {"N": 3, "r": 8, "seed": s, "test_accuracy": 0.9 + 0.01 * s,
         "num_parameters": 100}
        for s in range(4)
    ] + [{"N": 2, "r": 4, "seed": 0, "test_accuracy": 0.5,
          "num_parameters": 10}])
    tab = reporting.seed_averaged_table(df, ["N", "r"], min_seeds=3)
    assert len(tab) == 1 and tab.iloc[0]["n_seeds"] == 4
    tex = reporting.to_latex_table(tab)
    assert r"\begin{tabular}" in tex
    pf = reporting.pareto_frontier(df)
    assert len(pf) == 2  # both points are non-dominated


def test_default_train_variants():
    from tensornetworksfork_tpu.experiments import default_train
    for variant in ("raw", "rbf", "legendre"):
        res = default_train.run(variant, S=512, d=3, degree=2, N=3, r=6,
                                num_swipes=4)
        assert res["ok"], variant
        assert res["train_rmse"] < 0.6, (variant, res)


@pytest.mark.complex_dtype
def test_default_train_fourier_and_uncertainty():
    from tensornetworksfork_tpu.experiments import default_train
    res = default_train.run("fourier", S=256, d=2, degree=2, r=6, num_swipes=4)
    assert res["ok"]
    res_u = default_train.run("uncertainty", S=512, d=3, degree=2, N=2, r=4,
                              num_swipes=4, eps=1e-2)
    assert res_u["ok"]


def test_tnml_regressor():
    from tensornetworksfork_tpu.models.tnml import TNMLRegressor
    rng = np.random.default_rng(3)
    X = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
    # exactly representable in the sin-cos product basis (rank 1)
    y = (np.sin(np.pi / 2 * X[:, 0]) * np.cos(np.pi / 2 * X[:, 1])
         * np.cos(np.pi / 2 * X[:, 2]))
    reg = TNMLRegressor(r=6, num_swipes=6, eps_start=1e-4, eps_decay=0.8,
                        batch_size=256, seed=0)
    reg.fit(X, y)
    assert reg.score(X, y) > 0.9


def test_tnml_classification_standardized_inputs():
    # classification defaults to XE on C-1 logits, and input_scale="minmax"
    # refits standardized features into the [0, 1] domain the sin-cos
    # (Stoudenmire) embedding expects — without it the map wraps and
    # training plateaus near chance on z-scored tabular data.
    from tensornetworksfork_tpu.models.tnml import TNMLRegressor
    rng = np.random.default_rng(7)
    X = rng.standard_normal((512, 4)).astype(np.float32) * 3.0
    labels = (X[:, 0] + X[:, 1] > 0).astype(np.int64)
    y = np.eye(2, dtype=np.float32)[labels]
    reg = TNMLRegressor(r=4, output_dim=1, task="classification",
                        input_scale="minmax", num_swipes=6, eps_start=0.5,
                        eps_decay=0.5, batch_size=256, seed=0)
    reg.fit(X, y)
    assert reg.score(X, y) > 0.9


def test_module_batch_regressor():
    from tensornetworksfork_tpu.models.module import (
        TensorTrainBatchRegressor, TensorTrainRegressor)
    rng = np.random.default_rng(4)
    X = rng.standard_normal((256, 3)).astype(np.float32)
    y = (X[:, 0] + X[:, 1] * X[:, 2]).astype(np.float32)
    reg = TensorTrainRegressor(N=2, r=4, num_swipes=4, eps_start=1e-4,
                               eps_end=1e-6, perturb=False,
                               constrict_bond=False, seed=0)
    reg.fit(X, y)
    assert reg.score(X, y) > 0.8
    assert len(reg.trajectory) > 0
    breg = TensorTrainBatchRegressor(N=2, r=4, num_swipes=2, batch_size=64,
                                     swipe_method="batch_same", perturb=False,
                                     constrict_bond=False, eps_start=1e-3,
                                     eps_end=1e-3, seed=0)
    breg.fit(X, y)
    assert breg.score(X, y) > 0.5


def test_growing_drivers():
    from tensornetworksfork_tpu.experiments.growing import run_grow_cart
    rng = np.random.default_rng(5)
    x = rng.standard_normal((256, 6, 5)).astype(np.float32)
    y = rng.standard_normal((256, 2)).astype(np.float32)
    layer, hist = run_grow_cart(x, y, start_carriages=1, grow_steps=1,
                                bond_dim=3, convolution_bond=2, num_swipes=1,
                                eps=1e-2)
    assert len(hist) == 2
    assert hist[1]["carriages"] == 2
    assert all(h["ok"] for h in hist)


def test_epoch_flops_accounting():
    """flops.epoch_flops: linear in S, Gram-dominated for conv-TT, and the
    dominant term matches the analytic 2*S*C*D^2 within 2x."""
    import numpy as np
    import jax.numpy as jnp
    from tensornetworksfork_tpu.core.sweep import SweepConfig, Sweeper
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman
    from tensornetworksfork_tpu.utils.flops import epoch_flops

    layer = TensorConvolutionTrainLayer(3, 4, 6, 5, output_shape=(3,),
                                        convolution_bond=2, seed=0)
    cfg = SweepConfig(num_swipes=1, batch_size=64, method="ridge_cholesky",
                      eps=1.0)
    sw = Sweeper(layer.network, XEBregman(w=1.0), cfg)
    X1 = jnp.zeros((128, 6, 5), jnp.float32)
    y1 = jnp.zeros((128, 4), jnp.float32)
    X2 = jnp.zeros((256, 6, 5), jnp.float32)
    y2 = jnp.zeros((256, 4), jnp.float32)
    f1 = epoch_flops(sw, X1, y1)
    f2 = epoch_flops(sw, X2, y2)
    assert f1["total"] > 0
    # env+gram+jac scale with S; solve does not
    data1 = f1["total"] - f1["solve"]
    data2 = f2["total"] - f2["solve"]
    assert 1.8 < data2 / data1 < 2.2
    # dominant analytic Gram term: 2*S*CJ*D^2 per node per pass, where
    # CJ collapses to 1 for the node that owns the output axis (its
    # Jacobian carries no class axis)
    t = layer.network.topology
    out_axis = t.output_axes[0]
    gram = sum(
        2 * 128 * (1 if out_axis in t.node_axes[ni] else 3)
        * int(np.prod(t.nodes[ni].shape)) ** 2
        for ni in t.train_nodes) * 2
    assert f1["gram_and_jac"] >= gram * 0.9
    assert f1["gram_and_jac"] < gram * 2.0


def test_viz_ascii_fallback():
    from tensornetworksfork_tpu.models.layers import TensorTrainLayer
    from tensornetworksfork_tpu.utils.viz import visualize_topology
    layer = TensorTrainLayer(2, 3, 3, output_shape=(1,), seed=0)
    out = visualize_topology(layer.topology)
    assert out is not None


def test_timer_rates():
    import time as _t
    from tensornetworksfork_tpu.utils.timing import Timer
    timer = Timer()
    with timer.phase("x"):
        _t.sleep(0.01)
    with timer.phase("x"):
        _t.sleep(0.01)
    s = timer.summary()["x"]
    assert s["count"] == 2 and s["total_s"] >= 0.02
    assert timer.rate("x") > 0


def test_plots_gated():
    from tensornetworksfork_tpu.experiments import plots
    import pandas as pd
    df = pd.DataFrame([{"num_parameters": 10 * (i + 1),
                        "test_accuracy": 0.8 + 0.02 * i, "N": 2 + i,
                        "r": 4, "seed": s}
                       for i in range(3) for s in range(3)])
    try:
        fig = plots.frontier_plot(df, group="N")
        assert fig is not None
        traj = [{"epoch": e, "val_rmse": 1.0 / (e + 1)} for e in range(5)]
        assert plots.convergence_plot([traj]) is not None
        assert plots.seed_table_plot(df, ["N", "r"]) is not None
    except ImportError:
        import pytest
        pytest.skip("matplotlib unavailable")
