"""Estimator-level tests: regression/classification fit quality, type-I sums,
early stopping, loss-function triples vs autograd."""
import numpy as np
import jax
import jax.numpy as jnp

from tensornetworksfork_tpu.models.estimators import TensorTrainRegressor
from tensornetworksfork_tpu.data.synthetic import make_classification, make_regression
from tensornetworksfork_tpu.ops import bregman


def test_regressor_fits_polynomial():
    X, y = make_regression(S=512, d=3, degree=2, seed=0)
    reg = TensorTrainRegressor(N=2, r=6, num_swipes=10, eps_start=1e-4,
                               eps_decay=0.9, batch_size=256, seed=0)
    reg.fit(X, y)
    score = reg.score(X, y)
    assert score > 0.95, score


def test_regressor_type1_and_early_stopping():
    X, y = make_regression(S=512, d=3, degree=3, seed=1)
    reg = TensorTrainRegressor(N=3, r=4, model_type="tt_type1", num_swipes=8,
                               eps_start=1e-3, eps_decay=0.7, batch_size=256,
                               early_stopping=4, seed=1)
    reg.fit(X, y)
    assert reg._early_stopper.epoch > 0
    assert reg.score(X, y) > 0.8


def test_classifier():
    X, y = make_classification(S=600, d=4, n_classes=3, seed=2)
    reg = TensorTrainRegressor(N=2, r=8, output_dim=2, task="classification",
                               bf=bregman.XEBregman(w=1.0), num_swipes=6,
                               eps_start=1e-2, eps_decay=0.7, batch_size=300,
                               seed=2)
    reg.fit(X, y)
    acc = reg.score(X, y)
    assert acc > 0.85, acc


def test_losses_match_autograd():
    """Every analytic (loss, grad, hess) triple must agree with autograd."""
    rng = np.random.default_rng(0)
    B, C = 4, 3
    x = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)

    cases = []
    y_sq = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
    cases.append((bregman.SquareBregFunction(), x, y_sq))
    labels = jnp.eye(C + 1, dtype=jnp.float32)[jnp.asarray(rng.integers(0, C + 1, B))]
    cases.append((bregman.XEBregman(w=1.3), x, labels))
    y_bin = jnp.asarray(rng.uniform(0.1, 0.9, (B, C)), jnp.float32)
    cases.append((bregman.BinaryKLDivBregman(w=0.7), x, y_bin))
    cases.append((bregman.SoftmaxSquaredLoss(w=1.1), x,
                  jax.nn.softmax(jnp.asarray(rng.standard_normal((B, C)),
                                             jnp.float32))))

    for fn, xp, yt in cases:
        loss, g, H = fn(xp, yt)

        def scalar(xi, yi):
            return fn(xi[None], yi[None], only_loss=True)[0]

        g_auto = jax.vmap(jax.grad(scalar))(xp, yt)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_auto),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=type(fn).__name__)
        if type(fn).__name__ == "SoftmaxSquaredLoss":
            continue  # reference uses the Gauss-Newton JtJ approx, not true H
        H_auto = jax.vmap(jax.jacfwd(jax.grad(scalar)))(xp, yt)
        H_full = np.asarray(H)
        if H_full.ndim == 2:  # diagonal form
            H_auto = np.asarray(jax.vmap(jnp.diag)(
                jnp.asarray(H_auto)))  # extract diagonal
            np.testing.assert_allclose(H_full, H_auto, rtol=2e-3, atol=2e-3,
                                       err_msg=type(fn).__name__)
        else:
            np.testing.assert_allclose(H_full, np.asarray(H_auto),
                                       rtol=2e-3, atol=2e-3,
                                       err_msg=type(fn).__name__)


def test_uncertainty_loss_shapes():
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.standard_normal((5, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((5,)), jnp.float32)
    loss, g, H = bregman.UncertaintyAutogradLoss()(pred, y)
    assert loss.shape == (5,)
    assert g.shape == (5, 2)
    assert H.shape == (5, 2, 2)


def test_estimator_cumsum_type1_and_cpd_type1():
    X, y = make_regression(S=384, d=3, degree=2, seed=5)
    for mt, kw in [("tt_type1", dict(cum_sum=True)), ("cpd_type1", {})]:
        reg = TensorTrainRegressor(N=2, r=4, model_type=mt, num_swipes=4,
                                   eps_start=1e-2, eps_decay=0.7,
                                   batch_size=192, seed=5, **kw)
        reg.fit(X, y)
        score = reg.score(X, y)
        assert score > 0.3, (mt, score)


def test_estimator_linear_dim_path():
    X, y = make_regression(S=384, d=6, degree=2, seed=6)
    reg = TensorTrainRegressor(N=2, r=4, linear_dim=3, num_swipes=6,
                               eps_start=1e-2, eps_decay=0.7, batch_size=192,
                               seed=6)
    reg.fit(X, y)
    assert reg.score(X, y) > 0.3


def test_classifier_accepts_raw_integer_labels():
    """sklearn-style label vectors one-hot internally (and set output_dim);
    previously raw labels broadcast against the C-logit softmax and trained
    garbage. Reference drivers encode before fit (train_tabular.py:93-101);
    the direct estimator API must accept both forms."""
    from sklearn.datasets import load_iris
    X, y = load_iris(return_X_y=True)  # y: (150,) ints 0..2
    reg = TensorTrainRegressor(N=2, r=4, task="classification", num_swipes=4,
                               eps_start=0.5, eps_decay=0.5, seed=0)
    reg.fit(X / X.max(0), y)
    assert reg.output_dim == 2  # C-1 logits inferred from the labels
    assert reg.score(X / X.max(0), y) > 0.8


def test_classifier_label_validation():
    """Label-encoding guards (code-review round 3): negative labels ({-1,+1}
    convention) must raise instead of silently wrapping onto the last class;
    a val label outside the train-derived class range must raise a clear
    ValueError instead of IndexError'ing deep in fit; raw multi-class labels
    with perturb=True must fail at the estimator level (the constructor's
    guard can't see the label-implied output_dim)."""
    import pytest
    from tensornetworksfork_tpu.models.estimators import (
        one_hot_labels, prepare_classification_targets)

    with pytest.raises(ValueError, match="negative"):
        one_hot_labels(np.array([-1, 1, 1, -1]))
    with pytest.raises(ValueError, match="out of range"):
        one_hot_labels(np.array([0, 1, 2]), n_cls=2)
    with pytest.raises(ValueError, match="perturb"):
        prepare_classification_targets(np.array([0, 1, 2]), None, 1, True)
    # one-hot targets pass through untouched regardless of perturb
    y = np.eye(3, dtype=np.float32)[np.array([0, 1, 2])]
    y2, yv, od = prepare_classification_targets(y, None, 1, True)
    assert y2 is y and od == 1
