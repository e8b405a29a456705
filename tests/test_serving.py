"""AOT serving exports (utils/serving.py): batch-polymorphic StableHLO
artifacts that reproduce model/estimator predictions without model code.
The reference has no serving path (inference re-runs the torch module,
models/tensor_train.py:219-236) — this is TPU-native added capability."""
import numpy as np
import pytest

from tensornetworksfork_tpu.models.estimators import TensorTrainRegressor
from tensornetworksfork_tpu.models.layers import (
    TensorConvolutionTrainLayer, TensorTrainLayer)
from tensornetworksfork_tpu.utils.serving import (
    export_forward, export_estimator, load_forward, save_forward)


def test_layer_export_roundtrip_batch_polymorphic(tmp_path):
    layer = TensorTrainLayer(3, 4, 5, output_shape=2, seed=0)
    x = np.random.default_rng(0).normal(size=(8, 5)).astype(np.float32)
    ref = np.asarray(layer(x))

    blob = export_forward(layer, (5,))
    p = str(tmp_path / "tt.stablehlo")
    save_forward(p, blob)
    f = load_forward(p)  # from a path, full file roundtrip
    assert "cpu" in f.platforms
    np.testing.assert_allclose(np.asarray(f(x)), ref, rtol=1e-5, atol=1e-5)
    # one artifact serves ANY batch size (symbolic batch dim)
    np.testing.assert_allclose(np.asarray(f(x[:3])), ref[:3],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f(np.tile(x, (4, 1)))),
                               np.tile(ref, (4, 1)), rtol=1e-5, atol=1e-5)


def test_conv_layer_export():
    layer = TensorConvolutionTrainLayer(2, 3, 4, 6, output_shape=3,
                                        convolution_bond=2, seed=1)
    x = np.random.default_rng(1).normal(size=(5, 4, 6)).astype(np.float32)
    ref = np.asarray(layer(x))
    f = load_forward(export_forward(layer, (4, 6)))
    np.testing.assert_allclose(np.asarray(f(x)), ref, rtol=1e-5, atol=1e-5)


def test_estimator_export_matches_predict():
    rng = np.random.default_rng(2)
    X = rng.uniform(-1, 1, size=(96, 4)).astype(np.float32)
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(np.int64)
    reg = TensorTrainRegressor(N=2, r=4, task="classification", num_swipes=3,
                               eps_start=0.5, eps_decay=0.5, seed=0)
    reg.fit(X, y)
    f = load_forward(export_estimator(reg))
    logits = np.asarray(f(X))  # raw rows in: bias + zero logit baked in
    ref = reg.predict(X)
    assert logits.shape == ref.shape  # includes the appended zero column
    np.testing.assert_allclose(logits, ref, rtol=1e-5, atol=1e-5)
    assert (logits.argmax(-1) == ref.argmax(-1)).all()


def test_estimator_export_requires_fit():
    with pytest.raises(ValueError, match="fitted"):
        export_estimator(TensorTrainRegressor(N=2, r=4))


def test_estimator_export_method_and_tnml(tmp_path):
    """est.export(path) writes a loadable artifact; TNML artifacts bake the
    minmax rescale + basis embedding in (raw feature rows at serve time)."""
    from tensornetworksfork_tpu.models.tnml import TNMLRegressor

    rng = np.random.default_rng(3)
    X = rng.uniform(0, 1, size=(64, 6)).astype(np.float32)
    y = (X[:, 0] + X[:, 3] > 1.0).astype(np.int64)

    reg = TensorTrainRegressor(N=2, r=4, task="classification", num_swipes=2,
                               eps_start=0.5, seed=0)
    reg.fit(X, y)
    p = str(tmp_path / "reg.stablehlo")
    reg.export(p)
    f = load_forward(p)
    np.testing.assert_allclose(np.asarray(f(X)), reg.predict(X),
                               rtol=1e-5, atol=1e-5)

    tn = TNMLRegressor(r=3, num_swipes=1, task="classification", seed=0,
                       verbose=0, input_scale="minmax")
    tn.fit(X, y)
    g = load_forward(tn.export())
    np.testing.assert_allclose(np.asarray(g(X)), tn.predict(X),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g(X[:5])), tn.predict(X[:5]),
                               rtol=1e-4, atol=1e-4)
