"""First-class numerics tiers (utils/precision.py; VERDICT r03 weak #5):
`precision="reference"|"fast"|"fastest"` on the estimator / RunConfig /
train_image env schema must behave exactly like the TNF_* env-var route
(they map to the same knobs, scoped and cache-keyed), and must restore the
ambient environment afterwards."""
import os

import numpy as np
import pytest

from tensornetworksfork_tpu.models.estimators import TensorTrainRegressor
from tensornetworksfork_tpu.utils.precision import (TIERS, numerics_tier,
                                                    validate_tier)


def _data(seed=0, S=96, d=4):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((S, d)).astype(np.float32)
    y = (X[:, 0] * X[:, 1] + 0.5 * X[:, 2] ** 2).astype(np.float32)
    return X, y


def _fit_predict(prec=None, env=None):
    saved = {k: os.environ.get(k) for k in
             ("TNF_GRAM_DTYPE", "TNF_AUX_PRECISION")}
    try:
        for k, v in (env or {}).items():
            os.environ[k] = v
        X, y = _data()
        m = TensorTrainRegressor(N=2, r=4, num_swipes=4, seed=0,
                                 eps_start=0.5, eps_decay=0.5,
                                 batch_size=32, verbose=0, precision=prec)
        m.fit(X, y, split_train=False)
        return m.predict(X)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@pytest.mark.parametrize("tier", ["fast", "fastest"])
def test_precision_kwarg_matches_env_route(tier):
    via_kwarg = _fit_predict(prec=tier)
    via_env = _fit_predict(env=TIERS[tier])
    np.testing.assert_array_equal(via_kwarg, via_env)


def test_precision_reference_matches_default_env():
    """\"reference\" == the package defaults (f32 Gram, HIGHEST aux)."""
    np.testing.assert_array_equal(_fit_predict(prec="reference"),
                                  _fit_predict())


def test_tiers_differ():
    """The tiers are real: fast (bf16 Gram) must differ bitwise from
    reference (f32-HIGHEST) on generic data — otherwise the kwarg is
    silently not reaching the engine."""
    assert not np.array_equal(_fit_predict(prec="reference"),
                              _fit_predict(prec="fast"))


def test_env_restored_after_fit():
    os.environ.pop("TNF_GRAM_DTYPE", None)
    os.environ["TNF_AUX_PRECISION"] = "highest"
    _fit_predict(prec="fastest")
    assert "TNF_GRAM_DTYPE" not in os.environ
    assert os.environ["TNF_AUX_PRECISION"] == "highest"
    os.environ.pop("TNF_AUX_PRECISION", None)


def test_invalid_tier_rejected():
    with pytest.raises(ValueError, match="precision"):
        TensorTrainRegressor(precision="f64")
    with pytest.raises(ValueError, match="precision"):
        with numerics_tier("bf16"):
            pass
    assert validate_tier("") is None and validate_tier(None) is None
    assert validate_tier("Fast") == "fast"


def test_runconfig_and_cli_plumbing():
    """RunConfig carries the field and train_tabular's builder forwards it;
    train_image's env schema reads PRECISION."""
    from tensornetworksfork_tpu.experiments.train_tabular import build_model
    from tensornetworksfork_tpu.utils.config import RunConfig
    cfg = RunConfig(precision="fast", output_dim=1)
    m = build_model(cfg, input_dim=4)
    assert m.precision == "fast"
    from tensornetworksfork_tpu.experiments.train_image import (
        get_config_from_env)
    old = os.environ.get("PRECISION")
    try:
        os.environ["PRECISION"] = "fastest"
        assert get_config_from_env()["precision"] == "fastest"
        os.environ["PRECISION"] = ""
        assert get_config_from_env()["precision"] is None
    finally:
        if old is None:
            os.environ.pop("PRECISION", None)
        else:
            os.environ["PRECISION"] = old
