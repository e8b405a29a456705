"""Comparison baselines used by the grid-search / sweep drivers.

Rebuilds the reference baseline zoo on the JAX stack:
- MLP / PINet (multiplicative residual) / ResMLP + AdamW training wrapper
  (reference models/mlp.py) implemented in flax.linen + optax;
- XGBoost wrappers with label re-encoding and inverse-frequency sample
  weights (models/xgboost.py) — gated, xgboost is optional;
- SVM wrappers (models/svm.py) and PolynomialFeatures+Ridge/Lasso/pinv
  regression (models/polynomial_regression.py) over sklearn.
"""
from __future__ import annotations

from collections import Counter
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

try:
    import flax.linen as nn
    import optax
    _HAVE_FLAX = True
except Exception:  # pragma: no cover
    _HAVE_FLAX = False


if _HAVE_FLAX:

    class MLP(nn.Module):
        output_dim: int
        hidden_layers: Sequence[int] = (64, 64)
        activation: str = "relu"

        @nn.compact
        def __call__(self, x):
            act = nn.relu if self.activation == "relu" else nn.tanh
            for h in self.hidden_layers:
                x = act(nn.Dense(h)(x))
            return nn.Dense(self.output_dim)(x)

    class PINet(nn.Module):
        """Multiplicative-residual net (reference models/mlp.py:22-40)."""
        output_dim: int
        hidden_layers: Sequence[int] = (64, 64)

        @nn.compact
        def __call__(self, x):
            res = x
            prev = x.shape[-1]
            for h in self.hidden_layers:
                x = nn.Dense(h)(x)
                if prev == h:
                    x = x * res
                res = x
                prev = h
            return nn.Dense(self.output_dim)(x)

    class ResMLP(nn.Module):
        output_dim: int
        hidden_layers: Sequence[int] = (64, 64)
        activation: str = "relu"

        @nn.compact
        def __call__(self, x):
            act = nn.relu if self.activation == "relu" else nn.tanh
            res = x
            prev = x.shape[-1]
            for h in self.hidden_layers:
                x = act(nn.Dense(h)(x))
                if prev == h:
                    x = x + res
                res = x
                prev = h
            return nn.Dense(self.output_dim)(x)


class MLPWrapper:
    """AdamW minibatch trainer (reference MLPWrapper, models/mlp.py:66-118)."""

    def __init__(self, input_dim, output_dim, mlp_params=None,
                 task="regression"):
        if not _HAVE_FLAX:
            raise ImportError("flax/optax required for MLP baselines")
        p = mlp_params or {}
        hidden = tuple(p.get("hidden_layers", (64, 64)))
        act = p.get("activation", "relu")
        self.lr = p.get("lr", 1e-1)
        self.epochs = p.get("epochs", 50)
        self.batch_size = p.get("batch_size", 128)
        kind = p.get("type", "mlp").lower()
        self.task = task
        if kind.startswith("pin"):
            self.model = PINet(output_dim, hidden)
        elif kind.startswith("res"):
            self.model = ResMLP(output_dim, hidden, act)
        else:
            self.model = MLP(output_dim, hidden, act)
        self._params = None
        self._seed = p.get("seed", 0)

    def fit(self, X, y):
        X = jnp.asarray(np.asarray(X), jnp.float32)
        y = np.asarray(y)
        if self.task == "classification":
            if y.ndim == 2:
                y = y.argmax(-1)
            y = jnp.asarray(y, jnp.int32)
            def loss_fn(params, xb, yb):
                logits = self.model.apply(params, xb)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb).mean()
        else:
            y = jnp.asarray(y, jnp.float32)
            if y.ndim == 1:
                y = y[:, None]
            def loss_fn(params, xb, yb):
                return jnp.mean((self.model.apply(params, xb) - yb) ** 2)

        key = jax.random.PRNGKey(self._seed)
        params = self.model.init(key, X[:1])
        tx = optax.adamw(self.lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, xb, yb):
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        n = X.shape[0]
        rng = np.random.default_rng(self._seed)
        for _ in range(self.epochs):
            idx = rng.permutation(n)
            for b in range(0, n, self.batch_size):
                bi = idx[b:b + self.batch_size]
                params, opt_state, _ = step(params, opt_state, X[bi], y[bi])
        self._params = params
        return self

    def predict(self, X):
        X = jnp.asarray(np.asarray(X), jnp.float32)
        out = self.model.apply(self._params, X)
        if self.task == "classification":
            return np.asarray(out.argmax(axis=1))
        return np.asarray(out).squeeze(-1)


class XGBRegWrapper:
    def __init__(self, xgb_params=None):
        import xgboost as xgb  # gated: optional dependency
        self.xgb_object = xgb.XGBRegressor(**(xgb_params or {}))

    def fit(self, X, y):
        self.xgb_object.fit(np.asarray(X), np.asarray(y))

    def predict(self, X):
        return self.xgb_object.predict(np.asarray(X))


class XGBClfWrapper:
    """Classifier with label re-encoding + inverse-frequency sample weights
    (reference models/xgboost.py:19-45)."""

    def __init__(self, xgb_params=None):
        import xgboost as xgb  # gated: optional dependency
        self.xgb_object = xgb.XGBClassifier(**(xgb_params or {}))
        self.translation_dict = None
        self.retranslation_dict = None

    def fit(self, X, y):
        y = np.asarray(y)
        if y.ndim == 2:
            y = y.argmax(-1)
        unique = np.unique(y)
        self.translation_dict = {l: i for i, l in enumerate(unique)}
        self.retranslation_dict = {i: l for i, l in enumerate(unique)}
        y_enc = np.vectorize(self.translation_dict.get)(y)
        counts = Counter(y_enc)
        weights = {i: min(counts.values()) / counts[i] for i in counts}
        w = np.vectorize(weights.get)(y_enc)
        self.xgb_object.fit(np.asarray(X), y_enc, sample_weight=w)

    def predict(self, X):
        y_pred = self.xgb_object.predict(np.asarray(X))
        return np.vectorize(self.retranslation_dict.get)(y_pred)


class SVMRegWrapper:
    def __init__(self, svm_params=None):
        from sklearn.svm import SVR
        self.svm_object = SVR(**(svm_params or {}))

    def fit(self, X, y):
        y = np.asarray(y)
        self.svm_object.fit(np.asarray(X), y.squeeze(-1) if y.ndim > 1 else y)

    def predict(self, X):
        return self.svm_object.predict(np.asarray(X))


class SVMClfWrapper:
    def __init__(self, svm_params=None):
        from sklearn.svm import SVC
        self.svm_object = SVC(**(svm_params or {}))
        self.translation_dict = None
        self.retranslation_dict = None

    def fit(self, X, y):
        y = np.asarray(y)
        if y.ndim == 2:
            y = y.argmax(-1)
        unique = np.unique(y)
        self.translation_dict = {l: i for i, l in enumerate(unique)}
        self.retranslation_dict = {i: l for i, l in enumerate(unique)}
        self.svm_object.fit(np.asarray(X),
                            np.vectorize(self.translation_dict.get)(y))

    def predict(self, X):
        y_pred = self.svm_object.predict(np.asarray(X))
        return np.vectorize(self.retranslation_dict.get)(y_pred)


class GaussianProcessWrapper:
    """sklearn Gaussian process baseline (reference
    train_grid_search_GaussianProcess.py)."""

    def __init__(self, gp_params=None, task="regression"):
        self.task = task
        p = gp_params or {}
        if task == "classification":
            from sklearn.gaussian_process import GaussianProcessClassifier
            self.model = GaussianProcessClassifier(**p)
        else:
            from sklearn.gaussian_process import GaussianProcessRegressor
            self.model = GaussianProcessRegressor(**p)

    def fit(self, X, y):
        y = np.asarray(y)
        if self.task == "classification" and y.ndim == 2:
            y = y.argmax(-1)
        self.model.fit(np.asarray(X), y.squeeze() if y.ndim > 1 else y)
        return self

    def predict(self, X):
        return self.model.predict(np.asarray(X))


class PolynomialRegressionWrapper:
    """PolynomialFeatures + Ridge/Lasso/pinv (reference
    models/polynomial_regression.py)."""

    def __init__(self, degree=2, regularization: Optional[str] = None,
                 alpha=1.0):
        from sklearn.preprocessing import PolynomialFeatures
        self.degree = degree
        self.regularization = regularization
        self.alpha = alpha
        self.poly = PolynomialFeatures(degree=degree)
        if regularization == "l2":
            from sklearn.linear_model import Ridge
            self.model = Ridge(alpha=alpha)
        elif regularization == "l1":
            from sklearn.linear_model import Lasso
            self.model = Lasso(alpha=alpha)
        else:
            self.model = None
        self._coef = None

    def fit(self, X, y):
        Xp = self.poly.fit_transform(np.asarray(X))
        y = np.asarray(y)
        if self.model is not None:
            self.model.fit(Xp, y)
        else:
            self._coef = np.linalg.pinv(Xp) @ y
        return self

    def predict(self, X):
        Xp = self.poly.transform(np.asarray(X))
        if self.model is not None:
            return self.model.predict(Xp)
        return Xp @ self._coef


if _HAVE_FLAX:

    class SimpleCNN(nn.Module):
        """Small ConvNet baseline (reference train_mnist_cnn.py:12-60)."""
        num_classes: int = 10
        channels: Sequence[int] = (16, 32)

        @nn.compact
        def __call__(self, x):
            # x: (B, H, W) or (B, H, W, C)
            if x.ndim == 3:
                x = x[..., None]
            for ch in self.channels:
                x = nn.relu(nn.Conv(ch, (3, 3))(x))
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = x.reshape(x.shape[0], -1)
            x = nn.relu(nn.Dense(64)(x))
            return nn.Dense(self.num_classes)(x)


class CNNWrapper(MLPWrapper):
    """ConvNet classifier trained with AdamW (reference train_mnist_cnn.py)."""

    def __init__(self, num_classes=10, cnn_params=None):
        p = cnn_params or {}
        if not _HAVE_FLAX:
            raise ImportError("flax/optax required for the CNN baseline")
        self.lr = p.get("lr", 1e-3)
        self.epochs = p.get("epochs", 5)
        self.batch_size = p.get("batch_size", 128)
        self.task = "classification"
        self.model = SimpleCNN(num_classes, tuple(p.get("channels", (16, 32))))
        self._params = None
        self._seed = p.get("seed", 0)
