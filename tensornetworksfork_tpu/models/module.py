"""Older-generation estimator variants.

Rebuilds `/root/reference/tensor/module.py`: the geomspace-eps trajectory
regressor (module.py:103-288), the stochastic block-coordinate batch
regressor with swipe_method in {batch_unique, batch_same, batch_block}
(module.py:308-500, `mirrored_cycle` module.py:290-306), and the
one-pass degree-early-stopping regressor (module.py:502-614).
"""
from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

from ..core.sweep import Member, SweepConfig, Sweeper
from ..ops.bregman import SquareBregFunction
from .estimators import rmse, r2_score_np, error_rate
from .layers import (CPDLayer, SumLayer, TensorTrainLayer,
                     TensorTrainLinearLayer)

try:
    from sklearn.base import BaseEstimator, RegressorMixin
except Exception:  # pragma: no cover
    class BaseEstimator:  # type: ignore
        pass

    class RegressorMixin:  # type: ignore
        pass


def mirrored_cycle(seq, one_cycle: bool = False):
    """1,2,3,2,1,2,3,... node cycling (reference module.py:290-306)."""
    if not seq:
        return
    if one_cycle:
        yield from (list(seq) + list(reversed(seq[:-1])))
        return
    forward = list(seq)
    backward = forward[-2:0:-1]
    pattern = forward + backward
    while True:
        yield from pattern


class TensorTrainRegressor(BaseEstimator, RegressorMixin):
    """Geomspace-eps trajectory variant (reference tensor/module.py:103-288):
    eps follows geomspace(eps_start, eps_end) over 2*num_swipes half-sweeps
    (or per-node when num_swipes == 1), and every block update appends
    val metrics to `trajectory`."""

    def __init__(self, N=2, r=2, output_dim=1, linear_dim=None,
                 constrict_bond=True, perturb=True, seed=42, bf=None, lr=1.0,
                 eps_start=1e-12, eps_end=1e-12, batch_size=512,
                 method="ridge_cholesky", num_swipes=5, model_type="tt",
                 dtype=jnp.float32, verbose=0):
        self.N = N
        self.r = r
        self.output_dim = output_dim
        self.linear_dim = linear_dim if linear_dim is not None and linear_dim > 0 else None
        self.constrict_bond = constrict_bond
        self.perturb = perturb
        self.seed = seed
        self.bf = bf
        self.lr = lr
        if num_swipes > 1:
            self.epss = (np.geomspace(eps_start, eps_end, 2 * num_swipes).tolist()
                         if eps_end != eps_start else [eps_end] * (2 * num_swipes))
        else:
            self.epss = np.geomspace(eps_start, eps_end, N).tolist()
        self.batch_size = batch_size
        self.method = method
        self.num_swipes = num_swipes
        self.model_type = model_type
        self.dtype = dtype
        self.verbose = verbose
        self._model = None
        self.input_dim = None
        self.trajectory: List[dict] = []

    def _initialize_model(self):
        if self.model_type == "cpd":
            self._model = CPDLayer(self.N, self.r, self.input_dim,
                                   output_shape=self.output_dim,
                                   perturb=self.perturb, dtype=self.dtype,
                                   seed=self.seed)
        elif self.model_type.startswith("tt_type1"):
            drop_bias = "bias_first" in self.model_type
            mk = (TensorTrainLinearLayer if (self.linear_dim is not None and
                                             self.linear_dim < self.input_dim)
                  else TensorTrainLayer)
            layers = []
            train_linear = "_no_train_linear" not in self.model_type
            for i in range(1, self.N + 1):
                f = self.input_dim - 1 if (drop_bias and i != 1) else self.input_dim
                kw = dict(output_shape=self.output_dim,
                          constrict_bond=self.constrict_bond,
                          perturb=self.perturb, dtype=self.dtype,
                          seed=self.seed + i)
                if mk is TensorTrainLinearLayer:
                    layers.append(mk(i, self.r, f, self.linear_dim,
                                     train_linear=train_linear, **kw))
                else:
                    layers.append(mk(i, self.r, f, **kw))
            self._model = SumLayer(layers)
        elif self.linear_dim is not None and self.linear_dim < self.input_dim:
            self._model = TensorTrainLinearLayer(
                self.N, self.r, self.input_dim, self.linear_dim,
                output_shape=self.output_dim, constrict_bond=self.constrict_bond,
                perturb=self.perturb, dtype=self.dtype, seed=self.seed)
        else:
            self._model = TensorTrainLayer(
                self.N, self.r, self.input_dim, output_shape=self.output_dim,
                constrict_bond=self.constrict_bond, perturb=self.perturb,
                dtype=self.dtype, seed=self.seed)

    # -------------------------------------------------------------- plumbing
    def _prep_xy(self, X, y):
        X = jnp.asarray(np.asarray(X), self.dtype)
        X = jnp.concatenate([X, jnp.ones((X.shape[0], 1), X.dtype)], axis=1)
        if y is not None:
            y = jnp.asarray(np.asarray(y), self.dtype)
            if y.ndim == 1:
                y = y[:, None]
        return X, y

    def _make_sweeper(self, cfg):
        if isinstance(self._model, SumLayer):
            members = [Member(l.network, fn) for l, fn in
                       zip(self._model.layers, self._model.input_fns)]
            return Sweeper(members, self._bf(), cfg), self._model.params_list
        return Sweeper(self._model.network, self._bf(), cfg), [self._model.params]

    def _store(self, sweeper):
        pl = sweeper.params_list
        if isinstance(self._model, SumLayer):
            self._model.set_params_list(pl)
        else:
            self._model.params = pl[0]

    def _bf(self):
        return self.bf if self.bf is not None else SquareBregFunction()

    def _forward_all(self, X):
        return self._model.forward_batch(X, self.batch_size)

    def _split(self, X, y, X_val, y_val, validation_split, split_train):
        if X_val is None or y_val is None:
            if split_train:
                n = X.shape[0]
                idx = np.arange(n)
                rng = np.random.RandomState(self.seed)
                rng.shuffle(idx)
                split = int(n * (1 - validation_split))
                return X[idx[:split]], y[idx[:split]], X[idx[split:]], y[idx[split:]]
            return X, y, X, y
        X_val, y_val = self._prep_xy(X_val, y_val)
        return X, y, X_val, y_val

    def fit(self, X, y, X_val=None, y_val=None, validation_split=0.1,
            split_train=True):
        X, y = self._prep_xy(X, y)
        if self._model is None:
            self.input_dim = int(X.shape[1])
            self._initialize_model()
        X, y, X_val, y_val = self._split(X, y, X_val, y_val, validation_split,
                                         split_train)
        self.trajectory = []
        epoch = [0]

        cfg = SweepConfig(num_swipes=self.num_swipes, batch_size=self.batch_size,
                          method=self.method, eps=self.epss, lr=self.lr,
                          eps_per_node=(self.num_swipes == 1
                                        and len(self.epss) == self.N),
                          verbose=self.verbose)
        sweeper, init = self._make_sweeper(cfg)

        def convergence_criterion():
            epoch[0] += 1
            self._store(sweeper)
            y_pred = np.asarray(self._forward_all(X_val))
            log = {"epoch": epoch[0], "val_rmse": rmse(np.asarray(y_val), y_pred)}
            if y_val.shape[1] > 1:
                log["val_accuracy"] = 1.0 - error_rate(np.asarray(y_val), y_pred)
            if self.verbose > 0:
                print(", ".join(f"{k}: {v}" for k, v in log.items()))
            self.trajectory.append(log)
            return False

        sweeper.run(init, X, y, convergence_criterion=convergence_criterion)
        self._store(sweeper)
        return self

    def predict(self, X):
        X, _ = self._prep_xy(X, None)
        return np.asarray(self._forward_all(X))

    def score(self, X, y_true):
        y_pred = self.predict(X)
        y_true = np.asarray(y_true)
        if y_true.ndim == 1:
            y_true = y_true[:, None]
        return r2_score_np(y_true, y_pred.reshape(y_true.shape))


class TensorTrainBatchRegressor(TensorTrainRegressor):
    """Stochastic block-coordinate variants (reference module.py:308-500):
    batch_unique = one node per minibatch, mirrored round-robin;
    batch_same   = a full sweep per minibatch;
    batch_block  = one node trained across all minibatches, mirrored cycle."""

    def __init__(self, *args, batch_size=1024, swipe_method="batch_unique",
                 stream=None, **kwargs):
        super().__init__(*args, batch_size=batch_size, **kwargs)
        self.swipe_method = swipe_method
        # stream="native": minibatches gathered by the C++ prefetcher
        # (utils/data_stream.py) on a background thread instead of fancy
        # indexing on the training thread. Same protocol; permutations come
        # from the native mt19937_64 shuffle (not bit-identical to the
        # default path's RandomState), and batch_block draws a fresh
        # permutation per block instead of reusing the swipe's one.
        self.stream = stream

    def fit(self, X, y, X_val=None, y_val=None, validation_split=0.1,
            split_train=True):
        X, y = self._prep_xy(X, y)
        if self._model is None:
            self.input_dim = int(X.shape[1])
            self._initialize_model()
        X, y, X_val, y_val = self._split(X, y, X_val, y_val, validation_split,
                                         split_train)
        n_train = int(X.shape[0])
        n_batches = (n_train + self.batch_size - 1) // self.batch_size
        batch_rng = np.random.RandomState(self.seed)
        self.trajectory = []
        epoch = [0]

        eps_per_node = len(self.epss) == self.N
        cfg = SweepConfig(num_swipes=1, batch_size=-1, method=self.method,
                          eps=self.epss, lr=self.lr, eps_per_node=eps_per_node,
                          verbose=self.verbose)
        sweeper, init = self._make_sweeper(cfg)
        params = init

        def eval_epoch():
            epoch[0] += 1
            y_pred = np.asarray(self._forward_all(X_val))
            log = {"epoch": epoch[0], "val_rmse": rmse(np.asarray(y_val), y_pred)}
            if y_val.shape[1] > 1:
                log["val_accuracy"] = 1.0 - error_rate(np.asarray(y_val), y_pred)
            if self.verbose > 0:
                print(", ".join(f"{k}: {v}" for k, v in log.items()))
            self.trajectory.append(log)

        seq = [(mi, ni) for mi, m in enumerate(sweeper.members)
               for ni in m.train_nodes]

        ms = None
        y_host = np.asarray(y)
        if self.stream == "native":
            from ..utils.data_stream import MinibatchStream
            ms = MinibatchStream(np.asarray(X), self.batch_size,
                                 seed=self.seed)

        def epoch_batches(indices=None):
            """One full permutation of the training set as (xb, yb) pairs —
            gathered by the native prefetcher when stream='native', else by
            fancy indexing on this thread (reference module.py:378-384).
            `indices` reuses a precomputed permutation (batch_block shares
            the swipe's permutation across blocks on the default path)."""
            if ms is not None:
                for xb, idx in ms.epoch():
                    yield xb, y_host[idx]
            else:
                if indices is None:
                    indices = batch_rng.permutation(n_train)
                for bs in range(0, n_train, self.batch_size):
                    bi = indices[bs:bs + self.batch_size]
                    yield X[bi], y[bi]

        try:
            for swipe in range(self.num_swipes):
                if self.swipe_method == "batch_unique":
                    block_iter = mirrored_cycle(seq, one_cycle=False)
                    for xb, yb in epoch_batches():
                        block = next(block_iter)
                        params, _ = sweeper.run(params, xb, yb,
                                                node_order=[block])
                        self._store(sweeper)
                    eval_epoch()
                elif self.swipe_method == "batch_same":
                    for xb, yb in epoch_batches():
                        params, _ = sweeper.run(params, xb, yb)
                        self._store(sweeper)
                    eval_epoch()
                elif self.swipe_method == "batch_block":
                    swipe_idx = (None if ms is not None
                                 else batch_rng.permutation(n_train))
                    for block in mirrored_cycle(seq, one_cycle=True):
                        for xb, yb in epoch_batches(swipe_idx):
                            params, _ = sweeper.run(params, xb, yb,
                                                    node_order=[block])
                            self._store(sweeper)
                    eval_epoch()
                else:
                    raise ValueError(
                        f"unknown swipe_method {self.swipe_method!r}")
        finally:
            if ms is not None:
                ms.close()
        return self


class TensorTrainRegressorEarlyStopping(TensorTrainRegressor):
    """One left-to-right pass with per-node eps; early-stops on 'degree' (node
    index) and restores the best snapshot (reference module.py:502-614).
    Forces num_swipes=1 and perturb init."""

    def __init__(self, *args, early_stopping=10, rel_err=1e-12, abs_err=1e-13,
                 validation_split=0.1, split_train=False, **kwargs):
        kwargs["num_swipes"] = 1
        kwargs["perturb"] = True
        super().__init__(*args, **kwargs)
        self.early_stopping = early_stopping
        self.rel_err = rel_err
        self.abs_err = abs_err
        self.validation_split = validation_split
        self.split_train = split_train
        self._best_degree = None
        self._singular = False

    def fit(self, X, y, X_val=None, y_val=None):
        X, y = self._prep_xy(X, y)
        if self._model is None:
            self.input_dim = int(X.shape[1])
            self._initialize_model()
        X, y, X_val, y_val = self._split(X, y, X_val, y_val,
                                         self.validation_split, self.split_train)

        cfg = SweepConfig(num_swipes=1, batch_size=self.batch_size,
                          method=self.method, eps=self.epss, lr=self.lr,
                          skip_second=True, eps_per_node=True,
                          verbose=self.verbose)
        sweeper, init = self._make_sweeper(cfg)

        state = {"degree": 0, "best": np.inf, "best_state": None,
                 "best_degree": 0, "count": 0}

        def convergence_criterion():
            state["degree"] += 1
            self._store(sweeper)
            val_loss = rmse(np.asarray(y_val),
                            np.asarray(self._forward_all(X_val)))
            improvement = state["best"] - val_loss
            meets = (improvement >= self.abs_err
                     or improvement >= self.rel_err * abs(state["best"]))
            if improvement > 0:
                state["best"] = val_loss
                state["best_state"] = self._model.node_states()
                state["best_degree"] = state["degree"]
                state["count"] = 0 if meets else state["count"] + 1
            else:
                state["count"] += 1
            return state["count"] >= self.early_stopping

        _, converged = sweeper.run(init, X, y,
                                   convergence_criterion=convergence_criterion)
        self._singular = not converged
        self._best_degree = state["best_degree"]
        if state["best_state"] is not None:
            self._model.load_node_states(state["best_state"])
        return self
