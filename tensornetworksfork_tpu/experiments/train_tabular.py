"""Tabular training CLI.

Rebuilds the reference `train_tabular.py` driver (argparse flags over 5 model
families, W&B-config override merge, val/test rmse|accuracy reporting,
train_tabular.py:48-279) on the unified RunConfig. Model families: the TT/CPD
estimator (model_type tt|tt_type1|cpd|cpd_type1 with cum_sum / linear_dim
modifiers), tnml, mlp (flax), xgboost, svm, polynomial.

Run:  python -m tensornetworksfork_tpu.experiments.train_tabular --dataset abalone
"""
from __future__ import annotations

import sys
import time

import numpy as np

from ..data.synthetic import make_regression
from ..data.tabular import load_tabular_data
from ..models.estimators import TensorTrainRegressor
from ..models.tnml import TNMLRegressor
from ..ops.bregman import XEBregman
from ..utils.config import RunConfig
from ..utils.metrics import accuracy, append_results_csv, r2_score, rmse


def build_model(cfg: RunConfig, input_dim: int):
    mt = cfg.model_type
    if mt in ("tt", "tt_type1", "cpd", "cpd_type1"):
        return TensorTrainRegressor(
            N=cfg.N, r=cfg.r, output_dim=cfg.output_dim,
            linear_dim=cfg.linear_dim, constrict_bond=cfg.constrict_bond,
            perturb=cfg.perturb, seed=cfg.seed,
            bf=XEBregman(w=1.0) if cfg.task == "classification" else None,
            lr=cfg.lr, eps_start=cfg.eps, eps_decay=cfg.eps_decay,
            abs_err=cfg.abs_err, rel_err=cfg.rel_err,
            batch_size=cfg.batch_size, method=cfg.method,
            num_swipes=cfg.num_swipes, model_type=mt, task=cfg.task,
            train_operator=cfg.train_operator, cum_sum=cfg.cum_sum,
            early_stopping=cfg.early_stopping, verbose=cfg.verbose,
            precision=cfg.precision, refine=cfg.refine,
            solve_dtype=cfg.solve_dtype)
    if mt == "tnml":
        # tabular loaders standardize features; the sin-cos embedding needs
        # [0, 1] inputs (reference applies it to raw MNIST pixels)
        return TNMLRegressor(
            input_scale="minmax",
            r=cfg.r, output_dim=cfg.output_dim, seed=cfg.seed, lr=cfg.lr,
            eps_start=cfg.eps, eps_decay=cfg.eps_decay, abs_err=cfg.abs_err,
            rel_err=cfg.rel_err, batch_size=cfg.batch_size, method=cfg.method,
            num_swipes=cfg.num_swipes, task=cfg.task,
            early_stopping=cfg.early_stopping, verbose=cfg.verbose)
    if mt == "tt_batch":
        # stochastic block-coordinate trainer (reference train_mnist_batch.py
        # + tensor/module.py:308-500); --stream native routes minibatch
        # gathering through the C++ prefetcher (native/tnf_stream.cpp)
        from ..models.module import TensorTrainBatchRegressor
        return TensorTrainBatchRegressor(
            N=cfg.N, r=cfg.r, output_dim=cfg.output_dim,
            linear_dim=cfg.linear_dim, constrict_bond=cfg.constrict_bond,
            seed=cfg.seed, lr=cfg.lr, eps_start=cfg.eps,
            batch_size=cfg.batch_size, method=cfg.method,
            num_swipes=cfg.num_swipes, verbose=cfg.verbose,
            swipe_method=cfg.swipe_method, stream=cfg.stream)
    if mt == "mlp":
        from ..models.baselines import MLPWrapper
        return MLPWrapper(input_dim, cfg.output_dim, task=cfg.task)
    if mt == "xgboost":
        from ..models.baselines import XGBClfWrapper, XGBRegWrapper
        return (XGBClfWrapper() if cfg.task == "classification"
                else XGBRegWrapper())
    if mt == "svm":
        from ..models.baselines import SVMClfWrapper, SVMRegWrapper
        return (SVMClfWrapper() if cfg.task == "classification"
                else SVMRegWrapper())
    if mt == "polynomial":
        from ..models.baselines import PolynomialRegressionWrapper
        return PolynomialRegressionWrapper(degree=cfg.N, regularization="l2",
                                           alpha=cfg.eps)
    raise ValueError(f"unknown model_type {mt!r}")


def run(cfg: RunConfig, overrides=None, data=None) -> dict:
    if overrides:
        cfg = cfg.merge(overrides)
    if data is not None:
        if "task" in data:
            cfg.task = data.pop("task")
    elif cfg.dataset == "synthetic":
        X, y = make_regression(S=4096, d=6, degree=3, seed=cfg.seed)
        from ..data.tabular import split_train_val_test
        data = split_train_val_test(X, y, seed=cfg.seed)
    elif cfg.dataset in ("iris", "wine", "breast_cancer", "diabetes",
                         "digits"):
        from ..data.tabular import load_sklearn_dataset
        data = load_sklearn_dataset(cfg.dataset, seed=cfg.seed)
        cfg.task = data.pop("task")
    else:
        data = load_tabular_data(cfg.dataset, cfg.data_path)
    X_tr, y_tr = data["X_train"], data["y_train"]
    X_val, y_val = data["X_val"], data["y_val"]
    X_te, y_te = data["X_test"], data["y_test"]

    if cfg.task == "classification" and (y_tr.ndim == 1
                                         or y_tr.shape[-1] == 1):
        y_tr, y_val, y_te = (np.asarray(a).reshape(-1)
                             for a in (y_tr, y_val, y_te))
        n_cls = int(max(y_tr.max(), y_val.max(), y_te.max())) + 1
        eye = np.eye(n_cls, dtype=np.float32)
        y_tr, y_val, y_te = eye[y_tr.astype(int)], eye[y_val.astype(int)], eye[y_te.astype(int)]
        cfg.output_dim = n_cls - 1

    if cfg.task == "classification" and X_tr.shape[0] > 10_000 and cfg.model_type == "svm":
        # reference skips SVM above 10k samples (train_tabular.py:135)
        return {"skipped": True, "model_type": "svm"}

    model = build_model(cfg, X_tr.shape[1])
    t0 = time.time()
    singular = False
    try:
        if isinstance(model, (TensorTrainRegressor, TNMLRegressor)):
            model.fit(X_tr, y_tr, X_val=X_val, y_val=y_val)
        else:
            model.fit(X_tr, y_tr)
    except Exception as e:  # singular-abort parity (train_tabular.py:179-181)
        print(f"training failed: {e}", file=sys.stderr)
        singular = True
    train_s = time.time() - t0

    results = dict(cfg.to_dict(), singular=singular,
                   train_seconds=round(train_s, 2))
    if not singular:
        for split, Xs, ys in (("val", X_val, y_val), ("test", X_te, y_te)):
            y_pred = model.predict(Xs)
            if cfg.task == "regression":
                yp = np.asarray(y_pred).reshape(ys.shape[0], -1)
                results[f"{split}_rmse"] = rmse(ys.reshape(yp.shape), yp)
                results[f"{split}_r2"] = r2_score(ys.reshape(yp.shape), yp)
            else:
                results[f"{split}_accuracy"] = accuracy(ys, y_pred)
    if cfg.verbose:
        print({k: v for k, v in results.items()
               if k.startswith(("val_", "test_", "train_", "singular"))})
    return results


def main(argv=None):
    cfg = RunConfig.from_args(argv)
    results = run(cfg)
    append_results_csv(results, cfg.results_file)


if __name__ == "__main__":
    main()
