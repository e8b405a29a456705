"""Tabular dataset preparation.

Rebuilds the reference prep pipeline (`/root/reference/prep_file/prepare_*.py`
pattern, e.g. prepare_abaloner.py:1-40, and load_ucirepo.py:31-78):
standardize numeric features, one-hot categoricals with a total-width cap,
60/20/20 train/val/test split, persist as an .npz dict with
X/y x train/val/test — the JAX-side equivalent of the `{name}_tensor.pt`
protocol (train_tabular.py:13-26).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def one_hot_with_cap(df_columns, max_total_width: int = 128):
    """Given a list of (name, values, is_categorical), one-hot encode
    categoricals but cap the total encoded width (reference
    load_ucirepo.py:31-78): categories are added in frequency order until the
    cap; the rest map to an 'other' column."""
    pieces = []
    names = []
    width = sum(1 for _, _, cat in df_columns if not cat)
    for name, values, cat in df_columns:
        if not cat:
            pieces.append(np.asarray(values, np.float32).reshape(-1, 1))
            names.append(name)
            continue
        values = np.asarray(values)
        uniq, counts = np.unique(values, return_counts=True)
        order = uniq[np.argsort(-counts)]
        budget = max(1, max_total_width - width)
        kept = list(order[:budget])
        width += len(kept) + (1 if len(kept) < len(order) else 0)
        cols = np.zeros((len(values), len(kept) + (1 if len(kept) < len(order) else 0)),
                        np.float32)
        for j, cat_val in enumerate(kept):
            cols[values == cat_val, j] = 1.0
        if len(kept) < len(order):
            cols[~np.isin(values, kept), -1] = 1.0
            names += [f"{name}={v}" for v in kept] + [f"{name}=<other>"]
        else:
            names += [f"{name}={v}" for v in kept]
        pieces.append(cols)
    return np.concatenate(pieces, axis=1), names


def standardize(X: np.ndarray, mean=None, std=None):
    mean = X.mean(axis=0) if mean is None else mean
    std = X.std(axis=0) if std is None else std
    std = np.where(std == 0, 1.0, std)
    return (X - mean) / std, mean, std


def split_train_val_test(X, y, seed: int = 42, fractions=(0.6, 0.2, 0.2)):
    """60/20/20 shuffled split (reference prepare_abaloner.py:25-39)."""
    n = X.shape[0]
    idx = np.random.RandomState(seed).permutation(n)
    n_tr = int(fractions[0] * n)
    n_va = int(fractions[1] * n)
    tr, va, te = idx[:n_tr], idx[n_tr:n_tr + n_va], idx[n_tr + n_va:]
    return {
        "X_train": X[tr], "y_train": y[tr],
        "X_val": X[va], "y_val": y[va],
        "X_test": X[te], "y_test": y[te],
    }


def prepare_dataset(X, y, name: str, out_dir: str = "data", seed: int = 42,
                    standardize_y: bool = True) -> Dict[str, np.ndarray]:
    """Standardize X (fit on train), split, save {name}_tensor.npz."""
    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.float32)
    if y.ndim == 1:
        y = y[:, None]
    splits = split_train_val_test(X, y, seed=seed)
    Xtr, mean, std = standardize(splits["X_train"])
    splits["X_train"] = Xtr
    splits["X_val"] = standardize(splits["X_val"], mean, std)[0]
    splits["X_test"] = standardize(splits["X_test"], mean, std)[0]
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, f"{name}_tensor.npz"), **splits)
    return splits


def load_tabular_data(path_or_name: str, data_dir: str = "data"
                      ) -> Dict[str, np.ndarray]:
    """Loads a prepared dataset (reference load_tabular_data,
    train_tabular.py:13-26)."""
    path = path_or_name
    if not os.path.exists(path):
        path = os.path.join(data_dir, f"{path_or_name}_tensor.npz")
    with np.load(path) as d:
        return {k: d[k] for k in d.files}


def load_sklearn_dataset(name: str, seed: int = 42) -> Dict[str, np.ndarray]:
    """Bundled sklearn datasets (no network): iris, wine, breast_cancer,
    diabetes — standardized + 60/20/20 split. Covers the reference's IRIS
    sanity benchmarks (classification_IRIS.py, prepare_iris.py) offline."""
    from sklearn import datasets as skd
    loaders = {
        "iris": (skd.load_iris, "classification"),
        "wine": (skd.load_wine, "classification"),
        "breast_cancer": (skd.load_breast_cancer, "classification"),
        "diabetes": (skd.load_diabetes, "regression"),
        "digits": (skd.load_digits, "classification"),
    }
    if name not in loaders:
        raise ValueError(f"unknown bundled dataset {name!r}")
    loader, task = loaders[name]
    ds = loader()
    X = np.asarray(ds.data, np.float32)
    y = np.asarray(ds.target, np.float32)
    if task == "regression":
        y = (y - y.mean()) / y.std()
    splits = split_train_val_test(X, y.reshape(-1, 1), seed=seed)
    Xtr, mean, std = standardize(splits["X_train"])
    splits["X_train"] = Xtr
    splits["X_val"] = standardize(splits["X_val"], mean, std)[0]
    splits["X_test"] = standardize(splits["X_test"], mean, std)[0]
    splits["task"] = task
    return splits


def load_ucirepo(repo_id: Optional[int] = None, name: Optional[str] = None,
                 max_one_hot: int = 128):
    """Gated UCI fetch (reference load_ucirepo.py). Requires the optional
    `ucimlrepo` package and network access; raises with guidance otherwise."""
    try:
        from ucimlrepo import fetch_ucirepo
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "ucimlrepo is not installed in this environment; prepare datasets "
            "offline with prepare_dataset() instead") from e
    ds = fetch_ucirepo(id=repo_id, name=name)
    Xdf = ds.data.features
    ydf = ds.data.targets
    cols = []
    for cname in Xdf.columns:
        col = Xdf[cname]
        cat = col.dtype == object or str(col.dtype).startswith("category")
        cols.append((cname, col.values, cat))
    X, names = one_hot_with_cap(cols, max_total_width=max_one_hot)
    return X, np.asarray(ydf.values), names


def combine_datasets(datasets, seed: int = 42):
    """Concatenate several prepared split-dicts into one (reference
    acombinedatasets.py role): feature widths are right-padded with zeros to
    the max width, splits concatenated and reshuffled."""
    keys = ["X_train", "y_train", "X_val", "y_val", "X_test", "y_test"]
    width = max(d["X_train"].shape[1] for d in datasets)

    def padw(X):
        X = np.asarray(X, np.float32)
        if X.shape[1] < width:
            X = np.concatenate(
                [X, np.zeros((X.shape[0], width - X.shape[1]), np.float32)], 1)
        return X

    out = {}
    for k in keys:
        parts = [padw(d[k]) if k.startswith("X") else np.asarray(d[k])
                 for d in datasets]
        out[k] = np.concatenate(parts, axis=0)
    rng = np.random.RandomState(seed)
    for prefix in ("train", "val", "test"):
        idx = rng.permutation(out[f"X_{prefix}"].shape[0])
        out[f"X_{prefix}"] = out[f"X_{prefix}"][idx]
        out[f"y_{prefix}"] = out[f"y_{prefix}"][idx]
    return out
