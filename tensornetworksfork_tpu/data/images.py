"""Image dataset loading (MNIST / FashionMNIST / CIFAR), zero-egress gated.

The reference loads via torchvision (AAMNST.py:109-132, train_image.py:12-49).
This environment has no torchvision and no network access, so loaders read
the standard on-disk formats when present (idx ubyte files or the keras-style
.npz) and otherwise raise — callers (bench, experiments) fall back to
`synthetic_image_classification` for timing runs, which is shape-faithful.

Preprocessing reproduces the reference protocol exactly
(AAMNST.py:110-113,135-141): normalize by the dataset mean/std, unfold into
kernel x stride patches, append the bias patch.
"""
from __future__ import annotations

import gzip
import os
import struct
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..ops.patches import image_to_conv_input

MNIST_MEAN, MNIST_STD = 0.1307, 0.3081

_IDX_NAMES = {
    "train_images": ["train-images-idx3-ubyte", "train-images.idx3-ubyte"],
    "train_labels": ["train-labels-idx1-ubyte", "train-labels.idx1-ubyte"],
    "test_images": ["t10k-images-idx3-ubyte", "t10k-images.idx3-ubyte"],
    "test_labels": ["t10k-labels-idx1-ubyte", "t10k-labels.idx1-ubyte"],
}


def _read_idx(path: str) -> np.ndarray:
    if not path.endswith(".gz"):
        # native fast path (C++ parser, tensornetworksfork_tpu/native)
        from .. import native
        out = native.read_idx(path)
        if out is not None:
            return out
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(shape)


def _find(root: str, names) -> Optional[str]:
    for name in names:
        for cand in (name, name + ".gz"):
            p = os.path.join(root, cand)
            if os.path.exists(p):
                return p
    return None


def load_mnist_like(root: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x_train, y_train, x_test, y_test) from idx files or mnist.npz."""
    npz = os.path.join(root, "mnist.npz")
    if os.path.exists(npz):
        with np.load(npz) as d:
            return d["x_train"], d["y_train"], d["x_test"], d["y_test"]
    paths = {k: _find(root, v) for k, v in _IDX_NAMES.items()}
    if all(paths.values()):
        return (_read_idx(paths["train_images"]),
                _read_idx(paths["train_labels"]),
                _read_idx(paths["test_images"]),
                _read_idx(paths["test_labels"]))
    raise FileNotFoundError(
        f"no MNIST-format data under {root!r} (idx ubyte or mnist.npz); "
        "this environment has no network egress — stage data locally or use "
        "synthetic_image_classification() for timing runs")


def preprocess_images(x: np.ndarray, y: np.ndarray, kernel_size: int = 4,
                      kernel_stride: int = 4, num_classes: int = 10,
                      mean: float = MNIST_MEAN, std: float = MNIST_STD):
    """Reference preprocessing: normalize, unfold, bias patch, one-hot
    (AAMNST.py:135-141)."""
    x = (np.asarray(x, np.float32) / 255.0 - mean) / std
    if x.ndim == 3:
        x = x[:, None]
    xp = image_to_conv_input(jnp.asarray(x), kernel_size, kernel_stride)
    onehot = np.eye(num_classes, dtype=np.float32)[np.asarray(y).astype(int)]
    return xp, jnp.asarray(onehot)


def load_digits_images(kernel_size: int = 2, kernel_stride: int = 2,
                       seed: int = 42, test_fraction: float = 0.2):
    """sklearn's bundled 8x8 digits as a REAL image benchmark (offline):
    returns (x_train, y_train, x_test, y_test) preprocessed with the
    reference patch protocol. 1797 samples, 10 classes."""
    from sklearn.datasets import load_digits

    ds = load_digits()
    imgs = ds.images.astype(np.float32)  # (N, 8, 8), values 0..16
    imgs = (imgs / 16.0 - 0.5) / 0.5
    labels = ds.target
    n = len(labels)
    idx = np.random.RandomState(seed).permutation(n)
    n_test = int(n * test_fraction)
    te, tr = idx[:n_test], idx[n_test:]
    xp = image_to_conv_input(jnp.asarray(imgs[:, None]), kernel_size,
                             kernel_stride)
    onehot = np.eye(10, dtype=np.float32)[labels]
    return xp[tr], jnp.asarray(onehot[tr]), xp[te], jnp.asarray(onehot[te])


def synthetic_image_classification(S: int = 8192, side: int = 28,
                                   num_classes: int = 10, kernel_size: int = 4,
                                   kernel_stride: int = 4, seed: int = 0):
    """Shape-faithful synthetic stand-in with a learnable signal: class means
    are random images plus noise, so accuracy above chance is achievable."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, S)
    protos = rng.standard_normal((num_classes, side, side)).astype(np.float32)
    x = protos[labels] + 1.5 * rng.standard_normal((S, side, side)).astype(np.float32)
    xp = image_to_conv_input(jnp.asarray(x[:, None]), kernel_size, kernel_stride)
    onehot = np.eye(num_classes, dtype=np.float32)[labels]
    return xp, jnp.asarray(onehot)
