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

# Dataset registry mirroring the reference's
# (`/root/reference/train_image.py:12-49`): per-dataset class count, input
# channels, per-channel normalize (mean, std), and the default kernel/stride
# used by the image drivers. ImageNet keeps the reference's quirk of
# num_classes=100 (a deliberate subset there).
DATASETS = {
    "mnist": dict(num_classes=10, channels=1,
                  normalize=((MNIST_MEAN,), (MNIST_STD,)),
                  default_kernel=4, default_stride=4, side=28),
    "fashionmnist": dict(num_classes=10, channels=1,
                         normalize=((MNIST_MEAN,), (MNIST_STD,)),
                         default_kernel=4, default_stride=4, side=28),
    "cifar10": dict(num_classes=10, channels=3,
                    normalize=((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
                    default_kernel=8, default_stride=8, side=32),
    "cifar100": dict(num_classes=100, channels=3,
                     normalize=((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
                     default_kernel=8, default_stride=8, side=32),
    "imagenet": dict(num_classes=100, channels=3,
                     normalize=((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
                     default_kernel=8, default_stride=8, side=64),
}

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
                      mean=MNIST_MEAN, std=MNIST_STD):
    """Reference preprocessing: normalize, unfold, bias patch, one-hot
    (AAMNST.py:135-141). mean/std may be scalars or per-channel tuples
    (CIFAR: 3-channel (0.5, 0.5, 0.5) — train_image.py:27-28); x is
    (N, H, W) or (N, C, H, W) in 0..255."""
    x = np.asarray(x, np.float32) / 255.0
    if x.ndim == 3:
        x = x[:, None]
    m = np.asarray(mean, np.float32).reshape(1, -1, 1, 1)
    s = np.asarray(std, np.float32).reshape(1, -1, 1, 1)
    x = (x - m) / s
    xp = image_to_conv_input(jnp.asarray(x), kernel_size, kernel_stride)
    onehot = np.eye(num_classes, dtype=np.float32)[np.asarray(y).astype(int)]
    return xp, jnp.asarray(onehot)


def load_cifar(root: str, num_classes: int = 10
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x_train, y_train, x_test, y_test) with x (N, 3, 32, 32) uint8.

    Reads the standard on-disk formats: the pickled python batches
    (cifar-10-batches-py/data_batch_1..5 + test_batch, or
    cifar-100-python/train + test — the format torchvision consumes in the
    reference, train_image.py:22-38) or a cifar{10,100}.npz with
    x_train/y_train/x_test/y_test arrays."""
    import pickle

    npz = os.path.join(root, f"cifar{num_classes}.npz")
    if os.path.exists(npz):
        with np.load(npz) as d:
            return d["x_train"], d["y_train"], d["x_test"], d["y_test"]

    def read_batch(path, label_key):
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        data = d[b"data"] if b"data" in d else d["data"]
        labels = d.get(label_key) if isinstance(d, dict) else None
        if labels is None:
            labels = d[label_key.decode()] if isinstance(d, dict) else None
        return (np.asarray(data, np.uint8).reshape(-1, 3, 32, 32),
                np.asarray(labels, np.int64))

    if num_classes == 100:
        base = os.path.join(root, "cifar-100-python")
        if os.path.isdir(base):
            xtr, ytr = read_batch(os.path.join(base, "train"), b"fine_labels")
            xte, yte = read_batch(os.path.join(base, "test"), b"fine_labels")
            return xtr, ytr, xte, yte
    else:
        base = os.path.join(root, "cifar-10-batches-py")
        if os.path.isdir(base):
            parts = [read_batch(os.path.join(base, f"data_batch_{i}"),
                                b"labels") for i in range(1, 6)]
            xtr = np.concatenate([p[0] for p in parts])
            ytr = np.concatenate([p[1] for p in parts])
            xte, yte = read_batch(os.path.join(base, "test_batch"), b"labels")
            return xtr, ytr, xte, yte
    raise FileNotFoundError(
        f"no CIFAR-{num_classes} data under {root!r} (pickled python batches "
        "or .npz); this environment has no network egress — stage data "
        "locally or use the synthetic fallback")


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
                                   kernel_stride: int = 4, seed: int = 0,
                                   channels: int = 1):
    """Shape-faithful synthetic stand-in with a learnable signal: class means
    are random images plus noise, so accuracy above chance is achievable.
    channels=3 mirrors the CIFAR/ImageNet input shape."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, S)
    protos = rng.standard_normal(
        (num_classes, channels, side, side)).astype(np.float32)
    x = protos[labels] + 1.5 * rng.standard_normal(
        (S, channels, side, side)).astype(np.float32)
    xp = image_to_conv_input(jnp.asarray(x), kernel_size, kernel_stride)
    onehot = np.eye(num_classes, dtype=np.float32)[labels]
    return xp, jnp.asarray(onehot)
