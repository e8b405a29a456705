"""Feature-map studies: Fourier, Gaussian-RBF (spline), Legendre bases.

Rebuilds the reference's feature-map experiment family:
- complex Fourier bases, sparse (frequency subset) and dense
  (default_train_fourier.py:71-99, complex_trains.py);
- Gaussian-RBF quantization map (spline_trains.py:25-31);
- Legendre polynomial basis (arbitrary_poly.py).

Each map takes X (B, d) and returns the per-sample feature tensor to feed a
TT/CPD layer (with the bias column convention preserved where applicable).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def fourier_basis(X, num_frequencies: int, dense: bool = True,
                  frequencies=None):
    """Complex Fourier features exp(i k x) per input dimension.

    dense: frequencies k = -K..K; sparse: pass an explicit frequency list
    (reference default_train_fourier.py:71-99)."""
    X = jnp.asarray(X)
    if frequencies is None:
        if dense:
            frequencies = jnp.arange(-num_frequencies, num_frequencies + 1)
        else:
            frequencies = jnp.concatenate([
                jnp.array([0.0]),
                2.0 ** jnp.arange(num_frequencies)])
    k = jnp.asarray(frequencies, jnp.float32)
    # (B, d, K)
    return jnp.exp(1j * X[..., None] * k[None, None, :]).astype(jnp.complex64)


def gaussian_rbf_basis(X, centers=None, num_centers: int = 8,
                       width: float = None, input_range=(-1.0, 1.0)):
    """Gaussian-RBF quantization map (reference spline_trains.py:25-31):
    each scalar feature becomes exp(-(x - c_j)^2 / (2 sigma^2)) over a grid of
    centers."""
    X = jnp.asarray(X)
    if centers is None:
        centers = jnp.linspace(input_range[0], input_range[1], num_centers)
    centers = jnp.asarray(centers, X.dtype)
    if width is None:
        width = float(centers[1] - centers[0]) if len(centers) > 1 else 1.0
    z = (X[..., None] - centers[None, None, :]) / width
    return jnp.exp(-0.5 * z * z)


def legendre_basis(X, degree: int):
    """Legendre polynomials P_0..P_degree per feature (reference
    arbitrary_poly.py legendre comparisons). Recurrence:
    (n+1) P_{n+1} = (2n+1) x P_n - n P_{n-1}."""
    X = jnp.asarray(X)
    polys = [jnp.ones_like(X), X]
    for n in range(1, degree):
        polys.append(((2 * n + 1) * X * polys[n] - n * polys[n - 1]) / (n + 1))
    return jnp.stack(polys[: degree + 1], axis=-1)


def per_position_inputs(features):
    """(B, d, K) feature tensor -> list of per-position (B, K) inputs, the
    layout TT layers with one carriage per feature expect."""
    return [features[:, i] for i in range(features.shape[1])]
