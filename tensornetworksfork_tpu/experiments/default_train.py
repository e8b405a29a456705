"""Synthetic / feature-map study driver.

Rebuilds the reference `default_train*.py` family in one parameterised
driver: fit a TT to a random polynomial target under a chosen feature map —
raw (+bias), dense/sparse complex Fourier, Gaussian-RBF (spline), Legendre —
or with the uncertainty (Gaussian NLL) head, or over TT-compressed data.

variant: raw | fourier | fourier_sparse | rbf | legendre | uncertainty |
data_comp
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.sweep import SweepConfig, accumulating_sweep
from ..data.synthetic import RandomPolynomialRange
from ..models.layers import CompressedTensorTrainLayer, TensorTrainLayer
from ..ops import feature_maps
from ..ops.bregman import (SquareBregFunction, SquareComplexBregFunction,
                           UncertaintyAutogradLoss)
from ..ops.compression import DataCompression, train_compress
from ..utils.metrics import rmse


def run(variant: str = "raw", S: int = 2048, d: int = 4, degree: int = 3,
        N: int = 3, r: int = 8, num_swipes: int = 8, eps: float = 1e-4,
        eps_decay: float = 0.8, seed: int = 0, verbose: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, size=(S, d)).astype(np.float32)
    target = RandomPolynomialRange(d, degree, random_state=seed)
    y = target.evaluate(X).astype(np.float32)
    y = ((y - y.mean()) / (y.std() + 1e-8)).reshape(-1, 1)

    dtype = jnp.float32
    loss = SquareBregFunction()
    out_dim = 1

    if variant == "raw":
        feats = np.concatenate([X, np.ones((S, 1), np.float32)], axis=1)
        f = d + 1
        x_in = jnp.asarray(feats)
    elif variant in ("fourier", "fourier_sparse"):
        F = feature_maps.fourier_basis(X, num_frequencies=degree,
                                       dense=variant == "fourier")
        x_in = feature_maps.per_position_inputs(F)
        f = F.shape[-1]
        N = d
        dtype = jnp.complex64
        loss = SquareComplexBregFunction()
    elif variant == "rbf":
        F = feature_maps.gaussian_rbf_basis(X, num_centers=max(degree + 2, 4))
        x_in = feature_maps.per_position_inputs(F)
        f = F.shape[-1]
        N = d
    elif variant == "legendre":
        F = feature_maps.legendre_basis(X, degree=degree)
        x_in = feature_maps.per_position_inputs(F)
        f = F.shape[-1]
        N = d
    elif variant == "uncertainty":
        feats = np.concatenate([X, np.ones((S, 1), np.float32)], axis=1)
        f = d + 1
        x_in = jnp.asarray(feats)
        loss = UncertaintyAutogradLoss()
        out_dim = 2
        y = y.reshape(-1)
    elif variant == "data_comp":
        feats = np.concatenate([X, np.ones((S, 1), np.float32)], axis=1)
        comp = DataCompression(feats)
        blocks = comp.non_compressed(degree=N)
        blocks, _ = train_compress(list(blocks), rank=4 * r)
        layer = CompressedTensorTrainLayer(blocks, bond_dim=r,
                                           output_shape=(1,), seed=seed)
        cfg = SweepConfig(num_swipes=num_swipes, method="ridge_cholesky",
                          eps=eps, eps_decay=eps_decay, verbose=verbose)
        params, ok = accumulating_sweep(layer.network, layer.params, {},
                                        jnp.asarray(y), loss, cfg)
        layer.params = params
        pred = np.asarray(layer({}))
        return {"variant": variant, "ok": ok,
                "train_rmse": rmse(y, pred.reshape(y.shape))}
    else:
        raise ValueError(f"unknown variant {variant!r}")

    layer = TensorTrainLayer(N, r, f, output_shape=(out_dim,),
                             constrict_bond=True, dtype=dtype, seed=seed)
    # the Gaussian-NLL Hessian is indefinite: Cholesky would fail, use the
    # general ridge solve with strong damping + step clipping
    if variant == "uncertainty":
        cfg = SweepConfig(num_swipes=num_swipes, method="ridge_exact",
                          eps=max(eps, 1.0), eps_decay=0.7,
                          adaptive_step=True, verbose=verbose)
    else:
        cfg = SweepConfig(num_swipes=num_swipes, method="ridge_cholesky",
                          eps=eps, eps_decay=eps_decay, verbose=verbose)
    params, ok = accumulating_sweep(layer.network, layer.params, x_in,
                                    jnp.asarray(y), loss, cfg)
    layer.params = params
    pred = np.asarray(layer(x_in))
    if variant == "uncertainty":
        mean_pred = pred[:, 0]
        return {"variant": variant, "ok": ok,
                "train_rmse": rmse(y, mean_pred)}
    if np.iscomplexobj(pred):
        pred = pred.real
    return {"variant": variant, "ok": ok,
            "train_rmse": rmse(y, pred.reshape(y.shape))}


def main():
    import sys
    variant = sys.argv[1] if len(sys.argv) > 1 else "raw"
    print(run(variant, verbose=1))


if __name__ == "__main__":
    main()
