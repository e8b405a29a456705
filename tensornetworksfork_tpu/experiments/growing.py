"""Growing / DMRG experiment drivers.

Rebuilds the reference growing scripts:
- `run_grow_cart`  (growing.py:56-73, image_convolution_growing_MNIST.py):
  train a conv-TT, repeatedly append a carriage and retrain;
- `run_dmrg_growth` (growing_DMRG.py:52-62, growing_data.py:74-94): 2-site
  DMRG on a synthetic polynomial — grow_middle, train the 2-site block,
  SVD-split with rank/err truncation, repeat.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..core.sweep import SweepConfig, accumulating_sweep
from ..models import growing
from ..models.layers import TensorConvolutionTrainLayer
from ..ops.bregman import SquareBregFunction
from ..utils.metrics import rmse


def run_dmrg_growth(X2, y, bond_dim: int = 8, grow_steps: int = 2,
                    rank: int = 8, err: Optional[float] = None,
                    num_swipes: int = 4, eps: float = 1e-4,
                    verbose: int = 0):
    """X2: (S, 2, f) initial two-position inputs; positions double-grow by 2
    per step. Returns (layer, history)."""
    f = X2.shape[-1]
    layer = growing.TensorTrainDMRGInfiLayer(bond_dim, f, output_shape=(1,))
    cfg = SweepConfig(num_swipes=num_swipes, method="ridge_cholesky", eps=eps)
    history: List[dict] = []

    def train(x):
        params, ok = accumulating_sweep(
            layer.network, layer.params, layer.bind_x(jnp.asarray(x)),
            jnp.asarray(y), SquareBregFunction(), cfg)
        layer.params = params
        pred = np.asarray(layer(layer.bind_x(jnp.asarray(x))))
        return ok, rmse(np.asarray(y), pred)

    S = X2.shape[0]
    rng = np.random.default_rng(0)
    x = np.asarray(X2)
    ok, e = train(x)
    history.append({"positions": layer.num_carriages, "rmse": e, "ok": ok})
    for step in range(grow_steps):
        layer.grow_middle()
        # two new physical positions appear mid-chain: replicate columns
        mid = x.shape[1] // 2
        x = np.concatenate([x[:, :mid], x[:, mid:mid + 1], x[:, mid:mid + 1],
                            x[:, mid:]], axis=1)
        ok, e = train(x)  # trains only the grown block
        split_err = layer.split_node(rank=rank, err=err)
        ok2, e2 = train(x)  # full-chain sweeps after the split
        history.append({"positions": layer.num_carriages, "rmse": e2,
                        "split_err": split_err, "ok": ok and ok2})
        if verbose:
            print(history[-1])
    return layer, history


def run_grow_cart(x, y, start_carriages: int = 1, grow_steps: int = 2,
                  bond_dim: int = 8, convolution_bond: int = 4,
                  num_swipes: int = 3, eps: float = 1.0,
                  eps_decay: float = 0.5, loss_fn=None, verbose: int = 0):
    """Conv-TT cart growth: train, append a carriage, retrain (reference
    growing.py:56-73). x: (S, P, pp) patched images; y one-hot or targets."""
    loss_fn = loss_fn or SquareBregFunction()
    layer = TensorConvolutionTrainLayer(
        num_carriages=start_carriages, bond_dim=bond_dim,
        num_patches=x.shape[1], patch_pixels=x.shape[2],
        output_shape=(int(y.shape[1]),), convolution_bond=convolution_bond)
    cfg = SweepConfig(num_swipes=num_swipes, method="ridge_cholesky", eps=eps,
                      eps_decay=eps_decay)
    history: List[dict] = []
    for step in range(grow_steps + 1):
        params, ok = accumulating_sweep(layer.network, layer.params,
                                        jnp.asarray(x), jnp.asarray(y),
                                        loss_fn, cfg)
        layer.params = params
        pred = np.asarray(layer(jnp.asarray(x)))
        history.append({"carriages": layer.num_carriages,
                        "params": layer.num_parameters(),
                        "train_rmse": rmse(np.asarray(y), pred), "ok": ok})
        if verbose:
            print(history[-1])
        if step < grow_steps:
            layer = growing.grow_cart(layer)
    return layer, history
