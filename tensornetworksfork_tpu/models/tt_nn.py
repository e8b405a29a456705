"""TT as a layer inside a gradient-trained model, with natural-gradient
(Gauss-Newton) block updates.

Rebuilds the reference `TensorTrainNN` + `tensor_network_update`
(`/root/reference/tensor/layers.py:223-306`): the TT's output-space loss
gradient/Hessian are captured per step, the local system (A, b) for the
*current* block is EMA-accumulated with factor lmb, and `apply_update`
performs the ridge-Cholesky block solve round-robin over blocks, decaying
eps x0.7 (floor 4e-4) and annealing lmb -> 0.95 after each full cycle
(layers.py:234-237).

Differences from the reference: no autograd hooks — JAX's functional style
passes (d_loss, sqd_loss) explicitly (use ops.bregman.AutogradLoss to get
them from any loss), and params stay an explicit dict.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.solve import solve_block
from .layers import TensorTrainLayer


class TTNaturalGradient:
    def __init__(self, input_features: int, output_shape, N: int = 3,
                 r: int = 8, constrict_bond: bool = True,
                 method: str = "ridge_cholesky", eps: float = 1e-2,
                 lmb: float = 0.9, dtype=jnp.float32, seed: int = 0):
        # +1 input feature: the wrapper appends a bias column like the
        # reference forward (layers.py:274)
        self.layer = TensorTrainLayer(N, r, input_features + 1,
                                      output_shape=output_shape,
                                      constrict_bond=constrict_bond,
                                      dtype=dtype, seed=seed)
        self.net = self.layer.network
        self.method = method
        self.eps = eps
        self.lmb = lmb
        self._cur = 0
        self._A: Optional[jax.Array] = None
        self._b: Optional[jax.Array] = None
        t = self.net.topology
        self._train = list(t.train_nodes)
        self._jit_ab = {}

    @property
    def params(self):
        return self.layer.params

    @params.setter
    def params(self, p):
        self.layer.params = p

    def forward(self, params, x) -> jax.Array:
        x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
        return self.net.forward(params, self.net.bind_inputs(x))

    def _ab_fn(self, ni):
        if ni not in self._jit_ab:
            net = self.net
            t = net.topology

            def fn(params, x, d_loss, sqd_loss):
                inputs = net.bind_inputs(
                    jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1))
                ops = [net.operand(nj, params, inputs)
                       for nj in range(len(t.nodes)) if nj != ni]
                keep = net.jacobian_keep(ni, ops)
                from ..core.contract import contract
                J = (keep, contract(ops, keep, net.precision))
                return net.gram_and_rhs(ni, J, d_loss, sqd_loss)

            self._jit_ab[ni] = jax.jit(fn)
        return self._jit_ab[ni]

    def accumulate(self, params, x, d_loss, sqd_loss):
        """EMA-accumulate the current block's system (reference
        accumulate_gradient, layers.py:261-268)."""
        ni = self._train[self._cur]
        A, b = self._ab_fn(ni)(params, x, d_loss, sqd_loss)
        if self._A is None:
            self._A, self._b = A, b
        else:
            self._A = self.lmb * self._A + (1 - self.lmb) * A
            self._b = self.lmb * self._b + (1 - self.lmb) * b
        return self

    def apply_update(self, params) -> Dict[str, jax.Array]:
        """Solve + update the current block, advance round-robin (reference
        tensor_network_update, layers.py:223-237)."""
        if self._A is None:
            return params
        ni = self._train[self._cur]
        name = self.net.topology.nodes[ni].name
        step, ok = solve_block(self._A, self._b, params[name], self.method,
                               self.eps)
        new = dict(params)
        new[name] = jnp.where(ok, params[name] + step, params[name])
        self._cur += 1
        self._A = self._b = None
        if self._cur >= len(self._train):
            self._cur = 0
            self.eps = max(self.eps * 0.7, 4e-4)
            self.lmb = min(1 - (1 - self.lmb) * 0.8, 0.95)
        return new

    def train_step(self, params, x, y, loss_fn) -> Tuple[Dict, jax.Array]:
        """Convenience: forward, (loss, grad, hess) from a Bregman-style
        loss_fn, accumulate + update."""
        pred = self.forward(params, x)
        loss, g, H = loss_fn(pred, y)
        self.accumulate(params, x, g, H)
        return self.apply_update(params), loss.mean()
