"""Symmetric CPD with a dedicated Gauss-Newton fit.

Rebuilds the reference's standalone symmetric-CPD study
(`/root/reference/shtCPD.py`): the model y(x) = sum_r λ_r (w_rᵀ x)^m — a
rank-R symmetric tensor of order m applied to x — fit by Gauss-Newton on the
shared factor matrix W and weights λ.

Design: all samples vectorised; one jitted GN step updates (W, λ) jointly
with ridge damping. This is the whole model, so no sweep machinery is needed.
"""
from __future__ import annotations


import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp


class SymmetricCPD:
    def __init__(self, d: int, rank: int, order: int, seed: int = 0):
        self.d, self.rank, self.order = d, rank, order
        rng = np.random.default_rng(seed)
        self.W = jnp.asarray(rng.standard_normal((rank, d)) / np.sqrt(d),
                             jnp.float32)
        self.lam = jnp.asarray(rng.standard_normal(rank), jnp.float32)
        self._step = jax.jit(self._gn_step)

    def __call__(self, X) -> jax.Array:
        t = jnp.asarray(X) @ self.W.T  # (B, R)
        return (t ** self.order) @ self.lam

    def _gn_step(self, W, lam, X, y, eps):
        m = self.order

        def fwd(params):
            Wp, lp = params
            t = X @ Wp.T
            return (t ** m) @ lp

        params = (W, lam)
        pred = fwd(params)
        resid = pred - y
        # flatten-params Gauss-Newton: J via jacfwd on the flat vector
        flat, unravel = jax.flatten_util.ravel_pytree(params)

        def fwd_flat(v):
            return fwd(unravel(v))

        J = jax.jacfwd(fwd_flat)(flat)  # (B, P)
        A = J.T @ J
        scale = jnp.abs(jnp.diagonal(A)).mean()
        scale = jnp.where(scale == 0, 1.0, scale)
        A = A / scale + eps * jnp.eye(flat.size, dtype=flat.dtype)
        b = (J.T @ resid) / scale
        step = jnp.linalg.solve(A, -b)
        # trust-region style clip: step no larger than the parameter vector
        sn = jnp.linalg.norm(step)
        pn = jnp.linalg.norm(flat)
        step = step * jnp.where(sn > pn, pn / jnp.maximum(sn, 1e-30), 1.0)
        newW, newlam = unravel(flat + step)
        loss = jnp.mean(resid ** 2)
        return newW, newlam, loss

    def fit(self, X, y, iters: int = 50, eps: float = 1e-6,
            verbose: int = 0) -> "SymmetricCPD":
        X = jnp.asarray(np.asarray(X), jnp.float32)
        y = jnp.asarray(np.asarray(y), jnp.float32).reshape(-1)
        for it in range(iters):
            self.W, self.lam, loss = self._step(self.W, self.lam, X, y,
                                                jnp.float32(eps))
            if verbose and it % 10 == 0:
                print(f"iter {it}: mse {float(loss):.6f}")
        return self

    def predict(self, X):
        return np.asarray(self(jnp.asarray(np.asarray(X), jnp.float32)))
