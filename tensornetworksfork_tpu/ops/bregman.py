"""Bregman losses returning (loss, gradient, Hessian) triples.

Contract (reference `/root/reference/tensor/bregman.py:5-32`): a loss object's
`__call__(y_pred, y_true)` returns

    loss : (B,)            per-sample loss
    grad : y_pred.shape    dL/dy_pred per sample
    hess : full  (B, *out, *out)  or  diagonal (B, *out)

The engine's Gram builder distinguishes the two Hessian forms by ndim.
A full Hessian MUST be symmetric in its (out, out') block per sample — every
Gauss-Newton/Bregman Hessian is — because the Gram kernels (Pallas syrk and
the packed path) exploit A = JᴴHJ symmetry by computing only the upper
triangle and mirroring; a non-symmetric hess would be silently symmetrised.
Autograd variants use `jax.grad`/`jax.jacfwd` per sample under `vmap` instead
of the reference's Python loop over output channels (bregman.py:210-214),
which vectorises the Hessian build.

Classification convention preserved from the reference: the model emits C-1
logits and a zero logit is appended (bregman.py:122, models/tensor_train.py:261).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _flatten_tail(x):
    return x.reshape(x.shape[0], -1) if x.ndim > 1 else x.reshape(x.shape[0], 1)


class SquareBregFunction:
    """Squared error as a Bregman divergence with psi = sum x^2: grad=2(x-y),
    diagonal Hessian = 2 (reference bregman.py:34-52)."""

    def __call__(self, y_pred, y_true, only_loss=False):
        x = _flatten_tail(y_pred)
        y = _flatten_tail(y_true).astype(x.dtype)
        diff = x - y
        loss = jnp.sum(diff * diff, axis=-1)
        if only_loss:
            return loss
        grad = (2.0 * diff).reshape(y_pred.shape)
        hess = jnp.full_like(y_pred, 2.0)
        return loss, grad, hess


class SquareComplexBregFunction:
    """Complex least squares: grad = x - y, unit diagonal Hessian
    (reference bregman.py:54-66)."""

    def __call__(self, y_pred, y_true, only_loss=False):
        y = y_true.astype(y_pred.dtype)
        diff = y_pred - y
        loss = jnp.sum(jnp.abs(_flatten_tail(diff)) ** 2, axis=-1)
        if only_loss:
            return loss
        grad = diff
        hess = jnp.full_like(y_pred, 1.0)
        return loss, grad, hess


class SoftmaxSquaredLoss:
    """0.5 || softmax(w x) - y ||^2 with Gauss-Newton JᵀJ Hessian
    (reference bregman.py:68-98)."""

    def __init__(self, w: float = 1.0):
        self.w = w

    def __call__(self, y_pred, y_true, only_loss=False):
        z = self.w * y_pred
        s = jax.nn.softmax(z, axis=-1)
        diff = s - y_true.astype(s.dtype)
        loss = 0.5 * jnp.sum(diff * diff, axis=-1)
        if only_loss:
            return loss
        J = _softmax_jac(s)
        grad = self.w * jnp.einsum("...ij,...j->...i", J, diff)
        hess = (self.w ** 2) * jnp.einsum("...ik,...jk->...ij", J, J)
        return loss, grad, hess


def _softmax_jac(s):
    return (
        jnp.einsum("...i,ij->...ij", s, jnp.eye(s.shape[-1], dtype=s.dtype))
        - jnp.einsum("...i,...j->...ij", s, s)
    )


class XEBregman:
    """Cross entropy on C-1 logits with an appended zero logit; analytic
    gradient/Hessian.

    Matches the reference's `XEAutogradBregman` (bregman.py:189-216) exactly
    for one-hot targets — CE grad is w(s - y) and Hessian w^2(diag(s) - s sᵀ),
    both restricted to the first C-1 channels — but computed analytically
    instead of via an autograd loop. Also covers `KLDivBregman`
    (bregman.py:100-146), which is the same math."""

    def __init__(self, w: float = 1.0):
        self.w = w

    def __call__(self, y_pred, y_true, only_loss=False):
        z = self.w * y_pred
        z = jnp.concatenate([z, jnp.zeros_like(z[..., :1])], axis=-1)
        log_s = jax.nn.log_softmax(z, axis=-1)
        y = y_true.astype(log_s.dtype)
        loss = -jnp.sum(y * log_s, axis=-1)
        if only_loss:
            return loss
        s = jnp.exp(log_s)
        grad = self.w * (s - y)[..., :-1]
        outer = jnp.einsum("...i,...j->...ij", s, s)
        diag = jnp.einsum("...i,ij->...ij", s, jnp.eye(s.shape[-1], dtype=s.dtype))
        hess = (self.w ** 2) * (diag - outer)[..., :-1, :-1]
        return loss, grad, hess


# The reference exposes both names; they share one implementation here.
KLDivBregman = XEBregman
XEAutogradBregman = XEBregman


class BinaryKLDivBregman:
    """Binary KL on sigmoid(w x); diagonal Hessian w^2 s(1-s)
    (reference bregman.py:148-187)."""

    def __init__(self, w: float = 1.0):
        self.w = w

    def __call__(self, y_pred, y_true, only_loss=False, eps=1e-12):
        s = jax.nn.sigmoid(self.w * y_pred)
        s = jnp.clip(s, eps, 1 - eps)
        y = jnp.clip(y_true.astype(s.dtype), eps, 1 - eps)
        kl = y * jnp.log(y / s) + (1 - y) * jnp.log((1 - y) / (1 - s))
        loss = jnp.sum(_flatten_tail(kl), axis=-1)
        if only_loss:
            return loss
        grad = self.w * (s - y)
        hess = (self.w ** 2) * s * (1 - s)
        return loss, grad, hess


class AutogradLoss:
    """Wraps any per-sample scalar loss f(y_pred_i, y_true_i); grad and full
    Hessian via vmapped jax.grad / jax.jacfwd (reference bregman.py:266-292)."""

    def __init__(self, loss_func: Optional[Callable] = None):
        if loss_func is None:
            loss_func = lambda x, y: jnp.sum((x - y) ** 2)
        self._f = loss_func

    def __call__(self, y_pred, y_true, only_loss=False):
        f = self._f
        loss = jax.vmap(f)(y_pred, y_true)
        if only_loss:
            return loss
        g = jax.vmap(jax.grad(f))(y_pred, y_true)
        H = jax.vmap(jax.jacfwd(jax.grad(f)))(y_pred, y_true)
        return loss, g, H


class AutogradBregman(AutogradLoss):
    """Generic Bregman divergence D_phi from a callable phi
    (reference bregman.py:218-263)."""

    def __init__(self, phi_func: Callable):
        def breg(x, y):
            phi_x = phi_func(x)
            phi_y = phi_func(y)
            d_phi_x = jax.grad(phi_func)(x)
            return jnp.sum(phi_y - phi_x - jnp.sum(d_phi_x * (y - x), axis=-1))

        super().__init__(breg)


class UncertaintyAutogradLoss(AutogradLoss):
    """Gaussian NLL over a (mean, softplus-std) 2-channel head
    (reference bregman.py:296-326)."""

    def __init__(self):
        def nll(pred, y):
            mean = pred[..., 0]
            std = jax.nn.softplus(pred[..., 1])
            var = std * std
            return jnp.sum(
                0.5 * jnp.log(2 * jnp.pi * var) + 0.5 * (y - mean) ** 2 / var
            )

        super().__init__(nll)
