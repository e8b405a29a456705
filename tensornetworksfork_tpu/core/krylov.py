"""On-device Krylov solvers for the matrix-free sweep tier.

The reference's matrix-free path (`/root/reference/tensor/network.py:834-932`)
wraps the Gram matvec in a scipy LinearOperator: every CG/MINRES iteration
round-trips GPU->numpy->GPU and *recomputes all environment stacks per batch*
(network.py:905-906) — SURVEY.md §3.3 calls this the single biggest
performance bug. Here the entire solve is a `lax.while_loop` on device: the
matvec is a fused contraction over cached environments, there are zero host
transfers, and iteration stops on tolerance or maxiter.

Solvers: cg (Hermitian PSD), minres (symmetric indefinite), and the
Lanczos-Galerkin tridiagonal solver mirroring the reference's hand-rolled
`lanczos_solver` (network.py:796-824).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def cg(matvec: Callable, b: jax.Array, x0=None, maxiter: int = 50,
       tol: float = 1e-6) -> Tuple[jax.Array, jax.Array]:
    """Conjugate gradients; returns (x, n_iters). All on device."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    r0 = b - matvec(x0)
    atol2 = (tol * jnp.linalg.norm(b)) ** 2

    def cond(state):
        x, r, p, rs, k = state
        return (k < maxiter) & (rs > atol2)

    def body(state):
        x, r, p, rs, k = state
        Ap = matvec(p)
        alpha = rs / jnp.maximum(jnp.vdot(p, Ap).real, 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r).real
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        return (x, r, p, rs_new, k + 1)

    init = (x0, r0, r0, jnp.vdot(r0, r0).real, jnp.array(0))
    x, _, _, _, k = jax.lax.while_loop(cond, body, init)
    return x, k


def minres(matvec: Callable, b: jax.Array, x0=None, maxiter: int = 50,
           tol: float = 1e-6) -> Tuple[jax.Array, jax.Array]:
    """MINRES for symmetric (possibly indefinite) systems; Lanczos-based
    recurrence with Givens rotations, fully on device."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    r0 = b - matvec(x0)
    beta0 = jnp.linalg.norm(r0)
    v0 = r0 / jnp.maximum(beta0, 1e-30)

    def cond(state):
        (x, v_prev, v, beta, c_prev, s_prev, c, s, d_pprev, d_prev, phi, k) = state
        return (k < maxiter) & (jnp.abs(phi) > tol * jnp.maximum(beta0, 1e-30))

    def body(state):
        (x, v_prev, v, beta, c_prev, s_prev, c, s, d_pprev, d_prev, phi, k) = state
        Av = matvec(v)
        alpha = jnp.vdot(v, Av).real
        w = Av - alpha * v - beta * v_prev
        beta_new = jnp.linalg.norm(w)
        v_new = w / jnp.maximum(beta_new, 1e-30)
        # apply previous rotations to the new tridiagonal column
        delta = c * alpha - c_prev * s * beta
        gamma_bar = s * alpha + c_prev * c * beta
        eps_next = s_prev * beta
        # new rotation annihilating beta_new
        gamma = jnp.sqrt(delta ** 2 + beta_new ** 2)
        gamma = jnp.maximum(gamma, 1e-30)
        c_new = delta / gamma
        s_new = beta_new / gamma
        d = (v - gamma_bar * d_prev - eps_next * d_pprev) / gamma
        x = x + c_new * phi * d
        phi = -s_new * phi
        return (x, v, v_new, beta_new, c, s, c_new, s_new, d_prev, d,
                phi, k + 1)

    zeros = jnp.zeros_like(b)
    init = (x0, zeros, v0, jnp.array(0.0, b.dtype), jnp.array(1.0, b.dtype),
            jnp.array(0.0, b.dtype), jnp.array(1.0, b.dtype),
            jnp.array(0.0, b.dtype), zeros, zeros, beta0, jnp.array(0))
    out = jax.lax.while_loop(cond, body, init)
    return out[0], out[-1]


def lanczos_galerkin(matvec: Callable, b: jax.Array, x0: jax.Array,
                     maxiter: int = 50, tol: float = 1e-6) -> jax.Array:
    """Fixed-size Lanczos basis + tridiagonal Galerkin solve, the on-device
    equivalent of the reference's lanczos_solver (network.py:796-824)."""
    D = b.size
    r0 = b - matvec(x0)
    beta1 = jnp.linalg.norm(r0)
    v1 = r0 / jnp.maximum(beta1, 1e-30)

    V = jnp.zeros((maxiter, D), b.dtype).at[0].set(v1.reshape(-1))
    alphas = jnp.zeros((maxiter,), b.dtype)
    betas = jnp.zeros((maxiter + 1,), b.dtype).at[0].set(beta1)

    def body(j, carry):
        V, alphas, betas, v_prev, v = carry
        w = matvec(v) - betas[j] * v_prev
        a_j = jnp.vdot(w, v).real
        w = w - a_j * v
        b_j1 = jnp.linalg.norm(w)
        v_new = w / jnp.maximum(b_j1, 1e-30)
        V = jax.lax.cond(j + 1 < maxiter,
                         lambda V: V.at[j + 1].set(v_new.reshape(-1)),
                         lambda V: V, V)
        return (V, alphas.at[j].set(a_j), betas.at[j + 1].set(b_j1),
                v, v_new)

    V, alphas, betas, _, _ = jax.lax.fori_loop(
        0, maxiter, body, (V, alphas, betas, jnp.zeros_like(v1), v1))

    T = (jnp.diag(alphas) + jnp.diag(betas[1:maxiter], 1)
         + jnp.diag(betas[1:maxiter], -1))
    rhs = jnp.zeros((maxiter,), b.dtype).at[0].set(beta1)
    # regularise the trailing (possibly unconverged) block minimally
    y = jnp.linalg.solve(T + 1e-12 * jnp.eye(maxiter, dtype=b.dtype), rhs)
    return x0 + (V.T @ y).reshape(b.shape)


SOLVERS = {"cg": cg, "minres": minres}
