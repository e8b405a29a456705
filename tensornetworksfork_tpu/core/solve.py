"""Local Gauss-Newton block solves.

Reimplements the reference `solve_system` (`/root/reference/tensor/network.py:
293-327`) plus the older generation's `ridge_trace` variant
(`/root/reference/tensor/network_with_means.py:314-317`).

TPU numerics: the reference runs float64; TPUs have no fast f64, so solves run
in the params dtype (f32 by default) with the reference's diagonal-mean
rescaling, plus one optional iterative-refinement pass (`refine=True`) to claw
back precision on ill-conditioned Grams. Singularity cannot raise inside XLA —
instead `solve_block` returns an `ok` flag (all-finite check) and the sweep
driver aborts like the reference's LinAlgError path (network.py:481-484).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


def _flatten_system(A: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    D = b.size
    return A.reshape(D, D), b.reshape(D)


def solve_block(A: jax.Array, b: jax.Array, node_value: jax.Array,
                method: str = "exact", eps: float = 0.0,
                refine: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Returns (step, ok). step solves (A [+2eps I]) x = -(b [+2eps node]).

    Methods: exact | ridge_exact | ridge_cholesky | cholesky | ridge_trace |
    gradient. 'gradient' returns -b directly (steepest descent on the local
    quadratic, reference network.py:321-322).
    """
    method = method.lower()
    if method == "gradient":
        return -b, jnp.array(True)

    A_f, b_f = _flatten_system(A, b)
    dtype = A_f.dtype
    scale = jnp.abs(jnp.diagonal(A_f)).mean()
    scale = jnp.where(scale == 0, jnp.ones_like(scale), scale)
    A_f = A_f / scale
    b_f = b_f / scale
    eps = jnp.asarray(eps, dtype=jnp.real(A_f).dtype)

    if method == "ridge_trace":
        # older-generation variant: ridge scaled by ||b||^2
        eps = eps * jnp.sum(jnp.abs(b_f) ** 2)

    I = jnp.eye(A_f.shape[0], dtype=dtype)
    if method in ("ridge_exact", "ridge_cholesky", "ridge_trace"):
        A_f = A_f + (2.0 * eps) * I
        b_f = b_f + (2.0 * eps) * node_value.reshape(-1).astype(dtype)

    def _solve(M, rhs):
        if method in ("ridge_cholesky", "cholesky"):
            if jnp.iscomplexobj(M):
                c, low = cho_factor(M)
                return cho_solve((c, low), rhs)
            # cho_factor symmetrizes its input — (M + Mᵀ)/2 is a full-matrix
            # transpose that costs ~15 ms at D=16200 (slope-timed). Our Grams
            # are symmetric by construction (Gauss-Newton JᵀHJ, mirrored
            # exactly on the Pallas path), so read the lower triangle as-is.
            L = jax.lax.linalg.cholesky(M, symmetrize_input=False)
            y = jax.lax.linalg.triangular_solve(
                L, rhs[:, None], left_side=True, lower=True)
            x = jax.lax.linalg.triangular_solve(
                L, y, left_side=True, lower=True, transpose_a=True)
            return x[:, 0]
        return jnp.linalg.solve(M, rhs)

    x = _solve(A_f, -b_f)
    if refine:
        r = -b_f - A_f @ x
        x = x + _solve(A_f, r)
    ok = jnp.all(jnp.isfinite(x))
    return x.reshape(b.shape), ok


def apply_update(core: jax.Array, step: jax.Array, lr: float = 1.0,
                 adaptive_step: bool = False, max_norm=None,
                 cpd_mask: jax.Array = None) -> jax.Array:
    """Node update with the reference's step-norm controls
    (`/root/reference/tensor/node.py:178-203`) and the CPD diagonal mask
    (`node.py:284-298`)."""
    if cpd_mask is not None:
        step = step * cpd_mask
    if adaptive_step:
        step_norm = jnp.linalg.norm(step.reshape(-1))
        param_norm = jnp.linalg.norm(core.reshape(-1))
        factor = jnp.where(step_norm > param_norm,
                           param_norm / jnp.maximum(step_norm, 1e-30), 1.0)
        step = step * factor
    new = core + lr * step
    if max_norm is not None:
        cur = jnp.linalg.norm(new.reshape(-1))
        new = jnp.where(cur > max_norm, new * (max_norm / jnp.maximum(cur, 1e-30)), new)
    return new


def cpd_diag_mask(shape: Tuple[int, ...], labels, left, right, dtype=jnp.float32) -> jax.Array:
    """eye(left_bond) broadcast over non-bond axes — keeps CPD cores diagonal
    under updates (reference CPDTensorNode.update_node, node.py:284-298)."""
    lbl_to_ax = {l: i for i, l in enumerate(labels)}
    bond_axes = [lbl_to_ax[l] for l in (tuple(left) + tuple(right)) if l in lbl_to_ax]
    if len(bond_axes) < 2:
        return jnp.ones(shape, dtype=dtype)
    a0, a1 = bond_axes[0], bond_axes[-1]
    eye = jnp.eye(shape[a0], shape[a1], dtype=dtype)
    expand = [1] * len(shape)
    expand[a0] = shape[a0]
    expand[a1] = shape[a1]
    perm_eye = eye.reshape([shape[a0] if i == a0 else (shape[a1] if i == a1 else 1)
                            for i in range(len(shape))])
    return jnp.broadcast_to(perm_eye, shape).astype(dtype)
