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

Measured ε floor (tests/test_eps_ladder.py, docs/DESIGN.md "Solve numerics
tiers"): the f32 solve's forward error is ~cond(A+2εI)·6e-8 and one f32
refinement pass does not move it (the residual itself carries f32 rounding),
so ε below ~1e-6 on a unit-rescaled Gram buys nothing and ε ≤ 1e-9 at
cond ≥ 1e8 fails the Cholesky outright. For the reference's deep-ε corners
(module.py:107,123 run geomspace eps 1e-12 under torch f64),
`solve_dtype="float64"` reruns the rescale+ridge+factor+solve ON THE HOST in
f64 via jax.pure_callback — the ridge is then APPLIED in f64, so ε=1e-12 is
meaningful again; everything around the solve (Gram, Jacobians) stays on
device. Cost: one host round trip + an O(D³) f64 CPU Cholesky per node
update — built for the small-D tabular models where those corners live, not
for flagship-scale nodes.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve


def _flatten_system(A: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    D = b.size
    return A.reshape(D, D), b.reshape(D)


def _host_solve_f64(A_f: np.ndarray, b_f: np.ndarray, node_f: np.ndarray,
                    eps: np.ndarray, method: str) -> np.ndarray:
    """Host-side float64 rescale + ridge + solve (jax.pure_callback target).

    Receives the UNrescaled flattened system in the device dtype, promotes
    to f64, and reproduces solve_block's semantics exactly — crucially the
    2ε ridge is added in f64, so ε values far below f32 resolution (the
    reference's geomspace 1e-12 corners) actually perturb the system.
    Returns the step in the input dtype; non-finite on factorization
    failure (the caller's ok flag handles it, like the reference's
    LinAlgError path)."""
    out_dtype = A_f.dtype
    A = np.asarray(A_f, np.float64)
    b = np.asarray(b_f, np.float64)
    node = np.asarray(node_f, np.float64)
    e = float(np.asarray(eps, np.float64))
    scale = float(np.abs(np.diagonal(A)).mean()) or 1.0
    A = A / scale
    b = b / scale
    if method == "ridge_trace":
        e = e * float(np.sum(np.abs(b) ** 2))
    if method in ("ridge_exact", "ridge_cholesky", "ridge_trace"):
        A = A + (2.0 * e) * np.eye(A.shape[0])
        b = b + (2.0 * e) * node
    try:
        if method in ("ridge_cholesky", "cholesky"):
            import scipy.linalg as sla
            c, low = sla.cho_factor(A, check_finite=False)
            x = sla.cho_solve((c, low), -b, check_finite=False)
        else:
            x = np.linalg.solve(A, -b)
    except Exception:
        x = np.full_like(b, np.nan)
    return x.astype(out_dtype)


def _chol_blocked_min() -> int:
    """D threshold above which the cholesky methods take the blocked
    factor path (TNF_CHOL_BLOCKED_MIN, default 4096; TNF_CHOL_BLOCKED=0
    disables). Below it the XLA expander's fixed costs dominate and
    blocking buys nothing; above it the factor is GEMM-bound and precision
    control pays (benchmarks/chol_probe.py, v5e @ D=16,384: XLA expander
    60.8 ms, blocked(1024) DEFAULT-precision 36.5 ms)."""
    if os.environ.get("TNF_CHOL_BLOCKED", "1") == "0":
        return 1 << 62
    return int(os.environ.get("TNF_CHOL_BLOCKED_MIN", "4096"))


def _chol_factor_precision():
    """Trailing-GEMM precision for the blocked factorization.

    TNF_CHOL_PRECISION=highest|high|default. Default policy: DEFAULT under
    the int8 Gram tier (the Gram itself carries ~1e-3-relative quantization
    error, so a ~1e-5-relative factor — measured vs an f64 oracle,
    benchmarks/chol_probe.py — is numerically free and runs 1.7x faster
    than the XLA expander at D=16,384: 36.5 vs 60.8 ms), HIGHEST otherwise,
    which keeps the XLA expander (the hand-blocked HIGHEST factor is
    SLOWER — 106 vs 61 ms — so blocking only pays when precision drops;
    HIGH measured 64.1 ms, also no win)."""
    name = os.environ.get("TNF_CHOL_PRECISION")
    if name is None:
        from ..ops.pallas.gram import gram_quant
        name = "default" if gram_quant() else "highest"
    return jax.lax.Precision(name.lower())


def blocked_cholesky(A: jax.Array, block: int, precision) -> jax.Array:
    """Right-looking blocked Cholesky (lower), statically unrolled.

    A: (D, D) SPD with D % block == 0. Diagonal-block factorizations use
    the XLA expander at `block` size (cheap); the panel TRSMs and trailing
    SYRK — the FLOPs bulk — are dot_generals at `precision`, on exact
    shrinking slices (static shapes, D/block unrolled iterations). Returns
    L with an exactly-zero upper triangle (the substitution kernels below
    rely on it)."""
    D = A.shape[0]
    n = D // block
    cols = []  # finished (D - k*block, block) panels, top-aligned
    T = A
    for k in range(n):
        Lkk = jax.lax.linalg.cholesky(T[:block, :block],
                                      symmetrize_input=False)
        below = T[block:, :block]
        if below.shape[0]:
            Lb = jax.lax.linalg.triangular_solve(
                Lkk, below, left_side=False, lower=True, transpose_a=True)
            cols.append(jnp.concatenate([jnp.tril(Lkk), Lb], axis=0))
            T = T[block:, block:] - jax.lax.dot_general(
                Lb, Lb, (((1,), (1,)), ((), ())), precision=precision)
        else:
            cols.append(jnp.tril(Lkk))
    out = jnp.zeros_like(A)
    for k, panel in enumerate(cols):
        out = jax.lax.dynamic_update_slice(out, panel,
                                           (k * block, k * block))
    return out


def _diag_block_inverses(L: jax.Array, block: int) -> jax.Array:
    """(n, block, block) inverses of L's diagonal blocks, one batched TRSM
    (the batch axis parallelizes what the single-rhs expander serializes)."""
    D = L.shape[0]
    n = D // block
    idx = jnp.arange(n)
    blocks = L.reshape(n, block, n, block)[idx, :, idx, :]
    eye = jnp.broadcast_to(jnp.eye(block, dtype=L.dtype), (n, block, block))
    return jax.lax.linalg.triangular_solve(blocks, eye, left_side=True,
                                           lower=True)


def blocked_cho_substitute(L: jax.Array, rhs: jax.Array,
                           block: int) -> jax.Array:
    """Solve L Lᵀ x = rhs via block substitution with explicit diagonal-block
    inverses.

    Replaces the two single-rhs `lax.linalg.triangular_solve` calls (~45 ms
    at D=16,200 on a v5e: the XLA expander substitutes in 128-row blocks,
    each a latency-bound small step) with D/block masked full-width matvec
    steps — zero-initialized x/y make explicit masking unnecessary: any
    entry of L on or above the diagonal only ever multiplies a
    not-yet-computed (still zero) x/y entry in both passes, so even an
    unspecified upper triangle is never observed. Matvecs run at HIGHEST
    precision — substitution error feeds the solution directly, and the
    steps are DMA-bound anyway."""
    D = L.shape[0]
    n = D // block
    Dinv = _diag_block_inverses(L, block)
    hi = jax.lax.Precision.HIGHEST

    def fwd(k, y):
        row = jax.lax.dynamic_slice(L, (k * block, 0), (block, D))
        bk = jax.lax.dynamic_slice(rhs, (k * block,), (block,))
        r = bk - jnp.matmul(row, y, precision=hi)
        yk = jnp.matmul(jax.lax.dynamic_slice(
            Dinv, (k, 0, 0), (1, block, block))[0], r, precision=hi)
        return jax.lax.dynamic_update_slice(y, yk, (k * block,))

    y = jax.lax.fori_loop(0, n, fwd, jnp.zeros_like(rhs))

    def bwd(i, x):
        k = n - 1 - i
        col = jax.lax.dynamic_slice(L, (0, k * block), (D, block))
        yk = jax.lax.dynamic_slice(y, (k * block,), (block,))
        r = yk - jnp.matmul(x, col, precision=hi)
        xk = jnp.matmul(r, jax.lax.dynamic_slice(
            Dinv, (k, 0, 0), (1, block, block))[0], precision=hi)
        return jax.lax.dynamic_update_slice(x, xk, (k * block,))

    return jax.lax.fori_loop(0, n, bwd, jnp.zeros_like(rhs))


def _blocked_cho_solve(M: jax.Array, rhs: jax.Array, prec) -> jax.Array:
    """Big-D cholesky solve: pad to a block multiple (identity diagonal on
    the pad keeps the factor well-defined; padded rhs entries stay zero),
    factor with precision-`prec` trailing GEMMs, back-substitute.

    The substitution stays on the XLA triangular-solve pair — at D=16,200
    it costs only 5.9 ms on a v5e (benchmarks/chol_probe.py) and is
    bit-identical to the default path's tail; `blocked_cho_substitute`
    (TNF_CHOL_SUB=1) exists for probing alternatives."""
    D = M.shape[0]
    block = int(os.environ.get("TNF_CHOL_BLOCK", "1024"))
    Dp = ((D + block - 1) // block) * block
    if Dp != D:
        pad = Dp - D
        M = jnp.pad(M, ((0, pad), (0, pad)))
        M = M + jnp.diag(jnp.concatenate(
            [jnp.zeros(D, M.dtype), jnp.ones(pad, M.dtype)]))
        rhs = jnp.pad(rhs, (0, pad))
    L = blocked_cholesky(M, block, prec)
    if os.environ.get("TNF_CHOL_SUB", "0") == "1":
        return blocked_cho_substitute(L, rhs, block)[:D]
    y = jax.lax.linalg.triangular_solve(L, rhs[:, None], left_side=True,
                                        lower=True)
    x = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                        transpose_a=True)
    return x[:D, 0]


def solve_block(A: jax.Array, b: jax.Array, node_value: jax.Array,
                method: str = "exact", eps: float = 0.0,
                refine: bool = False,
                solve_dtype=None) -> Tuple[jax.Array, jax.Array]:
    """Returns (step, ok). step solves (A [+2eps I]) x = -(b [+2eps node]).

    Methods: exact | ridge_exact | ridge_cholesky | cholesky | ridge_trace |
    gradient. 'gradient' returns -b directly (steepest descent on the local
    quadratic, reference network.py:321-322).

    solve_dtype="float64" routes the solve through a host f64 callback
    (see _host_solve_f64) — the supported path for ε below the f32 floor
    (~1e-6; docs/DESIGN.md). Real dtypes only; complex systems already run
    complex128 on CPU x64.
    """
    method = method.lower()
    if method == "gradient":
        return -b, jnp.array(True)

    if solve_dtype is not None and str(solve_dtype) not in (
            "float32", "f32"):
        if str(solve_dtype) not in ("float64", "f64"):
            raise ValueError(f"unsupported solve_dtype: {solve_dtype!r}")
        if jnp.iscomplexobj(A):
            raise ValueError("solve_dtype='float64' supports real systems "
                             "only (complex runs complex128 on CPU x64)")
        A_f, b_f = _flatten_system(A, b)
        x = jax.pure_callback(
            partial(_host_solve_f64, method=method),
            jax.ShapeDtypeStruct(b_f.shape, b_f.dtype),
            A_f, b_f, node_value.reshape(-1).astype(b_f.dtype),
            jnp.asarray(eps, jnp.float32), vmap_method="sequential")
        ok = jnp.all(jnp.isfinite(x))
        return x.reshape(b.shape), ok

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
            if M.shape[0] >= _chol_blocked_min():
                prec = _chol_factor_precision()
                if prec != jax.lax.Precision.HIGHEST:
                    return _blocked_cho_solve(M, rhs, prec)
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
