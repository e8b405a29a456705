"""Pallas TPU kernel: weighted Gram (syrk) accumulation.

The hottest contraction of the sweep's regression path is the Gram build
A = Jᵀ diag(h) J over a sample chunk (engine.gram_and_rhs with a diagonal
Hessian — e.g. SquareBregFunction, h = 2w_s). This kernel tiles A over a
(D/T, D/T) grid and computes each (T, T) tile as one MXU dot over the full
chunk, fusing the per-sample Hessian weighting into the load — the weighted
copy of J is never written to HBM (XLA materialises it as a separate
elementwise kernel).

Used by the engine when `TNF_PALLAS=1` (or use_pallas=True on the Network)
and the node qualifies (diagonal Hessian, single output channel, J free of
output axes). Falls back to interpret mode off-TPU so tests run on CPU.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable only with a TPU-capable jaxlib
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

TILE = 128

# trace-time call counters: each jitted trace that routes through a kernel
# increments these, so sweep-level tests can assert the Pallas branch is
# actually taken for a given topology/shape (not just that kernels are
# correct in isolation).
CALLS = {"weighted_gram": 0, "gram_pair": 0}


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def default_tile() -> int:
    """Gram kernel D-tile. Bigger tiles cut the revisit DMA traffic
    (HBM bytes scale as ntiles = D/tile), which is what bounds the syrk
    kernel once symmetry halves the MXU work. Measured best at flagship
    shapes via benchmarks/gram_bench.py."""
    return int(os.environ.get("TNF_PALLAS_TILE", "512"))


def default_block() -> int:
    return int(os.environ.get("TNF_PALLAS_BLOCK", "512"))


def gram_dtype():
    """Operand dtype for the Gram dot only (TNF_GRAM_DTYPE=f32|bf16).

    bf16 runs the MXU in native single-pass mode (~2.7x the f32-HIGHEST
    Gram at flagship shapes) while everything around it — Jacobian build,
    Hessian weighting, rhs, Cholesky solve — stays f32: accumulation is
    f32 in the kernel, so only the operand rounding (8-bit mantissa) is
    lost, averaged down over the sample dimension. Default f32."""
    return (jnp.bfloat16
            if os.environ.get("TNF_GRAM_DTYPE", "f32").lower() == "bf16"
            else None)


VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the 16 MB core limit


def _clamp_grid(tile: int, block: int, itemsize: int):
    """Shrink (tile, block) until the kernel's VMEM footprint fits.

    Footprint model calibrated against Mosaic's observed accounting at
    D=16200 (triple buffering of the two (block, tile) inputs and the f32
    (tile, tile) output tile): tile 512 fits at every dtype; 768 fits bf16
    but not f32; 1024 fits neither. Oversized env settings degrade instead
    of crashing the remote compile service."""
    def fits(t, b):
        return (3 * 2 * b * t * itemsize + 3 * t * t * 4) <= VMEM_BUDGET

    while not fits(tile, block) and block > 128:
        block //= 2
    while not fits(tile, block) and tile > 128:
        tile //= 2
    return tile, block


def pallas_enabled() -> bool:
    """Pallas Gram kernels default ON on TPU hardware (off elsewhere — the
    interpret-mode fallback is for tests, not speed). TNF_PALLAS=0/1
    overrides."""
    if not _HAVE_PLTPU:
        return False
    env = os.environ.get("TNF_PALLAS")
    if env is not None:
        return env == "1"
    return _on_tpu()


def _kernel(h_ref, j1_ref, j2_ref, out_ref):
    w = h_ref[:]  # (BS, 1)
    jw = (j1_ref[:] * w).astype(j1_ref.dtype)
    tile = jax.lax.dot_general(
        jw, j2_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(j1_ref))

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = tile

    @pl.when(pl.program_id(2) != 0)
    def _():
        out_ref[:] = out_ref[:] + tile


def _syrk_weighted_kernel(h_ref, j1_ref, j2_ref, out_ref):
    """weighted_gram with only on/above-diagonal tiles computed (the
    weighted Gram is symmetric); mirrored outside the kernel."""
    i, j, b = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(i <= j)
    def _():
        w = h_ref[:]
        jw = (j1_ref[:] * w).astype(j1_ref.dtype)
        tile = jax.lax.dot_general(
            jw, j2_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(j1_ref))

        @pl.when(b == 0)
        def _():
            out_ref[:] = tile

        @pl.when(b != 0)
        def _():
            out_ref[:] = out_ref[:] + tile

    @pl.when(jnp.logical_and(i > j, b == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "block", "symmetric"))
def weighted_gram(J: jax.Array, h: jax.Array, interpret: bool = False,
                  tile: Optional[int] = None, block: Optional[int] = None,
                  symmetric: bool = True) -> jax.Array:
    """A[d, e] = sum_s h[s] J[s, d] J[s, e].  J: (B, D), h: (B,).

    The diagonal-Hessian Gram with the per-sample weighting FUSED into the
    kernel load — the weighted copy of J never exists in HBM (gram_pair by
    contrast needs a materialised K operand). Grid (D/T, D/T, B/BS): the
    sample-block axis is innermost so each output tile stays resident in
    VMEM across the reduction (revisit pattern)."""
    CALLS["weighted_gram"] += 1
    if tile is None:
        tile = default_tile()
    if block is None:
        block = default_block()
    tile, block = _clamp_grid(tile, block, jnp.dtype(J.dtype).itemsize)
    if symmetric and J.dtype == jnp.bfloat16 and os.environ.get(
            "TNF_PALLAS_SYM", "auto") == "auto":
        symmetric = False  # same DMA-bound policy as gram_pair
    B, D = J.shape
    BS = min(B, block)
    Bp = ((B + BS - 1) // BS) * BS
    Dp = ((D + tile - 1) // tile) * tile
    if Dp != D or Bp != B:
        J = jnp.pad(J, ((0, Bp - B), (0, Dp - D)))
    h2 = jnp.pad(h, (0, Bp - B)).reshape(Bp, 1).astype(jnp.float32)
    grid = (Dp // tile, Dp // tile, Bp // BS)

    A = pl.pallas_call(
        _syrk_weighted_kernel if symmetric else _kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BS, 1), lambda i, j, b: (b, 0)),
            pl.BlockSpec((BS, tile), lambda i, j, b: (b, i)),
            pl.BlockSpec((BS, tile), lambda i, j, b: (b, j)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j, b: (i, j)),
        interpret=interpret,
    )(h2, J, J)
    if symmetric:
        A = jnp.triu(A) + jnp.triu(A, 1).T
    return A[:D, :D]


def weighted_gram_auto(J: jax.Array, h: jax.Array) -> jax.Array:
    """weighted_gram with interpret-mode fallback off-TPU."""
    return weighted_gram(J, h, interpret=not _on_tpu())


def _dot_precision(ref):
    # the package-global jax_default_matmul_precision=highest maps to
    # contract_precision<fp32>, which Mosaic rejects for bf16 operands;
    # bf16 inputs want the native single-pass MXU mode anyway.
    return (jax.lax.Precision.DEFAULT if ref.dtype == jnp.bfloat16 else None)


def _pair_kernel(j1_ref, j2_ref, out_ref):
    tile = jax.lax.dot_general(
        j1_ref[:], j2_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(j1_ref))

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = tile

    @pl.when(pl.program_id(2) != 0)
    def _():
        out_ref[:] = out_ref[:] + tile


def _syrk_kernel(j1_ref, j2_ref, out_ref):
    """Symmetric Gram: compute only tiles on/above the diagonal (i <= j);
    the strictly-lower tiles are filled by mirroring outside the kernel.
    Halves MXU work vs the rectangular kernel — a symmetry XLA's dot lowering
    does not exploit."""
    i, j, b = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(i <= j)
    def _():
        tile = jax.lax.dot_general(
            j1_ref[:], j2_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(j1_ref))

        @pl.when(b == 0)
        def _():
            out_ref[:] = tile

        @pl.when(b != 0)
        def _():
            out_ref[:] = out_ref[:] + tile

    # skipped lower tiles: write zeros once so the output buffer is fully
    # defined (the mirror only reads the upper triangle, but leaving HBM
    # uninitialised would trip all-finite checks on the raw buffer)
    @pl.when(jnp.logical_and(i > j, b == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "block", "symmetric"))
def gram_pair(J1: jax.Array, J2: jax.Array, interpret: bool = False,
              tile: Optional[int] = None, block: Optional[int] = None,
              symmetric: bool = False) -> jax.Array:
    """A[d, e] = sum_s J1[s, d] J2[s, e] — the full-Hessian Gram form: with
    J1 = J reshaped (B*C, D) and J2 = (H-weighted coeff) reshaped, this is
    the XE-path Gram accumulation (engine.gram_and_rhs full branch).

    Accumulates in f32 regardless of input dtype (pass bf16 inputs for the
    single-pass MXU mode). Grid (D/tile, D/tile, B/block) with the sample
    blocks innermost so each output tile stays VMEM-resident across the
    reduction; `tile` > 128 (MXU native) raises arithmetic intensity —
    HBM traffic scales as 1/tile, which is what makes the flagship
    D=16200 Gram compute-bound instead of load-bound.

    symmetric=True (valid when A is symmetric, i.e. J2 = W J1 with W
    symmetric — every Gauss-Newton Gram) computes only the upper-triangular
    tiles and mirrors them, halving MXU work."""
    CALLS["gram_pair"] += 1
    if tile is None:
        tile = default_tile()
    if block is None:
        block = default_block()
    tile, block = _clamp_grid(tile, block, jnp.dtype(J1.dtype).itemsize)
    if symmetric and J1.dtype == jnp.bfloat16 and os.environ.get(
            "TNF_PALLAS_SYM", "auto") == "auto":
        # measured (gram_bench, D=16200): bf16 runs DMA-bound — skipping the
        # lower-triangle dots saves nothing and the zero-fill adds ~6%.
        # Symmetry only pays where compute dominates (f32 passes).
        symmetric = False
    B, D = J1.shape
    BS = min(B, block)
    Bp = ((B + BS - 1) // BS) * BS
    Dp = ((D + tile - 1) // tile) * tile
    if Dp != D or Bp != B:
        J1 = jnp.pad(J1, ((0, Bp - B), (0, Dp - D)))
        J2 = jnp.pad(J2, ((0, Bp - B), (0, Dp - D)))
    grid = (Dp // tile, Dp // tile, Bp // BS)
    A = pl.pallas_call(
        _syrk_kernel if symmetric else _pair_kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BS, tile), lambda i, j, b: (b, i)),
            pl.BlockSpec((BS, tile), lambda i, j, b: (b, j)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j, b: (i, j)),
        interpret=interpret,
    )(J1, J2)
    if symmetric:
        # mirror the strictly-upper triangle into the lower half; diagonal
        # tiles were computed fully, so an elementwise triu-mirror
        # reconstructs the exact symmetric A.
        A = jnp.triu(A) + jnp.triu(A, 1).T
    return A[:D, :D]
