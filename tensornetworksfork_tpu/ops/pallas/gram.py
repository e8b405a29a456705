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


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def pallas_enabled() -> bool:
    return os.environ.get("TNF_PALLAS", "0") == "1" and _HAVE_PLTPU


def _kernel(h_ref, j1_ref, j2_ref, out_ref):
    w = h_ref[:]  # (BS, 1)
    jw = j1_ref[:] * w
    tile = jax.lax.dot_general(
        jw, j2_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = tile

    @pl.when(pl.program_id(2) != 0)
    def _():
        out_ref[:] = out_ref[:] + tile


@functools.partial(jax.jit, static_argnames=("interpret",))
def weighted_gram(J: jax.Array, h: jax.Array, interpret: bool = False
                  ) -> jax.Array:
    """A[d, e] = sum_s h[s] J[s, d] J[s, e].  J: (B, D) f32, h: (B,).

    Grid (D/T, D/T, B/BS): the sample-block axis is innermost so each output
    tile stays resident in VMEM across the reduction (revisit pattern)."""
    B, D = J.shape
    BS = min(B, 512)
    Bp = ((B + BS - 1) // BS) * BS
    Dp = ((D + TILE - 1) // TILE) * TILE
    if Dp != D or Bp != B:
        J = jnp.pad(J, ((0, Bp - B), (0, Dp - D)))
    h2 = jnp.pad(h, (0, Bp - B)).reshape(Bp, 1).astype(J.dtype)
    grid = (Dp // TILE, Dp // TILE, Bp // BS)

    A = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BS, 1), lambda i, j, b: (b, 0)),
            pl.BlockSpec((BS, TILE), lambda i, j, b: (b, i)),
            pl.BlockSpec((BS, TILE), lambda i, j, b: (b, j)),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j, b: (i, j)),
        interpret=interpret,
    )(h2, J, J)
    return A[:D, :D]


def weighted_gram_auto(J: jax.Array, h: jax.Array) -> jax.Array:
    """weighted_gram with interpret-mode fallback off-TPU."""
    return weighted_gram(J, h, interpret=not _on_tpu())


def _pair_kernel(j1_ref, j2_ref, out_ref):
    tile = jax.lax.dot_general(
        j1_ref[:], j2_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = tile

    @pl.when(pl.program_id(2) != 0)
    def _():
        out_ref[:] = out_ref[:] + tile


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "block"))
def gram_pair(J1: jax.Array, J2: jax.Array, interpret: bool = False,
              tile: int = 256, block: int = 512) -> jax.Array:
    """A[d, e] = sum_s J1[s, d] J2[s, e] — the full-Hessian Gram form: with
    J1 = J reshaped (B*C, D) and J2 = (H-weighted coeff) reshaped, this is
    the XE-path Gram accumulation (engine.gram_and_rhs full branch).

    Accumulates in f32 regardless of input dtype (pass bf16 inputs for the
    single-pass MXU mode). Grid (D/tile, D/tile, B/block) with the sample
    blocks innermost so each output tile stays VMEM-resident across the
    reduction; `tile` > 128 (MXU native) raises arithmetic intensity —
    HBM traffic scales as 1/tile, which is what makes the flagship
    D=16200 Gram compute-bound instead of load-bound."""
    B, D = J1.shape
    BS = min(B, block)
    Bp = ((B + BS - 1) // BS) * BS
    Dp = ((D + tile - 1) // tile) * tile
    if Dp != D or Bp != B:
        J1 = jnp.pad(J1, ((0, Bp - B), (0, Dp - D)))
        J2 = jnp.pad(J2, ((0, Bp - B), (0, Dp - D)))
    grid = (Dp // tile, Dp // tile, Bp // BS)
    A = pl.pallas_call(
        _pair_kernel,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BS, tile), lambda i, j, b: (b, i)),
            pl.BlockSpec((BS, tile), lambda i, j, b: (b, j)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j, b: (i, j)),
        interpret=interpret,
    )(J1, J2)
    return A[:D, :D]
