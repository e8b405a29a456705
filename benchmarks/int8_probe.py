"""Hardware probe: does Mosaic lower an int8 MXU dot on this v5e, and at
what rate vs the bf16 Gram dot?  Feeds the TNF_GRAM_DTYPE=int8 tier design
(quantized packed-syrk Gram — reference hot loop tensor/network.py:174-217).

Measures a single packed-grid-style tile-pair Gram dot at the flagship
block shape (BS=2048 rows, tile=512): bf16 baseline vs int8 in both
contraction lowerings (dim0 contraction and transpose+natural), plus the
rescale-by-column-scales epilogue the quantized tier needs.

Measured on the v5e (2026-08-19, jax through the axon tunnel):
    i8_dim0:    compiles, exact == numpy int32: True
    i8_nat:     compiles, exact == numpy int32: True
    i8_rescale: compiles, matches rescaled ref: True
    bf16       reps=64: 7.1 us/tile-dot, 150.6 TFLOP/s-equiv
    i8_dim0    reps=64: 5.1 us/tile-dot, 211.3 TFLOP/s-equiv
    i8_nat     reps=64: 4.9 us/tile-dot, 218.6 TFLOP/s-equiv
    i8_rescale reps=64: 4.0 us/tile-dot, 270.0 TFLOP/s-equiv
int8 lowers correctly (bit-exact int32 accumulation) and runs ~1.45x the
bf16 MXU rate; the transpose+natural lowering wins like it does at bf16.
Since the packed Gram kernel is DMA-bound at bf16, int8's 2x byte cut is
worth more than the MXU ratio — this probe green-lights the quantized
tier (ops/pallas/gram.py quantize_tiled + gram_pair_tiled_q).
"""
import common  # noqa: F401  (sys.path + compile cache)
common.setup()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from benchmarks.gram_bench import slope_timeit

BS, T = 2048, 512


def _kernel_bf16(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:].T, b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


def _kernel_i8_dim0(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _kernel_i8_nat(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:].T, b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _kernel_i8_rescale(sa_ref, sb_ref, a_ref, b_ref, o_ref):
    q = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = q.astype(jnp.float32) * (sa_ref[0][:, None] * sb_ref[0][None, :])


@functools.partial(jax.jit, static_argnames=("which", "reps"))
def run(a, b, sa, sb, which="bf16", reps=8):
    """reps back-to-back tile dots (grid axis) accumulated into one out tile
    so the timing is MXU/VMEM-bound, not dispatch-bound."""
    if which == "bf16":
        kern, ospec = _kernel_bf16, jnp.float32
        operands, in_specs = (a, b), [
            pl.BlockSpec((BS, T), lambda r: (0, 0)),
            pl.BlockSpec((BS, T), lambda r: (0, 0))]
    elif which == "i8_dim0":
        kern, ospec = _kernel_i8_dim0, jnp.int32
        operands, in_specs = (a, b), [
            pl.BlockSpec((BS, T), lambda r: (0, 0)),
            pl.BlockSpec((BS, T), lambda r: (0, 0))]
    elif which == "i8_nat":
        kern, ospec = _kernel_i8_nat, jnp.int32
        operands, in_specs = (a, b), [
            pl.BlockSpec((BS, T), lambda r: (0, 0)),
            pl.BlockSpec((BS, T), lambda r: (0, 0))]
    else:  # i8_rescale
        kern, ospec = _kernel_i8_rescale, jnp.float32
        operands, in_specs = (sa, sb, a, b), [
            pl.BlockSpec((1, T), lambda r: (0, 0)),
            pl.BlockSpec((1, T), lambda r: (0, 0)),
            pl.BlockSpec((BS, T), lambda r: (0, 0)),
            pl.BlockSpec((BS, T), lambda r: (0, 0))]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, T), ospec),
        grid=(reps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, T), lambda r: (0, 0)),
    )(*operands)


def main():
    rng = np.random.default_rng(0)
    af = rng.standard_normal((BS, T)).astype(np.float32)
    bf = rng.standard_normal((BS, T)).astype(np.float32)
    a16 = jnp.asarray(af, jnp.bfloat16)
    b16 = jnp.asarray(bf, jnp.bfloat16)
    a8 = jnp.asarray(np.clip(af * 40, -127, 127).astype(np.int8))
    b8 = jnp.asarray(np.clip(bf * 40, -127, 127).astype(np.int8))
    sa = jnp.ones((1, T), jnp.float32) / 40
    sb = jnp.ones((1, T), jnp.float32) / 40

    # correctness first (tiny tolerance vs numpy int32 reference)
    ref = (np.asarray(a8, np.int32).T @ np.asarray(b8, np.int32))
    for which in ("i8_dim0", "i8_nat"):
        try:
            out = np.asarray(run(a8, b8, sa, sb, which=which, reps=1))
            ok = np.array_equal(out, ref)
            print(f"{which}: compiles, exact == numpy int32: {ok}")
        except Exception as e:  # noqa: BLE001
            print(f"{which}: FAILED -> {type(e).__name__}: {str(e)[:300]}")
    try:
        out = np.asarray(run(a8, b8, sa, sb, which="i8_rescale", reps=1))
        ok = np.allclose(out, ref.astype(np.float64) / 1600, rtol=1e-6)
        print(f"i8_rescale: compiles, matches rescaled ref: {ok}")
    except Exception as e:  # noqa: BLE001
        print(f"i8_rescale: FAILED -> {type(e).__name__}: {str(e)[:300]}")

    flops = 2 * BS * T * T
    for which, (x, y) in {"bf16": (a16, b16), "i8_dim0": (a8, b8),
                          "i8_nat": (a8, b8),
                          "i8_rescale": (a8, b8)}.items():
        for reps in (64,):
            try:
                t = slope_timeit(
                    lambda u, v: run(u, v, sa, sb, which=which, reps=reps),
                    x, y)
                per = t / reps
                print(f"{which} reps={reps}: {per*1e6:.1f} us/tile-dot, "
                      f"{flops/per/1e12:.1f} TFLOP/s-equiv")
            except Exception as e:  # noqa: BLE001
                print(f"{which} timing FAILED -> {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
