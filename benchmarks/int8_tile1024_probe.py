"""Probe: int8 packed Gram kernel at tile=1024.

The packed grid's input DMA scales as npairs * rows * tile * itemsize =
D^2/(2*tile) * rows * itemsize — doubling the D-tile HALVES the slab
traffic. bf16 could not afford tile 1024 (12.6 MB of triple-buffered
operand blocks + the 4 MB f32 out tile overflow the 16 MB core), but int8
operands are 1 B/elem: block 1024 fits the model (6.3 + 4.2 MB). This
probe times gram_pair_tiled_q at (tile, block) = (1024, 1024) and (512,
2048) on the same quantized flagship operands.

Measured on the v5e (2026-08-19, slope-timed):
    tile 512  block 2048: 18.4 ms  (the production plan)
    tile 1024 block 1024: 14.8 ms  (fits; ~20% faster end-to-end)
but tile 1024 forces the SHARED tiled layout (kmix/rhs/retile consume the
same slabs) to a 1024-wide tile, whose kmix VMEM clamp drops the sample
block to 32 rows — wiring it in is a net engine change, kept as a
follow-up; the kernel-side win is recorded here.
"""
import common  # noqa: F401

common.setup()

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.gram_bench import slope_timeit
from tensornetworksfork_tpu.ops.pallas.gram import (gram_pair_tiled_q,
                                                    quantize_tiled,
                                                    retile_rows)

B, C, D = 2048, 9, 16200


def main():
    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.standard_normal((B * C, D)), jnp.bfloat16)
    for tile, block in ((512, 2048), (1024, 1024)):
        n = (D + tile - 1) // tile
        Jt = retile_rows(J, n, tile)
        Q, s = quantize_tiled(Jt, block)
        Q, s = jax.device_put(Q), jax.device_put(s)

        @jax.jit
        def f(Q, s, tile=tile):
            return gram_pair_tiled_q(Q, s, Q, s, tile=tile)

        try:
            ts = slope_timeit(f, Q, s)
            flops = 2 * B * C * D * D
            print(f"tile {tile} block {block}: {ts*1e3:.1f} ms  "
                  f"{flops/ts/1e12:.1f} TFLOP/s-equiv")
        except Exception as e:  # noqa: BLE001
            print(f"tile {tile} block {block}: FAILED -> "
                  f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
