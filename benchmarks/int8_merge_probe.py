"""Probe: merged-quantizer int8 Gram pipeline (TNF_INT8_MERGE) on hardware.

Times the engine's actual int8 composition at the flagship Gram shape —
quantize BOTH operands from the shared 512-wide bf16 slabs, then the packed
pair kernel — with the quantizer emitting (a) narrow 512 tiles (the
round-3 production plan: gram tile 512, sample block 2048) vs (b) merged
1024-wide tiles (gram tile 1024). The merge is free inside the quantizer
(same bytes read, per-column scales unchanged), and the pair grid's slab
traffic scales as D/tile, so (b) was expected to land near the standalone
tile-1024 number (14.8 vs 18.4 ms, benchmarks/int8_tile1024_probe.py).

Measured on the v5e (2026-08-19 evening):
    narrow 512, sample block 2048:  21.0 ms  (quantize x2 + gram)
    merged 1024, sample block 1024: Mosaic compile-helper failure (HTTP
        500) — the probe's one-off (1024, 1024) success did NOT reproduce;
        the out tile + the dot's int32/f32 temps are 3 x 4 MB of VMEM
        before the triple-buffered operand windows.
    merged 1024, sample block 512 (gram only, compiles): 22.2 ms — SLOWER
        than narrow's 18.4: 4x the grid visits eat the halved slab DMA.
Verdict: TNF_INT8_MERGE stays default-OFF (engine.packed_gram_rhs);
the narrow 512/2048 plan remains the production int8 route.
"""
import common  # noqa: F401

common.setup()

import functools

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
    tile = 512
    n = (D + tile - 1) // tile
    J = jnp.asarray(rng.standard_normal((B * C, D)), jnp.bfloat16)
    K = jnp.asarray(rng.standard_normal((B * C, D)), jnp.bfloat16)
    Jt = jax.device_put(retile_rows(J, n, tile))
    Kt = jax.device_put(retile_rows(K, n, tile))

    for label, merge, qblock in (("narrow 512", 1, 2048),
                                 ("merged 1024", 2, 1024)):
        @functools.partial(jax.jit, static_argnames=("m", "qb"))
        def f(Jt, Kt, m=merge, qb=qblock):
            Q1, s1 = quantize_tiled(Jt, qb, merge=m)
            Q2, s2 = quantize_tiled(Kt, qb, merge=m)
            return gram_pair_tiled_q(Q1, s1, Q2, s2, tile=tile * m)

        try:
            ts = slope_timeit(f, Jt, Kt)
            flops = 2 * B * C * D * D
            print(f"{label}: {ts*1e3:.1f} ms  "
                  f"{flops/ts/1e12:.1f} TFLOP/s-equiv (quantize+gram)")
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED -> {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
