"""Hardware probe for add_packed_upper's aliasing semantics (even n).

The packed-carry add is input/output aliased into the scan carry; that is
only legal because its grid enumerates each upper tile pair EXACTLY once
(gram._pair_table). A duplicate-visiting grid (the gram kernels' (k, i)
round-robin map) double-adds the even-n distance-n/2 tiles under aliasing:
the second visit re-reads the tile the first visit already wrote back.
Interpret mode copies buffers and cannot reproduce this — it must be
probed ON HARDWARE. This script chains three adds at even n with known
values; any double-add shows up as upper-tile values != 4.0.

    python benchmarks/alias_probe.py [n] [tile]

Exit code 0 iff every visited tile is exact. (This class of bug shipped
briefly in round 3 and cost the digits replication 96.55 -> 91.98% —
RESULTS.md "padded-carry aliasing FIXED".)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup

setup()
import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    from tensornetworksfork_tpu.ops.pallas.gram import add_packed_upper

    Dp = n * tile

    @jax.jit
    def chain(A, B):
        S = add_packed_upper(A, B, tile=tile)
        S = add_packed_upper(S, B, tile=tile)
        S = add_packed_upper(S, B, tile=tile)
        return S

    A = jnp.ones((Dp, Dp), jnp.float32)
    B = jnp.ones((Dp, Dp), jnp.float32)
    S = np.asarray(jax.device_get(chain(A, B)))
    up = S[np.triu_indices(Dp)]
    err = np.abs(up - 4.0).max()
    vals = np.unique(up)
    print(f"n={n} tile={tile}: chained x3 upper-tile values {vals} "
          f"(expect [4.]), max err {err}")
    if err != 0.0:
        print("ALIASING HAZARD: duplicate pair visits double-added")
        raise SystemExit(1)
    print("OK: exact-pair aliased add is idempotent-safe on this device")


if __name__ == "__main__":
    main()
