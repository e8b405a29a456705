"""Microbenchmark: flagship-shape Gram strategies on the real TPU chip.

The flagship's dominant cost is A = J^T H J at (B=2048, C=9, D=16200)
(reference hot loop /root/reference/tensor/network.py:174-217). Round-1
finding: the XLA flat-2D dot form is ~3x faster than the multi-contracting-
dim dot but crashes the remote compiler at D=16200. This script times each
candidate lowering in isolation so the engine can route to the fastest one
that actually compiles.

Run one variant per process (the remote compiler crash kills the process):
    python benchmarks/gram_bench.py <variant> [B] [C] [D]
variants: curr | flat | chol | kbuild | kbuild2[def] |
          pallas<tile>[b<block>][sym][bf16]  (e.g. pallas512sym,
          pallas1024b256bf16)

Measured (v5e, B=2048 C=9 D=16200, 2026-08): curr 366ms | pallas512 383 |
pallas512sym 296 | pallas512bf16 136 | pallas768bf16 129 | chol 106 |
kbuild 54. tile=1024 exceeds the 16MB VMEM limit at block 512.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup

setup()
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fetch(x):
    return float(jnp.sum(x))  # block_until_ready unreliable on axon


def timeit(fn, *args, reps=3):
    fetch(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    variant = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 9
    D = int(sys.argv[4]) if len(sys.argv) > 4 else 16200
    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.standard_normal((B, C, D)), jnp.float32)
    H = jnp.asarray(rng.standard_normal((B, C, C)), jnp.float32)
    H = H @ jnp.swapaxes(H, 1, 2)  # PSD like a GN Hessian
    prec = jax.lax.Precision.HIGHEST

    def build_K(J, H):
        return jnp.einsum("scd,sci->sdi", H, J, precision=prec)

    if variant == "curr":
        @jax.jit
        def f(J, H):
            K = build_K(J, H)
            return jax.lax.dot_general(J, K, (((0, 1), (0, 1)), ((), ())),
                                       precision=prec)
    elif variant == "currbf16":
        # multi-contracting-dim dot on bf16 operands, f32 accumulation —
        # avoids the flat reshape whose layout copy OOMs HBM at this shape
        @jax.jit
        def f(J, H):
            K = jax.lax.dot_general(
                H, J, (((1,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)  # K[s,c',d]
            return jax.lax.dot_general(
                J.astype(jnp.bfloat16), K.astype(jnp.bfloat16),
                (((0, 1), (0, 1)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
    elif variant == "flat":
        @jax.jit
        def f(J, H):
            K = build_K(J, H)
            return jax.lax.dot_general(
                J.reshape(B * C, D), K.reshape(B * C, D),
                (((0,), (0,)), ((), ())), precision=prec)
    elif variant.startswith("pallas"):
        from tensornetworksfork_tpu.ops.pallas.gram import gram_pair
        tail = variant[len("pallas"):]
        bf16 = tail.endswith("bf16")
        if bf16:
            tail = tail[:-4]
        sym = tail.endswith("sym")
        if sym:
            tail = tail[:-3]
        block = 512
        if "b" in tail:  # e.g. pallas1024b256bf16
            tail, btail = tail.split("b", 1)
            block = int(btail)
        tile = int(tail)
        if sym:
            os.environ["TNF_PALLAS_SYM"] = "1"  # defeat the auto bf16 policy

        @jax.jit
        def f(J, H):
            K = build_K(J, H)
            J2, K2 = J.reshape(B * C, D), K.reshape(B * C, D)
            if bf16:
                J2, K2 = J2.astype(jnp.bfloat16), K2.astype(jnp.bfloat16)
            return gram_pair(J2, K2, tile=tile, block=block, symmetric=sym)
    elif variant == "chol":
        # the per-node ridge-Cholesky solve at flagship D (solve.py analogue)
        A0 = jnp.eye(D, dtype=jnp.float32) * 3.0 + 0.01
        bvec = jnp.ones((D,), jnp.float32)

        @jax.jit
        def f(A0, bvec):
            import jax.scipy.linalg as jsl
            cf = jsl.cho_factor(A0)
            return jsl.cho_solve(cf, bvec)

        t = timeit(f, A0, bvec)
        print(f"chol: D={D}  {t*1e3:.1f} ms  "
              f"{(D**3/3)/t/1e12:.2f} TFLOP/s")
        return
    elif variant == "kbuild":
        @jax.jit
        def f(J, H):
            return build_K(J, H)
    elif variant == "kbuild2":
        # batched dot_general form of the H-weighting
        @jax.jit
        def f(J, H):
            return jax.lax.dot_general(
                H, J, (((1,), (1,)), ((0,), (0,))), precision=prec)
    elif variant == "kbuild2def":
        @jax.jit
        def f(J, H):
            return jax.lax.dot_general(
                H, J, (((1,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT)
    else:
        raise SystemExit(f"unknown variant {variant}")

    t = timeit(f, J, H)
    flops = 2 * B * C * D * D + 2 * B * C * C * D
    print(f"{variant}: B={B} C={C} D={D}  {t*1e3:.1f} ms  "
          f"{flops/t/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
