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

Measured (v5e, B=2048 C=9 D=16200, 2026-08, single-call timings INCLUDING
the ~31 ms axon dispatch RTT): curr 366ms | pallas512 383 | pallas512sym
296 | pallas512bf16 136 | pallas768bf16 129 | chol 106 | kbuild 54.
Round-3 slope-timed (RTT excluded): XLA flat dot bf16 52.8 ms | packed
grid (gram_pair symmetric) 42.6; `tiledbf16` runs the production route
(retile + slab K build + packed-tiled kernel, raw output). tile=1024
exceeds VMEM at block 512.

int8 tier (round 3, slope-timed): qkernelonly (int8 packed pair kernel
alone) 18.2 ms vs 30.5 bf16; quantonly (single-pass Pallas quantizer)
1.4 ms/operand at 635 GB/s (3 B/elem: one bf16 read + int8 write; the
two-pass XLA lowering ran 9.6 ms);
qstage2 (quant x2 + kernel on pre-tiled operands) 20.8; qstage3 (full
chain with a trivial K) 32.7; `tiledq` (full chain with the XLA K
einsum) 39.9 ms. NOTE: an earlier 198 ms tiledq reading was a dispatch
bug in THIS script — variant.startswith("tiled") shadowed the tiledq
branch and timed the f32 production route under the int8 label. The
real int8+einsum composition is faster than the bf16 one (tiledbf16),
so the engine runs int8 on the TNF_KMIX=0 fallback too.
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
    if isinstance(x, tuple):
        return sum(float(jnp.sum(v)) for v in x)
    return float(jnp.sum(x))  # block_until_ready unreliable on axon


def timeit(fn, *args, reps=3):
    fetch(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def slope_timeit(fn, *args, n1=2, n2=12):
    """RTT-free timing: N back-to-back async dispatches + ONE fetch, two
    values of N, slope. A single dispatch+fetch costs ~31 ms of axon tunnel
    round-trip, which dominates single-call timings of sub-100 ms ops
    (CLAUDE.md) — timeit() numbers here include that constant."""
    fetch(fn(*args))  # compile + warm

    def run(n):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                a = fn(*args)
            fetch(a)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(n2) - run(n1)) / (n2 - n1)


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
    elif variant.startswith("tiled") and not variant.startswith("tiledq"):
        # the PRODUCTION single-chip route (engine.packed_gram_rhs): retile
        # J once to (n, rows, tile) slabs feeding the slab-wise K build and
        # the packed-tiled kernel (raw output, mirror deferred)
        from tensornetworksfork_tpu.ops.pallas.gram import (
            gram_pair_tiled, plan_tiles, retile_rows)
        bf16 = variant.endswith("bf16")
        op_dtype = jnp.bfloat16 if bf16 else jnp.float32
        kprec = jax.lax.Precision.DEFAULT if bf16 else prec
        tile, block, n, Dp = plan_tiles(D, jnp.dtype(op_dtype).itemsize)

        @jax.jit
        def f(J, H):
            Jt = retile_rows(J.astype(op_dtype).reshape(B * C, D), n, tile)
            Kt = jnp.einsum("scd,nsdt->nsct", H.astype(op_dtype),
                            Jt.reshape(n, B, C, tile),
                            precision=kprec).reshape(n, B * C, tile)
            return gram_pair_tiled(Jt, Kt, tile=tile, block=block)
    elif variant.startswith("tiledq"):
        # the int8 tier's production route (TNF_GRAM_DTYPE=int8): bf16
        # retile + slab K build, absmax quantization of both operands,
        # int8 packed-tiled pair kernel with in-kernel rescale
        from tensornetworksfork_tpu.ops.pallas.gram import (
            gram_pair_tiled_q, plan_tiles, quantize_tiled, retile_rows)
        tile, block, n, Dp = plan_tiles(D, 2)

        @jax.jit
        def f(J, H):
            Jt = retile_rows(J.astype(jnp.bfloat16).reshape(B * C, D), n,
                             tile)
            Kt = jnp.einsum("scd,nsdt->nsct", H.astype(jnp.bfloat16),
                            Jt.reshape(n, B, C, tile),
                            precision=jax.lax.Precision.DEFAULT,
                            ).reshape(n, B * C, tile)
            Q1, s1 = quantize_tiled(Jt, block)
            Q2, s2 = quantize_tiled(Kt, block)
            return gram_pair_tiled_q(Q1, s1, Q2, s2, tile=tile)
    elif variant.startswith("qstage"):
        # stage attribution of the int8 route: qstage1 = retile + K build
        # + both quantize kernels (no Gram); qstage2 = quantize both +
        # q-kernel on PRE-TILED bf16 operands (no retile/K build)
        from tensornetworksfork_tpu.ops.pallas.gram import (
            gram_pair_tiled_q, plan_tiles, quantize_tiled, retile_rows)
        tile, block, n, Dp = plan_tiles(D, 2)
        if variant == "qstage3":
            # full chain minus the K einsum (trivial K): isolates the
            # einsum's contribution to the tiledq composition
            @jax.jit
            def f(J, H):
                Jt = retile_rows(J.astype(jnp.bfloat16).reshape(B * C, D),
                                 n, tile)
                Kt = Jt * jnp.bfloat16(1.5)
                Q1, s1 = quantize_tiled(Jt, block)
                Q2, s2 = quantize_tiled(Kt, block)
                return gram_pair_tiled_q(Q1, s1, Q2, s2, tile=tile)
        elif variant == "qstage1":
            @jax.jit
            def f(J, H):
                Jt = retile_rows(J.astype(jnp.bfloat16).reshape(B * C, D),
                                 n, tile)
                Kt = jnp.einsum("scd,nsdt->nsct", H.astype(jnp.bfloat16),
                                Jt.reshape(n, B, C, tile),
                                precision=jax.lax.Precision.DEFAULT,
                                ).reshape(n, B * C, tile)
                Q1, s1 = quantize_tiled(Jt, block)
                Q2, s2 = quantize_tiled(Kt, block)
                return Q1, s1, Q2, s2
        else:  # qstage2
            Jt0 = retile_rows(J.astype(jnp.bfloat16).reshape(B * C, D),
                              n, tile)
            Kt0 = Jt0 * 1.5

            @jax.jit
            def fq(Jt, Kt):
                Q1, s1 = quantize_tiled(Jt, block)
                Q2, s2 = quantize_tiled(Kt, block)
                return gram_pair_tiled_q(Q1, s1, Q2, s2, tile=tile)

            t = timeit(fq, Jt0, Kt0)
            ts = slope_timeit(fq, Jt0, Kt0)
            print(f"{variant}: D={D}  single-call {t*1e3:.1f} ms | "
                  f"slope {ts*1e3:.1f} ms")
            return
    elif variant.startswith("kernelonly"):
        # the bf16 packed pair kernel alone on pre-tiled operands (the
        # TNF_PALLAS_GROUP A/B target: set the env var before running)
        from tensornetworksfork_tpu.ops.pallas.gram import (
            gram_pair_tiled, plan_tiles, retile_rows)
        tile, block, n, Dp = plan_tiles(D, 2)
        Jt0 = retile_rows(J.astype(jnp.bfloat16).reshape(B * C, D), n, tile)
        Jt0 = jax.device_put(Jt0)

        @jax.jit
        def fk(Jt):
            return gram_pair_tiled(Jt, Jt, tile=tile, block=block)

        t = timeit(fk, Jt0)
        ts = slope_timeit(fk, Jt0)
        flops = 2 * B * C * D * D
        print(f"{variant}[group={os.environ.get('TNF_PALLAS_GROUP', '2')}]"
              f": B={B} C={C} D={D}  single-call {t*1e3:.1f} ms | "
              f"slope {ts*1e3:.1f} ms  {flops/ts/1e12:.1f} TFLOP/s")
        return
    elif variant.startswith("qkernelonly"):
        # the int8 packed pair kernel alone on pre-quantized operands;
        # qkernelonly<block> (e.g. qkernelonly3072) overrides the sample
        # block — the engine plans at the bf16 itemsize, but the int8
        # kernel's half-size slabs leave VMEM room for longer DMA bursts
        from tensornetworksfork_tpu.ops.pallas.gram import (
            gram_pair_tiled_q, plan_tiles, quantize_tiled, retile_rows)
        tile, block, n, Dp = plan_tiles(D, 2)
        if variant != "qkernelonly":
            block = int(variant[len("qkernelonly"):])
        Jt0 = retile_rows(J.astype(jnp.bfloat16).reshape(B * C, D), n, tile)
        Q0, s0 = quantize_tiled(Jt0, block)
        Q0, s0 = jax.device_put(Q0), jax.device_put(s0)

        @jax.jit
        def fq(Q, s):
            return gram_pair_tiled_q(Q, s, Q, s, tile=tile)

        t = timeit(fq, Q0, s0)
        ts = slope_timeit(fq, Q0, s0)
        flops = 2 * B * C * D * D
        print(f"{variant}: B={B} C={C} D={D}  single-call {t*1e3:.1f} ms | "
              f"slope {ts*1e3:.1f} ms  {flops/ts/1e12:.1f} TFLOP/s")
        return
    elif variant.startswith("qbandonly"):
        # resident-band int8 chain (incl. the fused carry add) on
        # pre-quantized operands: compare against qkernelonly + ~2.7 ms
        # add_packed_upper (the pair it replaces). NOTE: the band chain
        # ALIASES the carry into its output (donation), and this probe
        # re-passes the SAME A buffer every call — XLA inserts a defensive
        # (Dp, Dp) copy per call (~3 ms) that the sweep's linearly-threaded
        # scan carry never pays; update_bench.py A2 is the authoritative
        # sweep-level number (48 ms/chunk vs 53 packed at the flagship).
        from tensornetworksfork_tpu.ops.pallas.gram import (
            gram_pair_band_q, plan_tiles, quantize_tiled, retile_rows)
        tile, block, n, Dp = plan_tiles(D, 1, acc=True)
        Jt0 = retile_rows(J.astype(jnp.bfloat16).reshape(B * C, D), n, tile)
        Q0, s0 = quantize_tiled(Jt0, block)
        A0 = jnp.zeros((Dp, Dp), jnp.float32)
        Q0, s0, A0 = jax.device_put(Q0), jax.device_put(s0), jax.device_put(A0)

        @jax.jit
        def fb(Q, s, A):
            return gram_pair_band_q(Q, s, Q, s, A, tile=tile)

        t = timeit(fb, Q0, s0, A0)
        ts = slope_timeit(fb, Q0, s0, A0)
        flops = 2 * B * C * D * D
        print(f"{variant}[HB={os.environ.get('TNF_PALLAS_BAND_HB', '3')}]"
              f": B={B} C={C} D={D}  single-call {t*1e3:.1f} ms | "
              f"slope {ts*1e3:.1f} ms  {flops/ts/1e12:.1f} TFLOP/s")
        return
    elif variant.startswith("quantonly"):
        # the quantization pass alone: the Pallas kernel is single-pass —
        # one bf16 read + int8 write (+ negligible scales)
        from tensornetworksfork_tpu.ops.pallas.gram import (plan_tiles,
                                                            quantize_tiled,
                                                            retile_rows)
        tile, block, n, Dp = plan_tiles(D, 2)
        Jt0 = retile_rows(J.astype(jnp.bfloat16).reshape(B * C, D), n, tile)

        @jax.jit
        def fz(Jt):
            return quantize_tiled(Jt, block)

        t = timeit(fz, Jt0)
        ts = slope_timeit(fz, Jt0)
        gb = B * C * Dp * (2 + 1) / 1e9
        print(f"{variant}: D={D}  single-call {t*1e3:.1f} ms | "
              f"slope {ts*1e3:.1f} ms  {gb/ts:.0f} GB/s")
        return
    elif variant.startswith("kmixonly"):
        # the fused retile+class-mix kernel alone (gram.retile_hmix)
        from tensornetworksfork_tpu.ops.pallas.gram import (plan_tiles,
                                                            retile_hmix)
        bf16 = variant.endswith("bf16")
        op_dtype = jnp.bfloat16 if bf16 else jnp.float32
        tile, block, n, Dp = plan_tiles(D, jnp.dtype(op_dtype).itemsize)

        @jax.jit
        def f(J, H):
            return retile_hmix(J.astype(op_dtype), H, n, tile)
    elif variant.startswith("retileonly"):
        from tensornetworksfork_tpu.ops.pallas.gram import (plan_tiles,
                                                            retile_rows)
        bf16 = variant.endswith("bf16")
        op_dtype = jnp.bfloat16 if bf16 else jnp.float32
        tile, block, n, Dp = plan_tiles(D, jnp.dtype(op_dtype).itemsize)

        @jax.jit
        def f(J, H):
            return retile_rows(J.astype(op_dtype).reshape(B * C, D), n, tile)
    elif variant.startswith("rhsonly"):
        # the tiled rhs dot b = Jt^T g over the (n, rows, tile) slabs
        from tensornetworksfork_tpu.ops.pallas.gram import (plan_tiles,
                                                            retile_rows)
        bf16 = variant.endswith("bf16")
        op_dtype = jnp.bfloat16 if bf16 else jnp.float32
        tile, block, n, Dp = plan_tiles(D, jnp.dtype(op_dtype).itemsize)
        Jt0 = retile_rows(J.astype(op_dtype).reshape(B * C, D), n, tile)
        g0 = jnp.asarray(rng.standard_normal((B * C,)), op_dtype)

        @jax.jit
        def fr(Jt, g):
            return jax.lax.dot_general(
                Jt, g, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        t = timeit(fr, Jt0, g0)
        ts = slope_timeit(fr, Jt0, g0)
        print(f"{variant}: D={D}  single-call {t*1e3:.1f} ms | "
              f"slope {ts*1e3:.1f} ms")
        return
    elif variant == "accadd":
        # the per-chunk raw-A accumulator add at padded flagship size
        from tensornetworksfork_tpu.ops.pallas.gram import plan_tiles
        tile, block, n, Dp = plan_tiles(D, 2)
        A0 = jnp.ones((Dp, Dp), jnp.float32)
        A1 = jnp.full((Dp, Dp), 2.0, jnp.float32)

        @jax.jit
        def fa(a, b):
            return a + b

        t = timeit(fa, A0, A1)
        ts = slope_timeit(fa, A0, A1)
        gb = 3 * Dp * Dp * 4 / 1e9
        print(f"accadd: Dp={Dp}  single-call {t*1e3:.1f} ms | slope "
              f"{ts*1e3:.1f} ms  {gb/ts:.0f} GB/s")
        return
    else:
        raise SystemExit(f"unknown variant {variant}")

    t = timeit(f, J, H)
    ts = slope_timeit(f, J, H)
    flops = 2 * B * C * D * D + 2 * B * C * C * D
    print(f"{variant}: B={B} C={C} D={D}  single-call {t*1e3:.1f} ms "
          f"(incl ~31 ms RTT) | slope {ts*1e3:.1f} ms  "
          f"{flops/ts/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
