"""Attribution + candidate lowerings for the flagship A1 (own-out) update.

The output-owning node's deferred Gram (engine.gram_and_rhs structured
path, VERDICT r04 #1: A1 is ~0.7-0.9 s of the int8 epoch) is per chunk:

    Kup[s, p, d] = Hup[s, p] * J[s, d]        (P = C(C+1)/2 = 45, DJ = 900)
    A_raw = Kup.reshape(S, P*DJ)^T @ J        ((40500, 900) f32)

Theory says ~3 ms/chunk (1.5e11 bf16 FLOPs + ~0.5 GB traffic) but the
update measures ~31 ms — this probe times each candidate in isolation to
find where the time actually goes.

    python benchmarks/a1_bench.py <variant> [B]
variants:
  kup      Kup materialisation alone (bcast multiply, bf16)
  dot      the production dot on a pre-built Kup
  chain    Kup + dot (the production per-chunk Gram, fused under one jit)
  chainf32 chain with f32 operands at HIGHEST (the TNF_GRAM_DTYPE=f32 form)
  dotT     dot with pre-transposed (D-major) operands: A_raw^T = J^T @ Kup
  pergem   P batched gemms via dot_general batching over p
  carry    chain + (45, 900, 900) carry add (the full scan-body Gram cost)
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

from gram_bench import fetch, slope_timeit, timeit  # noqa: E402


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "chain"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    C, P, r = 9, 50, 18
    DJ = P * r
    PU = C * (C + 1) // 2

    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.standard_normal((B, DJ)), jnp.bfloat16)
    Hup = jnp.asarray(rng.standard_normal((B, PU)), jnp.bfloat16)
    prec = jax.lax.Precision.DEFAULT

    if variant == "kup":
        @jax.jit
        def f(J, Hup):
            return Hup[:, :, None] * J[:, None, :]
    elif variant == "dot":
        Kup0 = (Hup[:, :, None] * J[:, None, :]).reshape(B, PU * DJ)
        Kup0 = jax.device_put(Kup0)

        @jax.jit
        def f(Kup, J):
            return jax.lax.dot_general(
                Kup, J, (((0,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)
        t = timeit(f, Kup0, J)
        ts = slope_timeit(f, Kup0, J)
        flops = 2 * B * PU * DJ * DJ
        print(f"{variant}: single {t*1e3:.1f} ms | slope {ts*1e3:.2f} ms "
              f"{flops/ts/1e12:.1f} TFLOP/s")
        return
    elif variant in ("chain", "chainf32"):
        if variant == "chainf32":
            J = J.astype(jnp.float32)
            Hup = Hup.astype(jnp.float32)
            prec = jax.lax.Precision.HIGHEST

        @jax.jit
        def f(J, Hup):
            Kup = Hup[:, :, None] * J[:, None, :]
            return jax.lax.dot_general(
                Kup.reshape(B, PU * DJ), J, (((0,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
    elif variant == "dotT":
        @jax.jit
        def f(J, Hup):
            Kup = Hup[:, :, None] * J[:, None, :]
            # contraction with S as lhs ROWS on both sides but output
            # transposed: (900, 40500) — D-major output
            return jax.lax.dot_general(
                J, Kup.reshape(B, PU * DJ), (((0,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
    elif variant == "pergem":
        @jax.jit
        def f(J, Hup):
            Kup = Hup.T[:, :, None] * J[None, :, :]   # (PU, B, DJ)
            return jax.lax.dot_general(
                Kup, J, (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)   # (PU, DJ, DJ)
    elif variant == "carry":
        A0 = jnp.zeros((PU, DJ, DJ), jnp.float32)

        @jax.jit
        def f(J, Hup, A0):
            Kup = Hup[:, :, None] * J[:, None, :]
            A = jax.lax.dot_general(
                Kup.reshape(B, PU * DJ), J, (((0,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            return A0 + A.reshape(PU, DJ, DJ)
        t = timeit(f, J, Hup, A0)
        ts = slope_timeit(f, J, Hup, A0)
        flops = 2 * B * PU * DJ * DJ
        print(f"{variant}: single {t*1e3:.1f} ms | slope {ts*1e3:.2f} ms "
              f"{flops/ts/1e12:.1f} TFLOP/s")
        return
    else:
        raise SystemExit(f"unknown variant {variant}")

    t = timeit(f, J, Hup)
    ts = slope_timeit(f, J, Hup)
    flops = 2 * B * PU * DJ * DJ
    print(f"{variant}: single {t*1e3:.1f} ms | slope {ts*1e3:.2f} ms "
          f"{flops/ts/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
