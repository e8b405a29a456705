"""Probe: what does the flagship D=16200 Cholesky solve actually cost, and
does controlling matmul precision inside a hand-blocked factorization beat
XLA's expander?

The sweep's ridge_cholesky solve (core/solve.py) is amortised ~4.7 ms/chunk
at the flagship (~106 ms per update call, x4 calls/epoch ~= 0.42 s/epoch).
XLA expands lax.linalg.cholesky itself, AFTER tracing, so the package's
jax_default_matmul_precision=highest may or may not reach its internal
dot_generals. This probe measures:

  a) lax.linalg.cholesky(symmetrize_input=False)  (the current solve path)
  b) a hand-blocked right-looking Cholesky whose trailing-update GEMMs run
     at an explicit precision (HIGHEST / ... / DEFAULT)

    python benchmarks/chol_probe.py [D] [block]

Timing follows CLAUDE.md slope-timing: N back-to-back dispatches + one
fetch, two values of N.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/benchmarks")
from common import setup

setup()
import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def slope_time(fn, *args):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        return time.perf_counter() - t0

    run(1)  # compile
    t2, t6 = run(2), run(6)
    return (t6 - t2) / 4


def blocked_cholesky(A, block: int, precision):
    """Right-looking blocked Cholesky, lower-triangular, statically unrolled.

    A must be (D, D) with D % block == 0 and SPD. The diagonal-block
    factorizations use lax.linalg.cholesky at block size (cheap); the panel
    solves and the trailing SYRK — the FLOPs bulk — are dot_generals at the
    requested precision, on exact shrinking slices (static shapes, n=D/block
    unrolled iterations)."""
    D = A.shape[0]
    n = D // block
    cols = []  # finished (D - k*block, block) panels, top-aligned at k*block
    T = A
    for k in range(n):
        Akk = T[:block, :block]
        Lkk = jax.lax.linalg.cholesky(Akk, symmetrize_input=False)
        below = T[block:, :block]
        Lb = jax.lax.linalg.triangular_solve(
            Lkk, below, left_side=False, lower=True, transpose_a=True)
        panel = jnp.concatenate([Lkk, Lb], axis=0) if Lb.shape[0] else Lkk
        cols.append(panel)
        if Lb.shape[0]:
            T = T[block:, block:] - jax.lax.dot_general(
                Lb, Lb, (((1,), (1,)), ((), ())), precision=precision)
    out = jnp.zeros_like(A)
    for k, panel in enumerate(cols):
        out = out.at[k * block:, k * block:(k + 1) * block].set(
            jnp.tril(panel) if panel.shape[0] == block else panel)
    return jnp.tril(out)


def trsv_pair(L, rhs):
    """The current solve tail: two single-rhs triangular solves."""
    y = jax.lax.linalg.triangular_solve(L, rhs[:, None], left_side=True,
                                        lower=True)
    x = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                        transpose_a=True)
    return x[:, 0]


def main():
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 16200
    blocks = ([int(b) for b in sys.argv[2].split(",")] if len(sys.argv) > 2
              else [512])
    precs = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ["highest", "default"])
    Dp = ((D + blocks[0] - 1) // blocks[0]) * blocks[0]
    rng = np.random.default_rng(0)
    M = rng.standard_normal((Dp, 256)).astype(np.float32)
    A = jnp.asarray(M @ M.T + Dp * np.eye(Dp, dtype=np.float32))

    flops = Dp ** 3 / 3

    chol = jax.jit(partial(jax.lax.linalg.cholesky, symmetrize_input=False))
    t = slope_time(chol, A)
    print(f"lax cholesky D={Dp}: {t*1e3:.1f} ms ({flops/t/1e12:.1f} TFLOP/s)")
    L = chol(A)
    rhs = jnp.asarray(rng.standard_normal(Dp).astype(np.float32))
    t = slope_time(jax.jit(trsv_pair), L, rhs)
    print(f"trsv pair (single rhs) D={Dp}: {t*1e3:.1f} ms", flush=True)
    if "--sub" in sys.argv:
        from tensornetworksfork_tpu.core.solve import blocked_cho_substitute
        for sb in blocks:
            t = slope_time(jax.jit(partial(blocked_cho_substitute,
                                           block=sb)), L, rhs)
            print(f"blocked substitution({sb}) D={Dp}: {t*1e3:.1f} ms",
                  flush=True)

    # error model at a cheap D (the f64 reference cholesky on this 1-core
    # host is unaffordable at 16k), speed at the real D
    Ds = 2048
    Ms = rng.standard_normal((Ds, 256)).astype(np.float32)
    As = jnp.asarray(Ms @ Ms.T + Ds * np.eye(Ds, dtype=np.float32))
    ref = np.linalg.cholesky(np.asarray(As, np.float64))
    for block in blocks:
        if Dp % block:
            continue
        for prec in precs:
            p = jax.lax.Precision(prec)
            Ls = jax.jit(partial(blocked_cholesky, block=block,
                                 precision=p))(As) if Ds % block == 0 else None
            err = (float(jnp.max(jnp.abs(Ls - ref)) / np.max(np.abs(ref)))
                   if Ls is not None else float("nan"))
            fn = jax.jit(partial(blocked_cholesky, block=block, precision=p))
            t = slope_time(fn, A)
            print(f"blocked({block}) prec={prec}: {t*1e3:.1f} ms "
                  f"({flops/t/1e12:.1f} TFLOP/s) rel_err@{Ds}={err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
