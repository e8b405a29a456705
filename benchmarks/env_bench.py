"""Environment-step lowering experiments at flagship column shapes.

The epoch attribution (epoch_bench.py) shows env advances cost ~79 ms/call
(26 chunks) while their FLOP count (~0.2 TFLOP) would take ~2 ms at peak:
the column contraction's intermediates have tiny minor dims (r=18, CB=8),
so the MXU runs ~2% utilized. This bench compares lowerings of ONE column
advance over the full 26-chunk scan:

  current   engine.env_step (opt_einsum path, aux precision)
  twostage  explicit staging: (X*C) -> (prev) -> (A) dots with the sample
            axis kept in the matmul M dimension and merged output dims
  bf16env   current, with the carried env stored bf16

    python benchmarks/env_bench.py [variant] [nchunks]
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


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "current"
    nchunks = int(sys.argv[2]) if len(sys.argv) > 2 else 26
    B = 2048
    N, r, CB, P, pp, C = 4, 18, 8, 50, 17, 9

    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer

    layer = TensorConvolutionTrainLayer(
        num_carriages=N, bond_dim=r, num_patches=P, patch_pixels=pp,
        output_shape=(C,), convolution_bond=CB, seed=0)
    net = layer.network
    t = net.topology
    ci = 1  # a middle column: prev env carries (out, r, cb, s)
    rng = np.random.default_rng(0)
    x = {t.nodes[nj].name: jnp.asarray(
            rng.standard_normal((nchunks, B, P, pp)), jnp.float32)
         for nj in t.input_nodes if t.col_of[nj] == ci}
    prev_axes = net.env_keep((0,))
    prev_shape = tuple(B if a == t.sample_axis else t.axis_size[a]
                       for a in prev_axes)
    prev = jnp.asarray(rng.standard_normal((nchunks,) + prev_shape),
                       jnp.float32) * 0.1
    params = layer.params
    cols = (0, 1)

    if variant == "current":
        def step(p_c, x_c):
            return net.env_step((prev_axes, p_c), ci, params, x_c, cols)[1]
    elif variant == "twostage":
        # names: conv block C2 (cb, pp, cb2), core A2 (r, p, r2)
        Cb = params["C2"]
        A = params["A2"]

        def step(p_c, x_c):
            X = next(iter(x_c.values()))  # (B, P, pp)
            # U[(b p), (cb cb2)] = X @ C  -- M=B*P large, N=64
            U = jax.lax.dot_general(
                X.reshape(B * P, pp), Cb.transpose(1, 0, 2).reshape(pp, -1),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT)
            U = U.reshape(B, P, CB, CB)  # (b, p, cb, cb2)
            # prev is (out, r, cb, s) -> (s, out*r, cb)
            pe = p_c.reshape(C, r, CB, B).transpose(3, 0, 1, 2).reshape(
                B, C * r, CB)
            # V[s, (p cb2), (out r)] = sum_cb U[s,p,cb2,cb] pe[s,(out r),cb]
            V = jax.lax.dot_general(
                U.transpose(0, 1, 3, 2).reshape(B, P * CB, CB), pe,
                (((2,), (2,)), ((0,), (0,))),
                precision=jax.lax.Precision.DEFAULT)  # (B, P*CB2, C*r)
            V = V.reshape(B, P, CB, C, r)  # (b, p, cb2, out, r)
            # new[(s cb2 out), r2] = sum_{(r p)} V A2[(r p), r2]
            Vp = V.transpose(0, 2, 3, 4, 1).reshape(B * CB * C, r * P)
            A2m = A.reshape(r * P, r)  # A2 axes are (r, p, r2)
            out = jax.lax.dot_general(
                Vp, A2m, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT)
            # -> (B, cb2, out, r2) -> env order (out, r2, cb2, s)
            return out.reshape(B, CB, C, r).transpose(2, 3, 1, 0)
    elif variant == "bf16env":
        def step(p_c, x_c):
            e = net.env_step((prev_axes, p_c.astype(jnp.float32)), ci,
                             params, x_c, cols)[1]
            return e.astype(jnp.bfloat16)
        prev = prev.astype(jnp.bfloat16)
    else:
        raise SystemExit(f"unknown variant {variant}")

    @jax.jit
    def run(prev, x):
        def body(_, piece):
            p_c, x_c = piece
            return None, step(p_c, x_c)

        _, envs = jax.lax.scan(body, None, (prev, x))
        return envs

    t0 = time.perf_counter()
    out = run(prev, x)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"{variant}: compile+first {time.perf_counter()-t0:.1f}s "
          f"out{out.shape}")
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(prev, x).astype(jnp.float32)))
        reps.append(time.perf_counter() - t0)
    print(f"{variant}: {min(reps)*1e3:.1f} ms / {nchunks} chunks "
          f"-> {min(reps)/nchunks*1e3:.2f} ms/chunk")


if __name__ == "__main__":
    main()
