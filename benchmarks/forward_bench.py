"""Inference (serving) throughput at the flagship config.

The reference serves predictions through the same forward it trains with
(TensorNetwork.forward, network.py:115-137; layer(x) call stack SURVEY §3.2).
Our engine.forward lowers the whole network as ONE opt_einsum contraction;
like the pre-staged env advance, its pairwise steps batch over the sample
axis with TINY bond dims as M/N, leaving the MXU idle.  This bench compares:

  generic   engine.forward per chunk (the TNLayer.forward_batch path)
  env       column-staged forward: env_step left-to-right (which routes
            conv-TT columns through engine._env_step_conv_fast), final
            column contracted generically

over an epoch-sized batch (26 x 2048 samples), printing samples/s.

    python benchmarks/forward_bench.py [variant ...]

Env knobs honoured: TNF_AUX_PRECISION / TNF_ENV_STAGED (the env variant),
package-global HIGHEST matmul precision (the generic variant).
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


def build():
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer

    N, r, CB, P, pp, C = 4, 18, 8, 50, 17, 9
    layer = TensorConvolutionTrainLayer(
        num_carriages=N, bond_dim=r, num_patches=P, patch_pixels=pp,
        output_shape=(C,), convolution_bond=CB, seed=0)
    return layer


def forward_env(net, params, inputs):
    """Left-to-right env-chain forward; conv columns take the staged path."""
    ncols = len(net.topology.columns)
    env = None
    for ci in range(ncols):
        env = net.env_step(env, ci, params, inputs, tuple(range(ci + 1)))
    keep, arr = env
    out_keep = net.output_keep()
    return jnp.transpose(arr, tuple(keep.index(a) for a in out_keep))


def main():
    variants = sys.argv[1:] or ["generic", "env"]
    nchunks, B = 26, 2048
    layer = build()
    net = layer.network
    t = net.topology
    rng = np.random.default_rng(0)
    P, pp = 50, 17
    x = jnp.asarray(rng.standard_normal((nchunks, B, P, pp)), jnp.float32)
    params = layer.params
    S = nchunks * B

    for variant in variants:
        if variant == "generic":
            def one(x_c):
                return net.forward(params, x_c)
        elif variant == "env":
            def one(x_c):
                return forward_env(net, params, net.bind_inputs(x_c))
        elif variant == "artifact":
            # the AOT serving path: a deserialized jax.export blob (params
            # baked in), dispatched per chunk like a serving process would —
            # includes the per-call dispatch overhead the scan variants hide
            from tensornetworksfork_tpu.utils.serving import (
                export_forward, load_forward)
            f = load_forward(export_forward(layer, (P, pp)))
        else:
            raise SystemExit(f"unknown variant {variant}")

        if variant == "artifact":
            def run(x):
                return jnp.stack([f(x[i]) for i in range(x.shape[0])])
        else:
            @jax.jit
            def run(x):
                def body(_, x_c):
                    return None, one(x_c)

                _, outs = jax.lax.scan(body, None, x)
                return outs

        t0 = time.perf_counter()
        out = run(x)
        s0 = float(jnp.sum(out.astype(jnp.float32)))
        print(f"{variant}: compile+first {time.perf_counter() - t0:.1f}s "
              f"out{out.shape} sum {s0:.4e}")
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(run(x).astype(jnp.float32)))
            reps.append(time.perf_counter() - t0)
        best = min(reps)
        print(f"{variant}: {best * 1e3:.1f} ms / {S} samples "
              f"-> {S / best:,.0f} samples/s "
              f"({best / nchunks * 1e3:.2f} ms/chunk)")


if __name__ == "__main__":
    main()
