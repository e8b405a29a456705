"""Compile + time ONE flagship node-update program in isolation.

The sweep's per-node update (scan over data chunks: J build -> loss ->
Gram/rhs -> Cholesky solve) is the program that historically crashes the
remote TPU compiler at flagship shapes (CLAUDE.md). This driver compiles a
single (node, direction) update with flagship-shaped dummy data so failures
can be attributed to a specific node / lowering, without the full bench's
14-program precompile in the way.

    python benchmarks/update_bench.py [node_name] [nchunks] [B]

node_name defaults to A2 (a D=16200 middle core).
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
    node_name = sys.argv[1] if len(sys.argv) > 1 else "A2"
    nchunks = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    # model-shape overrides (e.g. the reference CIFAR_minres config:
    # UB_R=100 UB_CB=5 UB_P=17 UB_PP=193 UB_METHOD=minres)
    e = os.environ.get
    N, r, CB = int(e("UB_N", 4)), int(e("UB_R", 18)), int(e("UB_CB", 8))
    P, pp, C = int(e("UB_P", 50)), int(e("UB_PP", 17)), int(e("UB_C", 9))

    from tensornetworksfork_tpu.core.sweep import SweepConfig, Sweeper
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    layer = TensorConvolutionTrainLayer(
        num_carriages=N, bond_dim=r, num_patches=P, patch_pixels=pp,
        output_shape=(C,), convolution_bond=CB, seed=0)
    net = layer.network
    t = net.topology
    ni = t.by_name[node_name]
    ci = t.col_of[ni]
    ncols = len(t.columns)

    method = os.environ.get("UB_METHOD", "ridge_cholesky")
    cfg = SweepConfig(num_swipes=1, batch_size=B, method=method, eps=5.0,
                      max_iter=int(os.environ.get("UB_MAX_ITER", "50")))
    sw = Sweeper(net, XEBregman(w=1.0), cfg)

    rng = np.random.default_rng(0)
    S = B * nchunks
    x = jnp.asarray(rng.standard_normal((S, P, pp)), jnp.float32)
    y = jnp.asarray(np.eye(C + 1, dtype=np.float32)[
        rng.integers(0, C + 1, S)])
    data = sw._prepare(x, y, None)

    def env_zeros(side, c):
        axes = sw._env_axes(0, side, c)
        shape = tuple(B if a == t.sample_axis else t.axis_size[a]
                      for a in axes)
        return jnp.zeros((nchunks,) + shape, jnp.float32)

    L = env_zeros("left", ci - 1) if ci > 0 else None
    R = env_zeros("right", ci + 1) if ci < ncols - 1 else None
    upd = sw._jit_update(0, ni, cfg.method, False, False, B)
    from tensornetworksfork_tpu.core.sweep import ITERATIVE_METHODS
    x0 = (jnp.zeros((layer.params[node_name].size,), jnp.float32)
          if cfg.method in ITERATIVE_METHODS else None)

    t0 = time.perf_counter()
    out = upd(layer.params, L, R, data["inputs"][0], data["y"], data["w"],
              None, jnp.float32(5.0), x0)
    val = float(jnp.sum(out[0]))
    t_compile = time.perf_counter() - t0
    print(f"{node_name}: compiled + first run in {t_compile:.1f}s "
          f"(sum {val:.3e})")

    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = upd(layer.params, L, R, data["inputs"][0], data["y"], data["w"],
                  None, jnp.float32(5.0), x0)
        float(jnp.sum(out[0]))
        reps.append(time.perf_counter() - t0)
    per_chunk = min(reps) / nchunks
    print(f"{node_name}: update {min(reps)*1e3:.0f} ms for {nchunks} chunks "
          f"-> {per_chunk*1e3:.0f} ms/chunk")


if __name__ == "__main__":
    main()
