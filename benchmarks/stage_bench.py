"""Stage-wise timing of the flagship node-update pipeline.

Isolates the per-chunk cost of each stage of the A2 (D=16200) update —
packed-J build, prediction, loss, rhs, K build, Gram, solve — by compiling
scan programs that stop after each stage. Differences between consecutive
stages attribute the wall-clock. (The full update measured 981 ms/chunk
packed vs 366 ms of isolated Gram dot; this finds the rest.)

    python benchmarks/stage_bench.py <stage> [nchunks] [B]
stages: jbuild | pred | loss | rhs | kbuild | gram | all
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
    stage = sys.argv[1]
    nchunks = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    N, r, CB, P, pp, C = 4, 18, 8, 50, 17, 9

    from tensornetworksfork_tpu.core.engine import Network
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    layer = TensorConvolutionTrainLayer(
        num_carriages=N, bond_dim=r, num_patches=P, patch_pixels=pp,
        output_shape=(C,), convolution_bond=CB, seed=0)
    net = layer.network
    t = net.topology
    ni = t.by_name["A2"]
    ci = t.col_of[ni]
    name = t.nodes[ni].name
    core = layer.params[name]
    loss_fn = XEBregman(w=1.0)

    rng = np.random.default_rng(0)
    x = {t.nodes[nj].name: jnp.asarray(
            rng.standard_normal((nchunks, B) + tuple(
                d for d in t.nodes[nj].shape if d is not None)), jnp.float32)
         for nj in t.input_nodes if t.col_of[nj] == ci}
    y = jnp.asarray(np.eye(C + 1, dtype=np.float32)[
        rng.integers(0, C + 1, (nchunks, B))])
    L_axes = net.env_keep(tuple(range(0, ci)))
    R_axes = net.env_keep(tuple(range(ci + 1, len(t.columns))))
    L = jnp.asarray(rng.standard_normal(
        (nchunks,) + tuple(B if a == t.sample_axis else t.axis_size[a]
                           for a in L_axes)), jnp.float32) * 0.1
    R = jnp.asarray(rng.standard_normal(
        (nchunks,) + tuple(B if a == t.sample_axis else t.axis_size[a]
                           for a in R_axes)), jnp.float32) * 0.1

    params = layer.params

    def per_chunk(piece, upto):
        Lop = (L_axes, piece["L"])
        Rop = (R_axes, piece["R"])
        pj = net.packed_jacobian(ni, params, piece["x"], Lop, Rop)
        assert pj is not None
        J2 = pj["arr"]
        if upto == "jbuild":
            return jnp.sum(J2 * J2)
        pred = net.packed_predict(pj, core)
        if upto == "pred":
            return jnp.sum(pred)
        loss, g, H = loss_fn(pred, piece["y"])
        if upto == "loss":
            return loss.sum() + g.sum() + H.sum()
        S_sz = J2.shape[0]
        C_sz = 1
        for d in J2.shape[1:1 + pj["n_out"]]:
            C_sz *= d
        D0, D1 = pj["a0_sz"], pj["r_sz"]
        J3 = J2.reshape(S_sz, C_sz, D0, D1)
        b = jax.lax.dot_general(J3, g.reshape(S_sz, -1),
                                (((0, 1), (0, 1)), ((), ())),
                                precision=net.precision)
        if upto == "rhs":
            return jnp.sum(b)
        K3 = jax.lax.dot_general(
            H.reshape(S_sz, C_sz, C_sz), J3.reshape(S_sz, C_sz, D0 * D1),
            (((1,), (1,)), ((0,), (0,))),
            precision=net.precision).reshape(S_sz, C_sz, D0, D1)
        if upto == "kbuild":
            return jnp.sum(K3) + jnp.sum(b)
        A = jax.lax.dot_general(J3, K3, (((0, 1), (0, 1)), ((), ())),
                                precision=net.precision)
        if upto in ("gram", "all"):
            return jnp.sum(A) + jnp.sum(b)
        raise ValueError(stage)

    @jax.jit
    def run(L, R, x, y):
        def body(acc, piece):
            return acc + per_chunk(piece, stage), None

        out, _ = jax.lax.scan(body, 0.0, {"L": L, "R": R, "x": x, "y": y})
        return out

    t0 = time.perf_counter()
    v = float(run(L, R, x, y))
    print(f"{stage}: compile+first {time.perf_counter()-t0:.1f}s ({v:.3e})")
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(L, R, x, y))
        reps.append(time.perf_counter() - t0)
    print(f"{stage}: {min(reps)*1e3:.0f} ms / {nchunks} chunks "
          f"-> {min(reps)/nchunks*1e3:.0f} ms/chunk")


if __name__ == "__main__":
    main()
