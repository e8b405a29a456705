"""Stage-wise timing of the flagship node-update pipeline.

Isolates the per-chunk cost of each stage of the A2 (D=16200) update by
compiling scan programs that stop after each stage; differences between
consecutive stages attribute the wall-clock. Stages call the ENGINE's own
methods (packed_jacobian / packed_predict / packed_gram_rhs), so the
numbers reflect exactly what the sweep runs under the active
TNF_GRAM_DTYPE / TNF_AUX_PRECISION mode.

    python benchmarks/stage_bench.py <stage> [nchunks] [B]
stages: jbuild | pred | loss | gram | all   (gram == A+b, the full
packed_gram_rhs; run under TNF_GRAM_DTYPE=bf16 for the bench mode)
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

    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    layer = TensorConvolutionTrainLayer(
        num_carriages=N, bond_dim=r, num_patches=P, patch_pixels=pp,
        output_shape=(C,), convolution_bond=CB, seed=0)
    net = layer.network
    t = net.topology
    ni = t.by_name["A2"]
    ci = t.col_of[ni]
    core = layer.params[t.nodes[ni].name]
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
        pj = net.packed_jacobian(ni, params, piece["x"],
                                 (L_axes, piece["L"]), (R_axes, piece["R"]))
        assert pj is not None
        if upto == "jbuild":
            J2 = pj["arr"].astype(jnp.float32)
            return jnp.sum(J2 * J2)
        pred = net.packed_predict(pj, core)
        if upto == "pred":
            return jnp.sum(pred)
        loss, g, H = loss_fn(pred, piece["y"])
        if upto == "loss":
            return loss.sum() + g.sum() + H.sum()
        A, b = net.packed_gram_rhs(pj, g, H)
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
          f"-> {min(reps)/nchunks*1e3:.1f} ms/chunk "
          f"(gram_dtype={os.environ.get('TNF_GRAM_DTYPE', 'f32')}, "
          f"aux={os.environ.get('TNF_AUX_PRECISION', 'highest')})")


if __name__ == "__main__":
    main()
