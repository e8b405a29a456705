"""Matrix-free solver tier benchmark — toy and FLAGSHIP shapes.

VERDICT r02 item #4: measure the iterative (CG/MINRES) tier at the flagship
D=16,200 node, where the dense Gram A is a 1.05 GB f32 matrix and matrix-free
is the *memory* winner (the CIFAR analogue of the reference's
`CIFAR_minres.py:112` scipy path, rebuilt as an on-device lax.while_loop with
a fused JᴴHJv matvec — engine.gram_matvec / sweep ITERATIVE_METHODS).

    python benchmarks/solver_bench.py quick            # round-1 toy config
    python benchmarks/solver_bench.py flagship [cg|minres]

flagship mode updates ONE node (A2, D=16200) through Sweeper.run(node_order=
[(0, A2)]) twice with different max_iter; the difference isolates the
per-iteration matvec cost from the shared linearisation pass, giving honest
iters/s. It also times the dense (ridge_cholesky) update of the same node for
the crossover comparison, and reports the analytic working-set sizes.
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

from tensornetworksfork_tpu.core.sweep import SweepConfig, Sweeper
from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
from tensornetworksfork_tpu.ops.bregman import XEBregman


def sync(params):
    return float(next(iter(params[0].values())).sum())


def quick():
    rng = np.random.default_rng(0)
    S, P, pp, C = 8192, 50, 17, 9
    X = jnp.asarray(rng.standard_normal((S, P, pp)), jnp.float32)
    y = jnp.asarray(np.eye(C + 1, dtype=np.float32)[rng.integers(0, C + 1, S)])
    layer = TensorConvolutionTrainLayer(3, 8, P, pp, output_shape=(C,),
                                        convolution_bond=4, seed=0)
    cfg = SweepConfig(num_swipes=1, batch_size=2048, method="cg", max_iter=50,
                      tol=1e-9, eps=1e-3)
    sw = Sweeper(layer.network, XEBregman(w=1.0), cfg)
    params, ok = sw.run([layer.params], X, y)
    t0 = time.perf_counter()
    params, ok = sw.run(params, X, y)
    sync(params)
    dt = time.perf_counter() - t0
    iters = 50 * len(layer.topology.train_nodes) * 2
    print(f"cg sweep epoch: {dt:.2f}s, ok={ok}; {iters} matvec iters -> "
          f"{iters/dt:.1f} iters/s (each matvec = fused JtHJv over {S} "
          f"samples)")


def flagship(method="cg"):
    N, r, CB, P, pp, C, S, batch = 4, 18, 8, 50, 17, 9, 53248, 2048
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((S, P, pp)), jnp.float32)
    y = jnp.asarray(np.eye(C + 1, dtype=np.float32)[rng.integers(0, C + 1, S)])
    layer = TensorConvolutionTrainLayer(N, r, P, pp, output_shape=(C,),
                                        convolution_bond=CB, seed=0)
    t = layer.topology
    ni = t.by_name["A2"]
    D = layer.params[t.nodes[ni].name].size
    nchunks = S // batch
    order = [(0, ni)]

    def one_node_time(method, max_iter, reps=2):
        cfg = SweepConfig(num_swipes=1, batch_size=batch, method=method,
                          max_iter=max_iter, tol=0.0, eps=1e-3,
                          skip_second=True)
        sw = Sweeper(layer.network, XEBregman(w=1.0), cfg)
        params, ok = sw.run([layer.params], X, y, node_order=order)  # compile
        assert ok
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            params, ok = sw.run(params, X, y, node_order=order)
            sync(params)
            times.append(time.perf_counter() - t0)
        return min(times)

    print(f"flagship node A2: D={D}, {nchunks} chunks x {batch} samples")
    t_dense = one_node_time("ridge_cholesky", 0)
    print(f"dense update (accumulate A ({D},{D}) f32 + cholesky): "
          f"{t_dense:.2f}s; A alone = {D*D*4/1e9:.2f} GB on device")

    it_lo, it_hi = 8, 40
    t_lo = one_node_time(method, it_lo)
    t_hi = one_node_time(method, it_hi)
    per_iter = (t_hi - t_lo) / (it_hi - it_lo)
    lin = t_lo - it_lo * per_iter
    # matrix-free working set: H cache + Krylov vectors, no (D, D) anywhere
    h_cache = nchunks * batch * C * C * 4 / 1e9
    vecs = 8 * D * 4 / 1e6
    print(f"{method} update: {t_lo:.2f}s @ {it_lo} iters, {t_hi:.2f}s @ "
          f"{it_hi} iters -> {per_iter*1e3:.0f} ms/iter "
          f"({1.0/per_iter:.1f} iters/s), linearisation pass {lin:.2f}s")
    print(f"matrix-free working set: H cache {h_cache:.3f} GB + Krylov "
          f"vectors ~{vecs:.1f} MB vs dense A {D*D*4/1e9:.2f} GB")
    iters_to_parity = max((t_dense - lin) / per_iter, 0.0)
    print(f"crossover: {method} wins wall-clock when it converges in "
          f"< {iters_to_parity:.0f} iters; memory-wise matrix-free wins "
          f"whenever D^2 f32 no longer fits comfortably (D >~ 5e4 on a "
          f"16 GB chip; at D={D} dense still fits, so dense stays the "
          f"wall-clock default and METHOD=cg|minres is the memory/huge-D "
          f"escape hatch)")
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats:
        print(f"device peak_bytes_in_use: "
              f"{stats.get('peak_bytes_in_use', 0)/1e9:.2f} GB")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    if mode == "quick":
        quick()
    else:
        flagship(sys.argv[2] if len(sys.argv) > 2 else "cg")
