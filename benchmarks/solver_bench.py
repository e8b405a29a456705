import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, numpy as np, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from tensornetworksfork_tpu.core.sweep import Sweeper, SweepConfig
from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
from tensornetworksfork_tpu.ops.bregman import XEBregman

rng = np.random.default_rng(0)
S, P, pp, C = 8192, 50, 17, 9
X = jnp.asarray(rng.standard_normal((S, P, pp)), jnp.float32)
y = jnp.asarray(np.eye(C+1, dtype=np.float32)[rng.integers(0, C+1, S)])
layer = TensorConvolutionTrainLayer(3, 8, P, pp, output_shape=(C,), convolution_bond=4, seed=0)
cfg = SweepConfig(num_swipes=1, batch_size=2048, method="cg", max_iter=50, tol=1e-9, eps=1e-3)
sw = Sweeper(layer.network, XEBregman(w=1.0), cfg)
# one epoch warmup (compile), then timed epoch; each node solve runs up to 50
# fused-matvec CG iterations over 4 chunks
params, ok = sw.run([layer.params], X, y)
t0 = time.perf_counter()
params, ok = sw.run(params, X, y)
_ = float(next(iter(params[0].values())).sum())
dt = time.perf_counter() - t0
n_nodes = len(layer.topology.train_nodes) * 2  # l2r + r2l
iters = 50 * n_nodes
print(f"cg sweep epoch: {dt:.2f}s, ok={ok}; {iters} matvec iters -> {iters/dt:.1f} iters/s "
      f"(each matvec = fused JtHJv over {S} samples)")
