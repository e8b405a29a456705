"""Epoch-level phase attribution of the flagship sweep.

Runs the flagship conv-TT config (bench.py CONFIGS['full'] by default) with
TNF_SWEEP_TIMERS=1 and prints the per-phase wall-clock table: far-env
chains, near-env advances, each node's update program, member forwards.
This is the tool for VERDICT r02 item #1 — locating the non-Gram overhead
of the bf16 epoch. Timed dispatch is serialised (each call synced), so the
TOTAL here is an upper bound on the real epoch; the relative split is what
matters.

    python benchmarks/epoch_bench.py [quick|full] [n_epochs]

Env: TNF_GRAM_DTYPE / TNF_PRECISION / TNF_AUX_PRECISION as usual.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ["TNF_SWEEP_TIMERS"] = "1"
from common import setup

setup()
import jax
import jax.numpy as jnp
import numpy as np

from common import CONFIGS  # noqa: E402 — single source of config truth


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "full"
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    c = CONFIGS[name]

    from tensornetworksfork_tpu.core.sweep import SweepConfig, Sweeper
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((c["S"], c["P"], c["pp"])), jnp.float32)
    y = jnp.asarray(np.eye(c["C"] + 1, dtype=np.float32)[
        rng.integers(0, c["C"] + 1, c["S"])])

    layer = TensorConvolutionTrainLayer(
        num_carriages=c["N"], bond_dim=c["r"], num_patches=c["P"],
        patch_pixels=c["pp"], output_shape=(c["C"],),
        convolution_bond=c["CB"], seed=0)
    cfg = SweepConfig(num_swipes=1, batch_size=c["batch"],
                      method="ridge_cholesky", eps=5.0, eps_decay=0.25)
    sweeper = Sweeper(layer.network, XEBregman(w=1.0), cfg)

    t0 = time.perf_counter()
    sweeper.precompile([layer.params], X, y)
    params, ok = sweeper.run([layer.params], X, y)
    assert ok
    print(f"warmup (incl. compile): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    sweeper.timers.clear()
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        params, ok = sweeper.run(params, X, y)
    wall = time.perf_counter() - t0
    print(f"\n=== {name}: {n_epochs} epoch(s), wall {wall:.2f}s "
          f"(timed/serialised), gram_dtype="
          f"{os.environ.get('TNF_GRAM_DTYPE', 'f32')}, precision="
          f"{os.environ.get('TNF_PRECISION', 'highest')} ===")
    print(sweeper.timer_report())


if __name__ == "__main__":
    main()
