"""Flagship benchmark: conv-TT image-model sweep epochs/sec.

Headline config mirrors the reference's MNIST benchmark protocol
(BASELINE.md: kernel 4 / stride 4 -> 50 patches x 17 pixels incl. bias patch,
N=4, r=18, CB=8, batch 2048, XE loss with C-1 logits, ridge_cholesky,
eps 5.0 x 0.25 decay). Data is synthetic at MNIST shapes: sweep-epoch
wall-clock is content-independent.

vs_baseline: speedup over an independent torch-float64-CPU implementation of
the reference's algorithm (per-batch environment recomputation + dense
Gauss-Newton solves, benchmarks/torch_baseline.py), measured at a reduced
common config and scaled linearly in sample count (the algorithm is linear in
samples). The reference publishes no timings (SURVEY.md §6), so its own
computational pattern on the torch stack is the baseline.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: the flagship sweep compiles ~25 programs;
# caching makes repeat bench runs start in seconds instead of minutes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
# Benchmark mode: int8-quantized Gram operands (per-block absmax scales,
# exact int32 block dots rescaled to f32 in-kernel) + single-pass bf16 aux
# tier (env chains, J builds, predictions, rhs) with f32 accumulation +
# full-f32 solves. Accuracy-validated — the 10-seed digits replication with
# the int8 route forced onto every packed node matches the f32/bf16 tiers:
# mean 96.55 % unchanged, 8/10 seeds per-seed EXACT, ±1 test sample on the
# other two (results/reproduce_digits.csv 2026-08-19 block vs
# digits_bf16_final_r3.csv); the bf16 tier (TNF_GRAM_DTYPE=bf16) is
# per-seed identical to f32. The JSON records gram_dtype/aux. Unset via
# TNF_GRAM_DTYPE=f32 TNF_AUX_PRECISION=highest for full-f32 numerics.
os.environ.setdefault("TNF_GRAM_DTYPE", "int8")
os.environ.setdefault("TNF_AUX_PRECISION", "default")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def our_epoch_seconds(N, r, CB, P, pp, C, S, batch, n_epochs=3, seed=0,
                      method="ridge_cholesky"):
    import jax
    import jax.numpy as jnp
    from tensornetworksfork_tpu.core.sweep import SweepConfig, Sweeper
    from tensornetworksfork_tpu.models.layers import TensorConvolutionTrainLayer
    from tensornetworksfork_tpu.ops.bregman import XEBregman

    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((S, P, pp)), jnp.float32)
    y = jnp.asarray(np.eye(C + 1, dtype=np.float32)[rng.integers(0, C + 1, S)])

    layer = TensorConvolutionTrainLayer(
        num_carriages=N, bond_dim=r, num_patches=P, patch_pixels=pp,
        output_shape=(C,), convolution_bond=CB, seed=seed)
    cfg = SweepConfig(num_swipes=1, batch_size=batch, method=method,
                      eps=5.0, eps_decay=0.25, max_iter=50)
    sweeper = Sweeper(layer.network, XEBregman(w=1.0), cfg)

    # warmup: parallel-compile every per-node update + env program, then one
    # uncompiled-path-free epoch
    t0 = time.perf_counter()
    n_jobs = sweeper.precompile([layer.params], X, y)
    log(f"ours: precompiled {n_jobs} programs in "
        f"{time.perf_counter()-t0:.1f}s")
    params, ok = sweeper.run([layer.params], X, y)
    assert ok
    jax.block_until_ready(next(iter(params[0].values())))
    compile_s = time.perf_counter() - t0
    log(f"ours: warmup epoch (incl. compile): {compile_s:.2f}s")

    times = []
    for e in range(n_epochs):
        t0 = time.perf_counter()
        params, ok = sweeper.run(params, X, y)
        # force a real device->host fetch: block_until_ready does not
        # reliably block on the axon tunnel platform (CLAUDE.md)
        float(jnp.sum(next(iter(params[0].values()))))
        times.append(time.perf_counter() - t0)
    log(f"ours: steady epochs: {[f'{t:.3f}' for t in times]}")

    from tensornetworksfork_tpu.utils.flops import epoch_flops
    flops = epoch_flops(sweeper, X, y)["total"]
    return min(times), flops


from benchmarks.common import CONFIGS  # noqa: E402 — shared with epoch_bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small config (CI smoke)")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the steady epochs")
    ap.add_argument("--method", default="ridge_cholesky",
                    help="node-solve method: ridge_cholesky (default) or the "
                         "matrix-free tier cg|minres|lanczos "
                         "(benchmarks/solver_bench.py measures these per "
                         "node at flagship shapes)")
    args = ap.parse_args()
    if args.profile:
        import jax.profiler
        jax.profiler.start_trace(args.profile)

    import signal

    class _Watchdog(Exception):
        pass

    def _alarm(*_):
        raise _Watchdog("wall-clock watchdog fired")

    signal.signal(signal.SIGALRM, _alarm)

    # fallback chain: if a config fails or hangs (the remote compile service
    # intermittently wedges), try the next smaller one — the driver must
    # always receive one JSON line
    order = ["quick", "smoke"] if args.quick else ["full", "quick", "smoke"]
    budgets = {"full": 2100, "quick": 900, "smoke": 600}
    t_full = None
    flops = None
    used = None
    for name in order:
        try:
            signal.alarm(budgets[name])
            t_full, flops = our_epoch_seconds(**CONFIGS[name],
                                              method=args.method)
            signal.alarm(0)
            used = name
            break
        except BaseException as e:
            signal.alarm(0)
            log(f"config {name} failed: {type(e).__name__}: {str(e)[:200]}")
    if args.profile:
        import jax.profiler
        jax.profiler.stop_trace()
        log(f"profile trace written to {args.profile}")
    if t_full is None:
        print(json.dumps({"metric": "convtt_mnist_sweep_epochs_per_sec",
                          "value": 0.0, "unit": "epochs/sec",
                          "vs_baseline": None, "error": "all configs failed"}))
        return
    epochs_per_sec = 1.0 / t_full
    log(f"ours[{used}]: {t_full:.3f}s/epoch -> {epochs_per_sec:.4f} epochs/s")

    vs_baseline = None
    vs_flagship = None
    if not args.skip_baseline and used == "full":
        # flagship-shape anchor (VERDICT r01 weak #2): measured torch-f64
        # kernel rates extrapolated to the flagship epoch (a direct
        # measurement is days of CPU time; see torch_baseline.py docstring)
        try:
            from benchmarks.torch_baseline import (
                flagship_epoch_seconds_extrapolated)
            t_torch_flag = flagship_epoch_seconds_extrapolated()
            vs_flagship = t_torch_flag / t_full
            log(f"baseline[flagship-extrapolated]: torch-cpu f64 "
                f"~{t_torch_flag:.0f}s/epoch -> {vs_flagship:.0f}x")
        except BaseException as e:
            log(f"flagship anchor failed: {e}")
    if not args.skip_baseline:
        # reduced common config for the torch-CPU baseline ratio
        full = CONFIGS[used]
        red = dict(N=full["N"], r=min(full["r"], 8), CB=min(full["CB"], 4),
                   P=full["P"], pp=full["pp"], C=full["C"], S=2048, batch=512)
        try:
            signal.alarm(900)
            t_ours_red, _ = our_epoch_seconds(**red)
            from benchmarks.torch_baseline import conv_tt_epoch_seconds
            t0 = time.perf_counter()
            t_torch_red = conv_tt_epoch_seconds(**red)
            log(f"baseline: torch-cpu f64 {t_torch_red:.2f}s/epoch at {red} "
                f"(measured in {time.perf_counter()-t0:.1f}s)")
            log(f"ours at reduced config: {t_ours_red:.3f}s/epoch")
            vs_baseline = t_torch_red / t_ours_red
            signal.alarm(0)
        except BaseException as e:
            signal.alarm(0)
            log(f"baseline comparison failed: {e}")

    from tensornetworksfork_tpu.utils.flops import device_peak_flops, mfu
    achieved = flops / t_full if flops else None
    util = mfu(flops, t_full) if flops else None
    if achieved:
        log(f"ours[{used}]: {flops/1e12:.1f} TFLOPs/epoch -> "
            f"{achieved/1e12:.2f} TFLOP/s achieved"
            + (f" ({util*100:.1f}% of bf16 peak)" if util else ""))
    print(json.dumps({
        "metric": "convtt_mnist_sweep_epochs_per_sec",
        "value": round(epochs_per_sec, 4),
        "unit": "epochs/sec",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "vs_baseline_flagship_extrapolated":
            round(vs_flagship, 1) if vs_flagship else None,
        "config": used,
        "epoch_tflops": round(flops / 1e12, 2) if flops else None,
        "achieved_tflops_per_sec": round(achieved / 1e12, 3) if achieved else None,
        "mfu_vs_bf16_peak": round(util, 4) if util else None,
        "precision": os.environ.get("TNF_PRECISION", "highest"),
        "gram_dtype": os.environ.get("TNF_GRAM_DTYPE", "f32"),
        "aux_precision": os.environ.get("TNF_AUX_PRECISION", "highest"),
    }))


if __name__ == "__main__":
    main()
