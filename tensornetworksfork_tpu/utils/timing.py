"""First-class timing instrumentation.

The reference has no timers (SURVEY.md §5.1 — only tqdm postfix strings and a
wall-clock timeout). The BASELINE.md north-star metric (sweep epochs/sec,
solver iters/sec) needs real phase timing, so the sweep driver and benches use
these helpers. `block_on` forces device completion so timings are honest.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

import jax


def block_on(x):
    return jax.block_until_ready(x)


class Timer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def rate(self, name: str):
        t = self.totals.get(name, 0.0)
        return self.counts[name] / t if t > 0 else float("nan")

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }


@contextmanager
def xla_trace(log_dir: str = "/tmp/tnf_trace"):
    """jax.profiler trace context — the framework's replacement for the
    reference's absent profiling tier (SURVEY.md §5.1). View with
    tensorboard/xprof."""
    import jax.profiler as _prof

    _prof.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        _prof.stop_trace()
