"""Unified run configuration.

The reference has three uncoordinated config mechanisms (SURVEY.md §5.6):
argparse (~50 flags, train_tabular.py:216-277), environment variables
(AAMNST.py:32-66), and W&B sweep YAML merged over args
(train_tabular.py:58-65). Here a single dataclass covers the union, loadable
from any of the three sources with the same key names.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class RunConfig:
    # data
    dataset: str = "synthetic"
    data_path: str = "data"
    task: str = "regression"          # regression | classification
    validation_split: float = 0.1
    # model
    model_type: str = "tt"            # tt | tt_type1 | cpd | cpd_type1 | tnml
    N: int = 3
    r: int = 8
    output_dim: int = 1
    linear_dim: Optional[int] = None
    CB: int = 4                        # convolution bond (image models)
    kernel_size: int = 4
    kernel_stride: int = 4
    constrict_bond: bool = False
    perturb: bool = False
    cum_sum: bool = False
    train_operator: bool = False
    swipe_method: str = "batch_same"   # tt_batch: batch_unique|same|block
    stream: Optional[str] = None       # tt_batch: "native" = C++ prefetcher
    # optimisation
    num_swipes: int = 5
    batch_size: int = 512
    method: str = "ridge_cholesky"
    # numerics tier: reference | fast | fastest | None = respect TNF_* env
    # (utils/precision.py; VERDICT r03 weak #5)
    precision: Optional[str] = None
    # solve numerics (docs/DESIGN.md "Solve numerics tiers"): refine = one
    # f32 iterative-refinement pass; solve_dtype="float64" = host f64 solve
    # for eps below the f32 floor (~1e-6)
    refine: bool = False
    solve_dtype: Optional[str] = None
    eps: float = 5.0
    eps_decay: Optional[float] = 0.25
    lr: float = 1.0
    max_iter: int = 50                 # iterative solvers
    tol: float = 1e-6
    # early stopping
    early_stopping: int = 10
    abs_err: float = 1e-4
    rel_err: float = 1e-3
    # misc
    seed: int = 42
    verbose: int = 1
    timeout: Optional[float] = None
    results_file: str = "results/results.csv"

    @classmethod
    def field_names(cls):
        return [f.name for f in dataclasses.fields(cls)]

    @classmethod
    def from_env(cls, prefix: str = "") -> "RunConfig":
        """AAMNST-style env-var config (reference AAMNST.py:32-66): keys are
        upper-cased field names."""
        cfg = cls()
        for f in dataclasses.fields(cls):
            key = (prefix + f.name).upper()
            if key in os.environ:
                setattr(cfg, f.name, _coerce(os.environ[key], f.type,
                                             getattr(cfg, f.name)))
        return cfg

    @classmethod
    def from_args(cls, argv=None) -> "RunConfig":
        p = argparse.ArgumentParser()
        cfg = cls()
        for f in dataclasses.fields(cls):
            default = getattr(cfg, f.name)
            if isinstance(default, bool):
                p.add_argument(f"--{f.name}", action="store_true",
                               default=default)
            else:
                p.add_argument(f"--{f.name}", default=default,
                               type=_parser_for(default))
        ns = p.parse_args(argv)
        for f in dataclasses.fields(cls):
            setattr(cfg, f.name, getattr(ns, f.name))
        return cfg

    def merge(self, overrides: dict) -> "RunConfig":
        """W&B-config-style override merge (reference train_tabular.py:58-65)."""
        cfg = dataclasses.replace(self)
        for k, v in overrides.items():
            if k in self.field_names():
                setattr(cfg, k, v)
        return cfg

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def _coerce(val: str, typ, default):
    if isinstance(default, bool):
        return val.lower() in ("1", "true", "yes")
    if isinstance(default, int):
        return int(val)
    if isinstance(default, float):
        return float(val)
    if default is None:
        try:
            return float(val) if "." in val else int(val)
        except ValueError:
            return None if val in ("", "None", "none") else val
    return val


def _parser_for(default):
    if default is None:
        # Optional fields: numbers parse as numbers, everything else stays a
        # string (Optional[str] knobs like stream="native")
        def parse(s):
            if s in ("", "None", "none"):
                return None
            try:
                return float(s) if "." in s else int(s)
            except ValueError:
                return s
        return parse
    if isinstance(default, float):
        return float
    if isinstance(default, int):
        return int
    return str
