"""Result aggregation: seed-averaged tables, LaTeX output, frontier data.

Rebuilds the reference reporting family:
- seed-averaged accuracy tables with a minimum-seed-count filter
  (AMNISTTABLE.py:8-48, >=3 seeds);
- LaTeX benchmark tables (create_test_table.py, create_ablation_table.py);
- accuracy-vs-parameter-count frontier extraction (create_frontier_graph.py);
- convergence trajectories from fit CSVs (convergence_plot.py).

All functions take/return pandas DataFrames; CSV layout follows
utils.metrics.append_results_csv (the reference's results protocol).
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd


def seed_averaged_table(df: pd.DataFrame, group_cols: Sequence[str],
                        metric: str = "test_accuracy",
                        min_seeds: int = 3) -> pd.DataFrame:
    """mean ± std of `metric` per config, keeping configs with >= min_seeds
    replicates (reference AMNISTTABLE.py:28-43)."""
    g = df.groupby(list(group_cols))[metric]
    out = g.agg(["mean", "std", "count"]).reset_index()
    out = out[out["count"] >= min_seeds]
    out = out.rename(columns={"mean": f"{metric}_mean",
                              "std": f"{metric}_std",
                              "count": "n_seeds"})
    return out.sort_values(f"{metric}_mean", ascending=False)


def to_latex_table(df: pd.DataFrame, caption: str = "",
                   float_fmt: str = "%.2f") -> str:
    """Minimal LaTeX tabular emitter (reference create_test_table.py role)."""
    cols = list(df.columns)
    lines = [r"\begin{table}[h]", r"\centering",
             r"\begin{tabular}{" + "l" * len(cols) + "}", r"\toprule",
             " & ".join(str(c).replace("_", r"\_") for c in cols) + r" \\",
             r"\midrule"]
    for _, row in df.iterrows():
        cells = []
        for c in cols:
            v = row[c]
            cells.append(float_fmt % v if isinstance(v, (float, np.floating))
                         else str(v).replace("_", r"\_"))
        lines.append(" & ".join(cells) + r" \\")
    lines += [r"\bottomrule", r"\end{tabular}"]
    if caption:
        lines.append(r"\caption{" + caption + "}")
    lines.append(r"\end{table}")
    return "\n".join(lines)


def pareto_frontier(df: pd.DataFrame, x: str = "num_parameters",
                    y: str = "test_accuracy") -> pd.DataFrame:
    """Rows not dominated in (fewer params, higher metric)
    (reference create_frontier_graph.py role)."""
    d = df.loc[df.groupby(x)[y].idxmax()].sort_values(x)
    best = -np.inf
    keep = []
    for _, row in d.iterrows():
        if row[y] > best:
            keep.append(row)
            best = row[y]
    return pd.DataFrame(keep)


def convergence_table(trajectory: List[dict]) -> pd.DataFrame:
    """Fit-trajectory list (module estimators' .trajectory) -> DataFrame
    (reference train_mnist.py trajectory CSVs)."""
    return pd.DataFrame(trajectory)


def combine_result_files(paths: Sequence[str]) -> pd.DataFrame:
    frames = [pd.read_csv(p) for p in paths]
    return pd.concat(frames, ignore_index=True)
