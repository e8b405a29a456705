"""Hyperparameter sweep harness.

Rebuilds the reference's self-contained W&B Bayesian sweep
(`/root/reference/wandb_sweep.py:114-180`): search space N in [2,16],
r in [2,24], eps log-uniform, layer types, 5-fold CV with the robust metric
r2_low = mean - SEM. W&B is optional (not present in this environment): with
wandb the sweep registers and runs an agent; without it a seeded random
search over the same space runs locally and logs rows to CSV — the cluster
submit scripts' role (Sweeps/submit_*.sh) is played by running this module
once per worker.
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np

from ..models.estimators import TensorTrainRegressor
from ..ops.bregman import XEBregman
from ..utils.config import RunConfig
from ..utils.metrics import accuracy, append_results_csv, r2_score

# reference search space (wandb_sweep.py:127-151, Sweeps/*.yaml)
SWEEP_SPACE = {
    "N": ("int", 2, 16),
    "r": ("int", 2, 24),
    "eps": ("log", 1e-12, 10.0),
    "num_swipes": ("int", 1, 50),
    "model_type": ("choice", ["tt", "tt_type1", "cpd"]),
    "cum_sum": ("choice", [False, True]),
}


def sample_config(rng: np.random.Generator, space=None) -> Dict:
    space = space or SWEEP_SPACE
    out = {}
    for k, spec in space.items():
        kind = spec[0]
        if kind == "int":
            out[k] = int(rng.integers(spec[1], spec[2] + 1))
        elif kind == "log":
            out[k] = float(np.exp(rng.uniform(math.log(spec[1]),
                                              math.log(spec[2]))))
        elif kind == "choice":
            out[k] = spec[1][int(rng.integers(len(spec[1])))]
    return out


def cv_score(cfg: RunConfig, overrides: Dict, X, y, folds: int = 5) -> Dict:
    """5-fold CV returning r2_low = mean - SEM (reference wandb_sweep.py
    metric) or accuracy_low for classification."""
    n = X.shape[0]
    idx = np.random.RandomState(cfg.seed).permutation(n)
    scores = []
    singular = False
    for f in range(folds):
        val_idx = idx[f::folds]
        tr_idx = np.setdiff1d(idx, val_idx)
        c = cfg.merge(overrides)
        est = TensorTrainRegressor(
            N=c.N, r=c.r, output_dim=c.output_dim, seed=c.seed,
            bf=XEBregman(w=1.0) if c.task == "classification" else None,
            eps_start=c.eps, eps_decay=c.eps_decay, batch_size=c.batch_size,
            method=c.method, num_swipes=c.num_swipes, model_type=c.model_type,
            task=c.task, cum_sum=c.cum_sum, early_stopping=c.early_stopping,
            verbose=0)
        try:
            est.fit(X[tr_idx], y[tr_idx], X_val=X[val_idx], y_val=y[val_idx])
            pred = est.predict(X[val_idx])
            if c.task == "regression":
                scores.append(r2_score(y[val_idx].reshape(pred.shape), pred))
            else:
                scores.append(accuracy(y[val_idx], pred))
        except Exception:
            singular = True
            break
    if singular or not scores:
        return {"score_low": -1e9, "singular": True}
    mean = float(np.mean(scores))
    sem = float(np.std(scores) / math.sqrt(len(scores)))
    return {"score_low": mean - sem, "score_mean": mean, "score_sem": sem,
            "singular": False}


def run_sweep(cfg: RunConfig, X, y, n_trials: int = 20,
              results_file: Optional[str] = None, use_wandb: bool = True):
    results_file = results_file or f"{cfg.dataset}_sweep_results.csv"
    try:
        if not use_wandb:
            raise ImportError
        import wandb  # optional
        _run_wandb(cfg, X, y, n_trials)
        return
    except ImportError:
        pass
    rng = np.random.default_rng(cfg.seed)
    best = None
    for t in range(n_trials):
        overrides = sample_config(rng)
        res = cv_score(cfg, overrides, X, y)
        row = {**overrides, **res, "trial": t}
        append_results_csv(row, results_file)
        if not res["singular"] and (best is None
                                    or res["score_low"] > best[0]):
            best = (res["score_low"], overrides)
        if cfg.verbose:
            print(f"trial {t}: {overrides} -> {res.get('score_low'):.4f}"
                  if not res["singular"] else f"trial {t}: singular")
    return best


def _run_wandb(cfg: RunConfig, X, y, n_trials):  # pragma: no cover
    import wandb

    sweep_config = {
        "method": "bayes",
        "metric": {"name": "score_low", "goal": "maximize"},
        "parameters": {
            "N": {"min": 2, "max": 16},
            "r": {"min": 2, "max": 24},
            "eps": {"distribution": "log_uniform_values",
                    "min": 1e-12, "max": 10.0},
            "num_swipes": {"min": 1, "max": 50},
            "model_type": {"values": ["tt", "tt_type1", "cpd"]},
        },
    }
    sweep_id = wandb.sweep(sweep_config, project=f"tnf-tpu-{cfg.dataset}")

    def agent_fn():
        run = wandb.init()
        res = cv_score(cfg, dict(run.config), X, y)
        wandb.log(res)

    wandb.agent(sweep_id, function=agent_fn, count=n_trials)


def main(argv=None):
    cfg = RunConfig.from_args(argv)
    from ..data.synthetic import make_regression
    X, y = make_regression(S=2048, d=6, degree=3, seed=cfg.seed)
    best = run_sweep(cfg, X, y, n_trials=10, use_wandb=False)
    print("best:", best)


if __name__ == "__main__":
    main()
