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
import os
import sys
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


class BayesSearch:
    """Surrogate-based sequential search (offline stand-in for the reference's
    `method: bayes` W&B sweep, `/root/reference/wandb_sweep.py:114-180`).

    GP regression with an RBF kernel over the normalized search space
    (ints/log-floats scaled to [0,1], choices one-hot) and expected-
    improvement acquisition maximized over a random candidate pool. The first
    `n_init` proposals are random (space-filling); afterwards each `ask()`
    refits the GP on everything `tell()` has seen.
    """

    def __init__(self, space=None, seed: int = 0, n_init: int = 5,
                 n_candidates: int = 256, length_scale: float = 0.35,
                 noise: float = 1e-4):
        self.space = dict(space or SWEEP_SPACE)
        self.rng = np.random.default_rng(seed)
        self.n_init = n_init
        self.n_candidates = n_candidates
        self.l2 = 2.0 * length_scale ** 2
        self.noise = noise
        self.X: list = []   # encoded observations
        self.y: list = []

    # ---- encoding ---------------------------------------------------------
    def _encode(self, cfg: Dict) -> np.ndarray:
        feats = []
        for k, spec in self.space.items():
            kind = spec[0]
            v = cfg[k]
            if kind == "int":
                lo, hi = spec[1], spec[2]
                feats.append((float(v) - lo) / max(1, hi - lo))
            elif kind == "log":
                lo, hi = math.log(spec[1]), math.log(spec[2])
                feats.append((math.log(float(v)) - lo) / (hi - lo))
            else:
                onehot = [1.0 if v == c else 0.0 for c in spec[1]]
                feats.extend(onehot)
        return np.asarray(feats)

    def _kernel(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)
        return np.exp(-d2 / self.l2)

    # ---- ask / tell -------------------------------------------------------
    def ask(self) -> Dict:
        if len(self.y) < self.n_init:
            return sample_config(self.rng, self.space)
        cands = [sample_config(self.rng, self.space)
                 for _ in range(self.n_candidates)]
        Xc = np.stack([self._encode(c) for c in cands])
        Xo = np.stack(self.X)
        yo = np.asarray(self.y, float)
        mu0, sd0 = yo.mean(), max(yo.std(), 1e-9)
        yn = (yo - mu0) / sd0
        K = self._kernel(Xo, Xo) + self.noise * np.eye(len(yo))
        try:
            L = np.linalg.cholesky(K)
        except np.linalg.LinAlgError:
            L = np.linalg.cholesky(K + 1e-6 * np.eye(len(yo)))
        alpha = np.linalg.solve(L.T, np.linalg.solve(L, yn))
        Ks = self._kernel(Xc, Xo)
        mu = Ks @ alpha
        v = np.linalg.solve(L, Ks.T)
        var = np.clip(1.0 - (v ** 2).sum(0), 1e-12, None)
        sd = np.sqrt(var)
        # expected improvement over the incumbent (maximization)
        best = yn.max()
        z = (mu - best) / sd
        phi = np.exp(-0.5 * z ** 2) / math.sqrt(2 * math.pi)
        Phi = 0.5 * (1.0 + np.vectorize(math.erf)(z / math.sqrt(2)))
        ei = (mu - best) * Phi + sd * phi
        return cands[int(np.argmax(ei))]

    def tell(self, cfg: Dict, score: float):
        self.X.append(self._encode(cfg))
        self.y.append(float(score))


def cv_score(cfg: RunConfig, overrides: Dict, X, y, folds: int = 5) -> Dict:
    """5-fold CV returning r2_low = mean - SEM (reference wandb_sweep.py
    metric) or accuracy_low for classification.

    Resource guard: configs whose middle-core Gram would exceed
    TNF_SWEEP_MAX_A_BYTES (default 1 GB) are recorded as infeasible
    (singular), like the reference's cluster runs that die on the search
    space's corners — a wedged 10-minute remote compile would otherwise
    burn the whole trial budget."""
    f = int(X.shape[1]) + 1  # bias column added by the estimator
    r = int(overrides.get("r", cfg.r))
    mt = str(overrides.get("model_type", cfg.model_type))
    N = int(overrides.get("N", cfg.N))
    # middle-core size: TT cores are (r, f, r); CPD factors only (r, f)
    D = r * f if "cpd" in mt else r * f * r
    max_bytes = int(os.environ.get("TNF_SWEEP_MAX_A_BYTES", str(1 << 30)))
    # compile-count cap: a type-I sum of degree 1..N has N(N+1)/2 cores and
    # each core is a separately compiled program on this stack — beyond
    # ~TNF_SWEEP_MAX_NODES the trial is compile-bound, not model-bound
    n_nodes = N * (N + 1) // 2 if "type1" in mt else N
    max_nodes = int(os.environ.get("TNF_SWEEP_MAX_NODES", "36"))
    # cum_sum materialises an (f,f,f,f) MPO constant per core — at high
    # feature counts the constants alone reach GBs (65-feature digits:
    # 71 MB x n_nodes); bound their total
    cum_bytes = (n_nodes * f ** 4 * 4
                 if overrides.get("cum_sum", cfg.cum_sum) else 0)
    if (D * D * 4 > max_bytes or n_nodes > max_nodes
            or cum_bytes > max_bytes):
        return {"score_low": -1e9, "singular": True, "infeasible": True}
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
            verbose=0, timeout=c.timeout)
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
              results_file: Optional[str] = None, use_wandb: bool = True,
              search: str = "bayes"):
    """search='bayes' (GP-EI surrogate, the reference's sweep method) or
    'random' (uniform)."""
    results_file = results_file or f"{cfg.dataset}_sweep_results.csv"
    try:
        if not use_wandb:
            raise ImportError
        import wandb  # optional
        _run_wandb(cfg, X, y, n_trials)
        return
    except ImportError:
        pass
    import signal
    import threading

    rng = np.random.default_rng(cfg.seed)
    searcher = BayesSearch(seed=cfg.seed) if search == "bayes" else None
    best = None
    # Per-trial wall-clock watchdog (SIGALRM, like bench.py's): the remote
    # TPU compile service intermittently wedges (CLAUDE.md) and a blocked
    # device call ignores the sweep's own between-updates timeout. A wedged
    # trial is recorded and skipped; two consecutive wedges mean the device
    # is gone — stop and keep the CSV.
    wall = float(os.environ.get("TNF_SWEEP_TRIAL_WALL", "900"))

    class _TrialWall(Exception):
        pass

    use_alarm = (hasattr(signal, "SIGALRM")
                 and threading.current_thread() is threading.main_thread())
    if use_alarm:
        signal.signal(signal.SIGALRM, lambda *_: (_ for _ in ()).throw(
            _TrialWall()))
    wedged_streak = 0
    for t in range(n_trials):
        overrides = searcher.ask() if searcher else sample_config(rng)
        try:
            if use_alarm:
                signal.alarm(int(wall))
            res = cv_score(cfg, overrides, X, y)
            wedged_streak = 0
        except _TrialWall:
            res = {"score_low": -1e9, "singular": True, "wedged": True}
            wedged_streak += 1
        finally:
            if use_alarm:
                signal.alarm(0)
        if searcher:
            searcher.tell(overrides, res["score_low"]
                          if not res["singular"] else -10.0)
        row = {**overrides, **res, "trial": t}
        append_results_csv(row, results_file)
        if not res["singular"] and (best is None
                                    or res["score_low"] > best[0]):
            best = (res["score_low"], overrides)
        if cfg.verbose:
            print(f"trial {t}: {overrides} -> {res.get('score_low'):.4f}"
                  if not res["singular"] else f"trial {t}: singular")
        if wedged_streak >= 2:
            print("device wedged twice in a row; stopping sweep",
                  file=sys.stderr)
            break
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
    """`--dataset digits` runs the GP-EI sweep on REAL data (sklearn's
    bundled digits through the flat-64 protocol — pixels/16 +
    quantile-uniform features, reproduce_result.run_digits_flat); any other
    dataset name uses the synthetic degree-3 regression. TNF_SWEEP_TRIALS
    sets the budget (default 10)."""
    cfg = RunConfig.from_args(argv)
    n_trials = int(os.environ.get("TNF_SWEEP_TRIALS", "10"))
    if cfg.timeout is None:
        # per-fold wall-clock bound: the search space's corners (N=16,
        # r=24, 50 swipes) are minutes/fold — the reference bounds trials
        # with the cluster's 4 h job limit (Sweeps/submit_*.sh); locally a
        # per-fit timeout keeps the trial budget meaningful
        cfg.timeout = float(os.environ.get("TNF_SWEEP_TRIAL_TIMEOUT", "60"))
    if cfg.dataset == "digits":
        from sklearn.datasets import load_digits
        from sklearn.preprocessing import QuantileTransformer

        ds = load_digits()
        X = np.asarray(ds.data, np.float32) / 16.0
        qt = QuantileTransformer(output_distribution="uniform",
                                 n_quantiles=min(1000, len(X)))
        X = qt.fit_transform(X).astype(np.float32)
        # one-hot targets + C-1 logits (the classification convention,
        # train_tabular.py run())
        y = np.eye(10, dtype=np.float32)[np.asarray(ds.target, int)]
        cfg = cfg.merge({"task": "classification", "output_dim": 9})
        best = run_sweep(cfg, X, y, n_trials=n_trials, use_wandb=False,
                         results_file=cfg.results_file or None)
    else:
        from ..data.synthetic import make_regression
        X, y = make_regression(S=2048, d=6, degree=3, seed=cfg.seed)
        best = run_sweep(cfg, X, y, n_trials=n_trials, use_wandb=False,
                         results_file=cfg.results_file or None)
    print("best:", best)


if __name__ == "__main__":
    main()
