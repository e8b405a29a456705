"""Headline-result reproduction runner.

The reference ships `reproduce_result.py` / `BEST_SO_FAR_reproduce_result
copy.py` pinning its best MNIST configuration. This runner pins the same
protocol for this framework: the type-I conv-TT at the reference's headline
config (N=4, r=18, CB=8, kernel 4/4, batch 2048, eps 5.0 x 0.25, patience 10)
on MNIST when staged locally, and on the offline-available benchmarks
otherwise (sklearn digits at the scaled-down kernel).

Run:  python -m tensornetworksfork_tpu.experiments.reproduce_result [digits|mnist]
"""
from __future__ import annotations

import os
import sys

HEADLINE = {
    "mnist": dict(DATASET="MNIST", MODEL_TYPE="tt_type1", N="4", R="18",
                  CB="8", KERNEL_SIZE="4", KERNEL_STRIDE="4", NUM_SWIPES="5",
                  EPS="5.0", EPS_DECAY="0.25", EARLY_STOPPING="10",
                  BATCH_SIZE="2048"),
    # offline-available real-image benchmark (8x8 digits -> kernel 2/2)
    "digits": dict(DATASET="digits", MODEL_TYPE="tt_type1", N="4", R="16",
                   CB="8", KERNEL_SIZE="2", KERNEL_STRIDE="2", NUM_SWIPES="6",
                   EPS="5.0", EPS_DECAY="0.25", EARLY_STOPPING="10",
                   BATCH_SIZE="512"),
}


def main(which: str = "digits",
         seeds=(42, 43, 44, 45, 46, 47, 48, 49, 50, 51)):
    import numpy as np

    from ..utils.metrics import append_results_csv

    if which == "digits_flat":
        return run_digits_flat(seeds)

    from . import train_image

    results = []
    for seed in seeds:
        os.environ.update(HEADLINE[which])
        os.environ["SEED"] = str(seed)
        os.environ.setdefault("VERBOSE", "0")
        config = train_image.get_config_from_env()
        res = train_image.train_model(config)
        append_results_csv(res, f"results/reproduce_{which}.csv")
        results.append(res)
        print(f"seed {seed}: test_accuracy {res['test_accuracy']}%")
    accs = [r["test_accuracy"] for r in results]
    mean = np.mean(accs)
    # binomial sampling noise floor of the (fixed) test set: the seed-to-seed
    # std cannot meaningfully drop below this on a 359-sample digits test
    n_test = 359 if which == "digits" else 10000
    p = mean / 100.0
    floor = 100.0 * np.sqrt(p * (1 - p) / n_test)
    print(f"{which}: {mean:.2f} +/- {np.std(accs):.2f} % over "
          f"{len(seeds)} seeds ({results[0]['num_parameters']} params); "
          f"test-set binomial noise floor ~{floor:.2f} %")
    return results


def run_digits_flat(seeds):
    """Second real-data anchor: flat-64 tabular digits through the TT
    regressor, replicating the reference flat-MNIST protocol
    (`/root/reference/train_mnist.py:43-48`): pixels scaled to [0,1] then
    QuantileTransformer(output_distribution="uniform") — bounded features
    are what keep a degree-N polynomial TT stable (z-scored pixels with
    heavy tails lose ~25 accuracy points here). Fixed train/test split."""
    import numpy as np
    from sklearn.datasets import load_digits
    from sklearn.preprocessing import QuantileTransformer

    from ..data.tabular import split_train_val_test
    from ..utils.metrics import append_results_csv
    from .train_tabular import run
    from ..utils.config import RunConfig

    ds = load_digits()
    X = np.asarray(ds.data, np.float32) / 16.0
    y = np.asarray(ds.target, np.float32)
    data0 = split_train_val_test(X, y.reshape(-1, 1), seed=42)  # fixed
    qt = QuantileTransformer(output_distribution="uniform",
                             n_quantiles=min(1000, len(data0["X_train"])))
    data0["X_train"] = qt.fit_transform(data0["X_train"]).astype(np.float32)
    data0["X_val"] = qt.transform(data0["X_val"]).astype(np.float32)
    data0["X_test"] = qt.transform(data0["X_test"]).astype(np.float32)

    accs = []
    for seed in seeds:
        data = {k: (v.copy() if hasattr(v, "copy") else v)
                for k, v in data0.items()}
        data["task"] = "classification"
        cfg = RunConfig(dataset="digits", model_type="tt", N=3, r=8,
                        num_swipes=20, eps=5.0, eps_decay=0.25,
                        batch_size=512, early_stopping=10, seed=seed,
                        verbose=0,
                        results_file="results/reproduce_digits_flat.csv")
        res = run(cfg, data=data)
        accs.append(res["test_accuracy"] * 100)
        append_results_csv({**res, "seed": seed},
                           "results/reproduce_digits_flat.csv")
        print(f"seed {seed}: test_accuracy {accs[-1]:.2f}%")
    print(f"digits_flat: {np.mean(accs):.2f} +/- {np.std(accs):.2f} % "
          f"over {len(seeds)} seeds")
    return accs


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "digits")
