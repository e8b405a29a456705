"""Model-zoo evidence sweep over the offline-bundled tabular datasets.

The reference commits per-dataset ablation CSVs covering its model families
(train_grid_search_ablation_{tt,cpd}{,_type1}{,_cumsum,_lin}*.py ->
results/{dataset}_ablation_results_{model}.csv; SURVEY.md §2.8). This driver
produces the equivalent evidence table on the datasets available without
network egress (sklearn bundles + synthetic): every TT/CPD family x dataset
x seed, one CSV row each, via the same train_tabular.run() path users call.

    python -m tensornetworksfork_tpu.experiments.zoo_eval [--quick]
                                                          [--out results/zoo_eval.csv]

Small fixed configs (N=3, r=6, 10 swipes) — this is a breadth/capability
table, not a tuned-accuracy benchmark (the tuned protocol lives in
grid_search.py / sweep.py).
"""
from __future__ import annotations

import argparse
import signal
import sys
import time

from ..utils.config import RunConfig
from ..utils.metrics import append_results_csv
from .train_tabular import run

DATASETS = ("iris", "wine", "breast_cancer", "diabetes", "synthetic")

# name -> RunConfig overrides (model family selectors)
FAMILIES = {
    "tt": dict(model_type="tt"),
    "tt_type1": dict(model_type="tt_type1"),
    "cpd": dict(model_type="cpd"),
    "cpd_type1": dict(model_type="cpd_type1"),
    "tt_cumsum": dict(model_type="tt", cum_sum=True),
    "tt_linear": dict(model_type="tt", linear_dim=6),
    "tnml": dict(model_type="tnml"),
    "polynomial": dict(model_type="polynomial"),
}

SEEDS = (42, 43, 44)
FIT_WALL_S = 600  # SIGALRM guard per fit: a wedged remote compile skips the
                  # row instead of stalling the whole table (CLAUDE.md env
                  # quirks; same pattern as experiments/sweep.py)


def _load_metrics(path):
    """CSV -> {(dataset, family): [metric per row]} using the task's headline
    metric (test_accuracy for classification, test_r2 for regression)."""
    import csv
    import collections
    cells = collections.defaultdict(list)
    with open(path) as f:
        for r in csv.DictReader(f):
            for k in ("test_accuracy", "test_r2"):
                v = r.get(k)
                if v not in (None, ""):
                    cells[(r["dataset"], r["family"])].append(float(v))
                    break
    return cells


def compare_tables(base_csv, other_csv, family_tol_pp=0.5, cell_tol_pp=2.0):
    """Numeric-tier regression gate (VERDICT r04 weak #6): assert the other
    table's per-family mean metric tracks the base within family_tol_pp
    percentage points (and each (dataset, family) cell within cell_tol_pp —
    cells are 3-seed means, so noisier). Tolerances calibrated on the
    committed round-4 int8-vs-f32 tables: worst family delta 0.31 pp, worst
    cell delta 1.16 pp; a −2 pp family regression trips the family gate.
    Returns a list of violation strings (empty = pass)."""
    import collections
    base = _load_metrics(base_csv)
    other = _load_metrics(other_csv)
    violations = []
    fams = collections.defaultdict(lambda: ([], []))
    for key in sorted(base):
        if key not in other:
            violations.append(f"missing cell in {other_csv}: {key}")
            continue
        a, b = base[key], other[key]
        fams[key[1]][0].extend(a)
        fams[key[1]][1].extend(b)
        d = (sum(b) / len(b) - sum(a) / len(a)) * 100
        if abs(d) > cell_tol_pp:
            violations.append(
                f"cell {key[0]}/{key[1]}: delta {d:+.2f} pp "
                f"(tol {cell_tol_pp})")
    for fam, (a, b) in sorted(fams.items()):
        if not a or not b:
            continue
        d = (sum(b) / len(b) - sum(a) / len(a)) * 100
        if abs(d) > family_tol_pp:
            violations.append(
                f"family {fam}: mean delta {d:+.2f} pp (tol {family_tol_pp})")
    return violations


class _Timeout(BaseException):
    # BaseException, NOT Exception: train_tabular.run wraps model.fit in a
    # broad `except Exception` (singular-abort parity), which would swallow
    # an Exception-derived alarm and mislabel a wedged-compile timeout as a
    # singular row. BaseException escapes that handler (like KeyboardInterrupt).
    pass


def _alarm(signum, frame):
    raise _Timeout()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="one dataset (iris) x all families x one seed")
    ap.add_argument("--out", default="results/zoo_eval.csv")
    ap.add_argument("--seeds", type=int, default=len(SEEDS))
    ap.add_argument("--platform", default="cpu", choices=("cpu", "tpu"),
                    help="accuracy table is platform-independent; cpu avoids "
                         "120 tunnel compiles (CLAUDE.md env quirks)")
    ap.add_argument("--compare", nargs=2, metavar=("BASE", "OTHER"),
                    help="no fits: regression-gate OTHER csv against BASE "
                         "(per-family/cell mean deltas); exit 1 + offending "
                         "rows on violation")
    ap.add_argument("--family_tol_pp", type=float, default=0.5)
    ap.add_argument("--cell_tol_pp", type=float, default=2.0)
    args = ap.parse_args(argv)

    if args.compare:
        violations = compare_tables(args.compare[0], args.compare[1],
                                    args.family_tol_pp, args.cell_tol_pp)
        for v in violations:
            print("VIOLATION:", v)
        print(f"zoo compare: {args.compare[1]} vs {args.compare[0]} -> "
              f"{'FAIL' if violations else 'OK'}")
        return 1 if violations else 0

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    datasets = ("iris",) if args.quick else DATASETS
    seeds = SEEDS[:1] if args.quick else SEEDS[:args.seeds]
    old = signal.signal(signal.SIGALRM, _alarm)
    n_ok = n_fail = 0
    try:
        for ds in datasets:
            for fam, over in FAMILIES.items():
                for seed in seeds:
                    cfg = RunConfig(dataset=ds, N=3, r=6, num_swipes=10,
                                    eps=0.5, eps_decay=0.5, batch_size=512,
                                    seed=seed, verbose=0,
                                    results_file=args.out)
                    t0 = time.time()
                    signal.alarm(FIT_WALL_S)
                    try:
                        res = run(cfg, overrides=over)
                        res["family"] = fam
                    except _Timeout:
                        res = dict(cfg.to_dict(), family=fam, singular=True,
                                   timed_out=True)
                    finally:
                        signal.alarm(0)
                    append_results_csv(res, args.out)
                    bad = res.get("singular") or res.get("skipped")
                    n_ok += not bad
                    n_fail += bool(bad)
                    metric = res.get("test_accuracy",
                                     res.get("test_r2", "-"))
                    print(f"{ds:13s} {fam:10s} seed {seed}: "
                          f"{'FAIL' if bad else metric} "
                          f"({time.time() - t0:.0f}s)", flush=True)
    finally:
        signal.signal(signal.SIGALRM, old)
    print(f"zoo_eval: {n_ok} ok, {n_fail} failed -> {args.out}")
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
