"""Metrics + results-file protocol.

Metrics mirror the reference's sklearn usage (r2/rmse/accuracy/
balanced_accuracy); `append_results_csv` reproduces the append-to-CSV results
protocol of the image benchmark (reference AAMNST.py:69-92) so tables are
directly comparable with the reference CSVs.
"""
from __future__ import annotations

import csv
import os
from datetime import datetime
from typing import Dict

import numpy as np


def rmse(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    return float(np.sqrt(np.mean((y_true - y_pred) ** 2)))


def r2_score(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    ss_res = np.sum((y_true - y_pred) ** 2)
    ss_tot = np.sum((y_true - y_true.mean(axis=0)) ** 2)
    return float(1 - ss_res / ss_tot)


def accuracy(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    if y_true.ndim > 1 and y_true.shape[-1] > 1:
        y_true = y_true.argmax(-1)
    if y_pred.ndim > 1 and y_pred.shape[-1] > 1:
        y_pred = y_pred.argmax(-1)
    return float(np.mean(y_true == y_pred))


def balanced_accuracy(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    if y_true.ndim > 1 and y_true.shape[-1] > 1:
        y_true = y_true.argmax(-1)
    if y_pred.ndim > 1 and y_pred.shape[-1] > 1:
        y_pred = y_pred.argmax(-1)
    accs = [np.mean(y_pred[y_true == c] == c) for c in np.unique(y_true)]
    return float(np.mean(accs))


def error_rate(y_true, y_pred) -> float:
    return 1.0 - accuracy(y_true, y_pred)


def append_results_csv(results: Dict, path: str) -> None:
    """Append one result row, creating the file + header when missing
    (reference save_results_to_dataset, AAMNST.py:69-92)."""
    results = dict(results)
    results["timestamp"] = datetime.now().isoformat()
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    existing_fields = None
    if os.path.exists(path):
        with open(path, newline="") as f:
            reader = csv.reader(f)
            existing_fields = next(reader, None)
    # an existing-but-empty file (e.g. an interrupted run) reads a None
    # header and is treated like a missing file: the header must be written
    has_header = existing_fields is not None
    # copy: appending new keys must NOT mutate existing_fields, or the
    # header-changed check below never fires and rows with new columns get
    # appended misaligned under the old header
    fields = list(existing_fields) if has_header else list(results.keys())
    for k in results:
        if k not in fields:
            fields.append(k)
    rows = []
    rewrite = has_header and existing_fields != fields
    if rewrite:
        # header extended: rewrite under the new header even when the file
        # holds no data rows yet (appending under the old header would
        # misalign this and every later row). Legacy rows longer than the
        # header (written by the pre-fix appender) surface their overflow
        # under DictReader's None rest-key — DictWriter refuses None (and a
        # mid-rewrite crash truncates the file), so drop it.
        with open(path, newline="") as f:
            rows = [{k: v for k, v in r.items() if k is not None}
                    for r in csv.DictReader(f)]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    mode = "a" if (has_header and not rewrite) else "w"
    with open(path, mode, newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        if mode == "w":
            writer.writeheader()
            for r in rows:
                writer.writerow(r)
        writer.writerow({k: results.get(k, "") for k in fields})
