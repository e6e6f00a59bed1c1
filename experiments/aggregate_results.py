"""Aggregate per-run JSON metrics into mean ± stderr tables.

Rebuild of the reference aggregator (experiments/aggregate_results.py:56-100):
globs ``LOG_DIR/<date>/*.json``, groups by (dataset, model) and reports
mean ± std/sqrt(n) for rmse/nlpd plus sampling-time aggregates.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd

from ggp_tpu.config import LOG_DIR


def load_runs(date: str | None = None) -> pd.DataFrame:
    pattern = os.path.join(LOG_DIR, date or "*", "*.json")
    rows = []
    for path in glob.glob(pattern):
        try:
            with open(path) as f:
                d = json.load(f)
            if isinstance(d, dict) and "test_rmse" in d:
                d.pop("trace_summary", None)
                rows.append(d)
        except Exception:
            continue
    return pd.DataFrame(rows)


def aggregate(df: pd.DataFrame) -> pd.DataFrame:
    """mean ± stderr with stderr = std / sqrt(n)
    (reference: aggregate_results.py:52-53)."""
    def stderr(x):
        return x.std(ddof=0) / max(np.sqrt(len(x)), 1)

    g = df.groupby(["dataset", "model"]).agg(
        nlpd_mean=("test_nlpd", "mean"), nlpd_se=("test_nlpd", stderr),
        rmse_mean=("test_rmse", "mean"), rmse_se=("test_rmse", stderr),
        wall_mean=("wall_clock_s", "mean"),
        sampling_mean=("sampling_s", "mean"),
        n=("split", "count"))
    return g.reset_index()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--date", default=None, help="log subdir date, default all")
    p.add_argument("--csv", default=None, help="write aggregate CSV here")
    a = p.parse_args()
    df = load_runs(a.date)
    if df.empty:
        print(f"no runs found under {LOG_DIR}")
        return
    agg = aggregate(df)
    with pd.option_context("display.width", 160):
        print(agg.to_string(index=False,
                            float_format=lambda v: f"{v:.4f}"))
    if a.csv:
        agg.to_csv(a.csv, index=False)
        print("wrote", a.csv)


if __name__ == "__main__":
    main()
