"""NLPD benchmark errorbar panels.

Rebuild of the reference figure script (experiments/nlpd_benchmarks_plot.py):
panel 1 compares against external baselines (DGP-2/3/4, PBP) from
``benchmarks_nlpd.csv`` (:15-46); panel 2 compares the in-repo model family
(:48-80). Input CSVs use the reference's layout: one row per dataset, one
column per model, entries "mean±se". Falls back to the aggregated run logs
when no CSV is given.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd


def parse_pm(s):
    m, se = str(s).replace("±", "+-").split("+-")
    return float(m), float(se)


def panel_from_csv(path, ax):
    df = pd.read_csv(path)
    datasets = df.iloc[:, 0].tolist()
    models = df.columns[1:]
    xs = np.arange(len(datasets))
    for j, model in enumerate(models):
        vals = [parse_pm(v) for v in df[model]]
        means = [v[0] for v in vals]
        ses = [v[1] for v in vals]
        ax.errorbar(xs + 0.08 * (j - len(models) / 2), means, yerr=ses,
                    fmt="o", ms=4, capsize=2, label=model)
    ax.set_xticks(xs); ax.set_xticklabels(datasets, rotation=30)
    ax.set_ylabel("test NLPD"); ax.legend(fontsize=7)


def panel_from_logs(ax):
    from aggregate_results import aggregate, load_runs
    df = load_runs()
    if df.empty:
        ax.text(0.5, 0.5, "no runs logged", ha="center")
        return
    agg = aggregate(df)
    datasets = sorted(agg["dataset"].unique())
    xs = np.arange(len(datasets))
    for j, model in enumerate(sorted(agg["model"].unique())):
        sub = agg[agg["model"] == model].set_index("dataset")
        means = [sub["nlpd_mean"].get(d, np.nan) for d in datasets]
        ses = [sub["nlpd_se"].get(d, np.nan) for d in datasets]
        ax.errorbar(xs + 0.06 * j, means, yerr=ses, fmt="o", ms=4, capsize=2,
                    label=model)
    ax.set_xticks(xs); ax.set_xticklabels(datasets, rotation=30)
    ax.set_ylabel("test NLPD"); ax.legend(fontsize=7)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default=None,
                   help="benchmarks CSV (mean±se cells); default: run logs")
    p.add_argument("--out", default="results/nlpd_benchmarks.png")
    a = p.parse_args()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import os
    fig, ax = plt.subplots(figsize=(8, 4))
    if a.csv:
        panel_from_csv(a.csv, ax)
    else:
        panel_from_logs(ax)
    os.makedirs(Path(a.out).parent, exist_ok=True)
    fig.savefig(a.out, dpi=120, bbox_inches="tight")
    print("saved", a.out)


if __name__ == "__main__":
    main()
