"""Log-scale bar chart of total MCMC sampling seconds per model x dataset.

Rebuild of the reference figure (experiments/sampler_runtimes.py:13-41);
reads either the reference-format CSV or the aggregated run logs
(``sampling_s`` field written by experiments/regression.py).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default=None)
    p.add_argument("--out", default="results/sampling_seconds.png")
    a = p.parse_args()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import os
    import pandas as pd

    if a.csv:
        df = pd.read_csv(a.csv, index_col=0)
        models = df.index.tolist()
        datasets = df.columns.tolist()
        vals = {m: [float(str(v).split("±")[0]) for v in df.loc[m]]
                for m in models}
    else:
        from aggregate_results import aggregate, load_runs
        runs = load_runs()
        if runs.empty:
            print("no runs logged")
            return
        agg = aggregate(runs)
        agg = agg[agg["sampling_mean"] > 0]
        models = sorted(agg["model"].unique())
        datasets = sorted(agg["dataset"].unique())
        vals = {m: [float(agg[(agg.model == m) & (agg.dataset == d)]
                        ["sampling_mean"].iloc[0])
                    if ((agg.model == m) & (agg.dataset == d)).any() else np.nan
                    for d in datasets] for m in models}

    xs = np.arange(len(datasets))
    w = 0.8 / max(len(models), 1)
    fig, ax = plt.subplots(figsize=(8, 4))
    for j, m in enumerate(models):
        ax.bar(xs + j * w, vals[m], width=w, label=m)
    ax.set_yscale("log")
    ax.set_xticks(xs + 0.4); ax.set_xticklabels(datasets, rotation=30)
    ax.set_ylabel("MCMC sampling seconds (log)")
    ax.legend(fontsize=7)
    os.makedirs(Path(a.out).parent, exist_ok=True)
    fig.savefig(a.out, dpi=120, bbox_inches="tight")
    print("saved", a.out)


if __name__ == "__main__":
    main()
