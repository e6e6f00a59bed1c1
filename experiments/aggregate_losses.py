"""Aggregate per-split loss curves into mean ± stderr trajectories.

Rebuild of the reference (experiments/aggregate_losses.py:24-43): reads
per-split loss CSVs (one column per run) and plots mean with a stderr band.
"""

from __future__ import annotations

import argparse
import glob
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pattern", help="glob of per-split loss .csv files")
    p.add_argument("--out", default=None)
    a = p.parse_args()
    files = sorted(glob.glob(a.pattern))
    if not files:
        print("no loss files match", a.pattern)
        return
    curves = [np.loadtxt(f, delimiter=",") for f in files]
    L = min(len(c) for c in curves)
    arr = np.stack([c[:L] for c in curves])          # (runs, steps)
    mean = arr.mean(0)
    se = arr.std(0) / np.sqrt(arr.shape[0])
    print(f"{arr.shape[0]} runs, {L} steps: final {mean[-1]:.4f}±{se[-1]:.4f}")
    if a.out:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        xs = np.arange(L)
        ax.plot(xs, mean, "b-")
        ax.fill_between(xs, mean - se, mean + se, color="b", alpha=0.25)
        ax.set_xlabel("step"); ax.set_ylabel("loss")
        fig.savefig(a.out, dpi=120, bbox_inches="tight")
        print("saved", a.out)


if __name__ == "__main__":
    main()
