"""1D posterior plotting (reference: utils/visualisation.py:12-61).

Matplotlib is host-side and optional; all functions accept numpy-like
arrays and save to ``RESULTS_DIR`` when given a filename.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import RESULTS_DIR
from .posterior_predictive import (
    get_posterior_predictive_means_stds,
    get_posterior_predictive_uncertainty_intervals,
)

__all__ = ["plot_mixture_posterior", "plot_posterior", "plot_train_data"]


def _save(fig, filename: Optional[str]):
    if filename:
        os.makedirs(RESULTS_DIR, exist_ok=True)
        fig.savefig(os.path.join(RESULTS_DIR, filename), dpi=120,
                    bbox_inches="tight")


def plot_train_data(X, y, ax=None, filename: Optional[str] = None):
    """Train scatter (reference: utils/visualisation.py:54-61)."""
    import matplotlib.pyplot as plt
    fig, ax = (ax.figure, ax) if ax is not None else plt.subplots()
    ax.plot(np.asarray(X).ravel(), np.asarray(y), "kx", ms=4, alpha=0.6,
            label="train")
    _save(fig, filename)
    return ax


def plot_posterior(X_test, mean, var, X=None, y=None, Z=None, ax=None,
                   filename: Optional[str] = None, label="posterior"):
    """Single posterior with 95% CI and inducing markers
    (reference: utils/visualisation.py:27-52)."""
    import matplotlib.pyplot as plt
    fig, ax = (ax.figure, ax) if ax is not None else plt.subplots()
    xs = np.asarray(X_test).ravel()
    order = np.argsort(xs)
    m = np.asarray(mean)[order]
    s = np.sqrt(np.asarray(var))[order]
    ax.plot(xs[order], m, "b-", label=label)
    ax.fill_between(xs[order], m - 1.96 * s, m + 1.96 * s, color="b",
                    alpha=0.2, label="95% CI")
    if X is not None:
        plot_train_data(X, y, ax=ax)
    if Z is not None:
        zs = np.asarray(Z).ravel()
        ax.plot(zs, np.full_like(zs, ax.get_ylim()[0]), "r^", ms=5,
                label="inducing")
    ax.legend(fontsize=7)
    _save(fig, filename)
    return ax


def plot_mixture_posterior(X_test, means, vars_, X=None, y=None, Z=None,
                           ax=None, filename: Optional[str] = None,
                           show_components: int = 30):
    """Mixture sample fan + empirical 95% interval
    (reference: utils/visualisation.py:12-24)."""
    import matplotlib.pyplot as plt
    fig, ax = (ax.figure, ax) if ax is not None else plt.subplots()
    xs = np.asarray(X_test).ravel()
    order = np.argsort(xs)
    means = np.asarray(means)
    vars_ = np.asarray(vars_)
    for m in means[:show_components]:
        ax.plot(xs[order], m[order], color="gray", alpha=0.15, lw=0.7)
    mix_mean, _ = get_posterior_predictive_means_stds(means, vars_)
    lo, hi = get_posterior_predictive_uncertainty_intervals(
        means, vars_, are_vars=True)
    mix_mean, lo, hi = (np.asarray(a) for a in (mix_mean, lo, hi))
    ax.plot(xs[order], mix_mean[order], "b-", label="mixture mean")
    ax.fill_between(xs[order], lo[order], hi[order], color="b", alpha=0.15,
                    label="95% mixture CI")
    if X is not None:
        plot_train_data(X, y, ax=ax)
    if Z is not None:
        zs = np.asarray(Z).ravel()
        ax.plot(zs, np.full_like(zs, ax.get_ylim()[0]), "r^", ms=5)
    ax.legend(fontsize=7)
    _save(fig, filename)
    return ax
