"""Mauna Loa CO2 data loading (reference: load_co2_dataset,
experiments/co2_baseline.py:40-68).

Reads ``data/co2/mauna.txt`` (decimal-year, ppm columns) when available.
This environment has no egress, so when the file is absent we fall back to a
clearly-labelled synthetic CO2 curve with the same structure (quadratic
trend + seasonal cycle + short-term noise, monthly 1958-2015) so the CO2
experiments remain runnable end-to-end.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from ggp_tpu.config import DATASET_DIR

MAUNA_PATH = os.path.join(DATASET_DIR, "co2", "mauna.txt")

# reference's year -> row-index split dict spans 1990..2010
# (experiments/co2_baseline.py:55-68)
DEFAULT_SPLIT_YEAR = 2003


def _synthetic_mauna(seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(1958.0, 2015.0, 1.0 / 12.0)
    dt = t - 1958.0
    ppm = (315.0 + 0.8 * dt + 0.0125 * dt ** 2
           + 2.8 * np.sin(2 * np.pi * t + 0.4)
           + 0.6 * np.sin(4 * np.pi * t + 1.3)
           + 0.25 * rng.normal(size=t.shape))
    return np.stack([t, ppm], axis=1)


def load_co2_dataset(year_split: int = DEFAULT_SPLIT_YEAR,
                     normalize: bool = True):
    """Returns (X_train, y_train, X_test, y_test, y_mean, y_std, is_synthetic).

    X is the decimal year (N, 1); the split keeps everything before
    ``year_split`` for training, the rest for extrapolation testing
    (reference: experiments/co2_baseline.py:55-68).
    """
    if os.path.exists(MAUNA_PATH):
        raw = np.loadtxt(MAUNA_PATH)
        is_synthetic = False
    else:
        raw = _synthetic_mauna()
        is_synthetic = True
    t, ppm = raw[:, 0], raw[:, 1]
    keep = ppm > 0            # mauna.txt uses negative sentinels for missing
    t, ppm = t[keep], ppm[keep]

    if normalize:
        y_mean, y_std = float(ppm.mean()), float(ppm.std())
    else:
        y_mean, y_std = 0.0, 1.0
    y = (ppm - y_mean) / y_std
    # centre the time axis but keep 1 unit = 1 year so the fixed seasonal
    # period of 1.0 stays meaningful (reference pins period=1 year,
    # experiments/co2_baseline.py:93-94)
    t0 = t.mean()
    x = t - t0

    tr = t < year_split
    return (x[tr, None], y[tr], x[~tr, None], y[~tr], y_mean, y_std,
            is_synthetic)
