"""Real-data loading + NLPD-parity golden tests (skipped until files exist).

Drop the files listed in data/MANIFEST.md and these activate: shape/semantics
checks against the reference loaders (utils/dataset.py:128-272) and SGPR NLPD
parity against the published benchmarks (benchmarks_nlpd_main.csv:1-6).
Also exercises the pandas-free fast_table path on the REAL file formats —
including Boston's fixed-width housing.data (the reference parses it with
``read_fwf``, utils/dataset.py:131; whitespace-run splitting is equivalent
because no field in the file abuts its neighbour).
"""

import os

import numpy as np
import pytest

from ggp_tpu.config import DATASET_DIR
from ggp_tpu.utils.datasets import (get_regression_data,
                                    regression_datasets)

# (name, expected N, expected D after drops) — reference utils/dataset.py
_SHAPES = {
    "boston": (506, 13),
    "concrete": (1030, 8),
    "energy": (768, 8),
    "winered": (1599, 11),
    "yacht": (308, 6),
    "kin8nm": (8192, 8),
    "power": (9568, 4),
    "protein": (45730, 9),
    "naval": (11934, 14),
    "winewhite": (4898, 11),
}

# SGPR ML-II test NLPD, mean ± stderr over 10 splits
# (/root/reference/benchmarks_nlpd_main.csv:1-6)
_GOLDEN_SGPR_NLPD = {
    "boston": (2.539, 0.040),
    "concrete": (3.097, 0.014),
    "energy": (0.670, 0.014),
    "winered": (0.961, 0.014),
    "yacht": (0.494, 0.150),
}


def _have(name):
    cls = regression_datasets.get(name)
    if cls is None:
        return False
    path = os.path.join(DATASET_DIR, name, getattr(cls, "filename", ""))
    return os.path.exists(path)


@pytest.mark.parametrize("name", sorted(_SHAPES))
def test_real_dataset_shapes_and_split_semantics(name):
    if not _have(name):
        pytest.skip(f"{name}: drop the file per data/MANIFEST.md to enable")
    d0 = get_regression_data(name, split=0, prop=0.8)
    N, D = _SHAPES[name]
    assert d0.N == N and d0.D == D, (d0.N, d0.D)
    n_train = int(0.8 * N)
    assert d0.X_train.shape == (n_train, D)
    assert d0.X_test.shape[0] == N - n_train
    # normalization: X z-scored over the full data before splitting
    # (reference utils/dataset.py:38-41,122-125)
    Xall = np.concatenate([d0.X_train, d0.X_test])
    assert np.allclose(Xall.mean(0), 0.0, atol=1e-5)
    assert np.allclose(Xall.std(0), 1.0, atol=1e-3)
    # split seeding: BASE_SEED+split shuffles reproducibly and differs by split
    d0b = get_regression_data(name, split=0, prop=0.8)
    assert np.allclose(d0.X_train, d0b.X_train)
    d1 = get_regression_data(name, split=1, prop=0.8)
    assert not np.allclose(d0.Y_train, d1.Y_train)


def test_boston_whitespace_parse_matches_pandas(tmp_path):
    """fast_table's whitespace mode parses the real housing.data fixed-width
    layout identically to pandas (and to the reference's read_fwf values).
    Runs against a format-exact snippet so it works without the real file."""
    snippet = (
        " 0.00632  18.00   2.310  0  0.5380  6.5750  65.20  4.0900   1"
        "  296.0  15.30 396.90   4.98  24.00\n"
        " 0.02731   0.00   7.070  0  0.4690  6.4210  78.90  4.9671   2"
        "  242.0  17.80 396.90   9.14  21.60\n"
        " 9.14136 100.00  18.100  1  0.7000  6.2000 100.00  1.1742  24"
        "  666.0  20.20  27.74  10.63  50.00\n")
    p = tmp_path / "housing.data"
    p.write_text(snippet)
    import pandas as pd

    from ggp_tpu.runtime import fast_csv
    a = fast_csv.read(str(p), header=None, sep=r"\s+")
    b = pd.read_csv(str(p), header=None, sep=r"\s+").values
    assert a.shape == (3, 14) == b.shape
    np.testing.assert_allclose(a, b)
    assert a[0, -1] == 24.00 and a[2, 8] == 24


@pytest.mark.parametrize("name", sorted(_GOLDEN_SGPR_NLPD))
def test_sgpr_nlpd_parity(name):
    """Golden NLPD parity vs benchmarks_nlpd_main.csv (SGPR column): 3-split
    mean within 4 combined standard errors of the published 10-split mean."""
    if not _have(name):
        pytest.skip(f"{name}: drop the file per data/MANIFEST.md to enable")
    import jax
    import jax.numpy as jnp

    from ggp_tpu.models import SparseGPR
    from ggp_tpu.utils.metrics import nlpd

    golden_mean, golden_se = _GOLDEN_SGPR_NLPD[name]
    vals = []
    for split in range(3):
        data = get_regression_data(name, split=split, prop=0.8)
        X = jnp.asarray(data.X_train, jnp.float32)
        y = jnp.asarray(data.Y_train, jnp.float32)
        rng = np.random.RandomState(45)
        Z = X[rng.randint(0, X.shape[0], min(100, X.shape[0]))]
        m = SparseGPR(X, y, Z_init=Z)
        m.train_model(max_steps=2000, verbose=False)
        mean, var = m.posterior_predictive(jnp.asarray(data.X_test, jnp.float32),
                                           full_cov=False)
        vals.append(float(nlpd(mean, var, jnp.asarray(data.Y_test, jnp.float32),
                               data.Y_std)))
    ours = float(np.mean(vals))
    se = float(np.hypot(golden_se, np.std(vals) / np.sqrt(len(vals)) + 1e-9))
    assert abs(ours - golden_mean) < 4.0 * se + 0.05, \
        f"{name}: ours {ours:.3f} vs golden {golden_mean:.3f}±{golden_se:.3f}"
