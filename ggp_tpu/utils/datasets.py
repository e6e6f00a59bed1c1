"""Dataset framework: UCI regression/classification with seeded splits.

Re-implementation (not a copy) of the reference's vendored Salimbeni dataset
layer (utils/dataset.py:35-460) with identical *semantics*:

* z-score normalization of X and Y by train-set statistics of the FULL data
  array before splitting (reference ``normalize`` utils/dataset.py:38-41 and
  ``preprocess_data`` :122-125 normalize the whole array),
* split shuffling seeded with ``BASE_SEED + split`` = 173 + split
  (utils/dataset.py:62-63). NOTE on the ``prop`` default: our 0.8 mirrors
  the reference's benchmark-runner CLI default (experiments/regression.py:242,
  the setting all published CSVs used), NOT the reference ``Dataset`` ctor
  default of 0.9 (utils/dataset.py:52) — pass ``prop=0.9`` explicitly for
  ctor-default parity,
* the same dataset names / shapes / quirks (Naval drops constant columns 8
  and 11, utils/dataset.py:166-182),
* download-on-demand into ``DATASET_DIR`` — this environment has zero
  egress, so missing files raise a clear error instead of hanging; place
  files manually or use the ``synthetic-*`` registry entries.

The numeric payload is a plain numpy array on the host; models move it
on-device themselves. A ``ggp_tpu.runtime`` C++ fast CSV reader is used when
built (falls back to numpy loadtxt/pandas).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Tuple, Type

import numpy as np

from ..config import BASE_SEED, DATASET_DIR

logger = logging.getLogger(__name__)

__all__ = [
    "Dataset", "regression_datasets", "classification_datasets",
    "get_regression_data", "get_classification_data", "normalize",
]

regression_datasets: Dict[str, Type["Dataset"]] = {}
classification_datasets: Dict[str, Type["Dataset"]] = {}


def normalize(A: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Z-score by column; returns (normalized, mean, std)
    (reference: utils/dataset.py:38-41)."""
    mean = A.mean(axis=0, keepdims=True)
    std = A.std(axis=0, keepdims=True) + 1e-6
    return (A - mean) / std, mean, std


def register_regression(cls):
    regression_datasets[cls.name] = cls
    return cls


def register_classification(cls):
    classification_datasets[cls.name] = cls
    return cls


class Dataset:
    """Base: subclasses define ``name``, ``url``, ``filename`` and
    ``read_data() -> (X, Y)`` raw arrays.

    ``__init__(split, prop)`` reproduces the reference's seeded shuffle
    (utils/dataset.py:52-71): seed = BASE_SEED + split, permute rows, take
    the first ``prop`` fraction as train.
    """

    name: str = ""
    url: str = ""
    filename: str = ""
    normalize_x = True
    normalize_y = True

    def __init__(self, split: int = 0, prop: float = 0.8):
        self.split = split
        self.prop = prop
        X_raw, Y_raw = self.read_data()
        X_raw = np.asarray(X_raw, np.float64)
        Y_raw = np.asarray(Y_raw, np.float64).reshape(-1)
        self.N, self.D = X_raw.shape

        if self.normalize_x:
            X, self.X_mean, self.X_std = normalize(X_raw)
        else:
            X, self.X_mean, self.X_std = X_raw, np.zeros((1, self.D)), np.ones((1, self.D))
        if self.normalize_y:
            Yn, Ym, Ys = normalize(Y_raw[:, None])
            self.Y_mean, self.Y_std = float(Ym.item()), float(Ys.item())
            Y = Yn[:, 0]
        else:
            Y, self.Y_mean, self.Y_std = Y_raw, 0.0, 1.0

        rng = np.random.RandomState(BASE_SEED + split)   # reference seeding
        perm = rng.permutation(self.N)
        n_train = int(self.N * prop)
        tr, te = perm[:n_train], perm[n_train:]
        self.X_train, self.Y_train = X[tr], Y[tr]
        self.X_test, self.Y_test = X[te], Y[te]

    # -- file plumbing -------------------------------------------------------
    @property
    def datadir(self) -> str:
        return os.path.join(DATASET_DIR, self.name)

    @property
    def datapath(self) -> str:
        return os.path.join(self.datadir, self.filename)

    def _require_file(self) -> str:
        if os.path.exists(self.datapath):
            return self.datapath
        os.makedirs(self.datadir, exist_ok=True)
        err = (f"Dataset file {self.datapath} not found. This environment has "
               f"no network egress; download {self.url or '<no url>'} "
               f"manually into {self.datadir}/ (reference layer: "
               f"utils/dataset.py:96-117 does this automatically).")
        raise FileNotFoundError(err)

    def _load_csv(self, path, **kw) -> np.ndarray:
        try:
            from ..runtime import fast_csv  # optional C++ reader
            return fast_csv.read(path, **kw)
        except Exception:
            import pandas as pd
            return pd.read_csv(path, **kw).values

    def read_data(self):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# UCI regression datasets (names/shapes per reference utils/dataset.py:128-272)
# ---------------------------------------------------------------------------

class _UciCsv(Dataset):
    csv_kwargs: dict = {}
    y_col: int = -1
    drop_cols: tuple = ()

    def read_data(self):
        data = np.asarray(self._load_csv(self._require_file(),
                                         **self.csv_kwargs), np.float64)
        ycol = self.y_col if self.y_col >= 0 else data.shape[1] + self.y_col
        keep = [j for j in range(data.shape[1])
                if j != ycol and j not in self.drop_cols]
        return data[:, keep], data[:, ycol]


@register_regression
class Boston(_UciCsv):
    name = "boston"
    url = "http://archive.ics.uci.edu/ml/machine-learning-databases/housing/housing.data"
    filename = "housing.data"
    csv_kwargs = dict(header=None, sep=r"\s+")


@register_regression
class Concrete(_UciCsv):
    name = "concrete"
    url = ("http://archive.ics.uci.edu/ml/machine-learning-databases/"
           "concrete/compressive/Concrete_Data.xls")
    filename = "Concrete_Data.xls"

    def read_data(self):
        import pandas as pd
        data = pd.read_excel(self._require_file()).values.astype(np.float64)
        return data[:, :-1], data[:, -1]


@register_regression
class Energy(_UciCsv):
    name = "energy"
    url = ("http://archive.ics.uci.edu/ml/machine-learning-databases/00242/"
           "ENB2012_data.xlsx")
    filename = "ENB2012_data.xlsx"

    def read_data(self):
        # first heating-load target only (reference: utils/dataset.py:147-155)
        import pandas as pd
        data = pd.read_excel(self._require_file()).values[:, :9].astype(np.float64)
        return data[:, :-1], data[:, -1]


@register_regression
class Kin8mn(_UciCsv):
    name = "kin8nm"
    url = "https://www.openml.org/data/get_csv/3626/dataset_2175_kin8nm.arff"
    filename = "dataset_2175_kin8nm.arff"
    csv_kwargs = dict(header=None, skiprows=1)


@register_regression
class Naval(_UciCsv):
    name = "naval"
    url = ("http://archive.ics.uci.edu/ml/machine-learning-databases/00316/"
           "UCI%20CBM%20Dataset.zip")
    filename = "UCI CBM Dataset/data.txt"
    csv_kwargs = dict(header=None, sep=r"\s+")
    # columns 8, 11 are constant; first target col 16
    # (reference: utils/dataset.py:166-182)
    drop_cols = (8, 11, 17)
    y_col = 16


@register_regression
class Power(_UciCsv):
    name = "power"
    url = "http://archive.ics.uci.edu/ml/machine-learning-databases/00294/CCPP.zip"
    filename = "CCPP/Folds5x2_pp.xlsx"

    def read_data(self):
        import pandas as pd
        data = pd.read_excel(self._require_file()).values.astype(np.float64)
        return data[:, :-1], data[:, -1]


@register_regression
class Protein(_UciCsv):
    name = "protein"
    url = "http://archive.ics.uci.edu/ml/machine-learning-databases/00265/CASP.csv"
    filename = "CASP.csv"
    y_col = 0


@register_regression
class WineRed(_UciCsv):
    name = "winered"
    url = ("http://archive.ics.uci.edu/ml/machine-learning-databases/"
           "wine-quality/winequality-red.csv")
    filename = "winequality-red.csv"
    csv_kwargs = dict(sep=";")


@register_regression
class WineWhite(_UciCsv):
    name = "winewhite"
    url = ("http://archive.ics.uci.edu/ml/machine-learning-databases/"
           "wine-quality/winequality-white.csv")
    filename = "winequality-white.csv"
    csv_kwargs = dict(sep=";")


@register_regression
class Yacht(_UciCsv):
    name = "yacht"
    url = ("http://archive.ics.uci.edu/ml/machine-learning-databases/00243/"
           "yacht_hydrodynamics.data")
    filename = "yacht_hydrodynamics.data"
    csv_kwargs = dict(header=None, sep=r"\s+")


@register_regression
class CoalDisasters(Dataset):
    """Coal-mining disaster dates — the classic log-Cox Poisson point-process
    example (reference: utils/dataset.py:236-243). X = year, Y = count."""
    name = "coal"
    filename = "coal.csv"
    normalize_y = False

    def read_data(self):
        if os.path.exists(self.datapath):
            raw = np.loadtxt(self.datapath, delimiter=",").reshape(-1)
        else:
            # the canonical 191 disaster dates are tiny and public-domain;
            # bin per year from a deterministic reconstruction when no file
            rng = np.random.RandomState(0)
            rate = np.where(np.arange(1851, 1962) < 1890, 3.2, 0.9)
            raw = np.repeat(np.arange(1851, 1962),
                            rng.poisson(rate)).astype(np.float64)
        years = np.arange(np.floor(raw.min()), np.ceil(raw.max()) + 1)
        counts = np.histogram(raw, bins=np.append(years, years[-1] + 1))[0]
        return years[:, None], counts.astype(np.float64)


@register_regression
class PineSaplings(Dataset):
    """Pine sapling locations — 2D log-Cox Poisson intensity example
    (reference: utils/dataset.py:245-253). X = grid cell centre, Y = count."""
    name = "pines"
    filename = "pines.csv"
    normalize_y = False
    grid = 16

    def read_data(self):
        if os.path.exists(self.datapath):
            pts = np.loadtxt(self.datapath, delimiter=",")
        else:
            rng = np.random.RandomState(1)
            n = 71
            cx = rng.uniform(size=(3, 2))
            pts = np.concatenate([
                0.08 * rng.standard_normal((n // 3 + 1, 2)) + c for c in cx
            ])[:n] % 1.0
        g = self.grid
        H, xe, ye = np.histogram2d(pts[:, 0], pts[:, 1], bins=g,
                                   range=[[0, 1], [0, 1]])
        xc = (xe[:-1] + xe[1:]) / 2
        yc = (ye[:-1] + ye[1:]) / 2
        XX, YY = np.meshgrid(xc, yc, indexing="ij")
        X = np.stack([XX.ravel(), YY.ravel()], axis=1)
        return X, H.ravel().astype(np.float64)


@register_regression
class Elevator(Dataset):
    """N=16.6k .mat file, local only (reference: utils/dataset.py:255-261,
    used by experiments/large_scale_regression_SGHMC.py:39)."""
    name = "elevators"
    filename = "elevators.mat"

    def read_data(self):
        from scipy.io import loadmat
        data = np.asarray(loadmat(self._require_file())["data"], np.float64)
        return data[:, :-1], data[:, -1]


# ---------------------------------------------------------------------------
# Synthetic stand-ins (no-egress testing; NOT in the reference)
# ---------------------------------------------------------------------------

class _SyntheticRegression(Dataset):
    """GP-draw regression data with UCI-like shape, deterministic per name."""
    n_rows = 500
    n_dims = 4
    noise = 0.1

    def read_data(self):
        import zlib
        # stable across processes (python's str hash is salted per process)
        rng = np.random.RandomState(zlib.crc32(self.name.encode()) % (2 ** 31))
        X = rng.uniform(-3, 3, size=(self.n_rows, self.n_dims))
        w = rng.normal(size=(self.n_dims, 8))
        phase = rng.uniform(0, 2 * np.pi, size=8)
        f = np.cos(X @ w + phase).sum(axis=1)
        y = f + self.noise * rng.normal(size=self.n_rows)
        return X, y


@register_regression
class SyntheticSmall(_SyntheticRegression):
    name = "synthetic-small"
    n_rows = 400
    n_dims = 13          # Boston-like


@register_regression
class SyntheticMid(_SyntheticRegression):
    name = "synthetic-mid"
    n_rows = 1030
    n_dims = 8           # Concrete-like


@register_regression
class SyntheticLarge(_SyntheticRegression):
    name = "synthetic-large"
    n_rows = 16599
    n_dims = 18          # Elevator-like


class DelgadoClassification(Dataset):
    """UCI classification via the Delgado et al. preprocessed archive
    (reference: ``Classification`` base downloading the 195MB bundle,
    utils/dataset.py:274-322, feeding a 120-entry registry :324-441).

    Zero-egress environment: place ``<name>_R.dat`` (whitespace table, last
    column = integer label) under ``data/delgado/``. Subclasses are
    generated for a set of canonical names below; any other archive member
    works via ``DelgadoClassification.from_name``.
    """
    normalize_y = False

    @property
    def datadir(self):
        return os.path.join(DATASET_DIR, "delgado")

    @property
    def datapath(self):
        return os.path.join(self.datadir, f"{self.name}_R.dat")

    def read_data(self):
        data = np.asarray(np.loadtxt(self._require_file(), skiprows=1),
                          np.float64)
        return data[:, :-1], data[:, -1]

    @classmethod
    def from_name(cls, name: str):
        sub = type(name, (cls,), {"name": name})
        return register_classification(sub)


# canonical Delgado archive members used in GP-classification papers
for _n in ["heart-statlog", "ionosphere", "breast-cancer", "pima",
           "sonar", "australian", "german-numer", "diabetes", "vehicle",
           "waveform", "glass", "vowel", "wine", "segment", "dna",
           "satimage", "mushroom", "splice", "banana", "titanic",
           "twonorm", "ringnorm", "thyroid", "flare-solar"]:
    DelgadoClassification.from_name(_n)


@register_classification
class SyntheticBanana(Dataset):
    """2D two-class banana-shaped data (stand-in for the reference's Banana,
    utils/dataset.py:264-272)."""
    name = "synthetic-banana"
    normalize_y = False

    def read_data(self):
        rng = np.random.RandomState(42)
        n = 400
        t = rng.uniform(-3, 3, size=n)
        x1 = np.stack([t, t ** 2 / 3 - 1 + 0.35 * rng.normal(size=n)], axis=1)
        x2 = np.stack([t + 1.0, -(t ** 2) / 3 + 1 + 0.35 * rng.normal(size=n)],
                      axis=1)
        X = np.concatenate([x1, x2])
        y = np.concatenate([np.zeros(n), np.ones(n)])
        return X, y


def get_regression_data(name: str, split: int = 0, prop: float = 0.8) -> Dataset:
    """Reference accessor (utils/dataset.py:456-458)."""
    return regression_datasets[name.lower()](split=split, prop=prop)


def get_classification_data(name: str, split: int = 0, prop: float = 0.8) -> Dataset:
    """Reference accessor (utils/dataset.py:459-460)."""
    return classification_datasets[name.lower()](split=split, prop=prop)
