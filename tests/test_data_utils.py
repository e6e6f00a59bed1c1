"""Dataset framework, experiment tools, posterior-predictive utilities."""

import numpy as np
import jax.numpy as jnp
import pytest

from ggp_tpu.utils.datasets import (
    Dataset, get_classification_data, get_regression_data, normalize,
    regression_datasets,
)
from ggp_tpu.utils.experiment_tools import (
    ExperimentName, dump_experiment_json, experiment_name, get_dataset_class,
)
from ggp_tpu.utils.posterior_predictive import (
    get_posterior_predictive_means_stds,
    get_posterior_predictive_uncertainty_intervals,
    log_predictive_mixture_density,
)


def test_normalize():
    A = np.array([[1.0, 10.0], [3.0, 30.0]])
    An, m, s = normalize(A)
    np.testing.assert_allclose(An.mean(0), 0.0, atol=1e-12)
    np.testing.assert_allclose(An.std(0), 1.0, rtol=1e-4)


def test_registry_has_uci_names():
    for name in ["boston", "concrete", "energy", "winered", "winewhite",
                 "yacht", "kin8nm", "naval", "power", "protein", "elevators"]:
        assert name in regression_datasets


def test_missing_uci_file_raises_cleanly():
    with pytest.raises(FileNotFoundError, match="no network egress"):
        get_regression_data("boston")


def test_download_path_mocked(tmp_path, monkeypatch):
    """GGP_ALLOW_DOWNLOAD=1 restores the reference's auto-fetch
    (reference utils/dataset.py:96-117): plain files land at datapath,
    archive URLs (.zip here) are extracted in place. urlopen is mocked —
    this sandbox has zero egress; outside it the real-data suite
    self-activates once files land."""
    import io
    import urllib.request
    import zipfile

    import ggp_tpu.utils.datasets as ds

    monkeypatch.setattr(ds, "DATASET_DIR", str(tmp_path))
    monkeypatch.setenv("GGP_ALLOW_DOWNLOAD", "1")
    csv_bytes = b"1.0,2.0,3.0\n4.0,5.0,6.0\n"
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("inner.csv", csv_bytes.decode())
    payloads = {
        "http://example.test/plain.csv": csv_bytes,
        "http://example.test/bundle.zip": zbuf.getvalue(),
    }
    fetched = []

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, *a, **k):
        fetched.append(url)
        return _Resp(payloads[url])

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)

    class Plain(ds.Dataset):
        name, filename = "plainds", "plain.csv"
        url = "http://example.test/plain.csv"

        def read_data(self):
            data = self._load_csv(self._require_file(), header=None)
            return data[:, :-1], data[:, -1]

    class Zipped(Plain):
        name, filename = "zipds", "inner.csv"
        url = "http://example.test/bundle.zip"

    p = Plain()
    assert fetched == ["http://example.test/plain.csv"]
    assert p.N == 2 and p.D == 2
    z = Zipped()
    assert fetched[-1] == "http://example.test/bundle.zip"
    assert z.N == 2 and z.D == 2
    # cached: a second construction re-reads the file, no re-fetch
    n_fetch = len(fetched)
    Plain()
    assert len(fetched) == n_fetch
    # and default-off: without the env gate a missing file still raises
    monkeypatch.delenv("GGP_ALLOW_DOWNLOAD")

    class Plain2(Plain):
        name = "plainds2"

    with pytest.raises(FileNotFoundError, match="GGP_ALLOW_DOWNLOAD"):
        Plain2()


def test_synthetic_dataset_split_seeding():
    """Same split index => identical split; different => different
    (reference seeding BASE_SEED+split, utils/dataset.py:62-63)."""
    a = get_regression_data("synthetic-small", split=3)
    b = get_regression_data("synthetic-small", split=3)
    c = get_regression_data("synthetic-small", split=4)
    np.testing.assert_array_equal(a.X_train, b.X_train)
    assert not np.array_equal(a.X_train, c.X_train)
    assert a.X_train.shape[0] == int(0.8 * a.N)
    # normalized
    full = np.concatenate([a.X_train, a.X_test])
    np.testing.assert_allclose(full.mean(0), 0.0, atol=1e-6)
    assert a.Y_std > 0


def test_banana_classification():
    d = get_classification_data("synthetic-banana")
    assert set(np.unique(d.Y_train)) == {0.0, 1.0}
    assert d.X_train.shape[1] == 2


def test_experiment_name_builder():
    n = experiment_name("SGPR", "boston", split_index=2, M=100, max_iters=2000,
                        seed=45)
    assert n == "boston_model-SGPR_split-2_M-100_max_iters-2000_seed-45"
    assert ExperimentName("x").add("a", 1).get() == "x_a-1"
    assert get_dataset_class("boston").name == "boston"


def test_dump_experiment_json(tmp_path, monkeypatch):
    import ggp_tpu.utils.experiment_tools as et
    monkeypatch.setattr(et, "LOG_DIR", str(tmp_path))
    p = dump_experiment_json("run1", {"rmse": 0.5, "nlpd": jnp.asarray(1.25)})
    import json
    with open(p) as f:
        d = json.load(f)
    assert d["nlpd"] == 1.25


def test_mixture_moments_and_intervals():
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.normal(size=(20, 15)))
    vars_ = jnp.asarray(rng.uniform(0.1, 0.5, size=(20, 15)))
    mix_mean, mix_std = get_posterior_predictive_means_stds(means, vars_)
    np.testing.assert_allclose(np.asarray(mix_mean), np.asarray(means).mean(0),
                               rtol=1e-6)
    lo, hi = get_posterior_predictive_uncertainty_intervals(
        means, vars_, are_vars=True, num_draws=4000)
    assert np.all(np.asarray(lo) < np.asarray(hi))
    # ~95% of fresh mixture draws should fall inside
    comp = rng.integers(0, 20, size=(2000, 15))
    draws = np.take_along_axis(np.asarray(means), comp, 0) + \
        rng.normal(size=(2000, 15)) * np.sqrt(np.take_along_axis(np.asarray(vars_), comp, 0))
    cover = ((draws > np.asarray(lo)) & (draws < np.asarray(hi))).mean()
    assert 0.92 < cover < 0.97
    lp = log_predictive_mixture_density(means, vars_, jnp.zeros(15))
    assert lp.shape == (15,)


def test_coal_and_pines_poisson_datasets():
    """Point-process datasets for the log-Cox Poisson likelihood
    (reference: utils/dataset.py:236-253)."""
    coal = get_regression_data("coal")
    assert coal.X_train.shape[1] == 1
    full_y = np.concatenate([coal.Y_train, coal.Y_test])
    assert (full_y >= 0).all() and full_y.max() > 1   # counts
    pines = get_regression_data("pines")
    assert pines.X_train.shape[1] == 2
    assert pines.N == 16 * 16


def test_delgado_registry():
    from ggp_tpu.utils.datasets import DelgadoClassification, classification_datasets
    assert "ionosphere" in classification_datasets
    assert len(classification_datasets) > 20
    with pytest.raises(FileNotFoundError):
        classification_datasets["ionosphere"]()
    extra = DelgadoClassification.from_name("my-extra")
    assert "my-extra" in classification_datasets


def test_delgado_registry_full():
    """The classification registry carries the reference's full table
    (116 entries, utils/dataset.py:324-441) plus the synthetic stand-in."""
    from ggp_tpu.utils.datasets import (_DELGADO_TABLE,
                                        classification_datasets)
    assert len(_DELGADO_TABLE) == 116
    assert len(classification_datasets) >= 117
    # spot-check (name, N, D, K) rows against the reference table
    tbl = {t[0]: t for t in _DELGADO_TABLE}
    assert tbl["iris"] == ("iris", 150, 5, 3)
    assert tbl["banana"] == ("banana", 5300, 2, 3)
    assert tbl["arrhythmia"][1:] == (452, 263, 13)


def test_delgado_archive_layouts(tmp_path, monkeypatch):
    """All three reference archive layouts parse (utils/dataset.py:304-322):
    nested <name>_R.dat, pre-split train/test, and banana.csv with -1->0."""
    import ggp_tpu.utils.datasets as ds
    monkeypatch.setattr(ds, "DATASET_DIR", str(tmp_path))
    root = tmp_path / "delgado"

    def table(n, d, k, header=True):
        rng = np.random.default_rng(n + d)
        rows = []
        if header:
            rows.append("\t".join([f"f{i}" for i in range(d - 1)] + ["clase"]))
        for i in range(n):
            vals = list(rng.normal(size=d - 1).round(4)) + [i % k + 1]
            rows.append("\t".join(str(v) for v in vals))
        return "\n".join(rows) + "\n"

    # 1) nested single-file layout (iris: 150 x 5, 3 classes)
    (root / "iris").mkdir(parents=True)
    (root / "iris" / "iris_R.dat").write_text(table(150, 5, 3))
    d = ds.get_classification_data("iris", split=0)
    assert d.X_train.shape[1] == 4
    assert d.N == 150
    # X z-scored over the FULL data before splitting (reference
    # Classification.preprocess_data, utils/dataset.py:275-277)
    Xall = np.concatenate([d.X_train, d.X_test])
    assert np.allclose(Xall.mean(0), 0, atol=1e-6)
    assert np.allclose(Xall.std(0), 1, atol=1e-3)
    assert set(np.unique(d.Y_train)) <= {1.0, 2.0, 3.0}     # Y untouched

    # 2) pre-split train/test layout (monks-1: 556 x 7)
    (root / "monks-1").mkdir()
    (root / "monks-1" / "monks-1_train_R.dat").write_text(table(400, 7, 2))
    (root / "monks-1" / "monks-1_test_R.dat").write_text(table(156, 7, 2))
    d2 = ds.get_classification_data("monks-1", split=0)
    assert d2.N == 556 and d2.X_train.shape[1] == 6

    # 3) banana.csv with -1 labels mapped to 0 (utils/dataset.py:305-308)
    (root / "banana").mkdir()
    rng = np.random.default_rng(0)
    lines = ["x1,x2,label"]
    for i in range(5300):
        lines.append(f"{rng.normal():.4f},{rng.normal():.4f},"
                     f"{-1 if i % 2 else 1}")
    (root / "banana" / "banana.csv").write_text("\n".join(lines) + "\n")
    d3 = ds.get_classification_data("banana", split=0)
    assert d3.N == 5300
    assert set(np.unique(d3.Y_train)) == {0.0, 1.0}
