"""Fast smoke tests of the experiment layer (tiny configs) — protects the
driver scripts from API drift."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "experiments"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_regression_single_run_sgpr(tmp_path, monkeypatch):
    import ggp_tpu.utils.experiment_tools as et
    monkeypatch.setattr(et, "LOG_DIR", str(tmp_path))
    from regression import single_run
    r = single_run("synthetic-small", 0, "SGPR", max_iters=100, verbose=False)
    assert np.isfinite(r["test_rmse"]) and np.isfinite(r["test_nlpd"])


@pytest.mark.slow
def test_regression_single_run_fixedz(tmp_path, monkeypatch):
    import ggp_tpu.utils.experiment_tools as et
    monkeypatch.setattr(et, "LOG_DIR", str(tmp_path))
    from regression import single_run
    r = single_run("synthetic-small", 1, "BayesianSGPR_HMC_FixedZ", tune=50,
                   num_samples=20, num_chains=1, verbose=False)
    assert np.isfinite(r["test_nlpd"])
    assert r["sampling_s"] > 0


def test_demo_1d_gap_data():
    from demo_1d_regression import make_gap_data
    X, y, Xt, ft = make_gap_data(n=50)
    # the gap: no train inputs in (-1.5, 1.5)
    xs = np.asarray(X).ravel()
    assert not np.any((xs > -1.4) & (xs < 1.4))


def test_co2_loader_split():
    from co2_data import load_co2_dataset
    Xtr, ytr, Xte, yte, ym, ys, synth = load_co2_dataset(2003)
    assert synth  # no mauna.txt in this env
    assert Xtr.shape[0] + Xte.shape[0] > 600
    assert Xte.shape[0] > 100
    # train strictly precedes test in time
    assert Xtr.max() < Xte.min()


def test_aggregate_results_roundtrip(tmp_path, monkeypatch):
    import ggp_tpu.utils.experiment_tools as et
    import aggregate_results as ar
    monkeypatch.setattr(et, "LOG_DIR", str(tmp_path))
    monkeypatch.setattr(ar, "LOG_DIR", str(tmp_path))
    from regression import single_run
    for split in (0, 1):
        single_run("synthetic-small", split, "SGPR", max_iters=60,
                   verbose=False)
    df = ar.load_runs()
    assert len(df) == 2
    agg = ar.aggregate(df)
    assert agg.iloc[0]["n"] == 2
    assert np.isfinite(agg.iloc[0]["nlpd_se"])


@pytest.mark.slow
def test_trace_summary_csv_all_hmc_models(tmp_path, monkeypatch):
    """Every sampler-backed model writes a per-run trace CSV with
    ESS/R-hat/divergences per hyper (reference writes pm.summary CSVs for
    every HMC run, experiments/regression.py:192-195)."""
    import os

    import ggp_tpu.utils.experiment_tools as et
    monkeypatch.setattr(et, "LOG_DIR", str(tmp_path))
    from regression import single_run
    for split, model in [(0, "GPR_HMC"), (0, "JointHMC")]:
        r = single_run("synthetic-small", split, model, tune=40,
                       num_samples=16, num_chains=1, verbose=False)
        assert "trace_summary" in r, model
        ts = r["trace_summary"]
        hyper_rows = [k for k in ts if not k.startswith("_")]
        assert hyper_rows, model
        for k in hyper_rows:
            assert np.isfinite(ts[k]["ess"]), (model, k)
        assert "_diverging" in ts
        csvs = [f for f in os.listdir(os.path.join(str(tmp_path), os.listdir(str(tmp_path))[0]))
                if f.endswith("_trace.csv")]
        assert csvs, model
        txt = open(os.path.join(str(tmp_path), os.listdir(str(tmp_path))[0], csvs[0])).read()
        assert txt.startswith("param,mean,sd,ess,rhat")


@pytest.mark.slow
def test_demo_2d_regression_tiny(tmp_path, monkeypatch):
    import ggp_tpu.config as cfg
    monkeypatch.setattr(cfg, "RESULTS_DIR", str(tmp_path))
    import demo_2d_regression as d2
    monkeypatch.setattr(d2, "RESULTS_DIR", str(tmp_path), raising=False)
    out = d2.main(n=80, M=16, max_iters=120, plot=False)
    if isinstance(out, dict):
        assert all(np.isfinite(v) for v in out.values()
                   if isinstance(v, float))


def test_lml_surface_components():
    from lml_surface import mlii_converged_points, nll_surface
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(30, 1)))
    y = jnp.sin(X[:, 0]) + 0.3 * jnp.asarray(rng.normal(size=30))
    surf = nll_surface(X, y, jnp.linspace(0.3, 3.0, 5),
                       jnp.linspace(0.05, 1.0, 4))
    assert np.isfinite(np.asarray(surf)).all() and np.asarray(surf).shape == (5, 4)
    pts = mlii_converged_points(X, y, n_inits=6, steps=60,
                                key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(pts[0])).all()


def test_hyperparameter_identification_sweep():
    from hyperparameter_identification import mlii_fit, size_sweep
    res = size_sweep(sizes=(10, 20), noise=0.4, n_seeds=2)
    arr = np.asarray([[v for v in row] for row in np.asarray(res, dtype=object)]
                     if not hasattr(res, "shape") else res, dtype=object)
    assert arr is not None


def test_co2_baseline_tiny(tmp_path, monkeypatch):
    import ggp_tpu.config as cfg
    monkeypatch.setattr(cfg, "RESULTS_DIR", str(tmp_path))
    import co2_baseline
    monkeypatch.setattr(co2_baseline, "RESULTS_DIR", str(tmp_path),
                        raising=False)
    out = co2_baseline.main(M=24, max_iters=150, plot=False)
    if isinstance(out, dict):
        for k, v in out.items():
            if isinstance(v, float):
                assert np.isfinite(v), k


@pytest.mark.slow
def test_classification_banana_tiny():
    from classification_banana import banana_svgp
    out = banana_svgp(M=12, num_epochs=60, plot=False)
    if isinstance(out, dict) and "accuracy" in out:
        assert out["accuracy"] > 0.5


def test_sampler_runtimes_and_benchmarks_plots(tmp_path, monkeypatch):
    """Figure scripts run headless against their bundled CSVs."""
    import matplotlib
    matplotlib.use("Agg")
    import ggp_tpu.config as cfg
    monkeypatch.setattr(cfg, "RESULTS_DIR", str(tmp_path))
    import nlpd_benchmarks_plot
    import sampler_runtimes
    for mod in (sampler_runtimes, nlpd_benchmarks_plot):
        monkeypatch.setattr(mod, "RESULTS_DIR", str(tmp_path), raising=False)
        try:
            mod.main()
        except SystemExit:
            pass


def test_allin_flat_xu_tiny():
    """Flat-Xu joint NUTS exploration (reference scratch.py:50-64) runs
    end-to-end on a tiny config and recovers a finite mixture predictive."""
    from allin_flat_xu import main
    model, r = main(n=96, m=6, tune=20, draws=10, plot=False)
    assert np.isfinite(r)
    # the flat prior leaves Z unregularised; the trace must still be finite
    assert np.all(np.isfinite(np.asarray(model.trace["Z"])))
