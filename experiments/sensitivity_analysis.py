"""Sensitivity of RMSE/NLPD to the number of inducing points M.

Rebuild of the reference figure (experiments/sensitivity_analysis.py:15-34),
which hardcodes its values; here the sweep actually RUNS: SGPR+HMC (fixed Z)
and JointHMC over M in {100..500} on a chosen dataset, then plots.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ggp_tpu.models import BayesianSparseGPR_HMC, SGPMC
from ggp_tpu.utils.datasets import get_regression_data
from ggp_tpu.utils.metrics import nlpd_mixture, rmse

# reference's published values for comparison
# (experiments/sensitivity_analysis.py:15-27)
REFERENCE = {
    "SGPR+HMC": {"rmse": [0.0936, 0.0924, 0.0913, 0.0912, 0.0907],
                 "nlpd": [-0.9207, -0.935, -0.941, -0.952, -0.9557]},
    "JointHMC": {"rmse": [0.114, 0.1006, 0.0971, 0.0965, 0.0964],
                 "nlpd": [-0.899, -0.908, -0.912, -0.915, -0.917]},
}
MS = [100, 200, 300, 400, 500]


def main(dataset="synthetic-mid", tune=300, n_samples=100, plot=True):
    data = get_regression_data(dataset, split=0)
    X = jnp.asarray(data.X_train, jnp.float32)
    y = jnp.asarray(data.Y_train, jnp.float32)
    Xt = jnp.asarray(data.X_test, jnp.float32)
    yt = jnp.asarray(data.Y_test, jnp.float32)
    rng = np.random.RandomState(45)

    results = {"SGPR+HMC": {"rmse": [], "nlpd": []},
               "JointHMC": {"rmse": [], "nlpd": []}}
    for M in MS:
        Z0 = X[rng.randint(0, X.shape[0], min(M, X.shape[0]))]
        m1 = BayesianSparseGPR_HMC(X, y, Z_init=Z0)
        m1.warm_start(300, lr=0.02)
        m1.train_fixed_model(tune, n_samples, key=jax.random.PRNGKey(M))
        means, vars_ = m1.mixture_posterior_predictive(Xt)
        results["SGPR+HMC"]["rmse"].append(
            float(rmse(jnp.mean(means, 0), yt, data.Y_std)))
        results["SGPR+HMC"]["nlpd"].append(
            float(nlpd_mixture(means, vars_, yt, data.Y_std)))

        m2 = SGPMC(X, y, Z_init=Z0)
        m2.warm_start(100)
        m2.train_model(tune, n_samples, key=jax.random.PRNGKey(M + 1))
        fm, fv = m2.mixture_posterior_predictive(Xt, num_components=50)
        noise = jnp.exp(m2.trace["lik"]["log_noise"]).mean()
        results["JointHMC"]["rmse"].append(
            float(rmse(jnp.mean(fm, 0), yt, data.Y_std)))
        results["JointHMC"]["nlpd"].append(
            float(nlpd_mixture(fm, fv + noise, yt, data.Y_std)))
        print(f"M={M}: " + "  ".join(
            f"{k} rmse={results[k]['rmse'][-1]:.4f} nlpd={results[k]['nlpd'][-1]:.4f}"
            for k in results))

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import os
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        for k in results:
            axes[0].plot(MS, results[k]["rmse"], "o-", label=k)
            axes[1].plot(MS, results[k]["nlpd"], "o-", label=k)
        axes[0].set_xlabel("M"); axes[0].set_ylabel("RMSE"); axes[0].legend()
        axes[1].set_xlabel("M"); axes[1].set_ylabel("NLPD"); axes[1].legend()
        os.makedirs("results", exist_ok=True)
        fig.savefig("results/sensitivity_analysis.png", dpi=120,
                    bbox_inches="tight")
        print("saved results/sensitivity_analysis.png")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--dataset", default="synthetic-mid")
    p.add_argument("--tune", type=int, default=300)
    p.add_argument("--n_samples", type=int, default=100)
    p.add_argument("--no_plot", action="store_true")
    a = p.parse_args()
    main(dataset=a.dataset, tune=a.tune, n_samples=a.n_samples,
         plot=not a.no_plot)
