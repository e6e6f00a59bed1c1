"""Mauna Loa CO2 with SGPMC (JointHMC) and the composite kernel.

Rebuild of the reference's gpflow variant (experiments/co2_sgpmc.py): the
composite kernel with tfd priors (:66-93) becomes the same co2 kernel with a
LogNormal(0,3) prior tree; the reference's HMC (leapfrog=20, step=0.005,
:120-122) maps to our ``algorithm="hmc"`` with the same leapfrog count;
M=200 (:190).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from co2_bayesian_sgpr_hmc import co2_prior_tree
from co2_data import load_co2_dataset
from ggp_tpu.kernels import co2_kernel
from ggp_tpu.models import SGPMC
from ggp_tpu.priors import Gamma
from ggp_tpu.utils.metrics import nlpd_mixture, rmse


def main(M=200, tune=500, n_samples=500, year_split=2003, algorithm="nuts",
         plot=True):
    Xtr, ytr, Xte, yte, y_mean, y_std, synth = load_co2_dataset(year_split)
    if synth:
        print("NOTE: mauna.txt not found - using synthetic CO2 stand-in")
    X = jnp.asarray(Xtr, jnp.float32)
    y = jnp.asarray(ytr, jnp.float32)
    Xt = jnp.asarray(Xte, jnp.float32)
    yt = jnp.asarray(yte, jnp.float32)

    kern = co2_kernel()
    prior = co2_prior_tree(kern)
    hyper_prior = {"kernel": prior["kernel"],
                   "lik": {"log_noise": Gamma(2.0, 1.0)}}
    Z_init = X[:: max(1, X.shape[0] // M)][:M]
    model = SGPMC(X, y, Z_init=Z_init, kernel=kern,
                  hyper_prior_tree=hyper_prior, jitter=1e-4)
    model.warm_start(num_steps=200, lr=0.02)
    model.train_model(num_warmup=tune, num_samples=n_samples,
                      algorithm=algorithm, num_leapfrog=20,
                      key=jax.random.PRNGKey(0))

    fmeans, fvars = model.mixture_posterior_predictive(Xt, num_components=50)
    noise = jnp.exp(model.trace["lik"]["log_noise"]).mean()
    means, vars_ = fmeans, fvars + noise
    print(f"extrapolation rmse={float(rmse(jnp.mean(means, 0), yt, y_std)):.3f} ppm  "
          f"mixture nlpd={float(nlpd_mixture(means, vars_, yt, y_std)):.3f}")

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import os
        from ggp_tpu.config import RESULTS_DIR
        fig, ax = plt.subplots(figsize=(11, 4))
        xs = np.asarray(Xt).ravel()
        ax.plot(np.asarray(X).ravel(), np.asarray(y) * y_std + y_mean, "k.", ms=2)
        ax.plot(xs, np.asarray(yt) * y_std + y_mean, "g.", ms=2)
        for mcomp in np.asarray(means)[:20]:
            ax.plot(xs, mcomp * y_std + y_mean, color="gray", alpha=0.2, lw=0.5)
        ax.plot(xs, np.asarray(jnp.mean(means, 0)) * y_std + y_mean, "b-", lw=1)
        os.makedirs(RESULTS_DIR, exist_ok=True)
        out = f"{RESULTS_DIR}/co2_sgpmc.png"
        fig.savefig(out, dpi=120, bbox_inches="tight")
        print("saved", out)
    return model


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=200)
    p.add_argument("--tune", type=int, default=500)
    p.add_argument("--n_samples", type=int, default=500)
    p.add_argument("--algorithm", default="nuts", choices=["nuts", "hmc"])
    p.add_argument("--no_plot", action="store_true")
    a = p.parse_args()
    main(M=a.M, tune=a.tune, n_samples=a.n_samples, algorithm=a.algorithm,
         plot=not a.no_plot)
