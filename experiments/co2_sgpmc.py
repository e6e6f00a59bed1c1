"""Mauna Loa CO2 with SGPMC (JointHMC), faithful to the reference spec.

Rebuild of the reference's gpflow variant (experiments/co2_sgpmc.py):
* Linear mean function with N(0,3) priors on A and b (:60-63) — the only
  reference model with a non-zero mean;
* the exact composite: Periodic(SE, period=1 fixed) x Matern52 seasonal,
  RationalQuadratic medium, SE trend (variance init log(2)^2),
  Matern52 + White noise (:65-71), with the per-component tfd priors
  (HalfNormal on variances, Gamma on lengthscales/alpha, :74-90) and
  Gamma(2,1) on likelihood noise (:107);
* HMC with leapfrog=20, step size adapted to accept 0.80 from 0.005
  (:119-125) -> ``algorithm="hmc"``, num_leapfrog=20; M=200 (:190).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from co2_data import load_co2_dataset
from ggp_tpu.kernels.composite import co2_sgpmc_kernel, co2_sgpmc_prior_tree
from ggp_tpu.means import Linear, linear_mean_prior_tree
from ggp_tpu.models import SGPMC
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

    kern = co2_sgpmc_kernel()
    hyper_prior = co2_sgpmc_prior_tree()
    hyper_prior["mean"] = linear_mean_prior_tree(3.0)
    Z_init = X[:: max(1, X.shape[0] // M)][:M]
    model = SGPMC(X, y, Z_init=Z_init, kernel=kern, mean_fn=Linear(),
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
