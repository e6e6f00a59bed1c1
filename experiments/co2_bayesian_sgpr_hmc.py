"""Mauna Loa CO2 with the composite kernel + NUTS over all 11 hypers.

Rebuild of the headline CO2 experiment
(experiments/co2_bayesian_sgpr_hmc.py): the composite kernel on BOTH sides
of the reference's torch/pymc3 boundary becomes a single kernel here; the
log-Normal reparameterised priors (log_n_per ~ N(0,3) etc., reference
:107-144) become a LogNormal(0,3) prior tree over the 10 kernel
log-parameters + noise (the reference's 11-hyper copy-back map, :162-188);
the noise component is Matern32 (:145); the frozen seasonal period needs no
re-pinning (:220) because it is static structure, not a parameter.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from co2_baseline import init_co2_params
from co2_data import load_co2_dataset
from ggp_tpu.kernels import co2_kernel
from ggp_tpu.models import BayesianSparseGPR_HMC
from ggp_tpu.priors import LogNormal
from ggp_tpu.utils.metrics import nlpd_mixture, rmse
from ggp_tpu.utils.posterior_predictive import (
    get_posterior_predictive_uncertainty_intervals,
)


def co2_prior_tree(kernel, input_dim=1, sigma=3.0):
    """LogNormal(0, sigma) on every kernel log-parameter + the noise
    (reference: experiments/co2_bayesian_sgpr_hmc.py:107-144)."""
    kp = kernel.init_params(input_dim)
    tree = jax.tree_util.tree_map(lambda _: LogNormal(0.0, sigma), kp)
    return {"kernel": tree, "log_noise": LogNormal(0.0, sigma)}


def main(M=480, max_iters=2000, tune=500, n_samples=100, year_split=2003,
         fixed_z=True, plot=True):
    Xtr, ytr, Xte, yte, y_mean, y_std, synth = load_co2_dataset(year_split)
    if synth:
        print("NOTE: mauna.txt not found - using synthetic CO2 stand-in")
    X = jnp.asarray(Xtr, jnp.float32)
    y = jnp.asarray(ytr, jnp.float32)
    Xt = jnp.asarray(Xte, jnp.float32)
    yt = jnp.asarray(yte, jnp.float32)

    kern = co2_kernel("matern32")
    Z_init = X[:: max(1, X.shape[0] // M)][:M]
    model = BayesianSparseGPR_HMC(X, y, Z_init=Z_init, kernel=kern,
                                  prior_tree=co2_prior_tree(kern),
                                  jitter=1e-4)  # f32 + M=480 composite Kmm
    # seed hypers like the ML-II baseline, then warm start
    sg_params = init_co2_params(
        type("S", (), {"params": {
            "kernel": kern.init_params(1),
            "log_noise": jnp.zeros(())}})())
    model.hypers = {"kernel": sg_params["kernel"],
                    "log_noise": sg_params["log_noise"]}
    model.warm_start(num_steps=1500, lr=0.01)

    if fixed_z:
        # reference train_fixed_model: tune=500, n=100 (:257-277);
        # chunked so each program invocation stays under the remote link's
        # execution-length limit at M=480
        model.train_fixed_model(num_warmup=tune, num_samples=n_samples,
                                key=jax.random.PRNGKey(0), chunk_size=100)
    else:
        model.train_model(max_steps=max_iters,
                          hmc_scheduler=[max_iters // 2, max_iters],
                          key=jax.random.PRNGKey(0))

    means, vars_ = model.mixture_posterior_predictive(Xt)
    print(f"extrapolation rmse={float(rmse(jnp.mean(means, 0), yt, y_std)):.3f} ppm  "
          f"mixture nlpd={float(nlpd_mixture(means, vars_, yt, y_std)):.3f}  "
          f"({means.shape[0]} components)")

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import os
        from ggp_tpu.config import RESULTS_DIR
        lo, hi = get_posterior_predictive_uncertainty_intervals(
            means, vars_, are_vars=True)
        fig, ax = plt.subplots(figsize=(11, 4))
        xs = np.asarray(Xt).ravel()
        ax.plot(np.asarray(X).ravel(), np.asarray(y) * y_std + y_mean, "k.", ms=2)
        ax.plot(xs, np.asarray(yt) * y_std + y_mean, "g.", ms=2)
        m = np.asarray(jnp.mean(means, 0)) * y_std + y_mean
        ax.plot(xs, m, "b-", lw=1)
        ax.fill_between(xs, np.asarray(lo) * y_std + y_mean,
                        np.asarray(hi) * y_std + y_mean, color="b", alpha=0.2)
        os.makedirs(RESULTS_DIR, exist_ok=True)
        out = f"{RESULTS_DIR}/co2_bayesian_sgpr_hmc.png"
        fig.savefig(out, dpi=120, bbox_inches="tight")
        print("saved", out)
    return model


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=480)
    p.add_argument("--tune", type=int, default=500)
    p.add_argument("--n_samples", type=int, default=100)
    p.add_argument("--year_split", type=int, default=2003)
    p.add_argument("--alternating", action="store_true")
    p.add_argument("--no_plot", action="store_true")
    a = p.parse_args()
    main(M=a.M, tune=a.tune, n_samples=a.n_samples, year_split=a.year_split,
         fixed_z=not a.alternating, plot=not a.no_plot)
