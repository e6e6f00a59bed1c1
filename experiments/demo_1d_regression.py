"""1D gap-extrapolation demo: SGPR (ML-II) vs BayesianSGPR_HMC vs JointHMC.

Rebuild of the reference demo (experiments/demo_1d_regression.py): ground
truth y = sin(x) + cos(2x) style composite with an extrapolation gap in the
training inputs (reference builds the gap at :62-65), comparison of point
ML-II hyperparameters against HMC posterior histograms (:194-209).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ggp_tpu.models import BayesianSparseGPR_HMC, SGPMC, SparseGPR
from ggp_tpu.utils.metrics import nlpd, nlpd_mixture, rmse
from ggp_tpu.utils.visualisation import plot_mixture_posterior, plot_posterior


def make_gap_data(n=200, noise=0.25, seed=37):
    """sin+cos ground truth with a central gap (reference:
    demo_1d_regression.py:43-44,62-65)."""
    rng = np.random.default_rng(seed)
    x_left = rng.uniform(-7.0, -1.5, n // 2)
    x_right = rng.uniform(1.5, 7.0, n - n // 2)
    x = np.sort(np.concatenate([x_left, x_right]))
    f = np.sin(x) + np.cos(2.0 * x) * 0.5
    y = f + noise * rng.normal(size=n)
    xt = np.linspace(-8.0, 8.0, 400)
    ft = np.sin(xt) + np.cos(2.0 * xt) * 0.5
    return (jnp.asarray(x[:, None], jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(xt[:, None], jnp.float32), jnp.asarray(ft, jnp.float32))


def main(M=32, max_iters=1500, tune=500, n_samples=500, plot=True):
    X, y, Xt, ft = make_gap_data()
    Z_init = X[:: max(1, X.shape[0] // M)][:M]
    key = jax.random.PRNGKey(0)

    # --- SGPR ML-II ---
    sgpr = SparseGPR(X, y, Z_init=Z_init)
    sgpr.train_model(max_steps=max_iters, lr=0.03, verbose=False)
    m1, v1 = sgpr.posterior_predictive(Xt, full_cov=False)
    print(f"SGPR      rmse={float(rmse(m1, ft)):.3f} "
          f"nlpd={float(nlpd(m1, v1, ft)):.3f} "
          f"ls={np.exp(np.asarray(sgpr.params['kernel']['base']['log_lengthscale'])).ravel()}")

    # --- BayesianSGPR_HMC ---
    bsgpr = BayesianSparseGPR_HMC(X, y, Z_init=Z_init)
    bsgpr.warm_start(num_steps=500, lr=0.03)
    bsgpr.train_fixed_model(num_warmup=tune, num_samples=n_samples,
                            key=jax.random.fold_in(key, 1))
    m2, v2 = bsgpr.mixture_posterior_predictive(Xt)
    print(f"SGPR+HMC  rmse={float(rmse(jnp.mean(m2, 0), ft)):.3f} "
          f"nlpd={float(nlpd_mixture(m2, v2, ft)):.3f} "
          f"{m2.shape[0]} mixture components")

    # --- JointHMC (SGPMC) ---
    sgpmc = SGPMC(X, y, Z_init=Z_init)
    sgpmc.warm_start(num_steps=100)
    sgpmc.train_model(num_warmup=tune, num_samples=n_samples,
                      key=jax.random.fold_in(key, 2))
    m3, v3 = sgpmc.mixture_posterior_predictive(Xt, num_components=50)
    noise3 = jnp.exp(sgpmc.trace["lik"]["log_noise"]).mean()
    print(f"JointHMC  rmse={float(rmse(jnp.mean(m3, 0), ft)):.3f} "
          f"nlpd={float(nlpd_mixture(m3, v3 + noise3, ft)):.3f}")

    # --- hyper identification: ML-II point vs HMC histograms
    # (reference: demo_1d_regression.py:194-209)
    ls_hmc = np.exp(np.asarray(
        bsgpr.trace["kernel"]["base"]["log_lengthscale"])).ravel()
    ls_mlii = float(np.exp(np.asarray(
        sgpr.params["kernel"]["base"]["log_lengthscale"])).ravel()[0])
    print(f"lengthscale: ML-II={ls_mlii:.3f}  HMC median={np.median(ls_hmc):.3f} "
          f"[{np.percentile(ls_hmc, 2.5):.3f}, {np.percentile(ls_hmc, 97.5):.3f}]")

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        plot_posterior(Xt, m1, v1, X=X, y=y, Z=sgpr.Z, ax=axes[0],
                       label="SGPR ML-II")
        plot_mixture_posterior(Xt, m2, v2, X=X, y=y, Z=bsgpr.Z, ax=axes[1])
        axes[1].set_title("SGPR+HMC mixture")
        axes[2].hist(ls_hmc, bins=30, density=True, alpha=0.6,
                     label="HMC posterior")
        axes[2].axvline(ls_mlii, color="r", label="ML-II")
        axes[2].set_xlabel("lengthscale"); axes[2].legend()
        import os
        from ggp_tpu.config import RESULTS_DIR
        os.makedirs(RESULTS_DIR, exist_ok=True)
        out = f"{RESULTS_DIR}/demo_1d_regression.png"
        fig.savefig(out, dpi=120, bbox_inches="tight")
        print("saved", out)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=32)
    p.add_argument("--max_iters", type=int, default=1500)
    p.add_argument("--tune", type=int, default=500)
    p.add_argument("--n_samples", type=int, default=500)
    p.add_argument("--no_plot", action="store_true")
    a = p.parse_args()
    main(a.M, a.max_iters, a.tune, a.n_samples, plot=not a.no_plot)
