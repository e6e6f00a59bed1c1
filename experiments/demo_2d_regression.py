"""2D six-hump camel-back demo: SGPR vs SGPR+HMC contours with learned Z.

Rebuild of the reference demo (experiments/demo_2d_regression.py:17-195):
the camel-back test function on [-2,2]x[-1,1], grid evaluation, contour
plots of the posterior mean with inducing-point locations.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ggp_tpu.models import BayesianSparseGPR_HMC, SparseGPR
from ggp_tpu.utils.metrics import rmse


def camelback(x1, x2):
    """Six-hump camel-back (reference: demo_2d_regression.py:17-28)."""
    return ((4.0 - 2.1 * x1 ** 2 + x1 ** 4 / 3.0) * x1 ** 2
            + x1 * x2 + (-4.0 + 4.0 * x2 ** 2) * x2 ** 2)


def main(n=300, M=50, max_iters=1500, noise=0.2, plot=True):
    rng = np.random.default_rng(0)
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1, 1, n)], axis=1)
    y = camelback(X[:, 0], X[:, 1]) + noise * rng.normal(size=n)
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)

    g1, g2 = np.meshgrid(np.linspace(-2, 2, 60), np.linspace(-1, 1, 30))
    Xg = jnp.asarray(np.stack([g1.ravel(), g2.ravel()], 1), jnp.float32)
    fg = camelback(g1.ravel(), g2.ravel())

    Z0 = X[rng.integers(0, n, M)]
    sgpr = SparseGPR(X, y, Z_init=Z0)
    sgpr.train_model(max_steps=max_iters, lr=0.03, verbose=False)
    m1, _ = sgpr.posterior_predictive(Xg, full_cov=False)
    print(f"SGPR      grid rmse={float(rmse(m1, jnp.asarray(fg))):.3f}")

    bs = BayesianSparseGPR_HMC(X, y, Z_init=Z0)
    bs.train_model(max_steps=1200, hmc_scheduler=[400, 800, 1200], lr=0.02,
                   key=jax.random.PRNGKey(1))
    m2, v2 = bs.mixture_posterior_predictive(Xg)
    print(f"SGPR+HMC  grid rmse={float(rmse(jnp.mean(m2, 0), jnp.asarray(fg))):.3f}")

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import os
        from ggp_tpu.config import RESULTS_DIR
        fig, axes = plt.subplots(1, 3, figsize=(16, 4))
        for ax, m, title in [(axes[0], fg, "truth"),
                             (axes[1], np.asarray(m1), "SGPR"),
                             (axes[2], np.asarray(jnp.mean(m2, 0)), "SGPR+HMC")]:
            c = ax.contourf(g1, g2, np.asarray(m).reshape(g1.shape), 20)
            fig.colorbar(c, ax=ax)
            ax.set_title(title)
        for ax, Z in [(axes[1], sgpr.Z), (axes[2], bs.Z)]:
            ax.plot(np.asarray(Z)[:, 0], np.asarray(Z)[:, 1], "rx", ms=4)
        os.makedirs(RESULTS_DIR, exist_ok=True)
        out = f"{RESULTS_DIR}/demo_2d_regression.png"
        fig.savefig(out, dpi=120, bbox_inches="tight")
        print("saved", out)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=300)
    p.add_argument("--M", type=int, default=50)
    p.add_argument("--no_plot", action="store_true")
    a = p.parse_args()
    main(n=a.n, M=a.M, plot=not a.no_plot)
