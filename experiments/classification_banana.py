"""Banana classification: SVGP / BayesianSVGP with Bernoulli-probit, plus a
softmax multi-class variant.

Covers the reference's classification exploration (scratch_pymc3.py:56-92 —
Banana with BernoulliLikelihood through the multitask SVGP wrapper) and
BASELINE.json config 4 ("BayesianSVGP classification: Bernoulli-probit and
softmax multi-class").
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ggp_tpu.likelihoods import BernoulliProbit, Softmax
from ggp_tpu.models import SGPMC, StochasticVariationalGP
from ggp_tpu.utils.datasets import get_classification_data
from ggp_tpu.utils.load_data import DataConfig, KernelConfig, load_1d_synthetic


def banana_svgp(M=32, num_epochs=800, plot=True):
    d = get_classification_data("synthetic-banana")
    X = jnp.asarray(d.X_train, jnp.float32)
    y = jnp.asarray(d.Y_train, jnp.float32)
    Xt = jnp.asarray(d.X_test, jnp.float32)
    yt = np.asarray(d.Y_test)

    rng = np.random.RandomState(0)
    Z0 = X[rng.randint(0, X.shape[0], M)]
    m = StochasticVariationalGP(X, y, likelihood=BernoulliProbit(), Z_init=Z0)
    m.train_model(num_epochs=num_epochs, batch_size=256, lr=0.03,
                  key=jax.random.PRNGKey(0))
    p, _ = m.posterior_predictive(Xt)
    acc = float(((np.asarray(p) > 0.5) == yt).mean())
    print(f"SVGP banana: test acc={acc:.3f}")

    # sampling twin: SGPMC with the probit likelihood
    ms = SGPMC(X, y, likelihood=BernoulliProbit(), Z_init=Z0)
    ms.warm_start(num_steps=100)
    ms.train_model(num_warmup=300, num_samples=200, key=jax.random.PRNGKey(1))
    fm, fv = ms.mixture_posterior_predictive(Xt, num_components=30)
    ps = np.asarray(jax.scipy.stats.norm.cdf(
        fm / jnp.sqrt(1.0 + fv))).mean(0)
    acc_s = float(((ps > 0.5) == yt).mean())
    print(f"SGPMC banana: test acc={acc_s:.3f}")

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import os
        g1, g2 = np.meshgrid(np.linspace(-3.5, 4.5, 80),
                             np.linspace(-4, 4, 80))
        Xg = jnp.asarray(np.stack([g1.ravel(), g2.ravel()], 1), jnp.float32)
        pg, _ = m.posterior_predictive(Xg)
        fig, ax = plt.subplots(figsize=(5, 4))
        c = ax.contourf(g1, g2, np.asarray(pg).reshape(g1.shape), 20,
                        cmap="RdBu")
        fig.colorbar(c, ax=ax)
        Xn = np.asarray(X)
        ax.plot(Xn[np.asarray(y) == 0, 0], Xn[np.asarray(y) == 0, 1], "r.", ms=2)
        ax.plot(Xn[np.asarray(y) == 1, 0], Xn[np.asarray(y) == 1, 1], "b.", ms=2)
        ax.plot(np.asarray(m.Z)[:, 0], np.asarray(m.Z)[:, 1], "k^", ms=5)
        os.makedirs("results", exist_ok=True)
        fig.savefig("results/banana_svgp.png", dpi=120, bbox_inches="tight")
        print("saved results/banana_svgp.png")
    return acc, acc_s


def multiclass_1d(num_epochs=500):
    X, yc, f = load_1d_synthetic(
        data_cfg=DataConfig(n=200, likelihood="multiclass", num_classes=3),
        kernel_cfg=KernelConfig(lengthscale=1.5, outputscale=3.0), seed=29)
    m = StochasticVariationalGP(X, yc, likelihood=Softmax(num_classes=3),
                                Z_init=X[::6])
    m.train_model(num_epochs=num_epochs, batch_size=200, lr=0.05,
                  key=jax.random.PRNGKey(2))
    p, _ = m.posterior_predictive(X)
    acc = float((np.asarray(p).argmax(-1) == np.asarray(yc)).mean())
    ceiling = float((np.asarray(f).argmax(-1) == np.asarray(yc)).mean())
    print(f"softmax 3-class: train acc={acc:.3f} (bayes ceiling ~{ceiling:.3f})")
    return acc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=32)
    p.add_argument("--num_epochs", type=int, default=800)
    p.add_argument("--no_plot", action="store_true")
    a = p.parse_args()
    banana_svgp(M=a.M, num_epochs=a.num_epochs, plot=not a.no_plot)
    multiclass_1d()
