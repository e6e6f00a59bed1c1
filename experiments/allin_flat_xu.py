"""Flat-prior inducing-input exploration: joint NUTS over (ls, sig_f, sig_n, Xu).

Rebuild of the reference's scratch exploration (scratch.py:14-64): 1D data
drawn from a true Scale(Matern52) GP (ls=1, sig_f=3, sig_n=2, n=2000 inputs
10*sort(rand)), then a VFE sparse GP whose M=20 inducing inputs carry an
improper flat prior — ``pm.Flat("Xu", shape=20)`` (scratch.py:59) — sampled
jointly with ls ~ Gamma(2,1) and HalfCauchy(5) scales by NUTS
(tune=200, draws=100, chains=1; scratch.py:64), finishing with the mixture
posterior predictive (scratch.py:67-72).

Here this is the ``all_in_HMC`` model with ``z_prior=Flat()`` — the same
joint-state NUTS engine; only the Z prior term changes.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ggp_tpu.kernels import Matern52, Scale
from ggp_tpu.models import all_in_HMC
from ggp_tpu.priors import Flat, Gamma, HalfCauchyOnStd
from ggp_tpu.utils.metrics import rmse
from ggp_tpu.utils.visualisation import plot_mixture_posterior


def make_matern_data(n=2000, ls_true=1.0, sigf_true=3.0, sign_true=2.0,
                     seed=1):
    """True f ~ GP(0, sig_f^2 Matern52(ls)) on 10*sort(rand(n))
    (scratch.py:17-37), sampled in f64 numpy."""
    rng = np.random.RandomState(seed)
    X = 10.0 * np.sort(rng.rand(n))[:, None]
    # true gram in f64 numpy (the f32 JAX path is for inference, not for
    # drawing the ground truth)
    r = np.sqrt(5.0) * np.abs(X - X.T) / ls_true
    K = sigf_true ** 2 * (1.0 + r + r * r / 3.0) * np.exp(-r)
    L = np.linalg.cholesky(K + 1e-8 * np.eye(n))
    f = L @ rng.randn(n)
    y = f + sign_true * rng.randn(n)
    return (jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
            np.asarray(f))


def main(n=2000, m=20, tune=200, draws=100, max_depth=8, plot=True, seed=1):
    X, y, f_true = make_matern_data(n=n, seed=seed)
    rng = np.random.RandomState(seed + 1)
    Z_init = jnp.asarray(10.0 * rng.rand(m)[:, None], jnp.float32)

    # ls ~ Gamma(2,1), sig_f ~ HalfCauchy(5), sig_n ~ HalfCauchy(5),
    # Xu ~ Flat (scratch.py:51-61).
    prior_tree = {
        "kernel": {
            "log_outputscale": HalfCauchyOnStd(5.0),
            "base": {"log_lengthscale": Gamma(2.0, 1.0)},
        },
        "log_noise": HalfCauchyOnStd(5.0),
    }
    model = all_in_HMC(X, y, Z_init=Z_init,
                       kernel=Scale(base=Matern52(ard=False)),
                       prior_tree=prior_tree, z_prior=Flat())
    model.train_model(num_warmup=tune, num_samples=draws, num_chains=1,
                      key=jax.random.PRNGKey(seed), max_depth=max_depth)

    means, vars_ = model.full_mixture_posterior_predictive(X)
    mix_mean = np.asarray(jnp.mean(means, 0))
    r = float(rmse(jnp.asarray(mix_mean), jnp.asarray(f_true, jnp.float32)))
    ls = np.exp(np.asarray(
        model.trace["kernel"]["base"]["log_lengthscale"])).ravel()
    print(f"allin_flat_xu: n={n} m={m} rmse(f)={r:.3f} "
          f"ls mean={ls.mean():.3f}")
    if plot:
        out = Path(__file__).resolve().parent.parent / "results"
        out.mkdir(exist_ok=True)
        plot_mixture_posterior(X, means, vars_, X=X, y=y,
                               Z=np.asarray(model.trace["Z"]).mean(0),
                               filename=str(out / "allin_flat_xu.png"))
    return model, r


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2000)
    p.add_argument("--m", type=int, default=20)
    p.add_argument("--tune", type=int, default=200)
    p.add_argument("--draws", type=int, default=100)
    p.add_argument("--no-plot", action="store_true")
    a = p.parse_args()
    main(n=a.n, m=a.m, tune=a.tune, draws=a.draws, plot=not a.no_plot)
