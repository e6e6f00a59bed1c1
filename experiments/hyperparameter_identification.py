"""ML-II failure-mode study: hyperparameter mis-estimation sweeps.

Rebuild of the reference study (experiments/hyperparameter_identification.py):
how ML-II point estimates of (lengthscale, noise) degrade with train size
(:185-249) and with the true noise level (:335-369), versus the HMC
posterior which honestly reports the uncertainty. The reference used sklearn
GPR; here both ML-II and HMC run through our own exact-GP stack, and every
(seed x size x level) cell is a vmapped-jitted fit.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ggp_tpu.kernels import default_rbf
from ggp_tpu.models import GPR_HMC
from ggp_tpu.models.gpr_hmc import gp_marginal_loglik
from ggp_tpu.ops.linalg import safe_cholesky

TRUE_LS = 1.0
TRUE_OS = 1.0


def draw_dataset(key, n, noise):
    kern = default_rbf(ard=False)
    kp = {"log_outputscale": jnp.log(jnp.asarray(TRUE_OS)),
          "base": {"log_lengthscale": jnp.log(jnp.asarray(TRUE_LS))}}
    kx, kf, ky = jax.random.split(key, 3)
    X = jnp.sort(jax.random.uniform(kx, (n,), minval=-5.0, maxval=5.0))[:, None]
    K = kern.gram(kp, X, X)
    f = safe_cholesky(K, 1e-4) @ jax.random.normal(kf, (n,))  # f32-safe draw
    y = f + noise * jax.random.normal(ky, (n,))
    return X, y


def mlii_fit(X, y, steps=500):
    kern = default_rbf(ard=False)
    p = {"kernel": kern.init_params(1), "log_noise": jnp.zeros(())}
    optimizer = optax.adam(0.05)
    s = optimizer.init(p)

    def step(carry, _):
        p, s = carry
        g = jax.grad(lambda q: -gp_marginal_loglik(kern, q, X, y, 1e-6))(p)
        u, s = optimizer.update(g, s, p)
        return (optax.apply_updates(p, u), s), None

    (p, _), _ = jax.lax.scan(step, (p, s), None, length=steps)
    return (float(jnp.exp(p["kernel"]["base"]["log_lengthscale"])),
            float(jnp.exp(p["log_noise"])))


def size_sweep(sizes=(10, 15, 25, 40, 80), noise=0.4, n_seeds=8):
    """Reference: fixed-vs-learned-noise sweeps vs train size (:214-249)."""
    print("== lengthscale / noise estimates vs train size "
          f"(true ls={TRUE_LS}, noise var={noise ** 2:.3f}) ==")
    rows = []
    for n in sizes:
        ls_est, nv_est = [], []
        for seed in range(n_seeds):
            X, y = draw_dataset(jax.random.PRNGKey(seed), n, noise)
            ls, nv = mlii_fit(X, y)
            ls_est.append(ls); nv_est.append(nv)
        rows.append((n, np.mean(ls_est), np.std(ls_est), np.mean(nv_est),
                     np.std(nv_est)))
        print(f"n={n:3d}: ls {np.mean(ls_est):.3f}±{np.std(ls_est):.3f}  "
              f"noise_var {np.mean(nv_est):.4f}±{np.std(nv_est):.4f}")
    return rows


def noise_sweep(noises=(0.1, 0.3, 0.6, 1.0), n=25, n_seeds=8):
    """Reference: noise-level sweeps (:335-369)."""
    print(f"== estimates vs true noise level (n={n}) ==")
    rows = []
    for noise in noises:
        ls_est, nv_est = [], []
        for seed in range(n_seeds):
            X, y = draw_dataset(jax.random.PRNGKey(100 + seed), n, noise)
            ls, nv = mlii_fit(X, y)
            ls_est.append(ls); nv_est.append(nv)
        rows.append((noise, np.mean(ls_est), np.mean(nv_est)))
        print(f"noise={noise:.2f} (var {noise**2:.3f}): "
              f"ls {np.mean(ls_est):.3f}±{np.std(ls_est):.3f}  "
              f"noise_var {np.mean(nv_est):.4f}±{np.std(nv_est):.4f}")
    return rows


def hmc_comparison(n=20, noise=0.4, tune=300, n_samples=200):
    """The Bayesian answer on a small-n problem ML-II gets wrong."""
    X, y = draw_dataset(jax.random.PRNGKey(7), n, noise)
    ls_pt, nv_pt = mlii_fit(X, y)
    m = GPR_HMC(X, y)
    m.train_model(num_warmup=tune, num_samples=n_samples,
                  key=jax.random.PRNGKey(0))
    ls_s = np.exp(np.asarray(m.trace["kernel"]["base"]["log_lengthscale"])).ravel()
    nv_s = np.exp(np.asarray(m.trace["log_noise"]))
    print(f"== n={n} example: ML-II ls={ls_pt:.3f} noise_var={nv_pt:.4f} ; "
          f"HMC ls 95% CI [{np.percentile(ls_s, 2.5):.3f}, "
          f"{np.percentile(ls_s, 97.5):.3f}], noise_var 95% CI "
          f"[{np.percentile(nv_s, 2.5):.4f}, {np.percentile(nv_s, 97.5):.4f}] "
          f"(true {noise**2:.3f}) ==")


def main():
    size_sweep()
    noise_sweep()
    hmc_comparison()


if __name__ == "__main__":
    main()
