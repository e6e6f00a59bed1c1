"""Mixture posterior-predictive summaries and uncertainty intervals.

Re-implementation of the reference's utilities
(utils/posterior_predictive.py:12-61). The reference builds a per-test-point
torch ``MixtureSameFamily``, draws 1000 samples and takes 2.5/97.5
percentiles (utils/posterior_predictive.py:30-46); here the sampling is one
vectorised draw over (samples, components, test points) in jax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "get_posterior_predictive_means_stds",
    "get_posterior_predictive_uncertainty_intervals",
    "log_predictive_mixture_density",
]


def get_posterior_predictive_means_stds(means: jnp.ndarray, vars_: jnp.ndarray):
    """Mixture moments from per-component (S, Nt) moments
    (reference: utils/posterior_predictive.py:12-22)."""
    mix_mean = jnp.mean(means, axis=0)
    second = jnp.mean(vars_ + means ** 2, axis=0)
    mix_var = jnp.maximum(second - mix_mean ** 2, 1e-12)
    return mix_mean, jnp.sqrt(mix_var)


def get_posterior_predictive_uncertainty_intervals(
        means: jnp.ndarray, stds_or_vars: jnp.ndarray, num_draws: int = 1000,
        key=None, lower_q: float = 2.5, upper_q: float = 97.5,
        are_vars: bool = False):
    """Empirical [2.5, 97.5]% interval of the equal-weight Gaussian mixture,
    per test point (reference: utils/posterior_predictive.py:30-46)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    means = jnp.asarray(means)
    stds = jnp.sqrt(stds_or_vars) if are_vars else jnp.asarray(stds_or_vars)
    S, Nt = means.shape
    kc, kn = jax.random.split(key)
    comp = jax.random.randint(kc, (num_draws, Nt), 0, S)
    eps = jax.random.normal(kn, (num_draws, Nt), means.dtype)
    draws = jnp.take_along_axis(means, comp, axis=0) + \
        eps * jnp.take_along_axis(stds, comp, axis=0)
    lower = jnp.percentile(draws, lower_q, axis=0)
    upper = jnp.percentile(draws, upper_q, axis=0)
    return lower, upper


def log_predictive_mixture_density(means, vars_, y):
    """Per-point log mixture density (reference:
    utils/posterior_predictive.py:56-61)."""
    m = jnp.asarray(means)
    v = jnp.asarray(vars_)
    y = jnp.asarray(y)[None, :]
    comp_lp = -0.5 * (jnp.log(2.0 * jnp.pi * v) + (y - m) ** 2 / v)
    return jax.scipy.special.logsumexp(comp_lp, axis=0) - jnp.log(m.shape[0])
