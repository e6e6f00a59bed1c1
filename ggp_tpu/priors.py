"""Prior log-densities over hyperparameters, in unconstrained space.

The reference's HMC models place Gamma(2,1) priors on lengthscales and
HalfCauchy(1) priors on signal/noise scales (models/bayesian_sgpr_hmc.py:62-68,
models/gpr_hmc.py:47-53) and log-Normal reparameterised priors for the CO2
composite (experiments/co2_bayesian_sgpr_hmc.py:107-144). pymc3 samples these
on the log scale internally; we do the same explicitly: every prior here is a
callable ``logpdf_unconstrained(u)`` where the natural parameter is
``x = exp(u)``, i.e. the log-Jacobian ``+u`` is already folded in.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

__all__ = ["Gamma", "HalfCauchy", "HalfCauchyOnStd", "HalfNormal",
           "LogNormal", "Normal", "Prior", "Flat", "log_prior", "prior_tree_rbf"]


@dataclasses.dataclass(frozen=True)
class Prior:
    def logpdf_unconstrained(self, u: jnp.ndarray) -> jnp.ndarray:
        """Sum of log p(x=exp(u)) + u over all elements of u."""
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Gamma(Prior):
    """Gamma(alpha, beta) on x=exp(u) (reference: pm.Gamma(2,1) on
    lengthscales, models/bayesian_sgpr_hmc.py:62)."""

    alpha: float = 2.0
    beta: float = 1.0

    def logpdf_unconstrained(self, u):
        a, b = self.alpha, self.beta
        x = jnp.exp(u)
        lp = a * math.log(b) - math.lgamma(a) + (a - 1.0) * u - b * x
        return jnp.sum(lp + u)


@dataclasses.dataclass(frozen=True)
class HalfCauchy(Prior):
    """HalfCauchy(scale) on x=exp(u) (reference: pm.HalfCauchy(1) on sig_f,
    sig_n, models/bayesian_sgpr_hmc.py:63,68)."""

    scale: float = 1.0

    def logpdf_unconstrained(self, u):
        s = self.scale
        x = jnp.exp(u)
        lp = math.log(2.0 / (math.pi * s)) - jnp.log1p((x / s) ** 2)
        return jnp.sum(lp + u)


@dataclasses.dataclass(frozen=True)
class HalfNormal(Prior):
    scale: float = 1.0

    def logpdf_unconstrained(self, u):
        s = self.scale
        x = jnp.exp(u)
        lp = 0.5 * math.log(2.0 / math.pi) - math.log(s) - 0.5 * (x / s) ** 2
        return jnp.sum(lp + u)


@dataclasses.dataclass(frozen=True)
class LogNormal(Prior):
    """x = exp(u), u ~ N(mu, sigma^2) — i.e. a plain Normal in unconstrained
    space (reference CO2 priors like log_n_per ~ N(0,3),
    experiments/co2_bayesian_sgpr_hmc.py:107-144)."""

    mu: float = 0.0
    sigma: float = 1.0

    def logpdf_unconstrained(self, u):
        z = (u - self.mu) / self.sigma
        lp = -0.5 * z * z - math.log(self.sigma) - 0.5 * math.log(2.0 * math.pi)
        return jnp.sum(lp)


@dataclasses.dataclass(frozen=True)
class HalfCauchyOnStd(Prior):
    """HalfCauchy(scale) on the *standard deviation* s when the unconstrained
    leaf stores a log-VARIANCE u = log(s^2).

    Needed because our kernels parameterise by variance
    (``log_outputscale`` = log sig_f^2, ``log_noise`` = log sig_n^2) while the
    reference's priors are on the scales sig_f, sig_n
    (models/bayesian_sgpr_hmc.py:63,68). s = exp(u/2); log-Jacobian
    |ds/du| = s/2.
    """

    scale: float = 1.0

    def logpdf_unconstrained(self, u):
        sc = self.scale
        s = jnp.exp(0.5 * u)
        lp = math.log(2.0 / (math.pi * sc)) - jnp.log1p((s / sc) ** 2)
        return jnp.sum(lp + jnp.log(0.5 * s))


@dataclasses.dataclass(frozen=True)
class Flat(Prior):
    """Improper flat prior (contributes 0) — for leaves sampled without
    regularisation, like pm.Flat inducing inputs in scratch.py:50-64."""

    def logpdf_unconstrained(self, u):
        return jnp.zeros(())


@dataclasses.dataclass(frozen=True)
class Normal(Prior):
    """Normal prior on an *unconstrained* quantity itself (no transform) —
    used for inducing locations Z ~ N(0,1) in all_in_HMC
    (models/all_in_HMC.py:57) and linear-mean coefficients
    (experiments/co2_sgpmc.py:61-64)."""

    mu: float = 0.0
    sigma: float = 1.0

    def logpdf_unconstrained(self, u):
        z = (u - self.mu) / self.sigma
        lp = -0.5 * z * z - math.log(self.sigma) - 0.5 * math.log(2.0 * math.pi)
        return jnp.sum(lp)


def log_prior(prior_tree, params) -> jnp.ndarray:
    """Sum of prior log-densities over a pytree of Prior objects whose
    structure mirrors the unconstrained parameter pytree."""
    import jax

    lps = jax.tree_util.tree_map(
        lambda pr, u: pr.logpdf_unconstrained(u), prior_tree, params,
        is_leaf=lambda x: isinstance(x, Prior))
    return sum(jax.tree_util.tree_leaves(lps))


def prior_tree_rbf():
    """Default hyper-prior tree for Scale(RBF) + Gaussian noise, matching the
    reference's HMC models: ls ~ Gamma(2,1) per dim, sig_f ~ HalfCauchy(1),
    sig_n ~ HalfCauchy(1) (models/bayesian_sgpr_hmc.py:62-68,
    models/gpr_hmc.py:47-53)."""
    return {
        "kernel": {
            "log_outputscale": HalfCauchyOnStd(1.0),
            "base": {"log_lengthscale": Gamma(2.0, 1.0)},
        },
        "log_noise": HalfCauchyOnStd(1.0),
    }
