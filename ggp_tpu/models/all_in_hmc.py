"""all_in_HMC — NUTS jointly over hyperparameters AND inducing locations.

Rebuild of the reference's Rossi-et-al.-2021 baseline ``all_in_HMC``
(models/all_in_HMC.py:24-125): the pymc3 model adds Z ~ N(0,1)^(M x D)
(models/all_in_HMC.py:57) to the VFE MarginalSparse target and NUTS samples
the joint state (tune=500, n=100, models/all_in_HMC.py:64-82). Predictions
restore each sampled (theta, Z) and form the mixture
(models/all_in_HMC.py:110-123).

Here the joint state is simply a bigger pytree handed to the same NUTS
engine — no special casing, and the M x D Z-block rides the same dual-averaged
trajectory as the hypers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_jitter
from ..inference.hmc import NUTSConfig, build_sampler
from ..kernels import Kernel, default_rbf
from ..likelihoods import GaussianLikelihood
from ..priors import Normal, log_prior, prior_tree_rbf
from .sgpr import sgpr_elbo, sgpr_hmc_target_elbo, sgpr_predict

__all__ = ["all_in_HMC"]


class all_in_HMC:
    """Reference API (models/all_in_HMC.py:24): ctor
    ``(train_x, train_y, likelihood, Z_init)``, ``train_model``,
    ``full_mixture_posterior_predictive``."""

    def __init__(self, train_x, train_y, likelihood: GaussianLikelihood | None = None,
                 Z_init=None, kernel: Kernel | None = None, prior_tree=None,
                 jitter: float | None = None, mesh=None, z_prior=None):
        self.train_x = jnp.asarray(train_x)
        self.train_y = jnp.asarray(train_y)
        d = self.train_x.shape[-1]
        self.kernel = kernel if kernel is not None else default_rbf(ard=True)
        self.likelihood = likelihood if likelihood is not None else GaussianLikelihood()
        self.jitter = default_jitter(self.train_x.dtype) if jitter is None else jitter
        Z_init = jnp.asarray(Z_init) if Z_init is not None else self.train_x[:100]
        hyper_priors = prior_tree if prior_tree is not None else prior_tree_rbf()
        # joint prior: hypers as usual + Z ~ N(0,1) elementwise
        # (reference: pm.Normal("Xu", shape=(100, D)), models/all_in_HMC.py:57).
        # ``z_prior`` overrides it — e.g. Flat() reproduces the reference's
        # pm.Flat("Xu") exploration (scratch.py:59).
        self.prior_tree = {**hyper_priors,
                           "Z": z_prior if z_prior is not None else Normal(0.0, 1.0)}
        self.state = {
            "kernel": self.kernel.init_params(d),
            "log_noise": jnp.zeros((), self.train_x.dtype),
            "Z": Z_init.astype(self.train_x.dtype),
        }
        self.mesh = mesh
        self.trace = None
        self._sampler = None
        self._sampler_key = None

    def _logpost(self, state, data):
        X, y = data
        ll = sgpr_hmc_target_elbo()(self.kernel, state, X, y, self.jitter)
        return ll + log_prior(self.prior_tree, state)

    def train_model(self, num_warmup: int = 500, num_samples: int = 100,
                    num_chains: int = 1, key=None, max_depth: int = 8):
        """Joint NUTS (reference defaults tune=500, n=100,
        regression_allin.py:161-162)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        skey = (num_warmup, num_samples, num_chains, max_depth)
        if self._sampler is None or self._sampler_key != skey:
            cfg = NUTSConfig(num_warmup=num_warmup, num_samples=num_samples,
                             max_depth=max_depth)
            self._sampler = build_sampler(self._logpost, self.state, cfg,
                                          num_chains, mesh=self.mesh)
            self._sampler_key = skey
        samples, stats = self._sampler(self.state, key,
                                       (self.train_x, self.train_y))
        self.trace = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:]), samples)
        self.stats = stats
        return self.trace

    def full_mixture_posterior_predictive(self, test_x, include_noise: bool = True):
        """Mixture over joint (theta, Z) samples
        (reference: models/all_in_HMC.py:96-125)."""
        assert self.trace is not None, "train first"
        test_x = jnp.asarray(test_x)

        def one(state):
            return sgpr_predict(self.kernel, state, self.train_x,
                                self.train_y, test_x, self.jitter,
                                full_cov=False, include_noise=include_noise)

        means, vars_ = jax.jit(
            lambda tr: jax.lax.map(one, tr, batch_size=8))(self.trace)
        ok = jnp.all(jnp.isfinite(means), axis=-1) & \
             jnp.all(jnp.isfinite(vars_), axis=-1) & \
             jnp.all(vars_ > 0, axis=-1)
        return means[ok], vars_[ok]
