"""SGHMC — stochastic-gradient Hamiltonian Monte Carlo (Chen et al. 2014).

The reference names an SGHMC large-scale experiment but never implements the
sampler (experiments/large_scale_regression_SGHMC.py runs SGPR /
BayesianSGPR_HMC instead — SURVEY §2.3). Here it is a first-class engine for
the ~1M-row config (BASELINE.json config 5): minibatch gradients of the
collapsed bound via subsampled VFE statistics, momentum with friction, and
the whole trajectory as one ``lax.scan`` under jit, vmappable over chains.

Update rule (M = I):
    r <- (1 - eps*C) r - eps * grad U~(z) + N(0, 2 C eps - (eps)^2 Bhat)
    z <- z + eps r
with U~ the minibatch potential estimate scaled to the full dataset.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.flatten_util
import jax.numpy as jnp

__all__ = ["SGHMCConfig", "run_sghmc"]


@dataclasses.dataclass(frozen=True)
class SGHMCConfig:
    step_size: float = 1e-3
    friction: float = 0.05          # C * eps in the discretisation
    num_steps: int = 2000
    batch_size: int = 1024
    thin: int = 10                  # keep every thin-th state
    num_warmup: int = 500           # discarded leading states
    resample_momentum_every: int = 50


def run_sghmc(logpost_fn: Callable, init_params, key, num_data: int,
              cfg: SGHMCConfig = SGHMCConfig(), num_chains: int = 1):
    """``logpost_fn(params, idx)`` must return an (approximately) unbiased
    full-data log-posterior estimate from minibatch row indices ``idx``.

    Returns (samples pytree with leading axes (chains, kept), stats).
    """
    flat0, unravel = jax.flatten_util.ravel_pytree(init_params)
    dim = flat0.shape[0]
    eps = cfg.step_size
    alpha = cfg.friction                     # = eps * C
    noise_std = jnp.sqrt(2.0 * alpha * eps)

    def grad_u(z, idx):
        return jax.grad(lambda v: -logpost_fn(unravel(v), idx))(z)

    def one_chain(z0, key):
        kr, key = jax.random.split(key)
        r0 = jnp.zeros(dim, z0.dtype)

        def step(carry, inp):
            z, r, key = carry
            t = inp
            key, kb, kn, km = jax.random.split(key, 4)
            idx = jax.random.randint(kb, (cfg.batch_size,), 0, num_data)
            g = grad_u(z, idx)
            noise = noise_std * jax.random.normal(kn, (dim,), z.dtype)
            r = (1.0 - alpha) * r - eps * g + noise
            # periodic momentum refresh guards against divergence
            refresh = (t % cfg.resample_momentum_every) == 0
            r = jnp.where(refresh,
                          jnp.sqrt(eps) * jax.random.normal(km, (dim,), z.dtype),
                          r)
            z = z + r * 1.0
            return (z, r, key), z

        (_, _, _), zs = jax.lax.scan(
            step, (z0, r0, key), jnp.arange(1, cfg.num_steps + 1))
        kept = zs[cfg.num_warmup::cfg.thin]
        return kept

    keys = jax.random.split(key, num_chains)
    jkeys = jax.random.split(jax.random.fold_in(key, 7), num_chains)
    z0s = jnp.stack([flat0 + 0.01 * jax.random.normal(k, flat0.shape,
                                                      flat0.dtype)
                     for k in jkeys])
    zs = jax.jit(jax.vmap(one_chain))(z0s, keys)      # (C, kept, dim)
    samples = jax.vmap(jax.vmap(unravel))(zs)
    stats = {"step_size": eps, "friction": alpha,
             "num_kept": zs.shape[1]}
    return samples, stats
