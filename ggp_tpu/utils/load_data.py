"""Synthetic data generators: draw ground truth from a GP prior, observe
through one of the four likelihoods.

Functional JAX rewrite of the reference's generators
(utils/load_data.py:22-120): ``KernelConfig``/``DataConfig`` dataclasses, the
gaussian/binary/poisson/multi-class observation branches
(utils/load_data.py:89-105), and clustered-vs-uniform input sampling
(utils/load_data.py:81-87).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..kernels import RBF, Scale
from ..ops.linalg import safe_cholesky

__all__ = ["KernelConfig", "DataConfig", "load_1d_synthetic", "invlogit", "probit"]


def invlogit(x):
    return jax.nn.sigmoid(x)          # reference: utils/load_data.py:61-62


def probit(x):
    return jax.scipy.stats.norm.cdf(x)  # reference: utils/load_data.py:64-65


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Reference: utils/load_data.py:22-37."""
    lengthscale: float = 1.0
    outputscale: float = 1.0


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Reference: utils/load_data.py:39-58."""
    n: int = 200
    x_min: float = -5.0
    x_max: float = 5.0
    noise: float = 0.1
    likelihood: str = "gaussian"     # gaussian | binary | poisson | multiclass
    num_classes: int = 3
    clustered: bool = False


def _sample_inputs(key, cfg: DataConfig):
    if cfg.clustered:
        # two clusters near the ends of the range (utils/load_data.py:81-85)
        k1, k2 = jax.random.split(key)
        half = cfg.n // 2
        a = cfg.x_min + 0.25 * (cfg.x_max - cfg.x_min)
        b = cfg.x_max - 0.25 * (cfg.x_max - cfg.x_min)
        x = jnp.concatenate([
            a + 0.5 * jax.random.normal(k1, (half,)),
            b + 0.5 * jax.random.normal(k2, (cfg.n - half,)),
        ])
    else:
        x = jax.random.uniform(key, (cfg.n,), minval=cfg.x_min, maxval=cfg.x_max)
    return jnp.sort(x)[:, None]


def load_1d_synthetic(key=None, data_cfg: DataConfig = DataConfig(),
                      kernel_cfg: KernelConfig = KernelConfig(), seed: int = 42):
    """Returns (X, y, f_true). f ~ GP(0, k); y via the configured likelihood
    (reference branches: utils/load_data.py:89-105)."""
    if key is None:
        key = jax.random.PRNGKey(seed)
    kx, kf, ky = jax.random.split(key, 3)
    X = _sample_inputs(kx, data_cfg)

    kern = Scale(RBF(ard=False))
    kp = {"log_outputscale": jnp.log(jnp.asarray(kernel_cfg.outputscale)),
          "base": {"log_lengthscale": jnp.log(jnp.asarray(kernel_cfg.lengthscale))}}

    n_latent = data_cfg.num_classes if data_cfg.likelihood == "multiclass" else 1
    K = kern.gram(kp, X, X)
    # smooth RBF grams are catastrophically ill-conditioned; the prior draw
    # only needs to be *a* sample, so take a generous dtype-aware jitter
    L = safe_cholesky(K, 1e-8 if K.dtype == jnp.float64 else 1e-4)
    f = (L @ jax.random.normal(kf, (data_cfg.n, n_latent))).squeeze(-1) \
        if n_latent == 1 else (L @ jax.random.normal(kf, (data_cfg.n, n_latent)))

    if data_cfg.likelihood == "gaussian":
        y = f + data_cfg.noise * jax.random.normal(ky, f.shape)
    elif data_cfg.likelihood == "binary":
        p = probit(f)
        y = jax.random.bernoulli(ky, p).astype(X.dtype)
    elif data_cfg.likelihood == "poisson":
        y = jax.random.poisson(ky, jnp.exp(f)).astype(X.dtype)
    elif data_cfg.likelihood == "multiclass":
        y = jax.random.categorical(ky, f, axis=-1).astype(jnp.int32)
    else:
        raise ValueError(f"unknown likelihood {data_cfg.likelihood!r}")
    return X, y, f
