"""BayesianSVGP — "doubly stochastic" SVGP with a variational distribution
over log-hyperparameters.

Rebuild of ``BayesianStochasticVariationalGP`` (models/bayesian_svgp.py:87-207)
and its ``VariationalHyperDist`` (models/bayesian_svgp.py:30-71): in addition
to q(u), learn q(log theta) = N(q_mu_h, L_h L_h^T) with a packed-Cholesky
covariance (models/bayesian_svgp.py:44,51-61) jointly by SVI. The hyper
vector has D+2 entries (models/bayesian_svgp.py:115) laid out as the
reference's forward does (models/bayesian_svgp.py:130-132):

  theta[0]   -> outputscale        (log_outputscale = s[0])
  theta[1:-1]-> ARD lengthscales   (log_lengthscale = s[1:-1])
  theta[-1]  -> noise std          (log_noise = 2 s[-1], noise = exp(s[-1])^2)

Prior p(log theta) = N(0, sigma0^2 I) with sigma0^2 = 0.01
(models/bayesian_svgp.py:116-117). The ELBO averages the data term over
``num_hyper_samples``=5 reparameterised draws per step
(models/bayesian_svgp.py:159-167) — here that average is a vmap, so the five
whitened-conditional Choleskys run as one batched MXU factorisation.

KL counting parity (round-3 re-audit): the reference adds KL(q(theta))/n
per minibatch via a gpytorch AddedLossTerm (models/bayesian_svgp.py:73-84)
inside VariationalELBO's per-point objective — in per-point units that is
the SAME weighting as our single full-ELBO KL (ours is the reference's
scaled by N), so there is no counting deviation to quantify; optimisation
differs only by the overall loss scale absorbed into the learning rate.

Deliberate deviation (quantified, PERF.md round 3): the reference's
predictive feeds softplus(s) back through its exp-based forward, i.e.
theta = exp(softplus(s)) (models/bayesian_svgp.py:199 feeding :121-124),
inconsistent with training's theta = exp(s). We default to exp in both
places; ``mixture_posterior_predictive(..., transform="ref_softplus")``
reproduces the reference behavior exactly. Measured on the 1-D synthetic
benchmark: NLPD -0.13 (exp) vs +1.55 (ref_softplus), RMSE 0.20 vs 1.17 —
the exp-consistent predictive is the defensible choice.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..config import default_jitter
from ..kernels import Kernel, default_rbf
from ..likelihoods import GaussianLikelihood, Likelihood
from .svgp import _build_L, _kl_whitened, _whitened_q_f

__all__ = ["BayesianStochasticVariationalGP"]


def _unpack_tril(vec: jnp.ndarray, n: int) -> jnp.ndarray:
    """Packed (n(n+1)/2,) -> lower-tri (n, n) with exp diag
    (the reference unpacks q_sigma_vec + jitter, models/bayesian_svgp.py:51-61)."""
    L = jnp.zeros((n, n), vec.dtype)
    il = jnp.tril_indices(n)
    L = L.at[il].set(vec)
    diag = jnp.exp(jnp.diagonal(L))
    return jnp.tril(L, k=-1) + jnp.diag(diag)


def _hyper_to_kernel_params(s: jnp.ndarray, d: int, has_noise: bool = True):
    """Map one hyper sample onto kernel/likelihood params.

    Gaussian case: (D+2,) with the trailing slot the noise std
    (models/bayesian_svgp.py:130-132). Classification case: (D+1,), no
    noise slot.
    """
    kp = {"log_outputscale": s[0], "base": {"log_lengthscale": s[1:d + 1]}}
    if not has_noise:
        return kp, None
    return kp, 2.0 * s[-1]   # log_noise (noise = std^2, std = exp(s[-1]))


def _kl_hyper(q_mu, L_h, prior_var):
    """KL( N(q_mu, L L^T) || N(0, prior_var I) )."""
    h = q_mu.shape[0]
    logdet_q = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_h)))
    tr = jnp.sum(L_h * L_h) / prior_var
    quad = jnp.sum(q_mu * q_mu) / prior_var
    return 0.5 * (tr + quad - h - logdet_q + h * jnp.log(prior_var))


def bsvgp_elbo(kernel: Kernel, likelihood: Likelihood, params: dict,
               X_batch, y_batch, num_data: int, key, num_hyper_samples: int,
               prior_var: float, jitter, eps=None) -> jnp.ndarray:
    d = X_batch.shape[-1]
    has_noise = isinstance(likelihood, GaussianLikelihood)
    h = d + 2 if has_noise else d + 1
    L_h = _unpack_tril(params["hyper_L_vec"], h)
    if eps is None:
        eps = jax.random.normal(key, (num_hyper_samples, h), X_batch.dtype)
    thetas = params["hyper_mu"][None, :] + eps @ L_h.T      # (S, h)

    q_L = _build_L(params["q_sqrt_raw"])

    def data_term(s):
        kp, log_noise = _hyper_to_kernel_params(s, d, has_noise)
        mean, var = _whitened_q_f(kernel, kp, params["Z"], params["q_mu"],
                                  q_L, X_batch, jitter)
        lik_params = {"log_noise": log_noise} if has_noise else {}
        ve = likelihood.variational_expectation(lik_params,
                                                mean[:, 0], var[:, 0], y_batch)
        return jnp.sum(ve)

    expected = jnp.mean(jax.vmap(data_term)(thetas))
    scale = num_data / X_batch.shape[0]
    return (scale * expected
            - _kl_whitened(params["q_mu"], q_L)
            - _kl_hyper(params["hyper_mu"], L_h, prior_var))


class BayesianStochasticVariationalGP:
    """Reference API (models/bayesian_svgp.py:87): ctor
    ``(train_x, train_y, likelihood, Z_init)``, ``train_model``,
    ``mixture_posterior_predictive``."""

    def __init__(self, train_x, train_y, likelihood: Likelihood | None = None,
                 Z_init=None, kernel: Kernel | None = None,
                 prior_var: float = 0.01, num_hyper_samples: int = 5,
                 jitter: float | None = None):
        self.train_x = jnp.asarray(train_x)
        self.train_y = jnp.asarray(train_y)
        d = self.train_x.shape[-1]
        self.kernel = kernel if kernel is not None else default_rbf(ard=True)
        self.likelihood = likelihood if likelihood is not None else GaussianLikelihood()
        self.jitter = default_jitter(self.train_x.dtype) if jitter is None else jitter
        self.prior_var = prior_var
        self.num_hyper_samples = num_hyper_samples
        Z_init = jnp.asarray(Z_init) if Z_init is not None else self.train_x[:128]
        Z_init = Z_init.astype(self.train_x.dtype)
        M = Z_init.shape[0]
        self._has_noise = isinstance(self.likelihood, GaussianLikelihood)
        # hyper_dim = D+2 for Gaussian (models/bayesian_svgp.py:115); D+1
        # (no noise slot) for classification likelihoods
        h = d + 2 if self._has_noise else d + 1
        dt = self.train_x.dtype
        # packed chol init: small diagonal (raw diag log(0.1))
        vec = jnp.zeros(h * (h + 1) // 2, dt)
        diag_pos = jnp.cumsum(jnp.arange(1, h + 1)) - 1
        vec = vec.at[diag_pos].set(jnp.log(0.1))
        self.params = {
            "kernel": self.kernel.init_params(d),   # unused by ELBO; kept for API
            "Z": Z_init,
            "q_mu": jnp.zeros((M, 1), dt),
            "q_sqrt_raw": jnp.zeros((1, M, M), dt),
            "hyper_mu": jnp.zeros(h, dt),
            "hyper_L_vec": vec,
        }

    def _fused_bsvi_ok(self, batch_size) -> bool:
        """Gate for the whole-epoch Pallas BSVGP kernel (ops/fused_svi):
        Scale(RBF-ARD) x Gaussian, M <= 512, batch <= 512, S <= 8, on TPU.
        GGP_FUSED_BSVGP=0 disables."""
        import os
        if os.environ.get("GGP_FUSED_BSVGP", "1") == "0":
            return False
        if jax.default_backend() != "tpu":
            return False
        from ..kernels.base import RBF, Scale
        if not (isinstance(self.kernel, Scale)
                and type(self.kernel.base) is RBF and self.kernel.base.ard):
            return False
        if type(self.likelihood) is not GaussianLikelihood:
            return False
        M = self.params["Z"].shape[0]
        d = self.train_x.shape[-1]
        return (M <= 512 and batch_size <= 512 and d + 2 <= 126
                and self.num_hyper_samples <= 8)

    def train_model(self, optimizer=None, num_epochs: int = 100,
                    batch_size: int = 200, lr: float = 0.01, key=None,
                    verbose: bool = False):
        if key is None:
            key = jax.random.PRNGKey(0)
        N = self.train_x.shape[0]
        batch_size = min(batch_size, N)
        steps = N // batch_size
        if optimizer is None and self._fused_bsvi_ok(batch_size):
            # whole-epoch Pallas kernel: every step's S hyper-sample SVGP
            # data terms + reparameterisation adjoints + Adam in-kernel
            # (ops/fused_svi.make_fused_bsvgp); same optax-adam trajectory
            # as the XLA path given the same eps (tests/test_fused_svi.py)
            self.params, losses = _run_bsvi_fused(
                self.kernel, self.train_x, self.train_y, self.jitter,
                self.params, num_epochs, batch_size, steps,
                self.num_hyper_samples, self.prior_var, lr, key)
            if verbose:
                print(f"BayesianSVGP(fused): epoch loss "
                      f"{float(losses[0]):.3f} -> {float(losses[-1]):.3f}")
            return losses
        if optimizer is None:
            optimizer = optax.adam(lr)
        self.params, losses = _run_bsvi(
            self.kernel, self.likelihood, self.train_x, self.train_y,
            self.jitter, self.params, optimizer, num_epochs, batch_size,
            steps, self.num_hyper_samples, self.prior_var, key)
        if verbose:
            print(f"BayesianSVGP: epoch loss {float(losses[0]):.3f} -> "
                  f"{float(losses[-1]):.3f}")
        return losses

    def mixture_posterior_predictive(self, test_x, num_samples: int = 100,
                                     key=None, include_noise: bool = True,
                                     transform: str = "exp"):
        """Draw ``num_samples`` hyper samples from q(theta) and form the
        per-sample predictive mixture (reference draws 100,
        models/bayesian_svgp.py:183-207).

        ``transform``: "exp" (default — consistent with the training
        transform theta = exp(s)) or "ref_softplus", which reproduces the
        reference's inconsistency exactly: it feeds softplus(s) back through
        the exp-based forward, i.e. theta = exp(softplus(s))
        (models/bayesian_svgp.py:199 feeding :121-124). Kept for the A/B
        quantification of this deviation (PERF.md round 3)."""
        if key is None:
            key = jax.random.PRNGKey(1)
        test_x = jnp.asarray(test_x)
        d = self.train_x.shape[-1]
        h = d + 2 if self._has_noise else d + 1
        L_h = _unpack_tril(self.params["hyper_L_vec"], h)
        eps = jax.random.normal(key, (num_samples, h), test_x.dtype)
        thetas = self.params["hyper_mu"][None, :] + eps @ L_h.T
        q_L = _build_L(self.params["q_sqrt_raw"])

        def one(s):
            if transform == "ref_softplus":
                s = jax.nn.softplus(s)
            kp, log_noise = _hyper_to_kernel_params(s, d, self._has_noise)
            mean, var = _whitened_q_f(self.kernel, kp, self.params["Z"],
                                      self.params["q_mu"], q_L, test_x,
                                      self.jitter)
            v = var[:, 0]
            if include_noise and self._has_noise:
                v = v + jnp.exp(log_noise)
            return mean[:, 0], v

        means, vars_ = jax.jit(jax.vmap(one))(thetas)
        ok = jnp.all(jnp.isfinite(means), axis=-1) & \
             jnp.all(jnp.isfinite(vars_), axis=-1)
        return means[ok], vars_[ok]

    def mixture_predictive_proba(self, test_x, num_samples: int = 100,
                                 key=None):
        """Classification: per-hyper-sample P(y=1|x) under the exact probit
        integral (mixture over q(theta)). Shape (num_samples, Nt)."""
        from ..likelihoods import BernoulliProbit
        assert isinstance(self.likelihood, BernoulliProbit), \
            "mixture_predictive_proba requires a BernoulliProbit likelihood"
        means, vars_ = self.mixture_posterior_predictive(
            test_x, num_samples, key, include_noise=False)
        return jax.scipy.stats.norm.cdf(means / jnp.sqrt(1.0 + vars_))

    @property
    def Z(self):
        return self.params["Z"]


@partial(jax.jit, static_argnums=(0, 1, 6, 7, 8, 9, 10, 11))
def _run_bsvi(kernel, likelihood, X, y, jitter, params, optimizer, num_epochs,
              batch_size, steps_per_epoch, num_hyper_samples, prior_var, key):
    N = X.shape[0]
    opt_state = optimizer.init(params)

    def epoch(carry, ekey):
        p, s = carry
        pkey, skey = jax.random.split(ekey)
        perm = jax.random.permutation(pkey, N)[:steps_per_epoch * batch_size]
        idx = perm.reshape(steps_per_epoch, batch_size)
        skeys = jax.random.split(skey, steps_per_epoch)

        def step(carry, inp):
            p, s = carry
            bidx, bkey = inp
            xb, yb = X[bidx], y[bidx]

            def loss(q):
                return -bsvgp_elbo(kernel, likelihood, q, xb, yb, N, bkey,
                                   num_hyper_samples, prior_var, jitter)

            val, g = jax.value_and_grad(loss)(p)
            # zero_nans-style guard (matches the fused kernel's Adam)
            g = jax.tree_util.tree_map(
                lambda a: jnp.where(jnp.isfinite(a), a, 0.0), g)
            updates, s = optimizer.update(g, s, p)
            return (optax.apply_updates(p, updates), s), val

        (p, s), vals = jax.lax.scan(step, (p, s), (idx, skeys))
        return (p, s), jnp.mean(vals)

    ekeys = jax.random.split(key, num_epochs)
    (params, _), losses = jax.lax.scan(epoch, (params, opt_state), ekeys)
    return params, losses


@partial(jax.jit, static_argnums=(0, 3, 5, 6, 7, 8, 9, 10))
def _run_bsvi_fused(kernel, X, y, jitter, params, num_epochs, batch_size,
                    steps_per_epoch, S, prior_var, lr, key):
    """Whole-epoch fused BayesianSVGP SVI: same key schedule as
    :func:`_run_bsvi` (per-epoch permutation key + per-step eps keys) with
    every Adam step in-kernel (ops/fused_svi.make_fused_bsvgp). Gaussian
    likelihood only; eps drawn in f32 (the kernel dtype)."""
    from ..ops.fused_svi import make_fused_bsvgp

    N = X.shape[0]
    M = params["q_mu"].shape[0]
    d = X.shape[-1]
    h = d + 2
    dt = jnp.float32
    nbp = -(-batch_size // 8) * 8
    Sp = 8
    chunk = make_fused_bsvgp(N, batch_size, M, d, S, prior_var, jitter,
                             steps_per_call=steps_per_epoch, lr=lr)

    il = jnp.tril_indices(h)
    Mp = max(128, -(-M // 128) * 128)
    pp = {
        "hmu": jnp.zeros((1, 128), dt).at[0, :h].set(
            params["hyper_mu"].astype(dt)),
        "Lraw": jnp.zeros((128, 128), dt).at[il].set(
            params["hyper_L_vec"].astype(dt)),
        "Z": jnp.zeros((Mp, 128), dt).at[:M, :d].set(
            params["Z"].astype(dt)),
        "q_mu": jnp.zeros((Mp, 1), dt).at[:M].set(
            params["q_mu"].astype(dt)),
        "q_raw": jnp.zeros((Mp, Mp), dt).at[:M, :M].set(
            params["q_sqrt_raw"][0].astype(dt)),
    }
    mm = {k: jnp.zeros_like(v) for k, v in pp.items()}
    vv = {k: jnp.zeros_like(v) for k, v in pp.items()}

    def epoch(carry, ekey):
        pp, mm, vv, t0 = carry
        pkey, skey = jax.random.split(ekey)
        perm = jax.random.permutation(pkey, N)[:steps_per_epoch * batch_size]
        idx = perm.reshape(steps_per_epoch, batch_size)
        rows = jnp.zeros((steps_per_epoch, nbp, 128), dt)
        rows = rows.at[:, :batch_size, :d].set(X[idx].astype(dt))
        rows = rows.at[:, :batch_size, 127].set(y[idx].astype(dt))
        slab = rows.reshape(steps_per_epoch * nbp, 128)
        skeys = jax.random.split(skey, steps_per_epoch)
        eps = jax.vmap(lambda k: jax.random.normal(k, (S, h), dt))(skeys)
        erows = jnp.zeros((steps_per_epoch, Sp, 128), dt)
        erows = erows.at[:, :S, :h].set(eps)
        eps_slab = erows.reshape(steps_per_epoch * Sp, 128)
        pp, mm, vv, losses = chunk(pp, mm, vv, slab, eps_slab, t0)
        return (pp, mm, vv, t0 + steps_per_epoch), jnp.mean(losses)

    ekeys = jax.random.split(key, num_epochs)
    (pp, _, _, _), losses = jax.lax.scan(
        epoch, (pp, mm, vv, jnp.asarray(0.0, dt)), ekeys)
    out = {
        "kernel": params["kernel"],
        "Z": pp["Z"][:M, :d].astype(X.dtype),
        "q_mu": pp["q_mu"][:M].astype(X.dtype),
        "q_sqrt_raw": pp["q_raw"][:M, :M][None].astype(X.dtype),
        "hyper_mu": pp["hmu"][0, :h].astype(X.dtype),
        "hyper_L_vec": pp["Lraw"][il].astype(X.dtype),
    }
    return out, losses
