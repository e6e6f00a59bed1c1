"""SVGP — Hensman (2013/15) uncollapsed variational sparse GP with SVI.

Rebuild of ``StochasticVariationalGP`` (models/svgp.py:24-141): whitened
q(u) = N(m, L L^T) with free Cholesky (gpytorch CholeskyVariationalDistribution,
models/svgp.py:37), learnable inducing locations (models/svgp.py:43,46),
minibatch ELBO with num_data scaling (VariationalELBO(num_data=N),
models/svgp.py:90), non-Gaussian likelihoods (the reference routes
classification through a multitask wrapper chosen by probing
``likelihood.noise``, models/svgp.py:40-46 — here the likelihood object
declares its latent count directly).

TPU-native design: the entire multi-epoch minibatch loop is a nested
``lax.scan`` under one jit (epoch-level permutation + step-level dynamic
slicing), instead of a Python epoch loop over a host DataLoader
(models/svgp.py:93-127). C latent functions are handled by batched (C-leading)
cholesky/solves — one MXU-batched factorisation, not a loop.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..config import default_jitter
from ..kernels import Kernel, default_rbf
from ..likelihoods import GaussianLikelihood, Likelihood, Softmax
from ..ops.linalg import safe_cholesky, tri_solve

__all__ = ["StochasticVariationalGP", "svgp_elbo", "svgp_predict_f"]


def _build_L(q_sqrt_raw: jnp.ndarray) -> jnp.ndarray:
    """(..., M, M) raw -> lower-tri with exp diag (positive-definite chol)."""
    L = jnp.tril(q_sqrt_raw, k=-1)
    diag = jnp.exp(jnp.diagonal(q_sqrt_raw, axis1=-2, axis2=-1))
    return L + jnp.vectorize(jnp.diag, signature="(m)->(m,m)")(diag)


def _whitened_q_f(kernel, kp, Z, q_mu, q_L, X, jitter, full_cov=False):
    """q(f(X)) moments under whitened u = Lk v, q(v)=N(q_mu, q_L q_L^T).

    q_mu: (M, C); q_L: (C, M, M). Returns mean (Nb, C), var (Nb, C).
    """
    Kmm = kernel.gram(kp, Z, Z)
    Lk = safe_cholesky(Kmm, jitter, relative=True)
    Kms = kernel.gram(kp, Z, X)
    A = tri_solve(Lk, Kms)                         # (M, Nb)
    mean = A.T @ q_mu                              # (Nb, C)
    SA = jnp.einsum("cmk,kn->cmn", jnp.swapaxes(q_L, -1, -2), A)  # L^T A
    if full_cov:
        Kss = kernel.gram(kp, X, X)
        cov = Kss[None] - (A.T @ A)[None] + jnp.einsum("cmn,cmp->cnp", SA, SA)
        return mean, cov
    kdiag = kernel.diag(kp, X)
    var = kdiag[None, :] - jnp.sum(A * A, axis=0)[None, :] \
        + jnp.sum(SA * SA, axis=1)                 # (C, Nb)
    return mean, jnp.maximum(var.T, 1e-12)


def _kl_whitened(q_mu, q_L):
    """KL( N(q_mu, q_L q_L^T) || N(0, I) ), summed over C latents."""
    M = q_mu.shape[0]
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(q_L, axis1=-2, axis2=-1)))
    tr = jnp.sum(q_L * q_L)
    return 0.5 * (tr + jnp.sum(q_mu * q_mu) - q_mu.size - logdet)


def svgp_elbo(kernel: Kernel, likelihood: Likelihood, params: dict,
              X_batch: jnp.ndarray, y_batch: jnp.ndarray, num_data: int,
              jitter: Optional[float] = None, key=None) -> jnp.ndarray:
    """Minibatch ELBO: (N/b) sum_batch E_q[log p(y_i|f_i)] - KL. ``key``
    drives the MC expectations of likelihoods without quadrature rules
    (Softmax) — fresh noise per step instead of a frozen sample set."""
    q_L = _build_L(params["q_sqrt_raw"])
    mean, var = _whitened_q_f(kernel, params["kernel"], params["Z"],
                              params["q_mu"], q_L, X_batch, jitter)
    if isinstance(likelihood, Softmax):
        ve = likelihood.variational_expectation(params.get("lik", {}), mean,
                                                var, y_batch, key=key)
    else:
        ve = likelihood.variational_expectation(params.get("lik", {}),
                                                mean[:, 0], var[:, 0], y_batch)
    scale = num_data / X_batch.shape[0]
    return scale * jnp.sum(ve) - _kl_whitened(params["q_mu"], q_L)


def svgp_predict_f(kernel: Kernel, params: dict, X_test: jnp.ndarray,
                   jitter: Optional[float] = None, full_cov: bool = False):
    q_L = _build_L(params["q_sqrt_raw"])
    return _whitened_q_f(kernel, params["kernel"], params["Z"],
                         params["q_mu"], q_L, X_test, jitter, full_cov)


class StochasticVariationalGP:
    """Reference API (models/svgp.py:24): ctor
    ``(train_x, train_y, likelihood, Z_init)``, ``train_model``,
    ``posterior_predictive``."""

    def __init__(self, train_x, train_y, likelihood: Likelihood | None = None,
                 Z_init=None, kernel: Kernel | None = None,
                 jitter: float | None = None):
        self.train_x = jnp.asarray(train_x)
        self.train_y = jnp.asarray(train_y)
        d = self.train_x.shape[-1]
        self.kernel = kernel if kernel is not None else default_rbf(ard=True)
        self.likelihood = likelihood if likelihood is not None else GaussianLikelihood()
        self.jitter = default_jitter(self.train_x.dtype) if jitter is None else jitter
        Z_init = jnp.asarray(Z_init) if Z_init is not None else self.train_x[:128]
        Z_init = Z_init.astype(self.train_x.dtype)
        M = Z_init.shape[0]
        C = self.likelihood.num_classes if isinstance(self.likelihood, Softmax) else 1
        self.num_latents = C
        dt = self.train_x.dtype
        self.params = {
            "kernel": self.kernel.init_params(d),
            "lik": self.likelihood.init_params(),
            "Z": Z_init,
            "q_mu": jnp.zeros((M, C), dt),
            # raw diag 0 -> L diag exp(0)=1 (prior init, whitened)
            "q_sqrt_raw": jnp.zeros((C, M, M), dt),
        }

    def loss_fn(self, params, X_batch, y_batch):
        return -svgp_elbo(self.kernel, self.likelihood, params, X_batch,
                          y_batch, self.train_x.shape[0], self.jitter)

    def _fused_likelihood_tag(self):
        """Kernel likelihood tag, or None if the likelihood has no fused
        data term (custom likelihoods)."""
        from ..likelihoods import BernoulliProbit, PoissonLogCox
        if type(self.likelihood) is GaussianLikelihood:
            return "gauss"
        if type(self.likelihood) is BernoulliProbit:
            return "bernoulli_probit"
        if type(self.likelihood) is PoissonLogCox:
            return "poisson"
        if type(self.likelihood) is Softmax:
            return "softmax"
        return None

    def _fused_svi_ok(self, batch_size) -> bool:
        """Gate for the whole-epoch Pallas SVI kernel (ops/fused_svi):
        Scale(RBF-ARD) x {Gaussian, Bernoulli-probit, Poisson, Softmax},
        M <= 512, batch <= 512, on TPU. GGP_FUSED_SVI=0 disables."""
        import os
        if os.environ.get("GGP_FUSED_SVI", "1") == "0":
            return False
        if jax.default_backend() != "tpu":
            return False
        from ..kernels.base import RBF, Scale
        if not (isinstance(self.kernel, Scale)
                and type(self.kernel.base) is RBF and self.kernel.base.ard):
            return False
        tag = self._fused_likelihood_tag()
        if tag is None:
            return False
        M = self.params["Z"].shape[0]
        d = self.train_x.shape[-1]
        if tag == "softmax":
            # multi-latent kernel envelope (ops/fused_svi
            # make_fused_svi_softmax): the eps slab for a whole epoch must
            # fit VMEM alongside the C (Mp,Mp) q_raw stacks
            from ..ops.fused_svi import make_fused_svi_softmax
            N = self.train_x.shape[0]
            bs = min(batch_size, N)
            steps = N // bs
            C = self.likelihood.num_classes
            mc = self.likelihood.num_mc
            if mc % 2 != 0:
                return False
            probe = make_fused_svi_softmax(N, bs, M, d, C, mc // 2,
                                           self.jitter, steps_per_call=steps)
            return probe is not None
        return M <= 512 and batch_size <= 512 and d + 2 <= 127

    def train_model(self, optimizer=None, num_epochs: int = 100,
                    batch_size: int = 200, lr: float = 0.01, key=None,
                    verbose: bool = False):
        """Jitted SVI: per-epoch permutation, per-step dynamic-slice batches
        (reference loop: models/svgp.py:93-127). Returns per-epoch losses."""
        if key is None:
            key = jax.random.PRNGKey(0)
        N = self.train_x.shape[0]
        batch_size = min(batch_size, N)
        steps = N // batch_size
        if optimizer is None and self._fused_svi_ok(batch_size):
            # whole-epoch Pallas kernel: every Adam step (gram + blocked
            # chol + hand adjoint + update) in-kernel (ops/fused_svi);
            # same batching schedule and optax-adam trajectory as the XLA
            # path (tests/test_fused_svi.py)
            tag = self._fused_likelihood_tag()
            if tag == "softmax":
                self.params, losses = _run_svi_fused_softmax(
                    self.train_x, self.train_y, self.jitter, self.params,
                    num_epochs, batch_size, steps, lr, key,
                    self.likelihood.num_classes, self.likelihood.num_mc)
            else:
                self.params, losses = _run_svi_fused(
                    self.kernel, self.train_x, self.train_y, self.jitter,
                    self.params, num_epochs, batch_size, steps, lr, key,
                    tag)
            if verbose:
                print(f"SVGP(fused): epoch loss {float(losses[0]):.3f} -> "
                      f"{float(losses[-1]):.3f}")
            return losses
        if optimizer is None:
            optimizer = optax.adam(lr)
        self.params, losses = _run_svi(
            self.kernel, self.likelihood, self.train_x, self.train_y,
            self.jitter, self.params, optimizer, num_epochs, batch_size,
            steps, key)
        if verbose:
            print(f"SVGP: epoch loss {float(losses[0]):.3f} -> "
                  f"{float(losses[-1]):.3f}")
        return losses

    def posterior_predictive(self, test_x, full_cov: bool = False,
                             include_likelihood: bool = True):
        """q(f*) or the y-predictive (reference returns the y-predictive
        under fast_pred_var, models/svgp.py:132-141)."""
        test_x = jnp.asarray(test_x)
        mean, var = svgp_predict_f(self.kernel, self.params, test_x,
                                   self.jitter, full_cov)
        if full_cov:
            if include_likelihood and isinstance(self.likelihood,
                                                 GaussianLikelihood):
                noise = jnp.exp(self.params["lik"]["log_noise"])
                var = var + noise * jnp.eye(test_x.shape[0], dtype=var.dtype)
            if self.num_latents == 1:
                return mean[:, 0], var[0]
            return mean, var
        if not include_likelihood:
            if self.num_latents == 1:
                return mean[:, 0], var[:, 0]
            return mean, var
        if isinstance(self.likelihood, Softmax):
            # explicit fixed key: the MC class-probability estimate is a
            # deterministic approximation by choice here; pass key= for
            # stochastic estimates
            return self.likelihood.predictive(self.params["lik"], mean, var,
                                              key=jax.random.PRNGKey(0))
        m, v = self.likelihood.predictive(self.params["lik"], mean[:, 0],
                                          var[:, 0])
        return m, v

    @property
    def Z(self):
        return self.params["Z"]


@partial(jax.jit, static_argnums=(0, 1, 6, 7, 8, 9))
def _run_svi(kernel, likelihood, X, y, jitter, params, optimizer, num_epochs,
             batch_size, steps_per_epoch, key):
    N = X.shape[0]
    opt_state = optimizer.init(params)

    def epoch(carry, ekey):
        p, s = carry
        perm = jax.random.permutation(ekey, N)[:steps_per_epoch * batch_size]
        idx = perm.reshape(steps_per_epoch, batch_size)

        skeys = jax.random.split(jax.random.fold_in(ekey, 1),
                                 idx.shape[0])

        def step(carry, inp):
            p, s = carry
            bidx, bkey = inp
            xb, yb = X[bidx], y[bidx]

            def loss(q):
                return -svgp_elbo(kernel, likelihood, q, xb, yb, N, jitter,
                                  key=bkey)

            val, g = jax.value_and_grad(loss)(p)
            # zero_nans-style guard (matches the fused kernel's Adam): a
            # borderline non-PSD Kmm or an overflowed poisson rate must
            # not poison optimizer state for the rest of training
            g = jax.tree_util.tree_map(
                lambda a: jnp.where(jnp.isfinite(a), a, 0.0), g)
            updates, s = optimizer.update(g, s, p)
            return (optax.apply_updates(p, updates), s), val

        (p, s), vals = jax.lax.scan(step, (p, s), (idx, skeys))
        return (p, s), jnp.mean(vals)

    ekeys = jax.random.split(key, num_epochs)
    (params, _), losses = jax.lax.scan(epoch, (params, opt_state), ekeys)
    return params, losses


@partial(jax.jit, static_argnums=(2, 4, 5, 6, 7, 9, 10))
def _run_svi_fused_softmax(X, y, jitter, params, num_epochs, batch_size,
                           steps_per_epoch, lr, key, C, num_mc):
    """Whole-epoch fused softmax SVI (ops/fused_svi make_fused_svi_softmax).

    Same batching schedule AND per-step eps draws as :func:`_run_svi` with
    a Softmax likelihood — the epoch key is folded and split exactly as
    there, and each step's antithetic normal block is drawn with the step
    key the way Softmax.variational_expectation draws it — so the fused
    trajectory replicates the XLA optax trajectory step-for-step."""
    from ..ops.fused_svi import make_fused_svi_softmax

    N = X.shape[0]
    M = params["q_mu"].shape[0]
    d = X.shape[-1]
    dt = jnp.float32
    nbp = -(-batch_size // 8) * 8
    n_half = num_mc // 2
    Sp = -(-n_half // 8) * 8
    svi = make_fused_svi_softmax(N, batch_size, M, d, C, n_half, jitter,
                                 steps_per_call=steps_per_epoch, lr=lr)

    Mp = max(128, -(-M // 128) * 128)
    hyp = jnp.zeros((1, 128), dt)
    hyp = hyp.at[0, :d].set(params["kernel"]["base"]["log_lengthscale"])
    hyp = hyp.at[0, d].set(params["kernel"]["log_outputscale"])
    pp = {
        "hyp": hyp,
        "Z": jnp.zeros((Mp, 128), dt).at[:M, :d].set(params["Z"]),
        "q_mu": jnp.zeros((Mp, 128), dt).at[:M, :C].set(params["q_mu"]),
        "q_raw": tuple(jnp.zeros((Mp, Mp), dt).at[:M, :M].set(
            params["q_sqrt_raw"][c]) for c in range(C)),
    }
    mm = jax.tree_util.tree_map(jnp.zeros_like, pp)
    vv = jax.tree_util.tree_map(jnp.zeros_like, pp)

    def epoch(carry, ekey):
        pp, mm, vv, t0 = carry
        perm = jax.random.permutation(ekey, N)[:steps_per_epoch * batch_size]
        idx = perm.reshape(steps_per_epoch, batch_size)
        rows = jnp.zeros((steps_per_epoch, nbp, 128), dt)
        rows = rows.at[:, :batch_size, :d].set(X[idx].astype(dt))
        rows = rows.at[:, :batch_size, 127].set(y[idx].astype(dt))
        slab = rows.reshape(steps_per_epoch * nbp, 128)
        skeys = jax.random.split(jax.random.fold_in(ekey, 1),
                                 steps_per_epoch)
        eps = jax.vmap(lambda k: jax.random.normal(
            k, (n_half, batch_size, C), X.dtype))(skeys)
        # kernel layout: (step, class, samples-in-sublanes, points-in-lanes)
        erows = jnp.zeros((steps_per_epoch, C, Sp, nbp), dt)
        erows = erows.at[:, :, :n_half, :batch_size].set(
            jnp.transpose(eps, (0, 3, 1, 2)).astype(dt))
        eps_slab = erows.reshape(steps_per_epoch * C * Sp, nbp)
        pp, mm, vv, losses = svi(pp, mm, vv, slab, eps_slab, t0)
        return (pp, mm, vv, t0 + steps_per_epoch), jnp.mean(losses)

    ekeys = jax.random.split(key, num_epochs)
    (pp, _, _, _), losses = jax.lax.scan(epoch, (pp, mm, vv,
                                                 jnp.asarray(0.0, dt)),
                                         ekeys)
    out = {
        "kernel": {"base": {"log_lengthscale":
                            pp["hyp"][0, :d].astype(X.dtype)},
                   "log_outputscale": pp["hyp"][0, d].astype(X.dtype)},
        "lik": params.get("lik", {}),
        "Z": pp["Z"][:M, :d].astype(X.dtype),
        "q_mu": pp["q_mu"][:M, :C].astype(X.dtype),
        "q_sqrt_raw": jnp.stack([pp["q_raw"][c][:M, :M]
                                 for c in range(C)]).astype(X.dtype),
    }
    return out, losses


@partial(jax.jit, static_argnums=(0, 3, 5, 6, 7, 8, 10))
def _run_svi_fused(kernel, X, y, jitter, params, num_epochs, batch_size,
                   steps_per_epoch, lr, key, lik_tag):
    """Whole-epoch fused SVI: same batching schedule as :func:`_run_svi`
    (per-epoch permutation with the epoch key), every Adam step in-kernel
    (ops/fused_svi). ``lik_tag`` selects the in-kernel data term
    ("gauss" / "bernoulli_probit" / "poisson"); the batch key is unused
    (quadrature/closed forms, no MC)."""
    from ..ops.fused_svi import make_fused_svi

    N = X.shape[0]
    M, _ = params["q_mu"].shape
    d = X.shape[-1]
    dt = jnp.float32
    nbp = -(-batch_size // 8) * 8
    svi = make_fused_svi(N, batch_size, M, d, jitter,
                         steps_per_call=steps_per_epoch, lr=lr,
                         likelihood=lik_tag)

    # pack params into the padded kernel layout
    Mp = max(128, -(-M // 128) * 128)
    hyp = jnp.zeros((1, 128), dt)
    hyp = hyp.at[0, :d].set(params["kernel"]["base"]["log_lengthscale"])
    hyp = hyp.at[0, d].set(params["kernel"]["log_outputscale"])
    if lik_tag == "gauss":
        hyp = hyp.at[0, d + 1].set(params["lik"]["log_noise"])
    pp = {
        "hyp": hyp,
        "Z": jnp.zeros((Mp, 128), dt).at[:M, :d].set(params["Z"]),
        "q_mu": jnp.zeros((Mp, 1), dt).at[:M].set(params["q_mu"]),
        "q_raw": jnp.zeros((Mp, Mp), dt).at[:M, :M].set(
            params["q_sqrt_raw"][0]),
    }
    mm = {k: jnp.zeros_like(v) for k, v in pp.items()}
    vv = {k: jnp.zeros_like(v) for k, v in pp.items()}
    lgam = (jax.scipy.special.gammaln(y.astype(dt) + 1.0)
            if lik_tag == "poisson" else None)

    def epoch(carry, ekey):
        pp, mm, vv, t0 = carry
        perm = jax.random.permutation(ekey, N)[:steps_per_epoch * batch_size]
        idx = perm.reshape(steps_per_epoch, batch_size)
        rows = jnp.zeros((steps_per_epoch, nbp, 128), dt)
        rows = rows.at[:, :batch_size, :d].set(X[idx].astype(dt))
        rows = rows.at[:, :batch_size, 127].set(y[idx].astype(dt))
        if lgam is not None:
            rows = rows.at[:, :batch_size, 126].set(lgam[idx])
        slab = rows.reshape(steps_per_epoch * nbp, 128)
        pp, mm, vv, losses = svi(pp, mm, vv, slab, t0)
        return (pp, mm, vv, t0 + steps_per_epoch), jnp.mean(losses)

    ekeys = jax.random.split(key, num_epochs)
    (pp, _, _, _), losses = jax.lax.scan(epoch, (pp, mm, vv,
                                                 jnp.asarray(0.0, dt)),
                                         ekeys)
    out = {
        "kernel": {"base": {"log_lengthscale":
                            pp["hyp"][0, :d].astype(X.dtype)},
                   "log_outputscale": pp["hyp"][0, d].astype(X.dtype)},
        "lik": ({"log_noise": pp["hyp"][0, d + 1].astype(X.dtype)}
                if lik_tag == "gauss" else {}),
        "Z": pp["Z"][:M, :d].astype(X.dtype),
        "q_mu": pp["q_mu"][:M].astype(X.dtype),
        "q_sqrt_raw": pp["q_raw"][:M, :M][None].astype(X.dtype),
    }
    return out, losses
