"""Fused SVGP SVI: whole minibatch-Adam steps inside one Pallas kernel.

The reference's SVGP training loop (models/svgp.py:88-127) drives one
gpytorch ELBO + Adam step per Python iteration; our XLA path already scans
steps under jit, but each step still pays this runtime's per-iteration
custom-call floor for the Kmm Cholesky (~80-90 us, PERF.md) — at M=128,
batch=200 that overhead dominates the step. Here the ENTIRE step — Gram
matrices, blocked in-VMEM Cholesky, whitened-conditional moments, the
hand-derived gradient wrt ALL parameters (hypers, Z, q_mu, packed q_L),
and the Adam update — runs in-kernel, and CHUNKS of steps run per call on
pre-gathered minibatch slabs.

Scope: Scale(RBF-ARD) kernel x Gaussian likelihood, single latent (C=1),
M <= 128, minibatch rows <= 512. The math mirrors models/svgp.py:
  q_L  = tril(q_raw,-1) + diag(exp(diag q_raw))       (_build_L)
  Lk   = chol(Kmm + jitter*max(sf2,1) I)              (relative jitter)
  A    = Lk^-1 Kms ; mean = A^T q_mu ; SA = q_L^T A
  var  = max(kdiag - colsum A^2 + colsum SA^2, 1e-12)
  ELBO = (N/b) sum_i [-(log(2 pi s2) + ((y-mean)^2 + var)/s2)/2] - KL
  KL   = (||q_L||^2 + ||q_mu||^2 - M - 2 sum log diag q_L)/2

Gradient structure (loss = -ELBO; all verified against jax.grad,
tests/test_fused_svi.py):
  alpha = (N/b) e / s2,  beta = -(N/b)/(2 s2)     [dloss/dvar_j = -beta]
  G     = dELBO/dA = q_mu alpha^T + 2 beta (q_L SA - A) (masked where the
          var clamp is active)
  Kms_b = Lk^-T G ;  Kmm_b = -sym(Lk^-T Phi(G A^T) Lk^-1)
then the RBF-ARD chain rules for (log_ls, log_os, Z) over Kmm_b/Kms_b —
the same Pmm/Pms patterns as the sampler adjoints (ops/fused_bound.py) plus
the inducing-location terms dZs = -2(rowsum(Pmm) o Zs - Pmm Zs)
- (rowsum(Pms) o Zs - Pms Xs), rescaled by 1/ls.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_bound import _dg, _round_up

__all__ = ["svgp_gauss_loss_vg", "svgp_loss_vg", "make_fused_svi",
           "bsvgp_loss_vg", "make_fused_bsvgp", "quad_table",
           "svgp_softmax_loss_vg", "make_fused_svi_softmax"]

_LANES = 128

# Non-Gaussian data terms (round 3): the reference trains classification
# and count SVGPs through gpytorch's VariationalELBO with Bernoulli /
# Poisson likelihoods (reference models/svgp.py:40-46, README.md:5-11).
# Our XLA path evaluates E_q[log p(y|f)] by 20-node Gauss-Hermite
# (likelihoods.py Likelihood.variational_expectation); the fused kernel
# uses the SAME nodes/weights, stacked as rows of one (QUAD_ROWS, NBp)
# block so the whole quadrature is ~15 elementwise VPU ops.
QUAD_N = 20
QUAD_ROWS = 32  # sublane-aligned padding; pad rows carry zero weight

_LOG_HALF = math.log(0.5)
_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)
# erfc rational approximation (Chebyshev-fitted, fractional error
# < 1.2e-7 for all x): erfc(x) = t exp(-x^2 + c(t)), t = 1/(1 + x/2).
# Mosaic has no erf primitive; this form is exp/log-only AND its
# exp(-x^2) factor cancels exactly in the Mills ratio pdf/ndtr used for
# the quadrature gradients.
_ERFC_C = (-1.26551223, 1.00002368, 0.37409196, 0.09678418, -0.18628806,
           0.27886807, -1.13520398, 1.48851587, -0.82215223, 0.17087277)


def quad_table(dtype=jnp.float32):
    """(QUAD_ROWS, 128) table: lane 0 = Gauss-Hermite nodes, lane 1 =
    normalized weights (rows >= QUAD_N zero). Kernel input — Pallas
    cannot capture array constants."""
    import numpy as np
    x, w = np.polynomial.hermite_e.hermegauss(QUAD_N)
    w = w / np.sum(w)
    tab = np.zeros((QUAD_ROWS, _LANES), np.float64)
    tab[:QUAD_N, 0] = x
    tab[:QUAD_N, 1] = w
    return jnp.asarray(tab, dtype)


def _erfc_c_poly(t):
    """c(t) Horner evaluation for the erfc approximation."""
    c = jnp.full_like(t, _ERFC_C[-1])
    for coef in _ERFC_C[-2::-1]:
        c = c * t + coef
    return c


def _log_ndtr_and_ratio(z):
    """Elementwise (log Phi(z), pdf(z)/Phi(z)) — Mosaic-lowerable.

    z <= 0: Phi(z) = erfc(-z/sqrt2)/2 = t exp(-z^2/2 + c)/2, so
    log Phi = log(t/2) - z^2/2 + c and the ratio's exp(-z^2/2) cancels:
    pdf/Phi = 2/(sqrt(2 pi) t e^c) — no underflow anywhere.
    z > 0: Phi = 1 - erfc(z/sqrt2)/2 in [1/2, 1], both direct."""
    ax = jnp.abs(z) * _INV_SQRT2
    t = 1.0 / (1.0 + 0.5 * ax)
    c = _erfc_c_poly(t)
    ec = jnp.exp(c)
    neg = z <= 0.0
    lp_neg = _LOG_HALF + jnp.log(t) - 0.5 * z * z + c
    half_erfc = 0.5 * t * jnp.exp(-0.5 * z * z + c)
    ndtr_pos = 1.0 - half_erfc
    lp_pos = jnp.log(ndtr_pos)
    lp = jnp.where(neg, lp_neg, lp_pos)
    r_neg = (2.0 * _INV_SQRT2PI) / (t * ec)
    r_pos = _INV_SQRT2PI * jnp.exp(-0.5 * z * z) / ndtr_pos
    r = jnp.where(neg, r_neg, r_pos)
    return lp, r


def svgp_gauss_loss_vg(params_pad, Xb, yb, num_data, nb, m, d, jitter,
                       chol_inv=None):
    """Gaussian-likelihood alias of :func:`svgp_loss_vg` (original API)."""
    return svgp_loss_vg(params_pad, Xb, yb, num_data, nb, m, d, jitter,
                        chol_inv=chol_inv, likelihood="gauss")


def svgp_loss_vg(params_pad, Xb, yb, num_data, nb, m, d, jitter,
                 chol_inv=None, likelihood="gauss", quad=None):
    """loss and gradients for one minibatch, padded layout.

    params_pad: dict of padded arrays —
      "hyp"   (1,128): lanes [log_ls (d), log_os, log_noise (gauss only)]
      "Z"     (Mp,128): rows :m, lanes :d
      "q_mu"  (Mp,1)
      "q_raw" (Mp,Mp)
    Xb (NBp,128) rows :nb lanes :d with y packed in lane 127; ``yb`` unused
    placeholder for clarity (y comes from lane 127). Returns (loss, grads)
    with grads matching params_pad's structure (zero in padding).

    likelihood selects the data term (reference trains all three through
    gpytorch's VariationalELBO, models/svgp.py:88-127):
      "gauss":            closed form; noise hyper in lane d+1.
      "bernoulli_probit": E[log Phi((2y-1) f)] by QUAD_N-node Gauss-Hermite
                          (same rule as likelihoods.Likelihood default);
                          requires ``quad`` = :func:`quad_table`.
      "poisson":          log-Cox closed form y mu - exp(mu + var/2)
                          - log y!, with lgamma(y+1) packed in lane 126
                          (constant wrt params; Mosaic has no lgamma).
    """
    dt = jnp.float32
    hyp = params_pad["hyp"]
    Zp = params_pad["Z"]
    q_mu = params_pad["q_mu"]
    q_raw = params_pad["q_raw"]
    Mp = Zp.shape[0]
    NBp = Xb.shape[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    rown = jax.lax.broadcasted_iota(jnp.int32, (NBp, 1), 0)
    coln = jax.lax.broadcasted_iota(jnp.int32, (1, NBp), 1)
    eyeM = (rowm == colm).astype(dt)
    mrow = (rowm < m).astype(dt)
    mcol = (colm < m).astype(dt)
    nmask = (rown < nb).astype(dt)                      # (NBp,1)
    nmaskT = (coln < nb).astype(dt)                     # (1,NBp)
    ls_mask = (lane < d).astype(dt)
    one11 = jnp.ones((1, 1), dt)
    ey = (lane == (_LANES - 1)).astype(dt)

    inv_ls = jnp.exp(-hyp) * ls_mask
    log_os = jnp.sum(hyp * (lane == d).astype(dt))
    log_noise = jnp.sum(hyp * (lane == d + 1).astype(dt))
    sf2 = jnp.exp(log_os)
    s2 = jnp.exp(log_noise)
    scale = jnp.asarray(num_data / nb, dt)

    yv = _dg(Xb, ey, 1, 1) * nmask                      # (NBp,1) targets
    Zs = Zp * inv_ls
    Xs = Xb * inv_ls                                    # y lane zeroed
    Zs2 = Zs * Zs
    Xs2 = Xs * Xs
    zn = jnp.sum(Zs2, axis=1, keepdims=True)
    xn = jnp.sum(Xs2, axis=1, keepdims=True)
    znT = _dg(one11, zn, 1, 1)
    xnT = _dg(one11, xn, 1, 1)
    r2_mm = jnp.maximum(zn + znT - 2.0 * _dg(Zs, Zs, 1, 1), 0.0)
    Kmm = sf2 * jnp.exp(-0.5 * r2_mm)
    Kmm = jnp.where((mrow * mcol) > 0, Kmm, eyeM)
    jit_scale = jnp.maximum(sf2, 1.0)
    Kmm_j = Kmm + (jitter * jit_scale) * eyeM
    r2_ms = jnp.maximum(zn + xnT - 2.0 * _dg(Zs, Xs, 1, 1), 0.0)
    Kms = sf2 * jnp.exp(-0.5 * r2_ms) * mrow * nmaskT   # (Mp,NBp)

    from .fused_bound import (block_chol_u, block_ut_inv, ut_solve_vec,
                              ut_t_solve_vec)
    # modified-Cholesky pivot floor (outputscale-relative): during SVI the
    # inducing locations MOVE, and a transient near-duplicate Z pair makes
    # f32 Kmm borderline non-PSD — the samplers' NaN-on-non-PSD semantics
    # would permanently poison Adam state here, so clamp instead (the
    # reference escalates jitter in psd_safe_cholesky for the same reason)
    pivot_floor = 1e-6 * jit_scale
    if chol_inv is None:
        U = block_chol_u(Kmm_j, block=32, pivot_floor=pivot_floor)
        V = block_ut_inv(U, block=32)                   # V = Lk^-T
    else:
        U, V = chol_inv(Kmm_j, pivot_floor)             # in-kernel path
    # blocked SUBSTITUTION for the conditional (not the formed inverse):
    # 1-D/clustered inducing sets drive cond(Kmm) high during training and
    # V^T Kms loses ~cond*eps digits where the solve stays backward-stable
    A = ut_t_solve_vec(U, V, Kms, block=64)             # Lk^-1 Kms

    # q_L from packed raw: tril(-1) + exp diag, masked to the m block
    diag_raw = jnp.sum(q_raw * eyeM, axis=1, keepdims=True)     # (Mp,1)
    strict = (rowm > colm).astype(dt)
    qL = (q_raw * strict + jnp.exp(diag_raw) * eyeM)
    qL = qL * mrow * (colm < m).astype(dt) + eyeM * (1.0 - mrow)
    # pad diag of qL = 1 so logdet/KL padding vanishes after masking

    mean = _dg(A, q_mu, 0, 0)                           # (NBp,1)
    SA = _dg(qL, A, 0, 0)                               # q_L^T A (Mp,NBp)
    var_raw = (sf2 - jnp.sum(A * A, axis=0, keepdims=True)
               + jnp.sum(SA * SA, axis=0, keepdims=True))       # (1,NBp)
    clamp = (var_raw > 1e-12).astype(dt)
    var = jnp.maximum(var_raw, 1e-12)

    cm = clamp * nmaskT
    # ---- per-likelihood data term: ve_sum = sum_i E[log p(y_i|f_i)],
    # alpha = scale * dve/dmean (NBp,1), bv = scale * dve/dvar * cm (1,NBp),
    # g_log_noise = dELBO/d log_noise (gauss only) ----
    if likelihood == "gauss":
        e = (yv - mean) * nmask                         # (NBp,1)
        see = jnp.sum(e * e)
        svar = jnp.sum(var * nmaskT)
        ve_sum = (-0.5 * nb * jnp.log(2.0 * jnp.asarray(jnp.pi, dt) * s2)
                  - 0.5 * (see + svar) / s2)
        alpha = scale * e / s2                          # (NBp,1)
        bv = (-0.5 * scale / s2) * cm                   # (1,NBp)
        d_s2 = (-0.5 * nb / s2 + 0.5 * (see + svar) / (s2 * s2))
        g_log_noise = scale * d_s2 * s2
    elif likelihood == "bernoulli_probit":
        meanT = _dg(one11, mean, 1, 1)                  # (1,NBp)
        yrow = _dg(one11, yv, 1, 1)
        srow = 2.0 * yrow - 1.0
        sig = jnp.sqrt(var)
        lane0 = (lane == 0).astype(dt)
        lane1 = (lane == 1).astype(dt)
        xcol = jnp.sum(quad * lane0, axis=1, keepdims=True)   # (Q,1) nodes
        wcol = jnp.sum(quad * lane1, axis=1, keepdims=True)   # (Q,1) weights
        zq = srow * (meanT + xcol * sig)                # (Q,NBp)
        lp, r = _log_ndtr_and_ratio(zq)
        ve_sum = jnp.sum(jnp.sum(wcol * lp, axis=0, keepdims=True) * nmaskT)
        dmu_row = srow * jnp.sum(wcol * r, axis=0, keepdims=True)
        dvar_row = (srow * jnp.sum(wcol * xcol * r, axis=0, keepdims=True)
                    / (2.0 * sig))
        alpha = scale * _dg(dmu_row * nmaskT, one11, 0, 0)    # (NBp,1)
        bv = scale * dvar_row * cm
        g_log_noise = jnp.zeros((), dt)
    elif likelihood == "poisson":
        meanT = _dg(one11, mean, 1, 1)
        yrow = _dg(one11, yv, 1, 1)
        e126 = (lane == 126).astype(dt)
        lgrow = _dg(e126, Xb, 1, 1)                     # (1,NBp) lgamma(y+1)
        rate = jnp.exp(meanT + 0.5 * var)               # E[exp f]
        ve_sum = jnp.sum((yrow * meanT - rate - lgrow) * nmaskT)
        alpha = scale * _dg((yrow - rate) * nmaskT, one11, 0, 0)
        bv = scale * (-0.5 * rate) * cm
        g_log_noise = jnp.zeros((), dt)
    else:  # pragma: no cover
        raise ValueError(f"unknown likelihood {likelihood!r}")

    diag_qL = jnp.sum(qL * eyeM, axis=1, keepdims=True)
    logdet = 2.0 * jnp.sum(jnp.log(diag_qL) * mrow)
    klq = 0.5 * (jnp.sum(qL * qL * mrow) + jnp.sum(q_mu * q_mu)
                 - m - logdet)
    elbo = scale * ve_sum - klq
    loss = -elbo

    # ---- adjoints (of ELBO; negated at the end) ----
    # dELBO/dA: mean term + var terms (through -A^2 and +SA^2)
    alphaT = _dg(one11, alpha, 1, 1)                    # (1,NBp)
    G = (q_mu * alphaT
         + 2.0 * (_dg(qL, SA, 1, 0) - A) * bv)          # (Mp,NBp)
    # dELBO/dq_mu = A alpha - q_mu (KL)
    g_qmu = _dg(A, alpha, 1, 0) - q_mu
    g_qmu = g_qmu * mrow
    # dELBO/dqL = 2 A (SA dvar)^T (var) - (qL - diag(1/diag qL)) (KL)
    g_qL = 2.0 * _dg(A, SA * bv, 1, 1) - qL + (1.0 / diag_qL) * eyeM
    g_qL = g_qL * mrow * (colm < m).astype(dt)
    # chain to q_raw: strict-lower direct; diagonal times exp(diag_raw)
    g_qraw = g_qL * strict + (jnp.sum(g_qL * eyeM, axis=1, keepdims=True)
                              * jnp.exp(diag_raw)) * eyeM

    # dELBO/dKms, dKmm through A = Lk^-1 Kms (Phi-masked chol chain,
    # as in fused_bound._sgpmc_neg_logpost_vg)
    Kms_b = ut_solve_vec(U, V, G, block=64)             # Lk^-T G
    T = _dg(G, A, 1, 1)
    Phi = T * ((rowm > colm).astype(dt) + 0.5 * eyeM)
    T1 = _dg(V, Phi, 1, 0)
    Kmm_b = -_dg(T1, V, 1, 1)
    Kmm_bT = _dg(eyeM, Kmm_b, 1, 1)
    Kmm_b = 0.5 * (Kmm_b + Kmm_bT)

    g_log_os = (jnp.sum(Kmm_b * Kmm) + jnp.sum(Kms_b * Kms)
                + jitter * sf2 * (sf2 > 1.0) * jnp.sum(Kmm_b * eyeM)
                + jnp.sum(bv) * sf2)                    # kdiag = sf2 per pt

    Pmm = Kmm_b * Kmm
    Pms = Kms_b * Kms
    rs_mm = jnp.sum(Pmm, axis=1, keepdims=True)
    cs_mm = jnp.sum(Pmm, axis=0, keepdims=True)
    rs_ms = jnp.sum(Pms, axis=1, keepdims=True)
    cs_ms = jnp.sum(Pms, axis=0, keepdims=True)
    g_ls = (_dg(rs_mm, Zs2, 0, 0) + cs_mm @ Zs2
            - 2.0 * jnp.sum(Zs * (Pmm @ Zs), axis=0, keepdims=True)
            + _dg(rs_ms, Zs2, 0, 0) + cs_ms @ Xs2
            - 2.0 * jnp.sum(Zs * _dg(Pms, Xs, 1, 0), axis=0,
                            keepdims=True)) * ls_mask
    # inducing locations: dZs from both grams, then dZ = dZs / ls
    dZs = (-2.0 * (rs_mm * Zs - Pmm @ Zs)
           - (rs_ms * Zs - _dg(Pms, Xs, 1, 0)))
    g_Z = dZs * inv_ls * mrow * ls_mask

    g_hyp = g_ls
    g_hyp = jnp.where(lane == d, g_log_os, g_hyp)
    g_hyp = jnp.where(lane == d + 1, g_log_noise, g_hyp)
    g_hyp = g_hyp * (lane < d + 2).astype(dt)

    grads = {"hyp": -g_hyp, "Z": -g_Z, "q_mu": -g_qmu, "q_raw": -g_qraw}
    return loss, grads


# ---------------------------------------------------------------------------
# Multi-class Softmax SVI loss: C latent functions, MC data term
# ---------------------------------------------------------------------------

def svgp_softmax_loss_vg(params_pad, Xb, num_data, nb, m, d, C, n_half,
                         eps_get, jitter, chol_inv=None):
    """loss + grads for one Softmax-SVGP minibatch, padded layout.

    The reference routes multi-class classification through a multitask
    SVGP wrapper (reference models/svgp.py:40-46) trained with an MC
    softmax data term; our XLA path is ``svgp_elbo`` with
    ``likelihoods.Softmax`` (antithetic MC, likelihoods.py:140-147). Here
    the C latent functions SHARE the Kmm factorisation and the whitened
    conditional A = Lk^-1 Kms — only q(u) moments and the data-term rows
    are per-latent — so the per-step cost over the single-latent kernel is
    C small MXU matmuls plus the VPU sample loop.

    params_pad:
      "hyp"   (1,128): lanes [log_ls (d), log_os]   (no noise hyper)
      "Z"     (Mp,128): rows :m, lanes :d
      "q_mu"  (Mp,128): lanes [0,C) = per-latent variational means
      "q_raw" tuple of C (Mp,Mp) packed-Cholesky raw mats (tril(-1) direct,
              exp diag) — separate arrays so Mosaic never slices values
    Xb (NBp,128): X lanes [0,d), integer class label (as f32) in lane 127.
    eps_get(c) -> (Sp, NBp): standard-normal draws for latent c — SAMPLES
    in sublanes, batch points in lanes (rows >= n_half zero). This layout
    is the speed-of-light one for the MC term: the whole antithetic sample
    block is a handful of full-width VPU ops per class (classes-in-lanes
    would burn 125/128 lanes at C=3 and force a per-sample loop), and the
    per-point softmax max is EXACT — classes are separate blocks combined
    by a static Python loop. The data term averages over S = 2*n_half
    signed copies, matching Softmax.variational_expectation's
    ``concatenate([eps, -eps])``.

    Returns (loss, grads) with grads matching params_pad's structure.
    """
    dt = jnp.float32
    hyp = params_pad["hyp"]
    Zp = params_pad["Z"]
    q_mu = params_pad["q_mu"]
    q_raws = params_pad["q_raw"]
    Mp = Zp.shape[0]
    NBp = Xb.shape[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    rown = jax.lax.broadcasted_iota(jnp.int32, (NBp, 1), 0)
    coln = jax.lax.broadcasted_iota(jnp.int32, (1, NBp), 1)
    eyeM = (rowm == colm).astype(dt)
    mrow = (rowm < m).astype(dt)
    mcol = (colm < m).astype(dt)
    nmask = (rown < nb).astype(dt)
    nmaskT = (coln < nb).astype(dt)
    ls_mask = (lane < d).astype(dt)
    cmask = (lane < C).astype(dt)
    one11 = jnp.ones((1, 1), dt)
    ey = (lane == (_LANES - 1)).astype(dt)

    inv_ls = jnp.exp(-hyp) * ls_mask
    log_os = jnp.sum(hyp * (lane == d).astype(dt))
    sf2 = jnp.exp(log_os)
    scale = jnp.asarray(num_data / nb, dt)

    yv = _dg(Xb, ey, 1, 1) * nmask                      # (NBp,1) labels

    Zs = Zp * inv_ls
    Xs = Xb * inv_ls                                    # y lane zeroed
    Zs2 = Zs * Zs
    Xs2 = Xs * Xs
    zn = jnp.sum(Zs2, axis=1, keepdims=True)
    xn = jnp.sum(Xs2, axis=1, keepdims=True)
    znT = _dg(one11, zn, 1, 1)
    xnT = _dg(one11, xn, 1, 1)
    r2_mm = jnp.maximum(zn + znT - 2.0 * _dg(Zs, Zs, 1, 1), 0.0)
    Kmm = sf2 * jnp.exp(-0.5 * r2_mm)
    Kmm = jnp.where((mrow * mcol) > 0, Kmm, eyeM)
    jit_scale = jnp.maximum(sf2, 1.0)
    Kmm_j = Kmm + (jitter * jit_scale) * eyeM
    r2_ms = jnp.maximum(zn + xnT - 2.0 * _dg(Zs, Xs, 1, 1), 0.0)
    Kms = sf2 * jnp.exp(-0.5 * r2_ms) * mrow * nmaskT   # (Mp,NBp)

    from .fused_bound import (block_chol_u, block_ut_inv, ut_solve_vec,
                              ut_t_solve_vec)
    pivot_floor = 1e-6 * jit_scale                      # training semantics
    if chol_inv is None:
        U = block_chol_u(Kmm_j, block=32, pivot_floor=pivot_floor)
        V = block_ut_inv(U, block=32)
    else:
        U, V = chol_inv(Kmm_j, pivot_floor)
    A = ut_t_solve_vec(U, V, Kms, block=64)             # Lk^-1 Kms

    # per-latent qL / SA / var; qL built exactly as the single-latent path
    strict = (rowm > colm).astype(dt)
    csA2 = jnp.sum(A * A, axis=0, keepdims=True)        # (1,NBp)
    base_row = sf2 - csA2
    mean_nb = _dg(A, q_mu, 0, 0)                        # (NBp,128) lanes C
    yrow = _dg(one11, yv, 1, 1)                         # (1,NBp)
    qLs, SAs, diag_raws, diag_qLs = [], [], [], []
    mean_rows, sig_rows, clamp_rows, oh_rows = [], [], [], []
    klq = jnp.zeros((), dt)
    for c in range(C):
        q_raw = q_raws[c]
        diag_raw = jnp.sum(q_raw * eyeM, axis=1, keepdims=True)
        qL = q_raw * strict + jnp.exp(diag_raw) * eyeM
        qL = qL * mrow * mcol + eyeM * (1.0 - mrow)
        SA = _dg(qL, A, 0, 0)                           # q_L^T A (Mp,NBp)
        vrow = base_row + jnp.sum(SA * SA, axis=0, keepdims=True)
        clamp_rows.append((vrow > 1e-12).astype(dt) * nmaskT)
        sig_rows.append(jnp.sqrt(jnp.maximum(vrow, 1e-12)))
        ec = (lane == c).astype(dt)
        mean_rows.append(_dg(ec, mean_nb, 1, 1))        # (1,NBp)
        oh_rows.append((yrow == c).astype(dt) * nmaskT)
        diag_qL = jnp.sum(qL * eyeM, axis=1, keepdims=True)
        logdet = 2.0 * jnp.sum(jnp.log(diag_qL) * mrow)
        klq = klq + 0.5 * (jnp.sum(qL * qL * mrow) - m - logdet)
        qLs.append(qL)
        SAs.append(SA)
        diag_raws.append(diag_raw)
        diag_qLs.append(diag_qL)
    klq = klq + 0.5 * jnp.sum((q_mu * cmask * mrow) ** 2)

    # ---- MC softmax data term over 2*n_half antithetic draws ----
    # samples in sublanes, points in lanes: the whole (Sp, NBp) block per
    # class in one shot; per-point max over classes is a static C-loop
    eps_blks = [eps_get(c) for c in range(C)]           # (Sp, NBp) each
    Sp = eps_blks[0].shape[0]
    srow = jax.lax.broadcasted_iota(jnp.int32, (Sp, 1), 0)
    smask = (srow < n_half).astype(dt)

    ve = jnp.zeros((), dt)
    dmu_rows = [jnp.zeros((1, NBp), dt) for _ in range(C)]
    dvar_rows = [jnp.zeros((1, NBp), dt) for _ in range(C)]
    for sign in (1.0, -1.0):
        fs = [mean_rows[c] + sig_rows[c] * (sign * eps_blks[c])
              for c in range(C)]                        # (Sp, NBp)
        mx = fs[0]
        for c in range(1, C):
            mx = jnp.maximum(mx, fs[c])
        exs = [jnp.exp(fs[c] - mx) for c in range(C)]
        se = exs[0]
        for c in range(1, C):
            se = se + exs[c]
        lse = mx + jnp.log(se)
        lp = -lse
        for c in range(C):
            lp = lp + oh_rows[c] * fs[c]
        ve = ve + jnp.sum(lp * smask * nmaskT)
        inv_se = 1.0 / se
        for c in range(C):
            gy = oh_rows[c] - exs[c] * inv_se           # dlp/df_c
            gys = gy * smask
            dmu_rows[c] = dmu_rows[c] + jnp.sum(gys, axis=0, keepdims=True)
            dvar_rows[c] = dvar_rows[c] + jnp.sum(
                gys * (sign * eps_blks[c]), axis=0, keepdims=True)
    S = 2.0 * n_half
    ve_sum = ve / S
    bv_rows = [scale * (dvar_rows[c] / S) / (2.0 * sig_rows[c])
               * clamp_rows[c] * nmaskT for c in range(C)]  # dELBO/dvar_c
    alpha = jnp.zeros((NBp, _LANES), dt)                # dELBO/dmean
    for c in range(C):
        arow = scale * (dmu_rows[c] / S) * nmaskT
        alpha = alpha + _dg(arow, one11, 0, 0) * (lane == c).astype(dt)

    elbo = scale * ve_sum - klq
    loss = -elbo

    # ---- adjoints (of ELBO; negated at the end) ----
    g_qmu = (_dg(A, alpha, 1, 0) - q_mu) * mrow * cmask
    sum_bv_row = bv_rows[0]
    for c in range(1, C):
        sum_bv_row = sum_bv_row + bv_rows[c]            # (1,NBp)
    G = _dg(q_mu, alpha, 1, 1) - 2.0 * A * sum_bv_row   # (Mp,NBp)
    bv_total = jnp.sum(sum_bv_row)
    g_qraws = []
    for c in range(C):
        bvc_row = bv_rows[c]                            # (1,NBp)
        G = G + 2.0 * _dg(qLs[c], SAs[c], 1, 0) * bvc_row
        g_qL = (2.0 * _dg(A, SAs[c] * bvc_row, 1, 1) - qLs[c]
                + (1.0 / diag_qLs[c]) * eyeM)
        g_qL = g_qL * mrow * mcol
        g_qraw = (g_qL * strict
                  + (jnp.sum(g_qL * eyeM, axis=1, keepdims=True)
                     * jnp.exp(diag_raws[c])) * eyeM)
        g_qraws.append(-g_qraw)

    Kms_b = ut_solve_vec(U, V, G, block=64)             # Lk^-T G
    T = _dg(G, A, 1, 1)
    Phi = T * (strict + 0.5 * eyeM)
    T1 = _dg(V, Phi, 1, 0)
    Kmm_b = -_dg(T1, V, 1, 1)
    Kmm_bT = _dg(eyeM, Kmm_b, 1, 1)
    Kmm_b = 0.5 * (Kmm_b + Kmm_bT)

    g_log_os = (jnp.sum(Kmm_b * Kmm) + jnp.sum(Kms_b * Kms)
                + jitter * sf2 * (sf2 > 1.0) * jnp.sum(Kmm_b * eyeM)
                + bv_total * sf2)                       # kdiag = sf2/pt/lat

    Pmm = Kmm_b * Kmm
    Pms = Kms_b * Kms
    rs_mm = jnp.sum(Pmm, axis=1, keepdims=True)
    cs_mm = jnp.sum(Pmm, axis=0, keepdims=True)
    rs_ms = jnp.sum(Pms, axis=1, keepdims=True)
    cs_ms = jnp.sum(Pms, axis=0, keepdims=True)
    g_ls = (_dg(rs_mm, Zs2, 0, 0) + cs_mm @ Zs2
            - 2.0 * jnp.sum(Zs * (Pmm @ Zs), axis=0, keepdims=True)
            + _dg(rs_ms, Zs2, 0, 0) + cs_ms @ Xs2
            - 2.0 * jnp.sum(Zs * _dg(Pms, Xs, 1, 0), axis=0,
                            keepdims=True)) * ls_mask
    dZs = (-2.0 * (rs_mm * Zs - Pmm @ Zs)
           - (rs_ms * Zs - _dg(Pms, Xs, 1, 0)))
    g_Z = dZs * inv_ls * mrow * ls_mask

    g_hyp = g_ls
    g_hyp = jnp.where(lane == d, g_log_os, g_hyp)
    g_hyp = g_hyp * (lane < d + 1).astype(dt)

    grads = {"hyp": -g_hyp, "Z": -g_Z, "q_mu": -g_qmu,
             "q_raw": tuple(g_qraws)}
    return loss, grads


def _svi_softmax_chunk_body(*refs, num_data, nb, nbp, m, d, C, n_half,
                            jitter, K, lr, block):
    """K softmax-SVI Adam steps on pre-gathered minibatch + eps slabs.

    refs layout: [scal(SMEM,1), slab(K*nbp,128), eps(K*C*Sp,nbp)]
    + params (3+C: hyp, Z, q_mu, q_raw_0..q_raw_{C-1}) + adam m (3+C)
    + adam v (3+C) || outputs: params', m', v' (3+C each), loss (K,8)
    || scratch: Ks, Us, Vs, Ds. Step t's eps block for class c sits at
    rows [(t*C + c)*Sp, ...) — samples in sublanes, points in lanes."""
    from .fused_bound import chol_u_inv_inplace

    f32 = jnp.float32
    P = 3 + C
    scal_ref, slab_ref, eps_ref = refs[0:3]
    in_refs = refs[3:3 + 3 * P]
    out_refs = refs[3 + 3 * P:3 + 6 * P]
    loss_o = refs[3 + 6 * P]
    Ks, Us, Vs, Ds = refs[3 + 6 * P + 1:]
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    t0 = scal_ref[0]

    def ref_chol_inv(Kmat, pivot_floor):
        Ks[:] = Kmat
        chol_u_inv_inplace(Ks, Us, Vs, Ds, block=block,
                           pivot_floor=pivot_floor)
        return Us[:], Vs[:]

    Sp = _round_up(n_half, 8)

    def step(t, carry):
        ps, ms, vs = carry
        Xb = slab_ref[pl.ds(t * nbp, nbp), :]

        def eps_get(c):
            return eps_ref[pl.ds((t * C + c) * Sp, Sp), :]

        params = {"hyp": ps[0], "Z": ps[1], "q_mu": ps[2],
                  "q_raw": tuple(ps[3:])}
        loss, g = svgp_softmax_loss_vg(params, Xb, num_data, nb, m, d, C,
                                       n_half, eps_get, jitter,
                                       chol_inv=ref_chol_inv)
        gl = [g["hyp"], g["Z"], g["q_mu"], *g["q_raw"]]
        ta = t0 + t.astype(f32) + 1.0
        new_p, new_m, new_v = [], [], []
        for p_i, g_i, m_i, v_i in zip(ps, gl, ms, vs):
            p1, m1, v1 = _adam_update(p_i, g_i, m_i, v_i, ta, lr)
            new_p.append(p1)
            new_m.append(m1)
            new_v.append(v1)
        loss_o[pl.ds(t, 1), :] = loss * (lane8 == 0).astype(f32)
        return (tuple(new_p), tuple(new_m), tuple(new_v))

    init = (tuple(r[:] for r in in_refs[0:P]),
            tuple(r[:] for r in in_refs[P:2 * P]),
            tuple(r[:] for r in in_refs[2 * P:3 * P]))
    ps, ms, vs = jax.lax.fori_loop(0, K, step, init)
    for ref, val in zip(out_refs, (*ps, *ms, *vs)):
        ref[:] = val


def make_fused_svi_softmax(num_data, nb, m, d, C, n_half, jitter, *,
                           steps_per_call, lr=0.01, block=32,
                           interpret=False):
    """Factory: ``chunk(params_pad, adam_m, adam_v, slab, eps_slab, t0) ->
    (params_pad, adam_m, adam_v, losses (K,))``.

    ``slab`` is (K*nbp, 128) minibatch rows (X lanes [0,d), class label in
    lane 127); ``eps_slab`` is (K*C*Sp, nbp) standard-normal blocks —
    step-major, then class, SAMPLES in sublanes, batch points in lanes
    (Sp = n_half rounded up to 8). Envelope: m <= 512, nb <= 512,
    2 <= C <= 16, d + 1 <= 126, n_half <= 128, and a conservative
    whole-kernel VMEM estimate (in + out + carry param triplets, slabs,
    scratch, per-step intermediates) <= 88 MB. Returns None outside it."""
    from jax.experimental.pallas import tpu as pltpu

    K = int(steps_per_call)
    nbp = _round_up(nb, 8)
    Sp = _round_up(n_half, 8)
    Mp = max(_LANES, _round_up(m, _LANES))
    if (m > 512 or nb > 512 or not (2 <= C <= 16) or d + 1 > 126
            or not (1 <= n_half <= 128)):
        return None
    # Honest VMEM envelope (ADVICE r3): the kernel holds the (p, m, v)
    # triplet of all P = 3+C params THREE times over (input refs, output
    # refs, and the fori-loop carry), the whole slab + eps inputs, the
    # chol scratch, and — live inside each step — the per-latent qL/SA
    # stacks plus A/Kms/G/Kms_b and the (Sp, NBp) sample blocks. The old
    # estimate counted one triplet + slabs only (~1/3 of reality), so
    # admitted corners like (C=16, M=512) failed Mosaic compilation
    # instead of falling back to XLA via returning None.
    param_f = 3 * (C * Mp * Mp + 2 * Mp * _LANES + _LANES)  # one (p,m,v) set
    slab_f = K * nbp * _LANES + K * C * Sp * nbp
    scratch_f = 3 * Mp * Mp + Mp * _LANES
    work_f = ((2 * C + 4) * Mp * nbp      # qLs/SAs + A/Kms/G/Kms_b
              + C * Mp * Mp               # q_raw copies live in the step
              + 3 * C * Sp * nbp)         # eps blocks + fs/exs
    state_bytes = 4 * (3 * param_f + slab_f + scratch_f + work_f)
    if state_bytes > 88 * 1024 * 1024:    # vmem_limit below is 100 MB
        return None
    f32 = jnp.float32
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    shapes = ([(1, _LANES), (Mp, _LANES), (Mp, _LANES)]
              + [(Mp, Mp)] * C)
    P = 3 + C
    out_shape = ([jax.ShapeDtypeStruct(s, f32) for s in shapes] * 3
                 + [jax.ShapeDtypeStruct((K, 8), f32)])
    call = pl.pallas_call(
        partial(_svi_softmax_chunk_body, num_data=num_data, nb=nb, nbp=nbp,
                m=m, d=d, C=C, n_half=n_half, jitter=float(jitter), K=K,
                lr=float(lr), block=block),
        out_shape=tuple(out_shape),
        in_specs=[smem] + [vmem] * (2 + 3 * P),
        out_specs=(vmem,) * (3 * P + 1),
        scratch_shapes=[pltpu.VMEM((Mp, Mp), f32) for _ in range(3)]
        + [pltpu.VMEM((Mp, _LANES), f32)],
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None),
        interpret=interpret,
    )

    def chunk(params_pad, adam_m, adam_v, slab, eps_slab, t0):
        def flat(pd):
            return [pd["hyp"], pd["Z"], pd["q_mu"], *pd["q_raw"]]

        outs = call(jnp.asarray([t0], f32), slab, eps_slab,
                    *flat(params_pad), *flat(adam_m), *flat(adam_v))

        def unflat(arrs):
            return {"hyp": arrs[0], "Z": arrs[1], "q_mu": arrs[2],
                    "q_raw": tuple(arrs[3:])}

        p1 = unflat(outs[0:P])
        m1 = unflat(outs[P:2 * P])
        v1 = unflat(outs[2 * P:3 * P])
        return p1, m1, v1, outs[3 * P][:, 0]

    return chunk


# ---------------------------------------------------------------------------
# BayesianSVGP ("doubly stochastic") loss: q(log theta) hyper distribution
# ---------------------------------------------------------------------------

def bsvgp_loss_vg(params_pad, Xb, eps_blk, num_data, nb, m, d, S,
                  prior_var, jitter, chol_inv=None):
    """loss + grads for one BayesianSVGP minibatch step, padded layout.

    The reference model (models/bayesian_svgp.py:87-207) learns
    q(log theta) = N(hyper_mu, L L^T) jointly with q(u); the per-step ELBO
    averages the SVGP data term over S reparameterised hyper draws
    (models/bayesian_svgp.py:159-167). Here each draw reuses the fused SVGP
    loss core (:func:`svgp_gauss_loss_vg`) with its hyp row built from
    theta_s = hyper_mu + L eps_s, and the hyper-distribution gradients
    follow by the reparameterisation chain (dtheta/dL = eps outer product).

    params_pad:
      "hmu"  (1,128): hyper mean, theta layout [log_os, log_ls (d),
             log_noise_std] (models/bayesian_svgp.py:130-132)
      "Lraw" (128,128): q(log theta) Cholesky, tril(-1) direct + exp diag
             (the packed q_sigma_vec of models/bayesian_svgp.py:44,51-61,
             unpacked to a matrix so Adam stays elementwise-equivalent)
      "Z" (Mp,128), "q_mu" (Mp,1), "q_raw" (Mp,Mp): as svgp_gauss_loss_vg
    eps_blk (Sp,128): S standard-normal rows (lanes [0,h)), padding rows 0.
    """
    dt = jnp.float32
    h = d + 2
    hmu = params_pad["hmu"]
    Lraw = params_pad["Lraw"]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    eyeH = (rows == cols).astype(dt)
    strict = (rows > cols).astype(dt)
    hmask = ((rows < h) & (cols < h)).astype(dt)
    hrow = (lane < h).astype(dt)

    diag_raw = jnp.sum(Lraw * eyeH, axis=1, keepdims=True)    # (128,1)
    diagL = jnp.exp(diag_raw)
    L_h = (Lraw * strict + diagL * eyeH) * hmask              # (128,128)

    # theta_s = hmu + L eps_s; rows of (Sp,128)
    thetas = hmu + _dg(eps_blk, L_h, 1, 1)                    # (Sp,128)

    # hyp = P theta: log_ls[j] = theta[j+1], log_os = theta[0],
    # log_noise = 2 theta[d+1] (noise = exp(theta[-1])^2)
    P = (((rows < d) & (cols == rows + 1)).astype(dt)
         + ((rows == d) & (cols == 0)).astype(dt)
         + 2.0 * ((rows == d + 1) & (cols == d + 1)).astype(dt))

    # one lax.fori_loop over draws — a Python-unrolled loop compiles S
    # copies of the SVGP core through Mosaic (~5 min first-call wall at
    # S=5); theta rows are extracted and gradient rows scattered with
    # one-hot MXU contractions (no dynamic value slicing in Mosaic)
    inv_s = 1.0 / S
    hyp_mask = (lane < d + 2).astype(dt)
    Sp = eps_blk.shape[0]
    scol = jax.lax.broadcasted_iota(jnp.int32, (1, Sp), 1)

    def draw(s, acc):
        loss_acc, gZ, gqmu, gqraw, G_theta = acc
        Es = (scol == s).astype(dt)                           # (1,Sp)
        theta_row = _dg(Es, thetas, 1, 0)                     # (1,128)
        hyp_row = _dg(theta_row, P, 1, 1) * hyp_mask
        ps = {"hyp": hyp_row, "Z": params_pad["Z"],
              "q_mu": params_pad["q_mu"], "q_raw": params_pad["q_raw"]}
        loss_s, g_s = svgp_gauss_loss_vg(ps, Xb, None, num_data, nb, m, d,
                                         jitter, chol_inv=chol_inv)
        grow = _dg(g_s["hyp"], P, 1, 0) * hrow
        return (loss_acc + inv_s * loss_s,
                gZ + inv_s * g_s["Z"],
                gqmu + inv_s * g_s["q_mu"],
                gqraw + inv_s * g_s["q_raw"],
                G_theta + _dg(Es, grow, 0, 0))                # scatter row s

    loss_acc, gZ, gqmu, gqraw, G_theta = jax.lax.fori_loop(
        0, S, draw,
        (jnp.zeros((), dt), jnp.zeros_like(params_pad["Z"]),
         jnp.zeros_like(params_pad["q_mu"]),
         jnp.zeros_like(params_pad["q_raw"]),
         jnp.zeros((Sp, _LANES), dt)))

    # reparameterisation chain + hyper KL (loss space: klh enters with +)
    g_hmu = inv_s * jnp.sum(G_theta, axis=0, keepdims=True)
    g_L = inv_s * _dg(G_theta, eps_blk, 0, 0) * hmask         # (128,128)
    pv = jnp.asarray(prior_var, dt)
    # KL(N(hmu, LL^T) || N(0, pv I)) — models/bayesian_svgp.py:116-117
    klh = 0.5 * (jnp.sum(L_h * L_h) / pv
                 + jnp.sum((hmu * hrow) ** 2) / pv
                 - h - 2.0 * jnp.sum(diag_raw * (rows < h).astype(dt))
                 + h * jnp.log(pv))
    loss = loss_acc + klh
    g_hmu = g_hmu + (hmu * hrow) / pv
    g_L = g_L + (L_h / pv) * hmask
    # chain dL -> dLraw: strict-lower direct; diagonal times exp(diag_raw);
    # the -1/diagL logdet term chains to exactly -1 per diagonal entry
    gdiag = jnp.sum(g_L * eyeH, axis=1, keepdims=True)
    hmask_d = (rows < h).astype(dt)
    g_Lraw = (g_L * strict
              + (gdiag * diagL - 1.0) * eyeH * hmask_d) * hmask

    grads = {"hmu": g_hmu, "Lraw": g_Lraw, "Z": gZ, "q_mu": gqmu,
             "q_raw": gqraw}
    return loss, grads


def _bsvgp_chunk_body(scal_ref, slab_ref, eps_ref,
                      hmu_ref, lraw_ref, z_ref, qmu_ref, qraw_ref,
                      m_hmu, m_lraw, m_z, m_qmu, m_qraw,
                      v_hmu, v_lraw, v_z, v_qmu, v_qraw,
                      hmu_o, lraw_o, z_o, qmu_o, qraw_o,
                      mo_hmu, mo_lraw, mo_z, mo_qmu, mo_qraw,
                      vo_hmu, vo_lraw, vo_z, vo_qmu, vo_qraw, loss_o,
                      Ks, Us, Vs, Ds,
                      *, num_data, nb, nbp, m, d, S, Sp, prior_var, jitter,
                      K, lr, block):
    """K BayesianSVGP Adam steps on pre-gathered minibatch + eps slabs."""
    from .fused_bound import chol_u_inv_inplace

    f32 = jnp.float32
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    t0 = scal_ref[0]

    def ref_chol_inv(Kmat, pivot_floor):
        Ks[:] = Kmat
        chol_u_inv_inplace(Ks, Us, Vs, Ds, block=block,
                           pivot_floor=pivot_floor)
        return Us[:], Vs[:]

    def step(t, carry):
        (hmu, Lraw, Z, qmu, qraw,
         m1, m2, m3, m4, m5, v1, v2, v3, v4, v5) = carry
        Xb = slab_ref[pl.ds(t * nbp, nbp), :]
        eps_blk = eps_ref[pl.ds(t * Sp, Sp), :]
        params = {"hmu": hmu, "Lraw": Lraw, "Z": Z, "q_mu": qmu,
                  "q_raw": qraw}
        loss, g = bsvgp_loss_vg(params, Xb, eps_blk, num_data, nb, m, d, S,
                                prior_var, jitter, chol_inv=ref_chol_inv)
        ta = t0 + t.astype(f32) + 1.0
        hmu, m1, v1 = _adam_update(hmu, g["hmu"], m1, v1, ta, lr)
        Lraw, m2, v2 = _adam_update(Lraw, g["Lraw"], m2, v2, ta, lr)
        Z, m3, v3 = _adam_update(Z, g["Z"], m3, v3, ta, lr)
        qmu, m4, v4 = _adam_update(qmu, g["q_mu"], m4, v4, ta, lr)
        qraw, m5, v5 = _adam_update(qraw, g["q_raw"], m5, v5, ta, lr)
        loss_o[pl.ds(t, 1), :] = loss * (lane8 == 0).astype(f32)
        return (hmu, Lraw, Z, qmu, qraw,
                m1, m2, m3, m4, m5, v1, v2, v3, v4, v5)

    init = (hmu_ref[:], lraw_ref[:], z_ref[:], qmu_ref[:], qraw_ref[:],
            m_hmu[:], m_lraw[:], m_z[:], m_qmu[:], m_qraw[:],
            v_hmu[:], v_lraw[:], v_z[:], v_qmu[:], v_qraw[:])
    out = jax.lax.fori_loop(0, K, step, init)
    for ref, val in zip((hmu_o, lraw_o, z_o, qmu_o, qraw_o,
                         mo_hmu, mo_lraw, mo_z, mo_qmu, mo_qraw,
                         vo_hmu, vo_lraw, vo_z, vo_qmu, vo_qraw), out):
        ref[:] = val


def make_fused_bsvgp(num_data, nb, m, d, S, prior_var, jitter, *,
                     steps_per_call, lr=0.01, block=32, interpret=False):
    """Factory: ``chunk(params_pad, adam_m, adam_v, slab, eps_slab, t0) ->
    (params_pad, adam_m, adam_v, losses (K,))``. Envelope: m <= 128,
    nb <= 512, d + 2 <= 126, S <= 8. Returns None outside it."""
    from jax.experimental.pallas import tpu as pltpu

    if m > 512 or d + 2 > _LANES - 2 or nb > 512 or S > 8:
        return None
    Mp = max(_LANES, _round_up(m, _LANES))
    nbp = _round_up(nb, 8)
    Sp = 8
    K = int(steps_per_call)
    f32 = jnp.float32
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    shapes = {"hmu": (1, _LANES), "Lraw": (_LANES, _LANES),
              "Z": (Mp, _LANES), "q_mu": (Mp, 1), "q_raw": (Mp, Mp)}
    names = ("hmu", "Lraw", "Z", "q_mu", "q_raw")
    out_shape = ([jax.ShapeDtypeStruct(shapes[k], f32)
                  for k in names] * 3
                 + [jax.ShapeDtypeStruct((K, 8), f32)])
    call = pl.pallas_call(
        partial(_bsvgp_chunk_body, num_data=num_data, nb=nb, nbp=nbp, m=m,
                d=d, S=S, Sp=Sp, prior_var=float(prior_var),
                jitter=float(jitter), K=K, lr=float(lr), block=block),
        out_shape=tuple(out_shape),
        in_specs=[smem] + [vmem] * 17,
        out_specs=(vmem,) * 16,
        scratch_shapes=[pltpu.VMEM((Mp, Mp), f32) for _ in range(3)]
        + [pltpu.VMEM((Mp, _LANES), f32)],
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None),
        interpret=interpret,
    )

    def chunk(params_pad, adam_m, adam_v, slab, eps_slab, t0):
        outs = call(jnp.asarray([t0], f32), slab, eps_slab,
                    *[params_pad[k] for k in names],
                    *[adam_m[k] for k in names],
                    *[adam_v[k] for k in names])
        p1 = dict(zip(names, outs[0:5]))
        m1 = dict(zip(names, outs[5:10]))
        v1 = dict(zip(names, outs[10:15]))
        return p1, m1, v1, outs[15][:, 0]

    return chunk


# ---------------------------------------------------------------------------
# Whole-chunk SVI kernel: K Adam steps per Pallas call
# ---------------------------------------------------------------------------

def _adam_update(p, g, mm, vv, t, lr, b1=0.9, b2=0.999, eps=1e-8):
    """optax.adam defaults (bias-corrected moments, eps_root=0).

    Non-finite gradient entries are zeroed first (optax.zero_nans
    semantics, extended to inf — poisson's exp data term can overflow
    f32): one poisoned minibatch must not corrupt Adam state for the rest
    of training. ``abs(g) <= 3e38`` is false for both NaN and inf and
    lowers in Mosaic (no is_finite primitive there)."""
    g = jnp.where(jnp.abs(g) <= 3.0e38, g, jnp.zeros_like(g))
    mm1 = b1 * mm + (1.0 - b1) * g
    vv1 = b2 * vv + (1.0 - b2) * g * g
    bc1 = 1.0 - jnp.exp(t * jnp.log(b1))
    bc2 = 1.0 - jnp.exp(t * jnp.log(b2))
    step = lr * (mm1 / bc1) / (jnp.sqrt(vv1 / bc2) + eps)
    return p - step, mm1, vv1


def _svi_chunk_body(scal_ref, slab_ref, quad_ref,
                    hyp_ref, z_ref, qmu_ref, qraw_ref,
                    m_hyp, m_z, m_qmu, m_qraw, v_hyp, v_z, v_qmu, v_qraw,
                    hyp_o, z_o, qmu_o, qraw_o,
                    mo_hyp, mo_z, mo_qmu, mo_qraw,
                    vo_hyp, vo_z, vo_qmu, vo_qraw, loss_o,
                    Ks, Us, Vs, Ds,
                    *, num_data, nb, nbp, m, d, jitter, K, lr, block,
                    likelihood):
    """K SVI Adam steps on pre-gathered minibatch slabs.

    scal_ref (SMEM f32, 1): adam step counter before this chunk.
    slab_ref (K*nbp, 128): step t's rows at [t*nbp, (t+1)*nbp), X in lanes
    [0,d), y in lane 127 (poisson: lgamma(y+1) in lane 126).
    quad_ref (QUAD_ROWS, 128): Gauss-Hermite table (zeros unless
    bernoulli_probit). loss_o (K, 8) lane 0 = per-step loss."""
    from .fused_bound import chol_u_inv_inplace

    f32 = jnp.float32
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    t0 = scal_ref[0]
    quad = quad_ref[:]

    def ref_chol_inv(Kmat, pivot_floor):
        Ks[:] = Kmat
        chol_u_inv_inplace(Ks, Us, Vs, Ds, block=block,
                           pivot_floor=pivot_floor)
        return Us[:], Vs[:]

    def step(t, carry):
        (hyp, Z, qmu, qraw, mh, mz, mq, mr, vh, vz, vq, vr) = carry
        Xb = slab_ref[pl.ds(t * nbp, nbp), :]
        params = {"hyp": hyp, "Z": Z, "q_mu": qmu, "q_raw": qraw}
        loss, g = svgp_loss_vg(params, Xb, None, num_data, nb, m, d,
                               jitter, chol_inv=ref_chol_inv,
                               likelihood=likelihood, quad=quad)
        ta = t0 + t.astype(f32) + 1.0
        hyp, mh, vh = _adam_update(hyp, g["hyp"], mh, vh, ta, lr)
        Z, mz, vz = _adam_update(Z, g["Z"], mz, vz, ta, lr)
        qmu, mq, vq = _adam_update(qmu, g["q_mu"], mq, vq, ta, lr)
        qraw, mr, vr = _adam_update(qraw, g["q_raw"], mr, vr, ta, lr)
        loss_o[pl.ds(t, 1), :] = loss * (lane8 == 0).astype(f32)
        return (hyp, Z, qmu, qraw, mh, mz, mq, mr, vh, vz, vq, vr)

    init = (hyp_ref[:], z_ref[:], qmu_ref[:], qraw_ref[:],
            m_hyp[:], m_z[:], m_qmu[:], m_qraw[:],
            v_hyp[:], v_z[:], v_qmu[:], v_qraw[:])
    (hyp, Z, qmu, qraw, mh, mz, mq, mr, vh, vz, vq, vr) = \
        jax.lax.fori_loop(0, K, step, init)
    hyp_o[:] = hyp
    z_o[:] = Z
    qmu_o[:] = qmu
    qraw_o[:] = qraw
    mo_hyp[:] = mh
    mo_z[:] = mz
    mo_qmu[:] = mq
    mo_qraw[:] = mr
    vo_hyp[:] = vh
    vo_z[:] = vz
    vo_qmu[:] = vq
    vo_qraw[:] = vr


def make_fused_svi(num_data, nb, m, d, jitter, *, steps_per_call,
                   lr=0.01, block=32, interpret=False,
                   likelihood="gauss"):
    """Factory: ``svi_chunk(params_pad, adam_state, slab, t0) ->
    (params_pad, adam_state, losses (K,))``. ``slab`` is
    (steps_per_call*nbp, 128) pre-gathered rows (y in lane 127; poisson
    additionally lgamma(y+1) in lane 126). Envelope: m <= 128, nb <= 512,
    d + 2 <= 127 (poisson: d <= 125 — lane 126 is taken).
    Returns None outside it."""
    from jax.experimental import pallas as pl  # noqa: F811
    from jax.experimental.pallas import tpu as pltpu

    if likelihood not in ("gauss", "bernoulli_probit", "poisson"):
        return None
    max_d = 125 if likelihood == "poisson" else _LANES - 3
    if m > 512 or d > max_d or nb > 512:
        return None
    Mp = max(_LANES, _round_up(m, _LANES))
    nbp = _round_up(nb, 8)
    K = int(steps_per_call)
    f32 = jnp.float32
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    shapes = {"hyp": (1, _LANES), "Z": (Mp, _LANES), "q_mu": (Mp, 1),
              "q_raw": (Mp, Mp)}
    out_shape = ([jax.ShapeDtypeStruct(shapes[k], f32)
                  for k in ("hyp", "Z", "q_mu", "q_raw")] * 3
                 + [jax.ShapeDtypeStruct((K, 8), f32)])
    call = pl.pallas_call(
        partial(_svi_chunk_body, num_data=num_data, nb=nb, nbp=nbp, m=m,
                d=d, jitter=float(jitter), K=K, lr=float(lr), block=block,
                likelihood=likelihood),
        out_shape=tuple(out_shape),
        in_specs=[smem] + [vmem] * 14,
        out_specs=(vmem,) * 13,
        scratch_shapes=[pltpu.VMEM((Mp, Mp), f32) for _ in range(3)]
        + [pltpu.VMEM((Mp, _LANES), f32)],
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None),
        interpret=interpret,
    )
    qtab = (quad_table() if likelihood == "bernoulli_probit"
            else jnp.zeros((QUAD_ROWS, _LANES), f32))

    def svi_chunk(params_pad, adam_m, adam_v, slab, t0):
        outs = call(jnp.asarray([t0], f32), slab, qtab,
                    params_pad["hyp"], params_pad["Z"], params_pad["q_mu"],
                    params_pad["q_raw"],
                    adam_m["hyp"], adam_m["Z"], adam_m["q_mu"],
                    adam_m["q_raw"],
                    adam_v["hyp"], adam_v["Z"], adam_v["q_mu"],
                    adam_v["q_raw"])
        names = ("hyp", "Z", "q_mu", "q_raw")
        p1 = dict(zip(names, outs[0:4]))
        m1 = dict(zip(names, outs[4:8]))
        v1 = dict(zip(names, outs[8:12]))
        return p1, m1, v1, outs[12][:, 0]

    return svi_chunk
