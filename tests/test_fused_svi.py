"""Fused SVGP SVI: hand value+grad parity vs jax.grad of the model ELBO."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from ggp_tpu.kernels import default_rbf
from ggp_tpu.likelihoods import GaussianLikelihood
from ggp_tpu.models.svgp import svgp_elbo
from ggp_tpu.ops.fused_svi import svgp_gauss_loss_vg


def _pad_params(p, m, d, Mp=None):
    Mp = Mp or max(128, -(-m // 128) * 128)
    hyp = jnp.zeros((1, 128), jnp.float32)
    hyp = hyp.at[0, :d].set(p["kernel"]["base"]["log_lengthscale"])
    hyp = hyp.at[0, d].set(p["kernel"]["log_outputscale"])
    hyp = hyp.at[0, d + 1].set(p["lik"]["log_noise"])
    Z = jnp.zeros((Mp, 128), jnp.float32).at[:m, :d].set(p["Z"])
    q_mu = jnp.zeros((Mp, 1), jnp.float32).at[:m].set(p["q_mu"])
    q_raw = jnp.zeros((Mp, Mp), jnp.float32).at[:m, :m].set(
        p["q_sqrt_raw"][0])
    return {"hyp": hyp, "Z": Z, "q_mu": q_mu, "q_raw": q_raw}


@pytest.mark.parametrize("nmd", [
    pytest.param((40, 8, 3), marks=pytest.mark.slow),
    pytest.param((200, 32, 5), marks=pytest.mark.slow),
    (33, 8, 2),
    pytest.param((64, 160, 5), marks=pytest.mark.slow),  # Mp=256 envelope
])
def test_svi_loss_and_grads_match_autodiff(nmd):
    nb, m, d = nmd
    N = 10 * nb
    rng = np.random.default_rng(11)
    Xb = jnp.asarray(rng.normal(size=(nb, d)), jnp.float32)
    yb = jnp.asarray(rng.normal(size=(nb,)), jnp.float32)
    kern = default_rbf(ard=True)
    lik = GaussianLikelihood()
    params = {
        "kernel": {"base": {"log_lengthscale":
                            jnp.asarray(rng.normal(size=(d,)) * 0.3,
                                        jnp.float32)},
                   "log_outputscale": jnp.asarray(0.3, jnp.float32)},
        "Z": jnp.asarray(rng.normal(size=(m, d)), jnp.float32),
        "q_mu": jnp.asarray(rng.normal(size=(m, 1)) * 0.5, jnp.float32),
        "q_sqrt_raw": jnp.asarray(rng.normal(size=(1, m, m)) * 0.1,
                                  jnp.float32),
        "lik": {"log_noise": jnp.asarray(-1.0, jnp.float32)},
    }
    jitter = 1e-6

    def ref_loss(p, X_, y_):
        return -svgp_elbo(kern, lik, p, X_, y_, N, jitter)

    # compare against the F64 ground truth: two f32 implementations can
    # legitimately differ by more than either differs from the truth
    # (measured: the fused Z-grad is CLOSER to f64 than f32 autodiff is)
    p64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)
    loss_ref, g_ref = jax.value_and_grad(ref_loss)(
        p64, Xb.astype(jnp.float64), yb.astype(jnp.float64))

    pp = _pad_params(params, m, d)
    NBp = -(-nb // 8) * 8
    Xslab = jnp.zeros((NBp, 128), jnp.float32).at[:nb, :d].set(Xb)
    Xslab = Xslab.at[:nb, 127].set(yb)
    loss_f, g_f = svgp_gauss_loss_vg(pp, Xslab, None, N, nb, m, d, jitter)

    np.testing.assert_allclose(float(loss_f), float(loss_ref), rtol=1e-4)

    def close(a, b):
        a = np.asarray(a, np.float64).reshape(-1)
        b = np.asarray(b, np.float64).reshape(-1)
        tol = 2e-3 * (1.0 + np.abs(b).max())
        np.testing.assert_allclose(a, b, atol=tol, rtol=0)

    close(g_f["hyp"][0, :d], g_ref["kernel"]["base"]["log_lengthscale"])
    close(g_f["hyp"][0, d], g_ref["kernel"]["log_outputscale"])
    close(g_f["hyp"][0, d + 1], g_ref["lik"]["log_noise"])
    close(g_f["Z"][:m, :d], g_ref["Z"])
    close(g_f["q_mu"][:m], g_ref["q_mu"])
    close(g_f["q_raw"][:m, :m], g_ref["q_sqrt_raw"][0])


def test_svi_loss_ill_conditioned_within_f32_envelope():
    """16 random 1-D inducing points give cond(Kmm) ~ 1e9 — past f32
    resolution, where ANY two f32 implementations legitimately disagree.
    Against the f64 ground truth, the fused loss must sit inside the same
    error envelope as the XLA f32 path (measured: XLA -0.73, fused +0.76
    on a truth of ~1208.7)."""
    nb, m, d = 33, 16, 1
    N = 10 * nb
    rng = np.random.default_rng(11)
    Xb = jnp.asarray(rng.normal(size=(nb, d)), jnp.float32)
    yb = jnp.asarray(rng.normal(size=(nb,)), jnp.float32)
    kern = default_rbf(ard=True)
    lik = GaussianLikelihood()
    params = {
        "kernel": {"base": {"log_lengthscale":
                            jnp.asarray(rng.normal(size=(d,)) * 0.3,
                                        jnp.float32)},
                   "log_outputscale": jnp.asarray(0.3, jnp.float32)},
        "Z": jnp.asarray(rng.normal(size=(m, d)), jnp.float32),
        "q_mu": jnp.asarray(rng.normal(size=(m, 1)) * 0.5, jnp.float32),
        "q_sqrt_raw": jnp.asarray(rng.normal(size=(1, m, m)) * 0.1,
                                  jnp.float32),
        "lik": {"log_noise": jnp.asarray(-1.0, jnp.float32)},
    }
    p64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)
    loss64 = float(-svgp_elbo(kern, lik, p64, Xb.astype(jnp.float64),
                              yb.astype(jnp.float64), N, 1e-6))
    loss32 = float(-svgp_elbo(kern, lik, params, Xb, yb, N, 1e-6))
    pp = _pad_params(params, m, d)
    NBp = -(-nb // 8) * 8
    Xslab = jnp.zeros((NBp, 128), jnp.float32).at[:nb, :d].set(Xb)
    Xslab = Xslab.at[:nb, 127].set(yb)
    loss_f, _ = svgp_gauss_loss_vg(pp, Xslab, None, N, nb, m, d, 1e-6)
    xla_err = abs(loss32 - loss64)
    fused_err = abs(float(loss_f) - loss64)
    assert fused_err < max(3.0 * xla_err, 0.5), (fused_err, xla_err)


@pytest.mark.slow
def test_svi_chunk_kernel_matches_optax(monkeypatch):
    """Interpret-mode chunk kernel (K Adam steps in-kernel) reproduces an
    optax.adam loop over the same minibatches: per-step losses and final
    parameters."""
    import optax

    from ggp_tpu.ops.fused_svi import make_fused_svi

    nb, m, d, K = 16, 8, 2, 4
    N = 64
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
    w = rng.normal(size=(d,))
    y = jnp.asarray(np.sin(np.asarray(X) @ w) + 0.3 * rng.normal(size=N),
                    jnp.float32)
    kern = default_rbf(ard=True)
    lik = GaussianLikelihood()
    params = {
        "kernel": {"base": {"log_lengthscale": jnp.zeros((d,), jnp.float32)},
                   "log_outputscale": jnp.asarray(0.1, jnp.float32)},
        "Z": X[:m],
        "q_mu": jnp.zeros((m, 1), jnp.float32),
        "q_sqrt_raw": jnp.asarray(np.eye(m) * np.log(0.5), jnp.float32)[None],
        "lik": {"log_noise": jnp.asarray(-1.0, jnp.float32)},
    }
    jitter = 1e-6
    idx = rng.integers(0, N, size=(K, nb))

    # optax reference trajectory
    lr = 0.02
    opt = optax.adam(lr)
    p_ref = params
    state = opt.init(p_ref)
    losses_ref = []

    def loss_fn(p, Xb, yb):
        return -svgp_elbo(kern, lik, p, Xb, yb, N, jitter)

    for t in range(K):
        Xb, yb = X[idx[t]], y[idx[t]]
        lval, g = jax.value_and_grad(loss_fn)(p_ref, Xb, yb)
        upd, state = opt.update(g, state)
        p_ref = optax.apply_updates(p_ref, upd)
        losses_ref.append(float(lval))

    # fused chunk
    svi = make_fused_svi(N, nb, m, d, jitter, steps_per_call=K, lr=lr,
                         interpret=True)
    pp = _pad_params(params, m, d)
    zeros = {k: jnp.zeros_like(v) for k, v in pp.items()}
    nbp = -(-nb // 8) * 8
    slab = jnp.zeros((K * nbp, 128), jnp.float32)
    for t in range(K):
        slab = slab.at[t * nbp:t * nbp + nb, :d].set(X[idx[t]])
        slab = slab.at[t * nbp:t * nbp + nb, 127].set(y[idx[t]])
    p1, m1, v1, losses = svi(pp, dict(zeros), dict(zeros), slab, 0.0)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref),
                               rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(p1["hyp"][0, :d + 2]),
        np.r_[np.asarray(p_ref["kernel"]["base"]["log_lengthscale"]),
              float(p_ref["kernel"]["log_outputscale"]),
              float(p_ref["lik"]["log_noise"])], atol=2e-4)
    np.testing.assert_allclose(np.asarray(p1["Z"][:m, :d]),
                               np.asarray(p_ref["Z"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(p1["q_mu"][:m]),
                               np.asarray(p_ref["q_mu"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(p1["q_raw"][:m, :m]),
                               np.asarray(p_ref["q_sqrt_raw"][0]),
                               atol=2e-4)


def test_fused_svi_gate_and_envelope(monkeypatch):
    """Eligibility gating: CPU backend off; envelope limits honored."""
    from ggp_tpu.models.svgp import StochasticVariationalGP
    from ggp_tpu.ops.fused_svi import make_fused_svi

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(64, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    m = StochasticVariationalGP(X, y, Z_init=X[:8])
    assert not m._fused_svi_ok(32)        # CPU backend in CI
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert m._fused_svi_ok(32)
    monkeypatch.setenv("GGP_FUSED_SVI", "0")
    assert not m._fused_svi_ok(32)
    monkeypatch.delenv("GGP_FUSED_SVI")
    assert not m._fused_svi_ok(1024)      # batch too large
    # factory envelope
    assert make_fused_svi(1000, 600, 32, 3, 1e-6, steps_per_call=4) is None
    assert make_fused_svi(1000, 64, 600, 3, 1e-6, steps_per_call=4) is None
    assert make_fused_svi(1000, 64, 200, 3, 1e-6,
                          steps_per_call=4) is not None  # M pads to 256


# ---------------------------------------------------------------------------
# BayesianSVGP ("doubly stochastic") fused path
# ---------------------------------------------------------------------------

def _bsvgp_params(m, d, rng):
    h = d + 2
    vec = rng.normal(size=(h * (h + 1) // 2,)) * 0.2
    return {
        "kernel": {"base": {"log_lengthscale": jnp.zeros((d,), jnp.float32)},
                   "log_outputscale": jnp.asarray(0.1, jnp.float32)},
        "Z": jnp.asarray(rng.normal(size=(m, d)), jnp.float32),
        "q_mu": jnp.asarray(rng.normal(size=(m, 1)) * 0.3, jnp.float32),
        "q_sqrt_raw": jnp.asarray(rng.normal(size=(1, m, m)) * 0.1,
                                  jnp.float32),
        "hyper_mu": jnp.asarray(rng.normal(size=(h,)) * 0.2, jnp.float32),
        "hyper_L_vec": jnp.asarray(vec, jnp.float32),
    }


def _bsvgp_pad(p, m, d, h):
    il = jnp.tril_indices(h)
    return {
        "hmu": jnp.zeros((1, 128), jnp.float32).at[0, :h].set(p["hyper_mu"]),
        "Lraw": jnp.zeros((128, 128), jnp.float32).at[il].set(
            p["hyper_L_vec"]),
        "Z": jnp.zeros((128, 128), jnp.float32).at[:m, :d].set(p["Z"]),
        "q_mu": jnp.zeros((128, 1), jnp.float32).at[:m].set(p["q_mu"]),
        "q_raw": jnp.zeros((128, 128), jnp.float32).at[:m, :m].set(
            p["q_sqrt_raw"][0]),
    }


@pytest.mark.parametrize("nmds", [
    (40, 8, 3, 5),
    pytest.param((64, 16, 2, 3), marks=pytest.mark.slow),
])
def test_bsvgp_loss_and_grads_match_autodiff(nmds):
    """bsvgp_loss_vg == jax.grad of -bsvgp_elbo (fixed eps, f64 truth)."""
    from ggp_tpu.models.bayesian_svgp import bsvgp_elbo
    from ggp_tpu.ops.fused_svi import bsvgp_loss_vg

    nb, m, d, S = nmds
    h = d + 2
    N = 10 * nb
    prior_var = 0.01
    jitter = 1e-6
    rng = np.random.default_rng(5)
    Xb = jnp.asarray(rng.normal(size=(nb, d)), jnp.float32)
    yb = jnp.asarray(rng.normal(size=(nb,)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(S, h)), jnp.float32)
    kern = default_rbf(ard=True)
    lik = GaussianLikelihood()
    params = _bsvgp_params(m, d, rng)

    def ref_loss(p, X_, y_, eps_):
        return -bsvgp_elbo(kern, lik, p, X_, y_, N, None, S, prior_var,
                           jitter, eps=eps_)

    p64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)
    loss_ref, g_ref = jax.value_and_grad(ref_loss)(
        p64, Xb.astype(jnp.float64), yb.astype(jnp.float64),
        eps.astype(jnp.float64))

    pp = _bsvgp_pad(params, m, d, h)
    NBp = -(-nb // 8) * 8
    Xp = jnp.zeros((NBp, 128), jnp.float32).at[:nb, :d].set(Xb)
    Xp = Xp.at[:nb, 127].set(yb)
    ep = jnp.zeros((8, 128), jnp.float32).at[:S, :h].set(eps)
    loss, g = bsvgp_loss_vg(pp, Xp, ep, N, nb, m, d, S, prior_var, jitter)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=3e-5)
    il = jnp.tril_indices(h)
    np.testing.assert_allclose(np.asarray(g["hmu"][0, :h]),
                               np.asarray(g_ref["hyper_mu"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g["Lraw"][il]),
                               np.asarray(g_ref["hyper_L_vec"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g["Z"][:m, :d]),
                               np.asarray(g_ref["Z"]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g["q_mu"][:m]),
                               np.asarray(g_ref["q_mu"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g["q_raw"][:m, :m]),
                               np.asarray(g_ref["q_sqrt_raw"][0]),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_bsvgp_chunk_kernel_matches_optax():
    """Interpret-mode BSVGP chunk kernel reproduces an optax.adam loop over
    the same minibatches and eps draws: per-step losses and final params."""
    import optax

    from ggp_tpu.models.bayesian_svgp import bsvgp_elbo
    from ggp_tpu.ops.fused_svi import make_fused_bsvgp

    nb, m, d, S, K = 16, 8, 2, 3, 4
    h = d + 2
    N = 64
    prior_var = 0.01
    jitter = 1e-6
    lr = 0.02
    rng = np.random.default_rng(9)
    X = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
    w = rng.normal(size=(d,))
    y = jnp.asarray(np.sin(np.asarray(X) @ w) + 0.3 * rng.normal(size=N),
                    jnp.float32)
    kern = default_rbf(ard=True)
    lik = GaussianLikelihood()
    params = _bsvgp_params(m, d, rng)
    idx = rng.integers(0, N, size=(K, nb))
    eps_all = rng.normal(size=(K, S, h)).astype(np.float32)

    opt = optax.adam(lr)
    p_ref = params
    state = opt.init(p_ref)
    losses_ref = []

    def loss_fn(p, Xb, yb, eps_):
        return -bsvgp_elbo(kern, lik, p, Xb, yb, N, None, S, prior_var,
                           jitter, eps=eps_)

    for t in range(K):
        lval, g = jax.value_and_grad(loss_fn)(
            p_ref, X[idx[t]], y[idx[t]], jnp.asarray(eps_all[t]))
        upd, state = opt.update(g, state)
        p_ref = optax.apply_updates(p_ref, upd)
        losses_ref.append(float(lval))

    chunk = make_fused_bsvgp(N, nb, m, d, S, prior_var, jitter,
                             steps_per_call=K, lr=lr, interpret=True)
    pp = _bsvgp_pad(params, m, d, h)
    zeros = {k: jnp.zeros_like(v) for k, v in pp.items()}
    nbp = -(-nb // 8) * 8
    slab = jnp.zeros((K * nbp, 128), jnp.float32)
    eps_slab = jnp.zeros((K * 8, 128), jnp.float32)
    for t in range(K):
        slab = slab.at[t * nbp:t * nbp + nb, :d].set(X[idx[t]])
        slab = slab.at[t * nbp:t * nbp + nb, 127].set(y[idx[t]])
        eps_slab = eps_slab.at[t * 8:t * 8 + S, :h].set(eps_all[t])
    p1, m1, v1, losses = chunk(pp, dict(zeros), dict(zeros), slab,
                               eps_slab, 0.0)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref),
                               rtol=3e-4)
    il = jnp.tril_indices(h)
    np.testing.assert_allclose(np.asarray(p1["hmu"][0, :h]),
                               np.asarray(p_ref["hyper_mu"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(p1["Lraw"][il]),
                               np.asarray(p_ref["hyper_L_vec"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(p1["Z"][:m, :d]),
                               np.asarray(p_ref["Z"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(p1["q_mu"][:m]),
                               np.asarray(p_ref["q_mu"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(p1["q_raw"][:m, :m]),
                               np.asarray(p_ref["q_sqrt_raw"][0]),
                               atol=3e-4)


def test_fused_bsvgp_gate_and_envelope(monkeypatch):
    from ggp_tpu.models.bayesian_svgp import BayesianStochasticVariationalGP
    from ggp_tpu.ops.fused_svi import make_fused_bsvgp

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(64, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    m = BayesianStochasticVariationalGP(X, y, Z_init=X[:8])
    assert not m._fused_bsvi_ok(32)       # CPU backend in CI
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert m._fused_bsvi_ok(32)
    monkeypatch.setenv("GGP_FUSED_BSVGP", "0")
    assert not m._fused_bsvi_ok(32)
    monkeypatch.delenv("GGP_FUSED_BSVGP")
    assert not m._fused_bsvi_ok(1024)     # batch too large
    m.num_hyper_samples = 12
    assert not m._fused_bsvi_ok(32)       # too many hyper samples
    assert make_fused_bsvgp(100, 32, 8, 2, 12, 0.01, 1e-6,
                            steps_per_call=2) is None
    assert make_fused_bsvgp(100, 600, 8, 2, 5, 0.01, 1e-6,
                            steps_per_call=2) is None


# ---------------------------------------------------------------------------
# Non-Gaussian fused data terms (bernoulli_probit quadrature, poisson)
# ---------------------------------------------------------------------------

def test_log_ndtr_approx_accuracy():
    """In-kernel erfc-based log_ndtr + Mills ratio vs scipy-grade truth.
    Mosaic has no erf; the kernel uses the rational erfc approximation
    (fractional error < 1.2e-7) whose exp(-z^2/2) factor cancels in the
    ratio."""
    from ggp_tpu.ops.fused_svi import _log_ndtr_and_ratio

    z = jnp.asarray(np.linspace(-30.0, 12.0, 4001), jnp.float64)
    lp, r = _log_ndtr_and_ratio(z)
    lp_ref = jax.scipy.special.log_ndtr(z)
    r_ref = jnp.exp(jax.scipy.stats.norm.logpdf(z) - lp_ref)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               atol=5e-7, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), rtol=1e-6)
    # f32 (the kernel dtype) stays finite and close far into the tail
    lp32, r32 = _log_ndtr_and_ratio(z.astype(jnp.float32))
    assert np.all(np.isfinite(np.asarray(lp32)))
    assert np.all(np.isfinite(np.asarray(r32)))
    np.testing.assert_allclose(np.asarray(lp32), np.asarray(lp_ref),
                               rtol=2e-5, atol=1e-4)


def _nongauss_case(likname, nb, m, d, rng):
    from ggp_tpu.likelihoods import BernoulliProbit, PoissonLogCox
    if likname == "bernoulli_probit":
        lik = BernoulliProbit()
        y = (rng.random(nb) < 0.5).astype(np.float64)
    else:
        lik = PoissonLogCox()
        y = rng.poisson(2.0, nb).astype(np.float64)
    params = {
        "kernel": {"base": {"log_lengthscale":
                            jnp.asarray(rng.normal(size=(d,)) * 0.3,
                                        jnp.float32)},
                   "log_outputscale": jnp.asarray(0.2, jnp.float32)},
        "lik": {},
        "Z": jnp.asarray(rng.normal(size=(m, d)), jnp.float32),
        "q_mu": jnp.asarray(rng.normal(size=(m, 1)) * 0.4, jnp.float32),
        "q_sqrt_raw": jnp.asarray(rng.normal(size=(1, m, m)) * 0.1,
                                  jnp.float32),
    }
    return lik, jnp.asarray(y, jnp.float32), params


def _pad_params_nolik(p, m, d, Mp=None):
    Mp = Mp or max(128, -(-m // 128) * 128)
    hyp = jnp.zeros((1, 128), jnp.float32)
    hyp = hyp.at[0, :d].set(p["kernel"]["base"]["log_lengthscale"])
    hyp = hyp.at[0, d].set(p["kernel"]["log_outputscale"])
    Z = jnp.zeros((Mp, 128), jnp.float32).at[:m, :d].set(p["Z"])
    q_mu = jnp.zeros((Mp, 1), jnp.float32).at[:m].set(p["q_mu"])
    q_raw = jnp.zeros((Mp, Mp), jnp.float32).at[:m, :m].set(
        p["q_sqrt_raw"][0])
    return {"hyp": hyp, "Z": Z, "q_mu": q_mu, "q_raw": q_raw}


@pytest.mark.parametrize("likname", ["bernoulli_probit", "poisson"])
@pytest.mark.parametrize("nmd", [
    (40, 8, 3),
    pytest.param((33, 16, 2), marks=pytest.mark.slow),
])
def test_svi_loss_nongauss_matches_autodiff(likname, nmd):
    """svgp_loss_vg(likelihood=...) == jax.grad of -svgp_elbo with the
    matching likelihoods.py object (f64 ground truth)."""
    from ggp_tpu.ops.fused_svi import quad_table, svgp_loss_vg

    nb, m, d = nmd
    N = 10 * nb
    jitter = 1e-6
    rng = np.random.default_rng(7)
    Xb = jnp.asarray(rng.normal(size=(nb, d)), jnp.float32)
    kern = default_rbf(ard=True)
    lik, yb, params = _nongauss_case(likname, nb, m, d, rng)

    def ref_loss(p, X_, y_):
        return -svgp_elbo(kern, lik, p, X_, y_, N, jitter)

    p64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)
    loss_ref, g_ref = jax.value_and_grad(ref_loss)(
        p64, Xb.astype(jnp.float64), yb.astype(jnp.float64))

    pp = _pad_params_nolik(params, m, d)
    NBp = -(-nb // 8) * 8
    Xslab = jnp.zeros((NBp, 128), jnp.float32).at[:nb, :d].set(Xb)
    Xslab = Xslab.at[:nb, 127].set(yb)
    if likname == "poisson":
        Xslab = Xslab.at[:nb, 126].set(
            jax.scipy.special.gammaln(yb + 1.0))
    loss_f, g_f = svgp_loss_vg(pp, Xslab, None, N, nb, m, d, jitter,
                               likelihood=likname, quad=quad_table())

    np.testing.assert_allclose(float(loss_f), float(loss_ref), rtol=1e-4)

    def close(a, b):
        a = np.asarray(a, np.float64).reshape(-1)
        b = np.asarray(b, np.float64).reshape(-1)
        tol = 2e-3 * (1.0 + np.abs(b).max())
        np.testing.assert_allclose(a, b, atol=tol, rtol=0)

    close(g_f["hyp"][0, :d], g_ref["kernel"]["base"]["log_lengthscale"])
    close(g_f["hyp"][0, d], g_ref["kernel"]["log_outputscale"])
    assert float(jnp.abs(g_f["hyp"][0, d + 1])) == 0.0  # no noise hyper
    close(g_f["Z"][:m, :d], g_ref["Z"])
    close(g_f["q_mu"][:m], g_ref["q_mu"])
    close(g_f["q_raw"][:m, :m], g_ref["q_sqrt_raw"][0])


@pytest.mark.slow
@pytest.mark.parametrize("likname", ["bernoulli_probit", "poisson"])
def test_svi_chunk_nongauss_matches_optax(likname):
    """Interpret-mode chunk kernel with a non-Gaussian data term reproduces
    the optax.adam trajectory of the XLA model loss."""
    import optax

    from ggp_tpu.ops.fused_svi import make_fused_svi

    nb, m, d, K = 16, 8, 2, 4
    N = 64
    jitter = 1e-6
    lr = 0.02
    rng = np.random.default_rng(13)
    X = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
    kern = default_rbf(ard=True)
    lik, y, params = _nongauss_case(likname, N, m, d, rng)
    idx = rng.integers(0, N, size=(K, nb))

    opt = optax.adam(lr)
    p_ref = params
    state = opt.init(p_ref)
    losses_ref = []

    def loss_fn(p, Xb, yb):
        return -svgp_elbo(kern, lik, p, Xb, yb, N, jitter)

    for t in range(K):
        lval, g = jax.value_and_grad(loss_fn)(p_ref, X[idx[t]], y[idx[t]])
        upd, state = opt.update(g, state)
        p_ref = optax.apply_updates(p_ref, upd)
        losses_ref.append(float(lval))

    svi = make_fused_svi(N, nb, m, d, jitter, steps_per_call=K, lr=lr,
                         interpret=True, likelihood=likname)
    pp = _pad_params_nolik(params, m, d)
    zeros = {k: jnp.zeros_like(v) for k, v in pp.items()}
    nbp = -(-nb // 8) * 8
    slab = jnp.zeros((K * nbp, 128), jnp.float32)
    for t in range(K):
        slab = slab.at[t * nbp:t * nbp + nb, :d].set(X[idx[t]])
        slab = slab.at[t * nbp:t * nbp + nb, 127].set(y[idx[t]])
        if likname == "poisson":
            slab = slab.at[t * nbp:t * nbp + nb, 126].set(
                jax.scipy.special.gammaln(y[idx[t]] + 1.0))
    p1, m1, v1, losses = svi(pp, dict(zeros), dict(zeros), slab, 0.0)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref),
                               rtol=3e-4)
    np.testing.assert_allclose(
        np.asarray(p1["hyp"][0, :d + 1]),
        np.r_[np.asarray(p_ref["kernel"]["base"]["log_lengthscale"]),
              float(p_ref["kernel"]["log_outputscale"])], atol=3e-4)
    np.testing.assert_allclose(np.asarray(p1["Z"][:m, :d]),
                               np.asarray(p_ref["Z"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(p1["q_mu"][:m]),
                               np.asarray(p_ref["q_mu"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(p1["q_raw"][:m, :m]),
                               np.asarray(p_ref["q_sqrt_raw"][0]),
                               atol=3e-4)


def test_fused_svi_nongauss_gate(monkeypatch):
    """Bernoulli/Poisson/Softmax SVGPs are all fused-eligible on TPU;
    the softmax kernel has its own envelope (eps-slab VMEM cap)."""
    from ggp_tpu.likelihoods import BernoulliProbit, PoissonLogCox, Softmax
    from ggp_tpu.models.svgp import StochasticVariationalGP
    from ggp_tpu.ops.fused_svi import make_fused_svi, make_fused_svi_softmax

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(64, 2)), jnp.float32)
    yb = jnp.asarray((rng.random(64) < 0.5).astype(np.float32))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    mb = StochasticVariationalGP(X, yb, likelihood=BernoulliProbit(),
                                 Z_init=X[:8])
    assert mb._fused_svi_ok(32)
    mp = StochasticVariationalGP(X, yb, likelihood=PoissonLogCox(),
                                 Z_init=X[:8])
    assert mp._fused_svi_ok(32)
    ms = StochasticVariationalGP(X, (yb > 0).astype(jnp.int32),
                                 likelihood=Softmax(num_classes=2),
                                 Z_init=X[:8])
    assert ms._fused_svi_ok(32)
    # make_fused_svi itself remains single-latent only
    assert make_fused_svi(100, 32, 8, 2, 1e-6, steps_per_call=2,
                          likelihood="softmax") is None
    # softmax factory envelope: C bounds and the MC sample cap
    assert make_fused_svi_softmax(100, 32, 8, 2, 1, 32, 1e-6,
                                  steps_per_call=2) is None
    assert make_fused_svi_softmax(100, 32, 8, 2, 3, 200, 1e-6,
                                  steps_per_call=2) is None  # n_half > 128
    assert make_fused_svi_softmax(100, 32, 8, 2, 3, 32, 1e-6,
                                  steps_per_call=2) is not None


# ---------------------------------------------------------------------------
# Softmax (multi-class) fused path
# ---------------------------------------------------------------------------

def _softmax_params(m, d, C, rng):
    return {
        "kernel": {"base": {"log_lengthscale":
                            jnp.asarray(rng.normal(size=(d,)) * 0.3,
                                        jnp.float32)},
                   "log_outputscale": jnp.asarray(0.3, jnp.float32)},
        "Z": jnp.asarray(rng.normal(size=(m, d)), jnp.float32),
        "q_mu": jnp.asarray(rng.normal(size=(m, C)) * 0.5, jnp.float32),
        "q_sqrt_raw": jnp.asarray(rng.normal(size=(C, m, m)) * 0.1,
                                  jnp.float32),
    }


def _softmax_ref_loss(p, Xb, yb, eps, N, jitter):
    """Plain-JAX mirror of -svgp_elbo with Softmax and the eps draws
    injected (antithetic ordering of likelihoods.Softmax)."""
    from ggp_tpu.kernels import default_rbf
    from ggp_tpu.models.svgp import _build_L, _kl_whitened, _whitened_q_f

    kern = default_rbf(ard=True)
    q_L = _build_L(p["q_sqrt_raw"])
    mean, var = _whitened_q_f(kern, p["kernel"], p["Z"], p["q_mu"], q_L,
                              Xb, jitter)
    eps_full = jnp.concatenate([eps, -eps], axis=0)
    f = mean[None] + jnp.sqrt(jnp.maximum(var, 1e-12))[None] * eps_full
    logp = jax.nn.log_softmax(f, axis=-1)
    yi = jnp.broadcast_to(yb, f.shape[:-1])[..., None].astype(jnp.int32)
    lp = jnp.take_along_axis(logp, yi, axis=-1)[..., 0]
    ve = jnp.mean(lp, axis=0)
    scale = N / Xb.shape[0]
    return -(scale * jnp.sum(ve) - _kl_whitened(p["q_mu"], q_L))


def _pad_softmax_params(p, m, d, C, Mp=None):
    Mp = Mp or max(128, -(-m // 128) * 128)
    hyp = jnp.zeros((1, 128), jnp.float32)
    hyp = hyp.at[0, :d].set(p["kernel"]["base"]["log_lengthscale"])
    hyp = hyp.at[0, d].set(p["kernel"]["log_outputscale"])
    Z = jnp.zeros((Mp, 128), jnp.float32).at[:m, :d].set(p["Z"])
    q_mu = jnp.zeros((Mp, 128), jnp.float32).at[:m, :C].set(p["q_mu"])
    q_raw = tuple(jnp.zeros((Mp, Mp), jnp.float32).at[:m, :m].set(
        p["q_sqrt_raw"][c]) for c in range(C))
    return {"hyp": hyp, "Z": Z, "q_mu": q_mu, "q_raw": q_raw}


@pytest.mark.parametrize("nmdc", [(24, 8, 2, 3), (40, 16, 3, 4)])
def test_softmax_loss_and_grads_match_autodiff(nmdc):
    nb, m, d, C = nmdc
    N = 10 * nb
    n_half = 4
    rng = np.random.default_rng(7)
    Xb = jnp.asarray(rng.normal(size=(nb, d)), jnp.float32)
    yb = jnp.asarray(rng.integers(0, C, size=(nb,)), jnp.float32)
    params = _softmax_params(m, d, C, rng)
    jitter = 1e-6
    key = jax.random.PRNGKey(5)
    eps = jax.random.normal(key, (n_half, nb, C), jnp.float32)

    # sanity: the explicit-eps mirror equals the model ELBO at this key
    from ggp_tpu.likelihoods import Softmax
    from ggp_tpu.models.svgp import svgp_elbo
    lik = Softmax(num_classes=C, num_mc=2 * n_half)
    from ggp_tpu.kernels import default_rbf as _dr
    loss_model = -svgp_elbo(_dr(ard=True), lik, params, Xb,
                            yb.astype(jnp.int32), N, jitter, key=key)
    loss_mirror = _softmax_ref_loss(params, Xb, yb, eps, N, jitter)
    np.testing.assert_allclose(float(loss_mirror), float(loss_model),
                               rtol=1e-5)

    # f64 ground truth of the mirror (same eps values)
    p64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)
    loss_ref, g_ref = jax.value_and_grad(_softmax_ref_loss)(
        p64, Xb.astype(jnp.float64), yb.astype(jnp.float64),
        eps.astype(jnp.float64), N, jitter)

    from ggp_tpu.ops.fused_svi import svgp_softmax_loss_vg
    pp = _pad_softmax_params(params, m, d, C)
    NBp = -(-nb // 8) * 8
    Sp = -(-n_half // 8) * 8
    Xslab = jnp.zeros((NBp, 128), jnp.float32).at[:nb, :d].set(Xb)
    Xslab = Xslab.at[:nb, 127].set(yb)
    eblk = jnp.zeros((C, Sp, NBp), jnp.float32).at[:, :n_half, :nb].set(
        jnp.transpose(eps, (2, 0, 1)))

    def eps_get(c):
        return eblk[c]

    loss_f, g_f = svgp_softmax_loss_vg(pp, Xslab, N, nb, m, d, C, n_half,
                                       eps_get, jitter)
    np.testing.assert_allclose(float(loss_f), float(loss_ref), rtol=1e-4)

    def close(a, b):
        a = np.asarray(a, np.float64).reshape(-1)
        b = np.asarray(b, np.float64).reshape(-1)
        tol = 2e-3 * (1.0 + np.abs(b).max())
        np.testing.assert_allclose(a, b, atol=tol, rtol=0)

    close(g_f["hyp"][0, :d], g_ref["kernel"]["base"]["log_lengthscale"])
    close(g_f["hyp"][0, d], g_ref["kernel"]["log_outputscale"])
    close(g_f["Z"][:m, :d], g_ref["Z"])
    close(g_f["q_mu"][:m, :C], g_ref["q_mu"])
    for c in range(C):
        close(g_f["q_raw"][c][:m, :m], g_ref["q_sqrt_raw"][c])


@pytest.mark.slow
def test_softmax_chunk_kernel_matches_optax():
    """Interpret-mode softmax chunk kernel reproduces an optax.adam loop
    over the same minibatches and eps draws: per-step losses and final
    parameters."""
    import optax

    from ggp_tpu.ops.fused_svi import make_fused_svi_softmax

    nb, m, d, C, K = 16, 8, 2, 3, 3
    n_half = 4
    N = 64
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
    y = jnp.asarray(rng.integers(0, C, size=(N,)), jnp.float32)
    params = _softmax_params(m, d, C, rng)
    jitter = 1e-6
    idx = rng.integers(0, N, size=(K, nb))
    eps_all = jax.random.normal(jax.random.PRNGKey(9), (K, n_half, nb, C),
                                jnp.float32)

    lr = 0.02
    opt = optax.adam(lr)
    p_ref = params
    state = opt.init(p_ref)
    losses_ref = []
    for t in range(K):
        Xb, yb = X[idx[t]], y[idx[t]]
        lval, g = jax.value_and_grad(_softmax_ref_loss)(
            p_ref, Xb, yb, eps_all[t], N, jitter)
        g = jax.tree_util.tree_map(
            lambda a: jnp.where(jnp.isfinite(a), a, 0.0), g)
        upd, state = opt.update(g, state)
        p_ref = optax.apply_updates(p_ref, upd)
        losses_ref.append(float(lval))

    svi = make_fused_svi_softmax(N, nb, m, d, C, n_half, jitter,
                                 steps_per_call=K, lr=lr, interpret=True)
    pp = _pad_softmax_params(params, m, d, C)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, pp)
    nbp = -(-nb // 8) * 8
    Sp = -(-n_half // 8) * 8
    slab = jnp.zeros((K * nbp, 128), jnp.float32)
    erows = jnp.zeros((K * C * Sp, nbp), jnp.float32)
    for t in range(K):
        slab = slab.at[t * nbp:t * nbp + nb, :d].set(X[idx[t]])
        slab = slab.at[t * nbp:t * nbp + nb, 127].set(y[idx[t]])
        for c in range(C):
            r0 = (t * C + c) * Sp
            erows = erows.at[r0:r0 + n_half, :nb].set(eps_all[t, :, :, c])
    p1, m1, v1, losses = svi(pp, zeros,
                             jax.tree_util.tree_map(jnp.zeros_like, pp),
                             slab, erows, 0.0)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref),
                               rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(p1["hyp"][0, :d + 1]),
        np.r_[np.asarray(p_ref["kernel"]["base"]["log_lengthscale"]),
              float(p_ref["kernel"]["log_outputscale"])], atol=3e-4)
    np.testing.assert_allclose(np.asarray(p1["Z"][:m, :d]),
                               np.asarray(p_ref["Z"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(p1["q_mu"][:m, :C]),
                               np.asarray(p_ref["q_mu"]), atol=3e-4)
    for c in range(C):
        np.testing.assert_allclose(np.asarray(p1["q_raw"][c][:m, :m]),
                                   np.asarray(p_ref["q_sqrt_raw"][c]),
                                   atol=3e-4)


@pytest.mark.slow
def test_softmax_epoch_driver_matches_xla(monkeypatch):
    """_run_svi_fused_softmax (the EPOCH driver: slab/eps packing, eps
    transpose, t0 accumulation, padded-param round-trip) reproduces the
    XLA _run_svi trajectory for 2 epochs with an interpret-mode kernel
    injected through the factory (ADVICE r3: an eps-LAYOUT bug in the
    driver would stay statistically valid and be invisible in loss
    curves — only step-for-step trajectory identity catches it)."""
    import optax

    import ggp_tpu.ops.fused_svi as fsvi
    from ggp_tpu.kernels import default_rbf
    from ggp_tpu.likelihoods import Softmax
    from ggp_tpu.models.svgp import _run_svi, _run_svi_fused_softmax

    orig_factory = fsvi.make_fused_svi_softmax
    monkeypatch.setattr(
        fsvi, "make_fused_svi_softmax",
        lambda *a, **k: orig_factory(*a, **{**k, "interpret": True}))

    N, bs, m, d, C, num_mc, lr, epochs = 48, 16, 8, 2, 3, 8, 0.02, 2
    steps = N // bs
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
    y = jnp.asarray(rng.integers(0, C, size=(N,)), jnp.float32)
    params = _softmax_params(m, d, C, rng)
    params["lik"] = {}
    jitter = 1e-6
    key = jax.random.PRNGKey(5)

    kern = default_rbf(ard=True)
    lik = Softmax(num_classes=C, num_mc=num_mc)
    p_ref, losses_ref = _run_svi(kern, lik, X, y, jitter, params,
                                 optax.adam(lr), epochs, bs, steps, key)
    p_f, losses_f = _run_svi_fused_softmax(X, y, jitter, params, epochs,
                                           bs, steps, lr, key, C, num_mc)

    np.testing.assert_allclose(np.asarray(losses_f), np.asarray(losses_ref),
                               rtol=3e-4)
    np.testing.assert_allclose(
        np.asarray(p_f["kernel"]["base"]["log_lengthscale"]),
        np.asarray(p_ref["kernel"]["base"]["log_lengthscale"]), atol=5e-4)
    np.testing.assert_allclose(float(p_f["kernel"]["log_outputscale"]),
                               float(p_ref["kernel"]["log_outputscale"]),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(p_f["Z"]), np.asarray(p_ref["Z"]),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(p_f["q_mu"]),
                               np.asarray(p_ref["q_mu"]), atol=5e-4)
    np.testing.assert_allclose(np.asarray(p_f["q_sqrt_raw"]),
                               np.asarray(p_ref["q_sqrt_raw"]), atol=5e-4)


def test_pivot_floor_and_adam_guard():
    """SVI robustness pieces: (1) the pivot-floored blocked Cholesky stays
    finite on a borderline non-PSD matrix where the sampler-semantics path
    NaNs; (2) the in-kernel Adam zeroes non-finite gradient entries
    (optax.zero_nans semantics extended to inf)."""
    from ggp_tpu.ops.fused_bound import block_chol_u
    from ggp_tpu.ops.fused_svi import _adam_update

    # rank-deficient PSD + a perturbation pushing one eigenvalue slightly
    # negative: plain f32 chol (and the NaN-semantics blocked chol) fails
    rng = np.random.default_rng(2)
    B = rng.normal(size=(128, 4))
    K = jnp.asarray(B @ B.T - 1e-3 * np.eye(128), jnp.float32)
    U_nan = block_chol_u(K, block=32)
    assert not bool(jnp.all(jnp.isfinite(U_nan)))
    U = block_chol_u(K, block=32, pivot_floor=jnp.asarray(1e-6, jnp.float32))
    assert bool(jnp.all(jnp.isfinite(U)))
    # U^T U reconstructs a nearby PSD matrix: residual bounded by the
    # deficiency scale (1e-3 eigen-perturbation on a ~4-scale matrix),
    # not amplified to O(1/floor)
    resid = np.asarray(U.T @ U - K)
    assert np.abs(resid).max() < 0.2

    g = jnp.asarray([1.0, jnp.nan, jnp.inf, -jnp.inf, 2.0], jnp.float32)
    p0 = jnp.zeros(5, jnp.float32)
    p1, m1, v1 = _adam_update(p0, g, p0, p0, jnp.asarray(1.0, jnp.float32),
                              0.1)
    assert bool(jnp.all(jnp.isfinite(p1)))
    np.testing.assert_array_equal(np.asarray(p1[1:4]), np.zeros(3))
    assert float(p1[0]) != 0.0 and float(p1[4]) != 0.0
