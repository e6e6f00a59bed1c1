"""Fused SGPMC warm start: hand (state, Z) value+grad parity vs jax.grad of
the XLA warm-start objective, and whole-chunk trajectory parity vs the XLA
optax chain (models/sgpmc.py warm_start)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggp_tpu.kernels import default_rbf
from ggp_tpu.likelihoods import GaussianLikelihood
from ggp_tpu.models.sgpmc import SGPMC, _whitened_conditional
from ggp_tpu.ops.fused_sgpmc import (make_fused_sgpmc_warm,
                                     sgpmc_warm_loss_vg)


def _case(n, m, d, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    w = rng.normal(size=d)
    y = np.sin(X @ w) + 0.3 * rng.normal(size=n)
    params = {
        "state": {
            "v": jnp.asarray(rng.normal(size=m) * 0.5, jnp.float32),
            "kernel": {"base": {"log_lengthscale":
                                jnp.asarray(rng.normal(size=d) * 0.3,
                                            jnp.float32)},
                       "log_outputscale": jnp.asarray(0.2, jnp.float32)},
            "lik": {"log_noise": jnp.asarray(-1.0, jnp.float32)},
        },
        "Z": jnp.asarray(rng.normal(size=(m, d)), jnp.float32),
    }
    return (jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
            params)


def _ref_loss_fn(kern, jitter):
    lik = GaussianLikelihood()

    def ref_loss(p, X_, y_):
        # models/sgpmc.py warm_start `loss`: -(loglik - ||v||^2 / 2)
        mean, var = _whitened_conditional(kern, p["state"]["kernel"],
                                          p["Z"], p["state"]["v"], X_,
                                          jitter)
        ve = lik.variational_expectation(p["state"]["lik"], mean, var, y_)
        return -(jnp.sum(ve) - 0.5 * jnp.sum(p["state"]["v"] ** 2))

    return ref_loss


def _pad(params, n, m, d, X, y):
    Np = -(-n // 128) * 128
    st = jnp.zeros((1, 128), jnp.float32)
    st = st.at[0, :d].set(
        params["state"]["kernel"]["base"]["log_lengthscale"])
    st = st.at[0, d].set(params["state"]["kernel"]["log_outputscale"])
    st = st.at[0, d + 1].set(params["state"]["lik"]["log_noise"])
    st = st.at[0, d + 2:d + 2 + m].set(params["state"]["v"])
    Z = jnp.zeros((128, 128), jnp.float32).at[:m, :d].set(params["Z"])
    Xp = jnp.zeros((Np, 128), jnp.float32).at[:n, :d].set(X)
    yrow = jnp.zeros((1, Np), jnp.float32).at[0, :n].set(y)
    return st, Z, Xp, yrow


@pytest.mark.parametrize("nmd", [
    (64, 12, 2),
    pytest.param((120, 20, 5), marks=pytest.mark.slow),
])
def test_warm_loss_and_grads_match_autodiff(nmd):
    """sgpmc_warm_loss_vg == jax.grad of the warm-start loss, f64 truth."""
    n, m, d = nmd
    jitter = 1e-6
    X, y, params = _case(n, m, d)
    kern = default_rbf(ard=True)
    ref_loss = _ref_loss_fn(kern, jitter)

    p64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)
    loss_ref, g_ref = jax.value_and_grad(ref_loss)(
        p64, X.astype(jnp.float64), y.astype(jnp.float64))
    _, g32 = jax.value_and_grad(ref_loss)(params, X, y)

    st, Z, Xp, yrow = _pad(params, n, m, d, X, y)
    loss_f, g_s, g_z = sgpmc_warm_loss_vg(st, Xp, yrow, Z, n, m, d, jitter)

    np.testing.assert_allclose(float(loss_f), float(loss_ref), rtol=1e-4)

    def close(a, b, b32):
        a = np.asarray(a, np.float64).reshape(-1)
        b = np.asarray(b, np.float64).reshape(-1)
        e32 = np.abs(np.asarray(b32, np.float64).reshape(-1) - b).max()
        tol = max(2e-3 * (1.0 + np.abs(b).max()), 3.0 * e32)
        np.testing.assert_allclose(a, b, atol=tol, rtol=0)

    gs = g_ref["state"]
    gs32 = g32["state"]
    close(g_s[0, :d], gs["kernel"]["base"]["log_lengthscale"],
          gs32["kernel"]["base"]["log_lengthscale"])
    close(g_s[0, d], gs["kernel"]["log_outputscale"],
          gs32["kernel"]["log_outputscale"])
    close(g_s[0, d + 1], gs["lik"]["log_noise"], gs32["lik"]["log_noise"])
    close(g_s[0, d + 2:d + 2 + m], gs["v"], gs32["v"])
    close(g_z[:m, :d], g_ref["Z"], g32["Z"])
    # padding stays zero
    assert float(jnp.abs(g_s[0, d + 2 + m:]).max()) == 0.0
    assert float(jnp.abs(g_z[m:]).max()) == 0.0


@pytest.mark.slow
def test_warm_chunk_matches_xla_warm_start():
    """Interpret-mode chunk kernel reproduces SGPMC.warm_start's XLA scan
    (zero_nans -> clip_by_global_norm(10) -> adam): per-step losses and
    final (state, Z)."""
    n, m, d, K = 48, 8, 2, 6
    lr = 0.02
    X, y, params = _case(n, m, d, seed=4)

    model = SGPMC(X, y, Z_init=params["Z"], jitter=1e-6)
    model.state = {**params["state"], "mean": {}}
    losses_ref = model.warm_start(num_steps=K, lr=lr)   # CPU -> XLA path
    p_ref, Z_ref = model.state, model.Z

    chunk = make_fused_sgpmc_warm(n, m, d, 1e-6, steps_per_call=K, lr=lr,
                                  interpret=True)
    st, Z, Xp, yrow = _pad(params, n, m, d, X, y)
    zero = {"state": jnp.zeros((1, 128), jnp.float32),
            "Z": jnp.zeros((128, 128), jnp.float32)}
    st1, Z1, _, _, losses = chunk(st, Z, dict(zero), dict(zero),
                                  Xp, yrow, 0.0)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref),
                               rtol=3e-4)
    np.testing.assert_allclose(
        np.asarray(st1[0, :d]),
        np.asarray(p_ref["kernel"]["base"]["log_lengthscale"]), atol=3e-4)
    np.testing.assert_allclose(float(st1[0, d + 1]),
                               float(p_ref["lik"]["log_noise"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(st1[0, d + 2:d + 2 + m]),
                               np.asarray(p_ref["v"]), atol=3e-4)
    np.testing.assert_allclose(np.asarray(Z1[:m, :d]), np.asarray(Z_ref),
                               atol=3e-4)


def test_fused_warm_gate_and_envelope(monkeypatch):
    X, y, params = _case(64, 8, 2)
    model = SGPMC(X, y, Z_init=params["Z"])
    assert not model._fused_warm_ok()         # CPU backend in CI
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert model._fused_warm_ok()
    monkeypatch.setenv("GGP_FUSED_WARM", "0")
    assert not model._fused_warm_ok()
    monkeypatch.delenv("GGP_FUSED_WARM")
    big = SGPMC(jnp.zeros((4096, 2)), jnp.zeros(4096),
                Z_init=params["Z"])
    assert not big._fused_warm_ok()           # n past the resident cap
    assert make_fused_sgpmc_warm(4096, 8, 2, 1e-6, steps_per_call=4) is None
    # state row overflow: d + 2 + m > 128
    assert make_fused_sgpmc_warm(100, 127, 2, 1e-6, steps_per_call=4) is None
    assert make_fused_sgpmc_warm(2048, 100, 2, 1e-6,
                                 steps_per_call=4) is not None
