"""Fused SGPR trainer: hand (theta, Z) value+grad parity vs jax.grad of the
model ELBO, and whole-chunk trajectory parity vs the XLA optax chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggp_tpu.kernels import default_rbf
from ggp_tpu.models.sgpr import SparseGPR, sgpr_elbo
from ggp_tpu.ops.fused_sgpr import make_fused_sgpr, sgpr_loss_vg


def _case(n, m, d, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    w = rng.normal(size=d)
    y = np.sin(X @ w) + 0.3 * rng.normal(size=n)
    params = {
        "kernel": {"base": {"log_lengthscale":
                            jnp.asarray(rng.normal(size=d) * 0.3,
                                        jnp.float32)},
                   "log_outputscale": jnp.asarray(0.2, jnp.float32)},
        "log_noise": jnp.asarray(-1.0, jnp.float32),
        "Z": jnp.asarray(rng.normal(size=(m, d)), jnp.float32),
    }
    return (jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
            params)


def _pad(params, n, m, d, X, y):
    Np = -(-n // 8) * 8
    Mp = max(128, -(-m // 128) * 128)
    theta = jnp.zeros((1, 128), jnp.float32)
    theta = theta.at[0, :d].set(params["kernel"]["base"]["log_lengthscale"])
    theta = theta.at[0, d].set(params["kernel"]["log_outputscale"])
    theta = theta.at[0, d + 1].set(params["log_noise"])
    Z = jnp.zeros((Mp, 128), jnp.float32).at[:m, :d].set(params["Z"])
    Xp = jnp.zeros((Np, 128), jnp.float32).at[:n, :d].set(X)
    yp = jnp.zeros((Np, 1), jnp.float32).at[:n, 0].set(y)
    return theta, Z, Xp, yp


@pytest.mark.parametrize("nmd", [
    pytest.param((120, 24, 5), marks=pytest.mark.slow),
    (64, 16, 2),
    pytest.param((96, 160, 3), marks=pytest.mark.slow),
])
def test_sgpr_loss_and_grads_match_autodiff(nmd):
    """sgpr_loss_vg == jax.grad of -sgpr_elbo over (theta, Z), f64 truth."""
    n, m, d = nmd
    jitter = 1e-6
    X, y, params = _case(n, m, d)
    kern = default_rbf(ard=True)

    def ref_loss(p, X_, y_):
        return -sgpr_elbo(kern, p, X_, y_, jitter)

    p64 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)
    loss_ref, g_ref = jax.value_and_grad(ref_loss)(
        p64, X.astype(jnp.float64), y.astype(jnp.float64))
    # f32 XLA autodiff error vs the f64 truth defines the legitimate
    # precision envelope at this conditioning (cond(Kmm) ~ 1e5 for the
    # 2-D/16-point case) — same comparison pattern as
    # test_fused_svi.test_svi_loss_ill_conditioned_within_f32_envelope
    _, g32 = jax.value_and_grad(ref_loss)(params, X, y)

    theta, Z, Xp, yp = _pad(params, n, m, d, X, y)
    loss_f, g_t, g_z = sgpr_loss_vg(theta, Xp, yp, Z, n, m, d, jitter)

    np.testing.assert_allclose(float(loss_f), float(loss_ref), rtol=1e-4)

    def close(a, b, b32):
        a = np.asarray(a, np.float64).reshape(-1)
        b = np.asarray(b, np.float64).reshape(-1)
        e32 = np.abs(np.asarray(b32, np.float64).reshape(-1) - b).max()
        tol = max(2e-3 * (1.0 + np.abs(b).max()), 3.0 * e32)
        np.testing.assert_allclose(a, b, atol=tol, rtol=0)

    close(g_t[0, :d], g_ref["kernel"]["base"]["log_lengthscale"],
          g32["kernel"]["base"]["log_lengthscale"])
    close(g_t[0, d], g_ref["kernel"]["log_outputscale"],
          g32["kernel"]["log_outputscale"])
    close(g_t[0, d + 1], g_ref["log_noise"], g32["log_noise"])
    close(g_z[:m, :d], g_ref["Z"], g32["Z"])


@pytest.mark.slow
def test_sgpr_chunk_kernel_matches_optax_chain():
    """Interpret-mode chunk kernel reproduces the XLA `_run_adam` loop
    (zero_nans -> clip_by_global_norm(100) -> adam, box projection, noise
    floor): per-step losses and final parameters."""
    import optax

    from ggp_tpu.models.sgpr import _run_adam

    n, m, d, K = 48, 8, 2, 6
    jitter = 1e-6
    lr = 0.02
    X, y, params = _case(n, m, d, seed=4)
    kern = default_rbf(ard=True)

    optimizer = optax.chain(optax.zero_nans(),
                            optax.clip_by_global_norm(100.0),
                            optax.adam(lr))
    p_ref, losses_ref = _run_adam(kern, X, y, jitter, params, optimizer, K)

    chunk = make_fused_sgpr(n, m, d, jitter, steps_per_call=K, lr=lr,
                            interpret=True)
    theta, Z, Xp, yp = _pad(params, n, m, d, X, y)
    zero = {"theta": jnp.zeros((1, 128), jnp.float32),
            "Z": jnp.zeros((128, 128), jnp.float32)}
    th1, Z1, _, _, losses = chunk(theta, Z, dict(zero), dict(zero),
                                  Xp, yp, 0.0)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref),
                               rtol=3e-4)
    np.testing.assert_allclose(
        np.asarray(th1[0, :d + 2]),
        np.r_[np.asarray(p_ref["kernel"]["base"]["log_lengthscale"]),
              float(p_ref["kernel"]["log_outputscale"]),
              float(p_ref["log_noise"])], atol=3e-4)
    np.testing.assert_allclose(np.asarray(Z1[:m, :d]),
                               np.asarray(p_ref["Z"]), atol=3e-4)


def test_fused_sgpr_gate_and_envelope(monkeypatch):
    X, y, params = _case(64, 8, 2)
    model = SparseGPR(X, y, Z_init=params["Z"])
    assert not model._fused_train_ok()        # CPU backend in CI
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert model._fused_train_ok()
    monkeypatch.setenv("GGP_FUSED_SGPR", "0")
    assert not model._fused_train_ok()
    monkeypatch.delenv("GGP_FUSED_SGPR")
    big = SparseGPR(jnp.zeros((20000, 2)), jnp.zeros(20000),
                    Z_init=params["Z"])
    assert not big._fused_train_ok()          # N past the streaming cap
    assert make_fused_sgpr(20000, 8, 2, 1e-6, steps_per_call=4) is None
    assert make_fused_sgpr(100, 600, 2, 1e-6, steps_per_call=4) is None
    assert make_fused_sgpr(100, 500, 2, 1e-6, steps_per_call=4) is not None
    assert make_fused_sgpr(8192, 8, 2, 1e-6, steps_per_call=4) is not None


def test_fused_runner_matches_xla_runner_cpu():
    """_run_adam_fused (interpret path unavailable — force via monkeypatch
    of make_fused_sgpr to interpret=True) == _run_adam end-to-end, chunked
    with a remainder (max_steps=9, K capped at 200 -> single 9-step call)."""
    import optax

    import ggp_tpu.models.sgpr as sgpr_mod
    from ggp_tpu.ops import fused_sgpr as fs

    n, m, d = 40, 8, 2
    jitter = 1e-6
    lr = 0.02
    X, y, params = _case(n, m, d, seed=9)
    kern = default_rbf(ard=True)

    optimizer = optax.chain(optax.zero_nans(),
                            optax.clip_by_global_norm(100.0),
                            optax.adam(lr))
    p_ref, losses_ref = sgpr_mod._run_adam(
        kern, X, y, jitter, params, optimizer, 9)

    orig = fs.make_fused_sgpr
    def interp_factory(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)
    import unittest.mock as mock
    with mock.patch.object(fs, "make_fused_sgpr", interp_factory):
        p_f, losses_f = sgpr_mod._run_adam_fused(X, y, jitter, params, 9, lr)

    np.testing.assert_allclose(np.asarray(losses_f),
                               np.asarray(losses_ref), rtol=3e-4)
    np.testing.assert_allclose(np.asarray(p_f["Z"]), np.asarray(p_ref["Z"]),
                               atol=3e-4)
    np.testing.assert_allclose(float(p_f["log_noise"]),
                               float(p_ref["log_noise"]), atol=3e-4)


def test_sgpr_streaming_core_matches_resident():
    """The streaming VFE core with want_z_grad/want_prior=False (host-loop
    loop_blocks, NB=64 blocks) reproduces the resident sgpr_loss_vg."""
    from ggp_tpu.ops.fused_bound import _rbf_vfe_neg_logpost_vg_streaming

    n, m, d = 200, 24, 4
    NB = 64
    jitter = 1e-6
    X, y, params = _case(n, m, d, seed=2)
    theta, Z, Xp, yp = _pad(params, n, m, d, X, y)
    loss_r, gt_r, gz_r = sgpr_loss_vg(theta, Xp, yp, Z, n, m, d, jitter)

    Np = -(-n // NB) * NB
    slab = jnp.zeros((Np, 128), jnp.float32).at[:n, :d].set(X)
    slab = slab.at[:n, 127].set(y)

    def loop_blocks(body, carry):
        for t in range(Np // NB):
            carry = body(jnp.asarray(t, jnp.int32),
                         slab[t * NB:(t + 1) * NB], carry)
        return carry

    from ggp_tpu.ops.fused_bound import _default_chol_inv
    loss_s, gt_s, gz_s = _rbf_vfe_neg_logpost_vg_streaming(
        theta, Z, n, m, d, jitter, chol_inv=_default_chol_inv,
        loop_blocks=loop_blocks, NB=NB, want_z_grad=True,
        want_prior=False, pivot_floor=1e-6)

    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gt_s[0, :d + 2]),
                               np.asarray(gt_r[0, :d + 2]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gz_s[:m, :d]),
                               np.asarray(gz_r[:m, :d]),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_sgpr_streaming_chunk_matches_optax_chain():
    """Interpret-mode STREAMING chunk kernel (n=2304 > resident cap, 3 DMA
    blocks) reproduces the XLA optax-chain trajectory."""
    import optax

    from ggp_tpu.models.sgpr import _run_adam

    n, m, d, K = 2304, 8, 2, 2
    jitter = 1e-6
    lr = 0.02
    X, y, params = _case(n, m, d, seed=6)
    kern = default_rbf(ard=True)

    optimizer = optax.chain(optax.zero_nans(),
                            optax.clip_by_global_norm(100.0),
                            optax.adam(lr))
    p_ref, losses_ref = _run_adam(kern, X, y, jitter, params, optimizer, K)

    chunk = make_fused_sgpr(n, m, d, jitter, steps_per_call=K, lr=lr,
                            interpret=True)
    theta, Z, Xp, yp = _pad(params, n, m, d, X, y)
    zero = {"theta": jnp.zeros((1, 128), jnp.float32),
            "Z": jnp.zeros((128, 128), jnp.float32)}
    th1, Z1, _, _, losses = chunk(theta, Z, dict(zero), dict(zero),
                                  Xp, yp, 0.0)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref),
                               rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(th1[0, :d + 2]),
        np.r_[np.asarray(p_ref["kernel"]["base"]["log_lengthscale"]),
              float(p_ref["kernel"]["log_outputscale"]),
              float(p_ref["log_noise"])], atol=5e-4)
    np.testing.assert_allclose(np.asarray(Z1[:m, :d]),
                               np.asarray(p_ref["Z"]), atol=5e-4)


@pytest.mark.slow
def test_fused_z_adam_matches_xla_zopt():
    """Interpret-mode fused Z-only chunk (mean over S trace hypers) ==
    the XLA _adam_Z loop (zero_nans -> adam): losses and final Z."""
    import optax

    from ggp_tpu.models.bayesian_sgpr_hmc import _adam_Z
    from ggp_tpu.ops.fused_sgpr import make_fused_z_adam

    n, m, d, S, K = 40, 8, 2, 5, 3
    jitter = 1e-6
    lr = 0.02
    rng = np.random.default_rng(8)
    X, y, params = _case(n, m, d, seed=8)
    kern = default_rbf(ard=True)
    trace = {
        "kernel": {"base": {"log_lengthscale":
                            jnp.asarray(rng.normal(size=(S, d)) * 0.3,
                                        jnp.float32)},
                   "log_outputscale": jnp.asarray(rng.normal(size=S) * 0.2,
                                                  jnp.float32)},
        "log_noise": jnp.asarray(-1.0 + rng.normal(size=S) * 0.1,
                                 jnp.float32),
    }

    optimizer = optax.chain(optax.zero_nans(), optax.adam(lr))
    Z_ref, losses_ref = _adam_Z(kern, X, y, jitter, params["Z"], trace,
                                optimizer, K)

    chunk = make_fused_z_adam(n, m, d, S, jitter, steps_per_call=K, lr=lr,
                              interpret=True)
    thetas = jnp.zeros((S, 128), jnp.float32)
    thetas = thetas.at[:, :d].set(trace["kernel"]["base"]["log_lengthscale"])
    thetas = thetas.at[:, d].set(trace["kernel"]["log_outputscale"])
    thetas = thetas.at[:, d + 1].set(trace["log_noise"])
    _, Zp, Xp, yp = _pad(params, n, m, d, X, y)
    zeros = jnp.zeros((128, 128), jnp.float32)
    Z1, _, _, losses = chunk(Zp, zeros, zeros, thetas, Xp, yp, 0.0)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref),
                               rtol=3e-4)
    np.testing.assert_allclose(np.asarray(Z1[:m, :d]), np.asarray(Z_ref),
                               atol=3e-4)


def test_fused_zopt_gate(monkeypatch):
    from ggp_tpu.models.bayesian_sgpr_hmc import BayesianSparseGPR_HMC
    from ggp_tpu.ops.fused_sgpr import make_fused_z_adam

    X, y, params = _case(64, 8, 2)
    model = BayesianSparseGPR_HMC(X, y, Z_init=params["Z"])
    model.trace = {
        "kernel": {"base": {"log_lengthscale": jnp.zeros((4, 2))},
                   "log_outputscale": jnp.zeros(4)},
        "log_noise": jnp.zeros(4),
    }
    assert not model._fused_zopt_ok()         # CPU backend in CI
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert model._fused_zopt_ok()
    monkeypatch.setenv("GGP_FUSED_ZOPT", "0")
    assert not model._fused_zopt_ok()
    monkeypatch.delenv("GGP_FUSED_ZOPT")
    assert make_fused_z_adam(20000, 8, 2, 4, 1e-6, steps_per_call=2) is None
    assert make_fused_z_adam(100, 8, 2, 600, 1e-6, steps_per_call=2) is None
    assert make_fused_z_adam(4096, 8, 2, 4, 1e-6,
                             steps_per_call=2) is not None  # streams


@pytest.mark.slow
def test_fused_z_adam_streaming_matches_xla():
    """Streaming (n=2304, 3 DMA blocks) fused Z chunk == _adam_Z."""
    import optax

    from ggp_tpu.models.bayesian_sgpr_hmc import _adam_Z
    from ggp_tpu.ops.fused_sgpr import make_fused_z_adam

    n, m, d, S, K = 2304, 8, 2, 3, 2
    jitter = 1e-6
    lr = 0.02
    rng = np.random.default_rng(3)
    X, y, params = _case(n, m, d, seed=3)
    kern = default_rbf(ard=True)
    trace = {
        "kernel": {"base": {"log_lengthscale":
                            jnp.asarray(rng.normal(size=(S, d)) * 0.3,
                                        jnp.float32)},
                   "log_outputscale": jnp.asarray(rng.normal(size=S) * 0.2,
                                                  jnp.float32)},
        "log_noise": jnp.asarray(-1.0 + rng.normal(size=S) * 0.1,
                                 jnp.float32),
    }
    optimizer = optax.chain(optax.zero_nans(), optax.adam(lr))
    Z_ref, losses_ref = _adam_Z(kern, X, y, jitter, params["Z"], trace,
                                optimizer, K)

    chunk = make_fused_z_adam(n, m, d, S, jitter, steps_per_call=K, lr=lr,
                              interpret=True)
    thetas = jnp.zeros((S, 128), jnp.float32)
    thetas = thetas.at[:, :d].set(trace["kernel"]["base"]["log_lengthscale"])
    thetas = thetas.at[:, d].set(trace["kernel"]["log_outputscale"])
    thetas = thetas.at[:, d + 1].set(trace["log_noise"])
    _, Zp, Xp, yp = _pad(params, n, m, d, X, y)
    zeros = jnp.zeros((128, 128), jnp.float32)
    Z1, _, _, losses = chunk(Zp, zeros, zeros, thetas, Xp, yp, 0.0)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref),
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(Z1[:m, :d]), np.asarray(Z_ref),
                               atol=5e-4)


def test_fused_warmstart_matches_adam_all_cpu():
    """_run_adam_fused with clip_norm=10 == bayesian_sgpr_hmc._adam_all
    (the warm-start chain) — interpret-forced, 7 steps."""
    import optax

    import ggp_tpu.models.sgpr as sgpr_mod
    from ggp_tpu.models.bayesian_sgpr_hmc import _adam_all
    from ggp_tpu.ops import fused_sgpr as fs

    n, m, d = 40, 8, 2
    jitter = 1e-6
    lr = 0.02
    X, y, params = _case(n, m, d, seed=12)
    kern = default_rbf(ard=True)

    optimizer = optax.chain(optax.zero_nans(),
                            optax.clip_by_global_norm(10.0),
                            optax.adam(lr))
    p_ref, losses_ref = _adam_all(kern, X, y, jitter, params, optimizer, 7)

    orig = fs.make_fused_sgpr
    def interp_factory(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)
    import unittest.mock as mock
    with mock.patch.object(fs, "make_fused_sgpr", interp_factory):
        p_f, losses_f = sgpr_mod._run_adam_fused(X, y, jitter, params, 7,
                                                 lr, 1e-4, 10.0)

    np.testing.assert_allclose(np.asarray(losses_f),
                               np.asarray(losses_ref), rtol=3e-4)
    np.testing.assert_allclose(np.asarray(p_f["Z"]), np.asarray(p_ref["Z"]),
                               atol=3e-4)
    np.testing.assert_allclose(
        float(p_f["kernel"]["log_outputscale"]),
        float(p_ref["kernel"]["log_outputscale"]), atol=3e-4)


@pytest.mark.slow
def test_fused_z_adam_runtime_actives():
    """Round 4 (VERDICT r3 item 5): one kernel compiled at (S, K) caps with
    runtime (s_active, n_steps) scalars reproduces a kernel compiled at
    exactly those sizes — the alternating scheduler's varying rounds share
    one executable. Inactive tail losses are zero-padded."""
    from ggp_tpu.ops.fused_sgpr import make_fused_z_adam

    n, m, d = 40, 8, 2
    S, K = 5, 4                 # the "real" round
    S_cap, K_cap = 8, 6         # the compiled caps
    jitter, lr = 1e-6, 0.02
    rng = np.random.default_rng(9)
    X, y, params = _case(n, m, d, seed=9)
    thetas = jnp.zeros((S, 128), jnp.float32)
    thetas = thetas.at[:, :d].set(
        jnp.asarray(rng.normal(size=(S, d)) * 0.3, jnp.float32))
    thetas = thetas.at[:, d].set(
        jnp.asarray(rng.normal(size=S) * 0.2, jnp.float32))
    thetas = thetas.at[:, d + 1].set(
        jnp.asarray(-1.0 + rng.normal(size=S) * 0.1, jnp.float32))
    _, Zp, Xp, yp = _pad(params, n, m, d, X, y)
    zeros = jnp.zeros((128, 128), jnp.float32)

    exact = make_fused_z_adam(n, m, d, S, jitter, steps_per_call=K, lr=lr,
                              interpret=True)
    Z_ref, _, _, losses_ref = exact(Zp, zeros, zeros, thetas, Xp, yp, 0.0)

    capped = make_fused_z_adam(n, m, d, S_cap, jitter, steps_per_call=K_cap,
                               lr=lr, interpret=True)
    Z1, _, _, losses = capped(Zp, zeros, zeros, thetas, Xp, yp, 0.0,
                              s_active=S, n_steps=K)

    np.testing.assert_allclose(np.asarray(losses[:K]),
                               np.asarray(losses_ref), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(losses[K:]),
                                  np.zeros(K_cap - K, np.float32))
    np.testing.assert_allclose(np.asarray(Z1), np.asarray(Z_ref), atol=1e-6)
