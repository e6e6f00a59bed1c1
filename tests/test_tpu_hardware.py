"""Real-TPU validation lane: ``GGP_TEST_TPU=1 python -m pytest -m tpu``.

Interpret-mode Pallas tests cannot catch Mosaic relayout/lowering failures
(CLAUDE.md) — each fused kernel family that is DEFAULT-ON needs one run on
hardware before a round ships. These tests are auto-skipped on the CPU CI
backend (tests/conftest.py adds the skip marker), so the default suites are
unchanged; on hardware they assert the kernel compiles, matches the XLA
path statistically, and actually wins wall-clock.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def test_fused_softmax_svi_hardware(monkeypatch):
    """Fused softmax SVI (ops/fused_svi.make_fused_svi_softmax) on real TPU:
    Mosaic-compiles, tracks the XLA optax loss curve, and beats it on wall
    (recorded 18.0x at 800 steps, PERF.md round-4 softmax row)."""
    from ggp_tpu.likelihoods import Softmax
    from ggp_tpu.models import StochasticVariationalGP

    rng = np.random.default_rng(42)
    N, d, C, M, bs, epochs = 512, 4, 3, 64, 128, 50
    X = rng.normal(size=(N, d))
    w = rng.normal(size=(d, C))
    y = np.argmax(X @ w + 0.5 * rng.normal(size=(N, C)), axis=1)
    Xj = jnp.asarray(X, jnp.float32)
    yj = jnp.asarray(y, jnp.int32)
    key = jax.random.PRNGKey(3)

    def run():
        m = StochasticVariationalGP(
            Xj, yj, likelihood=Softmax(num_classes=C, num_mc=64),
            Z_init=Xj[:M])
        losses = m.train_model(num_epochs=epochs, batch_size=bs, lr=0.02,
                               key=key)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        m2 = StochasticVariationalGP(
            Xj, yj, likelihood=Softmax(num_classes=C, num_mc=64),
            Z_init=Xj[:M])
        l2 = m2.train_model(num_epochs=epochs, batch_size=bs, lr=0.02,
                            key=key)
        jax.block_until_ready(l2)
        return np.asarray(losses), time.perf_counter() - t0

    monkeypatch.setenv("GGP_FUSED_SVI", "1")
    lf, tf = run()
    monkeypatch.setenv("GGP_FUSED_SVI", "0")
    lx, tx = run()

    # statistical parity: same basin, same curve shape. (Bitwise trajectory
    # identity is a CPU-interpret property — tests/test_fused_svi.py; on
    # hardware Adam's sign behaviour amplifies f32 ULP differences.)
    assert np.all(np.isfinite(lf))
    np.testing.assert_allclose(lf, lx, rtol=0.02)
    assert lf[-1] < 0.6 * lf[0]
    assert tf < tx, f"fused ({tf:.3f}s) should beat XLA ({tx:.3f}s)"


def test_fused_transition_smoke_hardware():
    """Flagship fused NUTS transition compiles and samples healthily on
    hardware (default-on path, ops/fused_nuts.py)."""
    if os.environ.get("GGP_FUSED_TRANSITION", "1") == "0":
        pytest.skip("fused transitions disabled by env")
    from ggp_tpu.models import BayesianSparseGPR_HMC

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(128, 3)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(X) @ np.ones(3)).ravel()
                    + 0.1 * rng.normal(size=128), jnp.float32)
    m = BayesianSparseGPR_HMC(X, y, Z_init=X[:16])
    m.warm_start(num_steps=100, lr=0.01)
    m.sample_hypers(50, 20, key=jax.random.PRNGKey(1))
    div = float(np.asarray(m.stats["diverging"]).mean())
    acc = float(np.asarray(m.stats["accept_prob"]).mean())
    assert div <= 0.1 and acc >= 0.5


def test_streaming_sgpmc_hardware():
    """N-streamed whitened-JointHMC kernels (round 4) on real TPU: at
    n > MAX_N_RESIDENT the single-chain NUTS and the C-batched HMC chunk
    kernels stream X/y from HBM in a single pass per potential eval
    (ops/fused_bound._sgpmc_neg_logpost_vg_streaming). Asserts they
    Mosaic-compile and sample healthily end-to-end through SGPMC.
    Reference protocol: gpflow SGPMC (models/sgp_hmc.py:67-73)."""
    if os.environ.get("GGP_FUSED_TRANSITION", "1") == "0":
        pytest.skip("fused transitions disabled by env")
    from ggp_tpu.models import SGPMC
    from ggp_tpu.ops.fused_nuts import MAX_N_RESIDENT

    rng = np.random.default_rng(0)
    n, d, M = MAX_N_RESIDENT + 1024, 4, 32
    X = rng.normal(size=(n, d)).astype(np.float32)
    y = (np.sin(X @ rng.normal(size=(d,)))
         + 0.1 * rng.normal(size=n)).astype(np.float32)
    m = SGPMC(X, y, Z_init=X[:: n // M][:M].copy(), jitter=1e-6)
    m.warm_start(num_steps=100, lr=0.05)

    m.train_model(num_warmup=20, num_samples=20, algorithm="nuts")
    assert float(np.asarray(m.stats["diverging"]).mean()) <= 0.1
    assert float(np.asarray(m.stats["accept_prob"]).mean()) >= 0.5
    assert all(bool(np.all(np.isfinite(np.asarray(l))))
               for l in jax.tree_util.tree_leaves(m.trace))

    m.train_model(num_warmup=20, num_samples=20, num_chains=4,
                  algorithm="hmc", num_leapfrog=10)
    assert float(np.asarray(m.stats["diverging"]).mean()) <= 0.1
    assert float(np.asarray(m.stats["accept_prob"]).mean()) >= 0.5
    assert all(bool(np.all(np.isfinite(np.asarray(l))))
               for l in jax.tree_util.tree_leaves(m.trace))
