"""Chain-batched fused HMC kernels (ops.fused_multichain): interpret-mode
correctness on CPU. TPU throughput numbers: PERF.md round 3."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ggp_tpu.ops.fused_bound import (block_chol_u, block_ut_inv,
                                     make_rbf_vfe_potential)
from ggp_tpu.ops.fused_multichain import (_rbf_vfe_batched_vg,
                                          chol_u_inv_batched_inplace,
                                          fused_multichain_supported,
                                          make_fused_hmc_multichain)

pytestmark = pytest.mark.slow   # interpret-mode Pallas


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    n, m, d = 48, 8, 2
    X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    w = rng.normal(size=(d,))
    y = jnp.asarray(np.sin(np.asarray(X) @ w) + 0.3 * rng.normal(size=n),
                    jnp.float32)
    return X, y, X[:m], d


def test_envelope():
    assert fused_multichain_supported(404, 13, 100, 8)
    assert not fused_multichain_supported(404, 13, 100, 1)   # use single path
    assert not fused_multichain_supported(404, 13, 100, 16)
    # vfe streams past the resident cap (round 3); sgpmc stays resident
    assert fused_multichain_supported(5000, 13, 100, 8, target="vfe")
    assert not fused_multichain_supported(5000, 13, 100, 8, target="sgpmc")
    assert not fused_multichain_supported(60000, 13, 100, 8, target="vfe")


def test_batched_chol_parity():
    C, Mp = 3, 128
    rng = np.random.default_rng(0)
    Ks = []
    for _ in range(C):
        A = rng.normal(size=(Mp, Mp))
        Ks.append(jnp.asarray(A @ A.T + Mp * np.eye(Mp), jnp.float32))
    K_all = jnp.concatenate(Ks, axis=0)

    def body(k_ref, u_ref, v_ref, Ks_s, Ds_s):
        Ks_s[:] = k_ref[:]
        chol_u_inv_batched_inplace(Ks_s, u_ref, v_ref, Ds_s, C, block=32)

    U_all, V_all = pl.pallas_call(
        body,
        out_shape=(jax.ShapeDtypeStruct((C * Mp, Mp), jnp.float32),) * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        scratch_shapes=[pltpu.VMEM((C * Mp, Mp), jnp.float32),
                        pltpu.VMEM((C * Mp, 128), jnp.float32)],
        interpret=True)(K_all)
    for c in range(C):
        U = np.asarray(U_all[c * Mp:(c + 1) * Mp], np.float64)
        V = np.asarray(V_all[c * Mp:(c + 1) * Mp], np.float64)
        Lref = np.linalg.cholesky(np.asarray(Ks[c], np.float64))
        assert np.abs(U.T - Lref).max() / np.abs(Lref).max() < 1e-4
        assert np.abs(U @ V - np.eye(Mp)).max() < 1e-3


def test_batched_potential_matches_single(problem):
    """Value-level batched potential == per-chain single potential (exact:
    same ops, chain loop only reorders)."""
    X, y, Z, d = problem
    C, n, m = 3, X.shape[0], Z.shape[0]
    rng = np.random.default_rng(3)
    thetas_np = rng.normal(size=(C, d + 2)) * 0.4
    Np = -(-n // 8) * 8
    Xp = jnp.zeros((Np, 128), jnp.float32).at[:n, :d].set(X)
    yp = jnp.zeros((Np, 1), jnp.float32).at[:n, 0].set(y)
    Zp = jnp.zeros((128, 128), jnp.float32).at[:m, :d].set(Z)
    thetas = jnp.zeros((C, 128), jnp.float32).at[:, :d + 2].set(
        jnp.asarray(thetas_np, jnp.float32))

    def val_chol(K_list):
        out = []
        for Kj in K_list:
            U = block_chol_u(Kj, block=32)
            out.append((U, block_ut_inv(U, block=32)))
        return out

    Ub, gb = _rbf_vfe_batched_vg(thetas, Xp, yp, Zp, n, m, d, 1e-6, C,
                                 val_chol)
    pot = make_rbf_vfe_potential(X, y, 1e-6)
    for c in range(C):
        u1, g1 = pot(jnp.asarray(thetas_np[c], jnp.float32), Z)
        np.testing.assert_allclose(float(Ub[c, 0]), float(u1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gb[c, :d + 2]),
                                   np.asarray(g1), rtol=1e-3, atol=1e-3)


def test_multichain_kernel_potential(problem):
    """In-kernel (interpret) batched potential matches the XLA potential."""
    X, y, Z, d = problem
    C = 2
    fused = make_fused_hmc_multichain(X, y, 1e-6, num_chains=C,
                                     interpret=True)(Z)
    rng = np.random.default_rng(5)
    thetas = jnp.asarray(rng.normal(size=(C, d + 2)) * 0.3, jnp.float32)
    U_b, g_b = jax.jit(fused.potential)(thetas)
    pot = make_rbf_vfe_potential(X, y, 1e-6)
    for c in range(C):
        u1, g1 = pot(thetas[c], Z)
        np.testing.assert_allclose(float(U_b[c]), float(u1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_b[c]), np.asarray(g1),
                                   rtol=1e-3, atol=1e-3)


def test_multichain_sampler_end_to_end(problem):
    """Movement on fixed-eps sample chunks (a tune=12 warmup is degenerate
    in every path — same caveat as the single-chain chunked test), then the
    integrated build_sampler run for shapes/trim/stat plumbing."""
    from ggp_tpu.inference.hmc import NUTSConfig, build_sampler

    X, y, Z, d = problem
    C = 2
    builder = make_fused_hmc_multichain(X, y, 1e-6, num_chains=C, chunk=4,
                                        num_leapfrog=5, interpret=True)
    fused = builder(Z)

    # movement + chaining across chunks at a known-good step size
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.normal(size=(C, d + 2)) * 0.3, jnp.float32)
    U, g = fused.potential(z)
    inv_mass = jnp.ones((C, d + 2), jnp.float32)
    eps = jnp.full((C,), 0.1, jnp.float32)
    key = jax.random.PRNGKey(2)
    rows, accs = [], []
    for _ in range(3):
        key, k = jax.random.split(key)
        zs, z, U, g, acc, div = fused.sample_chunk(z, U, g, k, eps,
                                                   inv_mass, 4)
        rows.append(np.asarray(zs).reshape(-1, d + 2))
        accs.append(np.asarray(acc))
        assert not np.any(np.asarray(div) > 0.5)
    rows = np.concatenate(rows)
    assert np.all(np.isfinite(rows))
    assert len({tuple(r) for r in np.round(rows, 5)}) > 16
    assert np.mean(np.concatenate(accs)) > 0.4
    # carried state equals the last draw of each chain
    np.testing.assert_allclose(np.asarray(z), rows[-C:], atol=1e-6)

    # integrated path: shapes, trimming, stat plumbing, per-chain eps
    cfg = NUTSConfig(num_warmup=12, num_samples=8, algorithm="hmc",
                     num_leapfrog=5)
    init = {"v": jnp.zeros(d + 2, jnp.float32)}
    sampler = build_sampler(lambda p, Z_: 0.0, init, cfg, num_chains=C,
                            fused_builder=lambda Z_: builder(Z_))
    samples, stats = sampler(init, jax.random.PRNGKey(0), Z)
    zs = np.asarray(samples["v"])
    assert zs.shape == (C, 8, d + 2)
    assert np.all(np.isfinite(zs))
    assert not np.allclose(zs[0], zs[1])      # chains differ
    acc = np.asarray(stats["accept_prob"])
    assert acc.shape == (C, 8)
    assert np.all((acc >= 0) & (acc <= 1))
    assert np.asarray(stats["step_size"]).shape == (C,)


def test_multichain_sgpmc_potential_and_chunks(problem):
    """target="sgpmc": batched whitened-JointHMC potential matches the
    single-chain fused sgpmc potential per chain, and fixed-eps sample
    chunks move with healthy accepts."""
    from ggp_tpu.ops.fused_nuts import make_fused_nuts

    X, y, Z, d = problem
    m = Z.shape[0]
    C = 2
    dim = d + 2 + m
    builder = make_fused_hmc_multichain(X, y, 1e-6, num_chains=C, chunk=4,
                                        num_leapfrog=5, target="sgpmc",
                                        interpret=True)
    fused = builder(Z)
    single = make_fused_nuts(X, y, 1e-6, target="sgpmc",
                             interpret=True)(Z)
    rng = np.random.default_rng(9)
    states = jnp.asarray(rng.normal(size=(C, dim)) * 0.2, jnp.float32)
    U_b, g_b = jax.jit(fused.potential)(states)
    for c in range(C):
        u1, g1 = single.potential(states[c])
        np.testing.assert_allclose(float(U_b[c]), float(u1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_b[c]), np.asarray(g1),
                                   rtol=1e-3, atol=1e-3)

    z = states
    U, g = fused.potential(z)
    inv_mass = jnp.ones((C, dim), jnp.float32)
    eps = jnp.full((C,), 0.05, jnp.float32)
    key = jax.random.PRNGKey(4)
    accs = []
    for _ in range(2):
        key, k = jax.random.split(key)
        zs, z, U, g, acc, div = fused.sample_chunk(z, U, g, k, eps,
                                                   inv_mass, 4)
        accs.append(np.asarray(acc))
        assert not np.any(np.asarray(div) > 0.5)
        assert np.all(np.isfinite(np.asarray(zs)))
    assert np.mean(np.concatenate(accs)) > 0.4


def test_streaming_multichain_potential_and_chunks(problem, monkeypatch):
    """vfe-core multichain N-streaming (round 3): with the resident cap
    forced low, the HBM block-streaming batched potential must match the
    XLA potential per chain, and fixed-eps sample chunks must move.
    n=48 pads to 2 blocks of 32 — exercises multi-block accumulation and
    row masking across all C chains sharing each DMA'd block."""
    import ggp_tpu.ops.fused_multichain as fm

    X, y, Z, d = problem
    C = 3
    monkeypatch.setattr(fm, "MAX_N_MULTICHAIN", 16)
    builder = fm.make_fused_hmc_multichain(X, y, 1e-6, num_chains=C,
                                           chunk=4, num_leapfrog=5,
                                           stream_block=32, interpret=True)
    fused = builder(Z)
    rng = np.random.default_rng(11)
    thetas = jnp.asarray(rng.normal(size=(C, d + 2)) * 0.3, jnp.float32)
    U_b, g_b = jax.jit(fused.potential)(thetas)
    pot = make_rbf_vfe_potential(X, y, 1e-6)
    for c in range(C):
        u1, g1 = pot(thetas[c], Z)
        np.testing.assert_allclose(float(U_b[c]), float(u1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g_b[c]), np.asarray(g1),
                                   rtol=1e-3, atol=1e-3)

    z = thetas
    U, g = fused.potential(z)
    inv_mass = jnp.ones((C, d + 2), jnp.float32)
    eps = jnp.full((C,), 0.1, jnp.float32)
    key = jax.random.PRNGKey(2)
    accs = []
    for _ in range(2):
        key, k = jax.random.split(key)
        zs, z, U, g, acc, div = fused.sample_chunk(z, U, g, k, eps,
                                                   inv_mass, 4)
        accs.append(np.asarray(acc))
        assert not np.any(np.asarray(div) > 0.5)
        assert np.all(np.isfinite(np.asarray(zs)))
    assert np.mean(np.concatenate(accs)) > 0.3
    assert not np.allclose(np.asarray(z), np.asarray(thetas))
