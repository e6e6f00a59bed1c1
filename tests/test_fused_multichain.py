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
    assert fused_multichain_supported(404, 13, 100, 16)      # round-3 cap
    assert not fused_multichain_supported(404, 13, 100, 1)   # use single path
    assert not fused_multichain_supported(404, 13, 100, 32)
    # vfe streams past the resident cap (round 3); sgpmc too (round 4)
    assert fused_multichain_supported(5000, 13, 100, 8, target="vfe")
    assert fused_multichain_supported(5000, 13, 100, 8, target="sgpmc")
    assert not fused_multichain_supported(60000, 13, 100, 8, target="vfe")
    assert not fused_multichain_supported(60000, 13, 100, 8, target="sgpmc")


def test_chain_batched_solves():
    """ut_t_solve_maj / ut_solve_maj (one set of panel ops for all chains)
    match per-chain numpy triangular solves exactly."""
    from ggp_tpu.ops.fused_multichain import ut_solve_maj, ut_t_solve_maj
    rng = np.random.default_rng(3)
    C, Mp = 4, 128
    Us, Vs, bs = [], [], []
    for _ in range(C):
        A = rng.normal(size=(Mp, Mp))
        U = np.linalg.cholesky(A @ A.T + Mp * np.eye(Mp)).T
        Us.append(U)
        Vs.append(np.linalg.inv(U))
        bs.append(rng.normal(size=(Mp, 1)))
    U_all = jnp.asarray(np.concatenate(Us, 0), jnp.float32)
    V_all = jnp.asarray(np.concatenate(Vs, 0), jnp.float32)
    b_maj = jnp.asarray(np.concatenate(bs, 0), jnp.float32)
    for block in (32, 64):
        c = np.asarray(ut_t_solve_maj(U_all, V_all, b_maj, C, block=block))
        v = np.asarray(ut_solve_maj(U_all, V_all, b_maj, C, block=block))
        for ci in range(C):
            sl = slice(ci * Mp, (ci + 1) * Mp)
            cref = np.linalg.solve(Us[ci].T, bs[ci])
            vref = np.linalg.solve(Us[ci], bs[ci])
            assert np.abs(c[sl] - cref).max() / np.abs(cref).max() < 1e-5
            assert np.abs(v[sl] - vref).max() / np.abs(vref).max() < 1e-5


@pytest.mark.parametrize("C,G", [(3, 1), (8, 4), (16, 4), (4, 2)])
def test_batched_chol_parity(C, G):
    Mp = 128
    rng = np.random.default_rng(0)
    Ks = []
    for _ in range(C):
        A = rng.normal(size=(Mp, Mp))
        Ks.append(jnp.asarray(A @ A.T + Mp * np.eye(Mp), jnp.float32))
    K_all = jnp.concatenate(Ks, axis=0)

    def body(k_ref, u_ref, v_ref, Ks_s, Ds_s):
        Ks_s[:] = k_ref[:]
        chol_u_inv_batched_inplace(Ks_s, u_ref, v_ref, Ds_s, C, block=32,
                                   lane_groups=G)

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


def test_streaming_multichain_sgpmc_potential_and_chunks(problem,
                                                         monkeypatch):
    """sgpmc-core multichain N-streaming (round 4): with the resident cap
    forced low, the single-pass HBM block-streaming batched whitened-JointHMC
    potential must match the resident single-chain fused sgpmc potential per
    chain, and fixed-eps sample chunks must move with healthy accepts."""
    import ggp_tpu.ops.fused_multichain as fm
    from ggp_tpu.ops.fused_nuts import make_fused_nuts

    X, y, Z, d = problem
    m = Z.shape[0]
    C = 2
    dim = d + 2 + m
    monkeypatch.setattr(fm, "MAX_N_MULTICHAIN", 16)
    builder = fm.make_fused_hmc_multichain(X, y, 1e-6, num_chains=C, chunk=4,
                                           num_leapfrog=5, target="sgpmc",
                                           stream_block=32, interpret=True)
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


def test_streaming_multichain_sgpmc_nuts_chunks(problem, monkeypatch):
    """Streaming + lock-step NUTS on the sgpmc core (round 4): the
    single-pass HBM block-streaming batched whitened-JointHMC potential
    drives the in-kernel multichain doubling loop. With the resident cap
    forced low (n=48 -> 2 DMA blocks of 32), the batched potential must
    match the resident single-chain fused sgpmc potential per chain and
    NUTS sample chunks must move with real tree depths."""
    import ggp_tpu.ops.fused_multichain as fm
    from ggp_tpu.ops.fused_nuts import make_fused_nuts

    X, y, Z, d = problem
    m = Z.shape[0]
    C = 2
    dim = d + 2 + m
    monkeypatch.setattr(fm, "MAX_N_MULTICHAIN", 16)
    builder = fm.make_fused_hmc_multichain(X, y, 1e-6, num_chains=C,
                                           chunk=4, algo="nuts",
                                           max_depth=5, target="sgpmc",
                                           stream_block=32, interpret=True)
    fused = builder(Z)
    assert fused.algo == "nuts"
    single = make_fused_nuts(X, y, 1e-6, target="sgpmc",
                             interpret=True)(Z)
    rng = np.random.default_rng(17)
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
    key = jax.random.PRNGKey(6)
    accs, deps = [], []
    for _ in range(2):
        key, k = jax.random.split(key)
        zs, z, U, g, acc, div, dep, nlv = fused.sample_chunk(
            z, U, g, k, eps, inv_mass, 4)
        accs.append(np.asarray(acc))
        deps.append(np.asarray(dep))
        assert not np.any(np.asarray(div) > 0.5)
        assert np.all(np.isfinite(np.asarray(zs)))
        assert np.all(np.asarray(nlv) >= 1)
    assert np.mean(np.concatenate(accs)) > 0.3
    assert np.concatenate(deps).max() >= 1
    assert not np.allclose(np.asarray(z), np.asarray(states))


def test_nuts_batched_equals_per_chain():
    """Lock-step masking correctness: C chains advanced jointly through
    _nuts_transition_batched give bitwise the same result as each chain
    run alone with its own randomness rows (the potential is elementwise,
    so batching cannot change the arithmetic — only the masking can)."""
    from ggp_tpu.ops.fused_multichain import _nuts_transition_batched

    f32 = jnp.float32
    C, dim, max_depth = 3, 5, 5
    leaf_rows = 1
    lane = jnp.arange(128)
    dmask = (lane < dim).astype(f32)
    a = (0.5 + jnp.arange(128, dtype=f32) % 7) * dmask       # curvatures

    def pot(z):
        U = 0.5 * jnp.sum(a * z * z, axis=1, keepdims=True)
        return U, a * z

    rng = np.random.default_rng(21)
    z0 = jnp.asarray(rng.normal(size=(C, 128)) * dmask[None], f32)
    # per-chain step sizes spread so tree depths differ across chains
    eps = jnp.asarray([[0.1], [0.45], [0.9]], f32)
    inv_mass = jnp.ones((C, 128), f32)
    U0, g0 = pot(z0)
    mom = jnp.asarray(rng.normal(size=(C, 128)), f32) * dmask[None]
    TR = jnp.asarray(rng.uniform(size=(C, 128)), f32)
    LU = jnp.asarray(rng.uniform(size=(C * leaf_rows, 128)), f32)

    run = jax.jit(lambda z, U, g, e, im, m, tr, lu, c: (
        _nuts_transition_batched(z, U, g, e, im, pot, m, tr, lu,
                                 C=c, max_depth=max_depth,
                                 leaf_rows=leaf_rows)), static_argnums=8)
    joint = run(z0, U0, g0, eps, inv_mass, mom, TR, LU, C)
    dep_j = np.asarray(joint[5])[:, 0]
    assert len(set(dep_j.tolist())) > 1     # chains really took different trees
    for c in range(C):
        sl = slice(c, c + 1)
        single = run(z0[sl], U0[sl], g0[sl], eps[sl], inv_mass[sl],
                     mom[sl], TR[sl],
                     LU[c * leaf_rows:(c + 1) * leaf_rows], 1)
        for j_out, s_out, name in zip(joint, single,
                                      ["zp", "Up", "gp", "acc", "div",
                                       "dep", "nl", "H0"]):
            np.testing.assert_array_equal(
                np.asarray(j_out[sl]), np.asarray(s_out),
                err_msg=f"chain {c} field {name}")


def test_nuts_batched_gaussian_moments():
    """Distributional correctness of the lock-step NUTS tree logic: 4
    chains x 400 transitions on an anisotropic Gaussian recover its
    moments. Pure-XLA (no Pallas) so it is cheap on CPU."""
    from ggp_tpu.ops.fused_multichain import _nuts_transition_batched

    f32 = jnp.float32
    C, dim, max_depth = 4, 3, 6
    leaf_rows = 1
    lane = jnp.arange(128)
    dmask = (lane < dim).astype(f32)
    sig2 = jnp.asarray([1.0, 4.0, 0.25], f32)
    prec = jnp.zeros(128, f32).at[:dim].set(1.0 / sig2)

    def pot(z):
        U = 0.5 * jnp.sum(prec * z * z, axis=1, keepdims=True)
        return U, prec * z

    T = 400
    key = jax.random.PRNGKey(3)
    k_m, k_t, k_l, k_z = jax.random.split(key, 4)
    moms = jax.random.normal(k_m, (T, C, 128), f32) * dmask
    TRs = jax.random.uniform(k_t, (T, C, 128), f32)
    LUs = jax.random.uniform(k_l, (T, C * leaf_rows, 128), f32)
    z0 = jax.random.normal(k_z, (C, 128), f32) * dmask
    eps = jnp.full((C, 1), 0.25, f32)
    inv_mass = jnp.ones((C, 128), f32)
    U0, g0 = pot(z0)

    def step(carry, xs):
        z, U, g = carry
        mom, TR, LU = xs
        zp, Up, gp, *_ = _nuts_transition_batched(
            z, U, g, eps, inv_mass, pot, mom, TR, LU,
            C=C, max_depth=max_depth, leaf_rows=leaf_rows)
        return (zp, Up, gp), zp

    _, zs = jax.jit(lambda c, xs: jax.lax.scan(step, c, xs))(
        (z0, U0, g0), (moms, TRs, LUs))
    draws = np.asarray(zs)[100:, :, :dim].reshape(-1, dim)   # burn 100
    se = np.sqrt(np.asarray(sig2)) / np.sqrt(len(draws) / 10.0)
    assert np.all(np.abs(draws.mean(0)) < 4 * se), draws.mean(0)
    np.testing.assert_allclose(draws.var(0), np.asarray(sig2),
                               rtol=0.25)


def test_multichain_nuts_sampler_end_to_end(problem):
    """Lock-step multichain NUTS inside the Pallas chunk kernels
    (interpret): sample chunks move with healthy accepts and real tree
    depths, and the integrated build_sampler path plumbs depth/leaf
    stats through."""
    from ggp_tpu.inference.hmc import NUTSConfig, build_sampler

    X, y, Z, d = problem
    C = 2
    builder = make_fused_hmc_multichain(X, y, 1e-6, num_chains=C, chunk=4,
                                        algo="nuts", max_depth=5,
                                        interpret=True)
    fused = builder(Z)
    assert fused.algo == "nuts" and fused.max_depth == 5

    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.normal(size=(C, d + 2)) * 0.3, jnp.float32)
    U, g = fused.potential(z)
    inv_mass = jnp.ones((C, d + 2), jnp.float32)
    eps = jnp.full((C,), 0.1, jnp.float32)
    key = jax.random.PRNGKey(2)
    accs, deps = [], []
    for _ in range(2):
        key, k = jax.random.split(key)
        zs, z, U, g, acc, div, dep, nlv = fused.sample_chunk(
            z, U, g, k, eps, inv_mass, 4)
        accs.append(np.asarray(acc))
        deps.append(np.asarray(dep))
        assert not np.any(np.asarray(div) > 0.5)
        assert np.all(np.isfinite(np.asarray(zs)))
        nlv = np.asarray(nlv)
        assert np.all(nlv >= 1) and np.all(nlv < 2 ** 5 + 1)
    assert np.mean(np.concatenate(accs)) > 0.4
    assert np.concatenate(deps).max() >= 1        # real doubling happened

    cfg = NUTSConfig(num_warmup=12, num_samples=8, algorithm="nuts",
                     max_depth=5)
    init = {"v": jnp.zeros(d + 2, jnp.float32)}
    sampler = build_sampler(lambda p, Z_: 0.0, init, cfg, num_chains=C,
                            fused_builder=lambda Z_: builder(Z_))
    samples, stats = sampler(init, jax.random.PRNGKey(0), Z)
    zs = np.asarray(samples["v"])
    assert zs.shape == (C, 8, d + 2)
    assert np.all(np.isfinite(zs))
    assert not np.allclose(zs[0], zs[1])
    dep = np.asarray(stats["depth"])
    assert dep.shape == (C, 8) and dep.max() >= 1
    assert np.all(np.asarray(stats["n_leapfrog"]) >= 1)


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


def test_streaming_multichain_nuts_chunks(problem, monkeypatch):
    """Streaming + lock-step NUTS combination (round 3): the HBM
    block-streaming batched potential drives the in-kernel multichain
    doubling loop. With the resident cap forced low (n=48 -> 2 DMA blocks
    of 32), the batched potential must match the XLA potential per chain
    and NUTS sample chunks must move with real tree depths."""
    import ggp_tpu.ops.fused_multichain as fm

    X, y, Z, d = problem
    C = 2
    monkeypatch.setattr(fm, "MAX_N_MULTICHAIN", 16)
    builder = fm.make_fused_hmc_multichain(X, y, 1e-6, num_chains=C,
                                           chunk=4, algo="nuts",
                                           max_depth=5, stream_block=32,
                                           interpret=True)
    fused = builder(Z)
    assert fused.algo == "nuts"
    rng = np.random.default_rng(13)
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
    key = jax.random.PRNGKey(3)
    accs, deps = [], []
    for _ in range(2):
        key, k = jax.random.split(key)
        zs, z, U, g, acc, div, dep, nlv = fused.sample_chunk(
            z, U, g, k, eps, inv_mass, 4)
        accs.append(np.asarray(acc))
        deps.append(np.asarray(dep))
        assert not np.any(np.asarray(div) > 0.5)
        assert np.all(np.isfinite(np.asarray(zs)))
        assert np.all(np.asarray(nlv) >= 1)
    assert np.mean(np.concatenate(accs)) > 0.3
    assert np.concatenate(deps).max() >= 1
    assert not np.allclose(np.asarray(z), np.asarray(thetas))


@pytest.mark.parametrize("algo", ["hmc", "nuts"])
def test_multichain_chunked_driver_matches_one_program(problem, algo):
    """build_sampler_chunked's host-dispatched multichain group driver
    (round 4: bounded per-execution wall for the link kill-window) is
    bit-identical to the one-program build_sampler path — including when
    the group size does NOT divide the schedule (padded no-op chunks must
    not advance the PRNG stream or the carried state)."""
    from ggp_tpu.inference.hmc import (NUTSConfig, build_sampler,
                                       build_sampler_chunked)

    X, y, Z, d = problem
    C = 2
    kw = dict(num_chains=C, chunk=4, interpret=True)
    if algo == "nuts":
        kw.update(algo="nuts", max_depth=5)
        cfg = NUTSConfig(num_warmup=10, num_samples=9, algorithm="nuts",
                         max_depth=5)
    else:
        kw.update(num_leapfrog=5)
        cfg = NUTSConfig(num_warmup=10, num_samples=9, algorithm="hmc",
                         num_leapfrog=5)
    builder = make_fused_hmc_multichain(X, y, 1e-6, **kw)
    init = {"v": jnp.zeros(d + 2, jnp.float32)}
    key = jax.random.PRNGKey(3)

    ref = build_sampler(lambda p, Z_: 0.0, init, cfg, num_chains=C,
                        fused_builder=lambda Z_: builder(Z_))
    s_ref, st_ref = ref(init, key, Z)

    # chunk_size=7 -> group size 1 kernel-chunk (K=4); 10 warmup
    # transitions = 3 kernel-chunks, 9 draws = 3 kernel-chunks (last
    # partially active) — nothing divides evenly
    chunked = build_sampler_chunked(lambda p, Z_: 0.0, init, cfg,
                                    num_chains=C, chunk_size=7,
                                    fused_builder=lambda Z_: builder(Z_))
    s_chk, st_chk = chunked(init, key, Z)

    np.testing.assert_array_equal(np.asarray(s_ref["v"]),
                                  np.asarray(s_chk["v"]))
    for k in ("accept_prob", "diverging", "step_size", "inv_mass"):
        np.testing.assert_array_equal(np.asarray(st_ref[k]),
                                      np.asarray(st_chk[k]), err_msg=k)
    assert np.all(np.isfinite(np.asarray(s_chk["v"])))
