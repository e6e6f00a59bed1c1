"""Whole-transition Pallas NUTS: interpret-mode correctness on CPU.

Statistical (posterior-moment) parity against the XLA NUTS sampler runs on
TPU (scripts/bench); here we verify the in-kernel potential matches the
tested fused-bound math exactly, and that a full transition produces sane
moves (finite state, consistent stats, detailed-balance-compatible energies).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggp_tpu.ops.fused_bound import make_rbf_vfe_potential
from ggp_tpu.ops.fused_nuts import fused_nuts_supported, make_fused_nuts

# interpret-mode Pallas is minutes-per-test on CPU (VERDICT r2 item 10)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    n, m, d = 48, 8, 2
    X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    w = rng.normal(size=(d,))
    y = jnp.asarray(np.sin(np.asarray(X) @ w) + 0.3 * rng.normal(size=n),
                    jnp.float32)
    Z = X[:m]
    return X, y, Z, d


def test_supported_envelope():
    from ggp_tpu.ops.fused_nuts import MAX_N_RESIDENT, MAX_N_STREAM
    assert fused_nuts_supported(404, 13, 100)
    # streaming (VERDICT r2 item 2) lifts the vfe envelope past resident N
    assert fused_nuts_supported(10_000, 13, 100)
    assert fused_nuts_supported(MAX_N_STREAM, 13, 100)
    assert not fused_nuts_supported(MAX_N_STREAM + 1, 13, 100)
    # targets without streaming cap at the resident envelope
    assert not fused_nuts_supported(10_000, 13, 100, max_n=MAX_N_RESIDENT)
    assert not fused_nuts_supported(404, 130, 100)
    # round 3: M envelope 256 -> 512 covers the reference's sensitivity
    # sweep (M in {100..500}, experiments/sensitivity_analysis.py)
    assert fused_nuts_supported(404, 13, 500)
    assert not fused_nuts_supported(404, 13, 513)


def test_inkernel_potential_matches_xla(problem):
    X, y, Z, d = problem
    builder = make_fused_nuts(X, y, 1e-6, interpret=True)
    _, pot_kernel = builder(Z)
    pot_xla = make_rbf_vfe_potential(X, y, 1e-6)
    zvec = jnp.asarray(np.r_[np.zeros(d), 0.3, -1.0], jnp.float32)
    U_k, g_k = jax.jit(pot_kernel)(zvec)
    U_x, g_x = jax.jit(lambda v: pot_xla(v, Z))(zvec)
    np.testing.assert_allclose(float(U_k), float(U_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-4, atol=1e-4)


def test_inkernel_potential_matches_xla_large_m(problem):
    """M > 256 (round 3 envelope extension): multi-panel factorisations at
    Mp=384 must still match the XLA potential (M=260 -> 3 lane panels,
    an odd pad tail, and 12 Cholesky panels at block=32)."""
    rng = np.random.default_rng(11)
    n, m, d = 64, 260, 3
    X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(X).sum(1)) + 0.1 * rng.normal(size=n),
                    jnp.float32)
    Z = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    builder = make_fused_nuts(X, y, 1e-6, interpret=True)
    _, pot_kernel = builder(Z)
    pot_xla = make_rbf_vfe_potential(X, y, 1e-6)
    zvec = jnp.asarray(np.r_[np.zeros(d), 0.3, -1.0], jnp.float32)
    U_k, g_k = jax.jit(pot_kernel)(zvec)
    U_x, g_x = jax.jit(lambda v: pot_xla(v, Z))(zvec)
    np.testing.assert_allclose(float(U_k), float(U_x), rtol=1e-4)
    # 260 random inducing rows in 3-D give a near-singular Kmm, so BOTH
    # f32 paths are roundoff-limited (the XLA gradient is itself ~1e-2 off
    # the f64 truth here); judge each against the f64 ground truth with a
    # shared roundoff budget instead of against each other
    pot64 = make_rbf_vfe_potential(X.astype(jnp.float64),
                                   y.astype(jnp.float64), 1e-6)
    _, g64 = jax.jit(lambda v: pot64(v, Z.astype(jnp.float64)))(
        zvec.astype(jnp.float64))
    err_x = float(np.max(np.abs(np.asarray(g_x) - np.asarray(g64))))
    err_k = float(np.max(np.abs(np.asarray(g_k) - np.asarray(g64))))
    assert err_k <= 5.0 * max(err_x, 1e-3), (err_k, err_x)


def test_transition_moves_and_stats(problem):
    X, y, Z, d = problem
    builder = make_fused_nuts(X, y, 1e-6, max_depth=4, interpret=True)
    trans, pot = builder(Z)
    zvec = jnp.asarray(np.r_[np.zeros(d), 0.3, -1.0], jnp.float32)
    U0, g0 = pot(zvec)
    assert np.isfinite(float(U0))
    inv_mass = jnp.ones(d + 2, jnp.float32)
    eps = jnp.asarray(0.05, jnp.float32)
    key = jax.random.PRNGKey(3)
    z1, U1, g1, stats = trans(None, zvec, U0, g0, key, eps, inv_mass)
    assert z1.shape == zvec.shape and g1.shape == zvec.shape
    assert np.all(np.isfinite(np.asarray(z1)))
    assert np.isfinite(float(U1))
    assert 0.0 <= float(stats["accept_prob"]) <= 1.0
    assert int(stats["n_leapfrog"]) >= 1
    assert int(stats["depth"]) >= 1
    assert not bool(stats["diverging"])
    # the proposal's potential must equal an independent evaluation at z1
    U1_check, _ = pot(z1)
    np.testing.assert_allclose(float(U1), float(U1_check), rtol=1e-5)
    # different key -> different move
    z2, *_ = trans(None, zvec, U0, g0, jax.random.PRNGKey(11), eps, inv_mass)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_transition_diverges_at_huge_step(problem):
    X, y, Z, d = problem
    builder = make_fused_nuts(X, y, 1e-6, max_depth=4, interpret=True)
    trans, pot = builder(Z)
    zvec = jnp.asarray(np.r_[np.zeros(d), 0.3, -1.0], jnp.float32)
    U0, g0 = pot(zvec)
    inv_mass = jnp.ones(d + 2, jnp.float32)
    z1, U1, g1, stats = trans(None, zvec, U0, g0, jax.random.PRNGKey(0),
                              jnp.asarray(1e4, jnp.float32), inv_mass)
    assert bool(stats["diverging"]) or float(stats["accept_prob"]) < 0.1
    # diverged transition keeps (or proposes near) a finite state
    assert np.all(np.isfinite(np.asarray(z1)))


def test_short_chain_statistics(problem):
    """A short fused-kernel chain at fixed step size should explore: distinct
    accepted states, mostly finite potentials, reasonable accept rate."""
    X, y, Z, d = problem
    builder = make_fused_nuts(X, y, 1e-6, max_depth=4, interpret=True)
    trans, pot = builder(Z)
    z = jnp.asarray(np.r_[np.zeros(d), 0.3, -1.0], jnp.float32)
    U, g = pot(z)
    inv_mass = jnp.ones(d + 2, jnp.float32)
    eps = jnp.asarray(0.1, jnp.float32)
    key = jax.random.PRNGKey(42)
    zs, accs = [], []
    for t in range(12):
        key, k = jax.random.split(key)
        z, U, g, stats = trans(None, z, U, g, k, eps, inv_mass)
        zs.append(np.asarray(z))
        accs.append(float(stats["accept_prob"]))
    zs = np.stack(zs)
    assert np.all(np.isfinite(zs))
    assert len({tuple(np.round(r, 6)) for r in zs}) > 6   # actually moves
    assert np.mean(accs) > 0.4


def test_chunked_fused_sampler_end_to_end(problem):
    """The chunked fast path (K transitions/kernel with in-kernel Stan
    adaptation) through build_sampler: shapes, trimming, health.

    Movement is asserted on fixed-eps sample chunks (a tune=10 warmup is
    degenerate in BOTH the XLA and fused paths: the dual-averaging restart
    at the last window end gets one settling step); the integrated run
    checks shapes/trim/stat plumbing.
    """
    from ggp_tpu.inference.hmc import NUTSConfig, build_sampler

    X, y, Z, d = problem
    builder = make_fused_nuts(X, y, 1e-6, max_depth=4, chunk=4,
                              interpret=True)
    fused = builder(Z)
    assert fused.chunk == 4

    # movement + chaining across chunks at a known-good step size
    z = jnp.asarray(np.r_[np.zeros(d), 0.3, -1.0], jnp.float32)
    U, g = fused.potential(z)
    inv_mass = jnp.ones(d + 2, jnp.float32)
    rows, accs = [], []
    key = jax.random.PRNGKey(2)
    for _ in range(3):
        key, k = jax.random.split(key)
        zs, z, U, g, stats = fused.sample_chunk(
            z, U, g, k, jnp.asarray(0.1, jnp.float32), inv_mass, 4)
        rows.append(np.asarray(zs))
        accs.append(np.asarray(stats["accept_prob"]))
    rows = np.concatenate(rows)
    assert np.all(np.isfinite(rows))
    assert len({tuple(r) for r in np.round(rows, 5)}) > 8
    assert np.mean(np.concatenate(accs)) > 0.4
    # the carried state equals the last draw
    np.testing.assert_allclose(np.asarray(z), rows[-1, :d + 2])

    # integrated path: shapes, trimming, stat plumbing
    init = {"v": jnp.zeros(d + 2, jnp.float32)}
    cfg = NUTSConfig(num_warmup=10, num_samples=10, max_depth=4)
    sampler = build_sampler(lambda p, Z_: 0.0, init, cfg,
                            fused_builder=lambda Z_: builder(Z_))
    samples, stats = sampler(init, jax.random.PRNGKey(0), Z)
    zs = np.asarray(samples["v"])
    assert zs.shape == (1, 10, d + 2)          # trimmed from 3 chunks of 4
    assert np.all(np.isfinite(zs))
    acc = np.asarray(stats["accept_prob"])
    assert acc.shape == (1, 10)
    assert np.all((acc >= 0) & (acc <= 1))
    assert float(np.asarray(stats["step_size"])) > 0


def test_streaming_potential_matches_resident(problem, monkeypatch):
    """N-streaming path (VERDICT r2 item 2): with the resident threshold
    forced low, the HBM double-buffered block-streaming potential must equal
    the XLA potential, and transitions must move. Uses a small stream block
    so CI stays cheap while exercising multi-block accumulation + masking
    (n=48 pads to 2 blocks of 32)."""
    import ggp_tpu.ops.fused_nuts as fn

    X, y, Z, d = problem
    monkeypatch.setattr(fn, "MAX_N_RESIDENT", 16)
    builder = fn.make_fused_nuts(X, y, 1e-6, max_depth=4, interpret=True,
                                 stream_block=32)
    fused = builder(Z)
    pot_xla = make_rbf_vfe_potential(X, y, 1e-6)
    zvec = jnp.asarray(np.r_[np.zeros(d), 0.3, -1.0], jnp.float32)
    U_k, g_k = jax.jit(fused.potential)(zvec)
    U_x, g_x = jax.jit(lambda v: pot_xla(v, Z))(zvec)
    np.testing.assert_allclose(float(U_k), float(U_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-4, atol=1e-4)

    U0, g0 = fused.potential(zvec)
    inv_mass = jnp.ones(d + 2, jnp.float32)
    z1, U1, g1, stats = fused.transition(
        None, zvec, U0, g0, jax.random.PRNGKey(3),
        jnp.asarray(0.05, jnp.float32), inv_mass)
    assert np.all(np.isfinite(np.asarray(z1)))
    assert int(stats["n_leapfrog"]) >= 1
    U1_check, _ = fused.potential(z1)
    np.testing.assert_allclose(float(U1), float(U1_check), rtol=1e-5)


def test_gpr_fused_potential_and_transition(problem):
    """target="gpr" (VERDICT r2 item 4): the in-kernel dense-marginal
    potential matches the XLA-level make_gpr_potential, and a NUTS
    transition on it moves with sane stats."""
    from ggp_tpu.ops.fused_bound import make_gpr_potential

    X, y, Z, d = problem
    builder = make_fused_nuts(X, y, 1e-6, max_depth=4, target="gpr",
                              interpret=True)
    fused = builder(jnp.zeros((1, d), jnp.float32))
    pot_xla = make_gpr_potential(X, y, 1e-6)
    zvec = jnp.asarray(np.r_[np.zeros(d), 0.3, -1.0], jnp.float32)
    U_k, g_k = jax.jit(fused.potential)(zvec)
    U_x, g_x = jax.jit(pot_xla)(zvec)
    np.testing.assert_allclose(float(U_k), float(U_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-4, atol=1e-4)

    U0, g0 = fused.potential(zvec)
    inv_mass = jnp.ones(d + 2, jnp.float32)
    z1, U1, g1, stats = fused.transition(
        None, zvec, U0, g0, jax.random.PRNGKey(3),
        jnp.asarray(0.05, jnp.float32), inv_mass)
    assert np.all(np.isfinite(np.asarray(z1)))
    assert 0.0 <= float(stats["accept_prob"]) <= 1.0
    assert int(stats["n_leapfrog"]) >= 1
    U1_check, _ = fused.potential(z1)
    np.testing.assert_allclose(float(U1), float(U1_check), rtol=1e-5)


def test_sgpmc_fused_potential_matches_autodiff(problem):
    """target="sgpmc": in-kernel whitened-JointHMC potential == jax.grad of
    SGPMC._logpost (Gaussian, Zero mean, Gamma(2,1) priors) in value+grad."""
    from ggp_tpu.models.sgpmc import SGPMC

    X, y, Z, d = problem
    m = Z.shape[0]
    mod = SGPMC(X, y, Z_init=Z, jitter=1e-6)
    rng = np.random.default_rng(3)
    state = {"v": jnp.asarray(rng.normal(size=(m,)) * 0.5, jnp.float32),
             "kernel": {"base": {"log_lengthscale":
                                 jnp.asarray(rng.normal(size=(d,)) * 0.3,
                                             jnp.float32)},
                        "log_outputscale": jnp.asarray(0.2, jnp.float32)},
             "lik": {"log_noise": jnp.asarray(-1.0, jnp.float32)},
             "mean": {}}
    flat, unravel = jax.flatten_util.ravel_pytree(state)

    def ref(v):
        return -mod._logpost(unravel(v), (X, y, Z))

    U_ref, g_ref = jax.value_and_grad(ref)(flat)
    builder = make_fused_nuts(X, y, 1e-6, target="sgpmc", interpret=True)
    fused = builder(Z)
    U_f, g_f = jax.jit(fused.potential)(flat)
    np.testing.assert_allclose(float(U_f), float(U_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_sgpmc_fused_hmc_transitions(problem):
    """target="sgpmc" + algorithm="hmc" (the reference JointHMC protocol):
    chains move, accept sane, sample_chunk works."""
    X, y, Z, d = problem
    m = Z.shape[0]
    builder = make_fused_nuts(X, y, 1e-6, target="sgpmc", algorithm="hmc",
                              num_leapfrog=5, max_depth=4, chunk=4,
                              interpret=True)
    fused = builder(Z)
    dim = d + 2 + m
    z = jnp.zeros(dim, jnp.float32).at[d + 1].set(-1.0)
    U, g = fused.potential(z)
    assert np.isfinite(float(U))
    inv_mass = jnp.ones(dim, jnp.float32)
    zs, z1, U1, g1, stats = fused.sample_chunk(
        z, U, g, jax.random.PRNGKey(0), jnp.asarray(0.05, jnp.float32),
        inv_mass, 4)
    assert np.all(np.isfinite(np.asarray(zs)))
    acc = np.asarray(stats["accept_prob"])
    assert np.all((acc >= 0) & (acc <= 1))
    assert np.all(np.asarray(stats["n_leapfrog"]) == 5)
    assert len({tuple(r) for r in np.round(np.asarray(zs), 5)}) >= 2
    # carried state consistency
    U1_check, _ = fused.potential(z1)
    np.testing.assert_allclose(float(U1), float(U1_check), rtol=1e-4)


def test_streaming_sgpmc_potential_matches_autodiff(problem, monkeypatch):
    """sgpmc N-streaming (round 4): with the resident threshold forced low,
    the single-pass HBM block-streaming whitened-JointHMC potential must
    equal jax.grad of SGPMC._logpost in value+grad, and a transition must
    move (n=48 pads to 2 blocks of 32, exercising multi-block accumulation
    of all nine data-coupled accumulators + row masking)."""
    import ggp_tpu.ops.fused_nuts as fn
    from ggp_tpu.models.sgpmc import SGPMC

    X, y, Z, d = problem
    m = Z.shape[0]
    monkeypatch.setattr(fn, "MAX_N_RESIDENT", 16)
    mod = SGPMC(X, y, Z_init=Z, jitter=1e-6)
    rng = np.random.default_rng(3)
    state = {"v": jnp.asarray(rng.normal(size=(m,)) * 0.5, jnp.float32),
             "kernel": {"base": {"log_lengthscale":
                                 jnp.asarray(rng.normal(size=(d,)) * 0.3,
                                             jnp.float32)},
                        "log_outputscale": jnp.asarray(0.2, jnp.float32)},
             "lik": {"log_noise": jnp.asarray(-1.0, jnp.float32)},
             "mean": {}}
    flat, unravel = jax.flatten_util.ravel_pytree(state)

    def ref(v):
        return -mod._logpost(unravel(v), (X, y, Z))

    U_ref, g_ref = jax.value_and_grad(ref)(flat)
    builder = fn.make_fused_nuts(X, y, 1e-6, target="sgpmc", max_depth=4,
                                 interpret=True, stream_block=32)
    fused = builder(Z)
    U_f, g_f = jax.jit(fused.potential)(flat)
    np.testing.assert_allclose(float(U_f), float(U_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)

    inv_mass = jnp.ones(d + 2 + m, jnp.float32)
    z1, U1, g1, stats = fused.transition(
        None, flat, U_f, g_f, jax.random.PRNGKey(3),
        jnp.asarray(0.05, jnp.float32), inv_mass)
    assert np.all(np.isfinite(np.asarray(z1)))
    assert int(stats["n_leapfrog"]) >= 1
    U1_check, _ = fused.potential(z1)
    np.testing.assert_allclose(float(U1), float(U1_check), rtol=1e-5)


def test_statistical_parity_vs_xla(problem):
    """End-to-end posterior parity: the fused chunked sampler and the XLA
    NUTS sampler agree on posterior means (within MC error) and spreads on
    the same target — the CI-level version of the TPU parity runs recorded
    in PERF.md."""
    from ggp_tpu.inference.hmc import NUTSConfig, build_sampler
    from ggp_tpu.kernels import default_rbf
    from ggp_tpu.models.sgpr import sgpr_elbo
    from ggp_tpu.priors import log_prior, prior_tree_rbf

    X, y, Z, d = problem
    kern = default_rbf(ard=True)
    ptree = prior_tree_rbf()
    init = {"kernel": kern.init_params(d),
            "log_noise": jnp.asarray(-1.0, jnp.float32)}

    def logpost(p, Z_):
        return (sgpr_elbo(kern, {**p, "Z": Z_}, X, y, 1e-6)
                + log_prior(ptree, p))

    cfg = NUTSConfig(num_warmup=150, num_samples=150, max_depth=5)
    builder = make_fused_nuts(X, y, 1e-6, max_depth=5, chunk=8,
                              interpret=True)
    sf, stf = build_sampler(logpost, init, cfg,
                            fused_builder=builder)(init,
                                                   jax.random.PRNGKey(0), Z)
    sx, stx = build_sampler(logpost, init, cfg)(init, jax.random.PRNGKey(1),
                                                Z)

    def flat(s):
        return np.concatenate([np.asarray(v).reshape(150, -1)
                               for v in jax.tree_util.tree_leaves(s)], -1)

    f, x = flat(sf), flat(sx)
    md = np.abs(f.mean(0) - x.mean(0)) / (x.std(0) + 1e-6)
    sr = f.std(0) / (x.std(0) + 1e-6)
    assert np.all(md < 1.2), md
    assert np.all((sr > 0.5) & (sr < 2.0)), sr
    for st in (stf, stx):
        assert float(np.mean(np.asarray(st["accept_prob"]))) > 0.6


@pytest.mark.slow
def test_co2_fused_potential_and_transition(rng):
    """target="co2_m32" (VERDICT r4 item 6): the in-kernel CO2 composite
    potential (interpret mode) matches the XLA-level make_co2_vfe_potential,
    and a NUTS transition on it moves with sane stats."""
    from ggp_tpu.ops.fused_bound import make_co2_vfe_potential

    n, m = 64, 8
    X = jnp.asarray(np.sort(rng.uniform(0, 6, n))[:, None], jnp.float32)
    y = jnp.asarray(np.sin(2 * np.pi * np.asarray(X[:, 0]))
                    + 0.05 * np.asarray(X[:, 0]) ** 2
                    + 0.1 * rng.normal(size=n), jnp.float32)
    Z = X[:: n // m][:m]
    builder = make_fused_nuts(X, y, 1e-5, max_depth=4, target="co2_m32",
                              interpret=True)
    fused = builder(Z)
    pot_xla = make_co2_vfe_potential(X, y, 1e-5, noise_comp="m32")
    zvec = jnp.asarray(rng.normal(size=11) * 0.3, jnp.float32)
    U_k, g_k = jax.jit(fused.potential)(zvec)
    U_x, g_x = jax.jit(lambda v: pot_xla(v, Z))(zvec)
    np.testing.assert_allclose(float(U_k), float(U_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-4, atol=1e-4)

    U0, g0 = fused.potential(zvec)
    inv_mass = jnp.ones(11, jnp.float32)
    z1, U1, g1, stats = fused.transition(
        None, zvec, U0, g0, jax.random.PRNGKey(3),
        jnp.asarray(0.02, jnp.float32), inv_mass)
    assert np.all(np.isfinite(np.asarray(z1)))
    assert 0.0 <= float(stats["accept_prob"]) <= 1.0
    U1_check, _ = fused.potential(z1)
    np.testing.assert_allclose(float(U1), float(U1_check), rtol=1e-5)
