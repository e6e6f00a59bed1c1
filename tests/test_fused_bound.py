"""Custom-call-free collapsed bound: blocked linalg + analytic adjoint parity.

Layer-1 tests per SURVEY §4: the blocked Cholesky/triangular-inverse against
lapack, and the fused potential's value+grad against jax.value_and_grad of
-(sgpr_elbo + log_prior) — the exact function it replaces in the NUTS hot
loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ggp_tpu.kernels import default_rbf
from ggp_tpu.models.sgpr import sgpr_elbo
from ggp_tpu.ops.fused_bound import (block_chol_u, block_ut_inv,
                                     fused_potential_is_eligible,
                                     make_rbf_vfe_potential)
from ggp_tpu.priors import (Flat, Gamma, HalfCauchy, HalfCauchyOnStd,
                            HalfNormal, LogNormal, log_prior, prior_tree_rbf)


def _rand_psd(rng, n, dtype):
    A = jnp.asarray(rng.normal(size=(n, n)), dtype)
    return A @ A.T + n * jnp.eye(n, dtype=dtype)


@pytest.mark.parametrize("n", [16, 128, 256])
def test_block_chol_matches_lapack(rng, n):
    K = _rand_psd(rng, n, jnp.float64)
    U = jax.jit(block_chol_u)(K)
    L_ref = jnp.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(U.T), np.asarray(L_ref),
                               rtol=1e-10, atol=1e-10)


def test_block_chol_nan_on_non_psd(rng):
    K = _rand_psd(rng, 32, jnp.float64)
    K = K.at[3, 3].set(-100.0)
    U = jax.jit(block_chol_u)(K)
    assert not bool(jnp.all(jnp.isfinite(U)))


@pytest.mark.parametrize("n", [16, 128])
def test_block_ut_inv(rng, n):
    K = _rand_psd(rng, n, jnp.float64)
    U = block_chol_u(K)
    V = jax.jit(block_ut_inv)(U)
    np.testing.assert_allclose(np.asarray(U @ V), np.eye(n),
                               rtol=0, atol=1e-10)


@pytest.mark.slow
@pytest.mark.parametrize("ndm", [(40, 8, 3), (404, 100, 13), (37, 20, 1)])
def test_fused_potential_matches_autodiff(rng, ndm):
    n, m, d = ndm
    X = jnp.asarray(rng.normal(size=(n, d)))
    y = jnp.asarray(rng.normal(size=(n,)))
    Z = jnp.asarray(rng.normal(size=(m, d)))
    kern = default_rbf(ard=True)
    ptree = prior_tree_rbf()
    jitter = 1e-6
    hypers = {
        "kernel": {"base": {"log_lengthscale":
                            jnp.asarray(rng.normal(size=(d,)) * 0.5)},
                   "log_outputscale": jnp.asarray(0.4)},
        "log_noise": jnp.asarray(-1.2),
    }
    zvec, unravel = jax.flatten_util.ravel_pytree(hypers)
    # fused path assumes ravel order [lengthscales..., outputscale, noise]
    assert np.allclose(
        np.asarray(zvec[:d]),
        np.asarray(hypers["kernel"]["base"]["log_lengthscale"]))
    assert float(zvec[d]) == float(hypers["kernel"]["log_outputscale"])
    assert float(zvec[d + 1]) == float(hypers["log_noise"])

    def ref(v):
        th = unravel(v)
        return -(sgpr_elbo(kern, {**th, "Z": Z}, X, y, jitter)
                 + log_prior(ptree, th))

    U_ref, g_ref = jax.value_and_grad(ref)(zvec)
    pot = make_rbf_vfe_potential(X, y, jitter)
    U_f, g_f = jax.jit(pot)(zvec, Z)
    assert g_f.shape == zvec.shape
    np.testing.assert_allclose(float(U_f), float(U_ref), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=1e-7, atol=1e-9)


@pytest.mark.slow
@pytest.mark.parametrize("nd", [(40, 3), (300, 13), (37, 1)])
def test_gpr_potential_matches_autodiff(rng, nd):
    """Dense GPR core (VERDICT r2 item 4): value+grad parity against
    jax.value_and_grad of -(gp_marginal_loglik + log_prior), the function it
    replaces in the GPR_HMC NUTS loop (reference models/gpr_hmc.py:47-57)."""
    from ggp_tpu.models.gpr_hmc import gp_marginal_loglik
    from ggp_tpu.ops.fused_bound import make_gpr_potential
    n, d = nd
    X = jnp.asarray(rng.normal(size=(n, d)))
    y = jnp.asarray(rng.normal(size=(n,)))
    kern = default_rbf(ard=True)
    ptree = prior_tree_rbf()
    jitter = 1e-6
    hypers = {
        "kernel": {"base": {"log_lengthscale":
                            jnp.asarray(rng.normal(size=(d,)) * 0.5)},
                   "log_outputscale": jnp.asarray(0.4)},
        "log_noise": jnp.asarray(-1.2),
    }
    zvec, unravel = jax.flatten_util.ravel_pytree(hypers)

    def ref(v):
        th = unravel(v)
        return -(gp_marginal_loglik(kern, th, X, y, jitter)
                 + log_prior(ptree, th))

    U_ref, g_ref = jax.value_and_grad(ref)(zvec)
    pot = make_gpr_potential(X, y, jitter)
    U_f, g_f = jax.jit(pot)(zvec)
    assert g_f.shape == zvec.shape
    np.testing.assert_allclose(float(U_f), float(U_ref), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=1e-7, atol=1e-9)


def test_gpr_potential_envelope():
    from ggp_tpu.ops.fused_bound import make_gpr_potential
    X = jnp.zeros((600, 2))
    assert make_gpr_potential(X, jnp.zeros(600), 1e-6) is None


@pytest.mark.slow
def test_fused_potential_f32(rng):
    """f32 parity at realistic (post-warm-start, small-noise) hypers — the
    regime where sgpr_elbo_fast's stats formulation broke (PERF.md)."""
    n, m, d = 200, 32, 4
    X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    y = jnp.sin(X @ w) + 0.05 * jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    Z = X[:m]
    kern = default_rbf(ard=True)
    ptree = prior_tree_rbf()
    jitter = 1e-6
    hypers = {
        "kernel": {"base": {"log_lengthscale": jnp.zeros((d,), jnp.float32)},
                   "log_outputscale": jnp.asarray(0.0, jnp.float32)},
        "log_noise": jnp.asarray(np.log(0.05 ** 2), jnp.float32),
    }
    zvec, unravel = jax.flatten_util.ravel_pytree(hypers)

    def ref(v):
        th = unravel(v)
        return -(sgpr_elbo(kern, {**th, "Z": Z}, X, y, jitter)
                 + log_prior(ptree, th))

    U_ref, g_ref = jax.value_and_grad(ref)(zvec)
    pot = make_rbf_vfe_potential(X, y, jitter)
    U_f, g_f = jax.jit(pot)(zvec, Z)
    assert np.isfinite(float(U_f))
    np.testing.assert_allclose(float(U_f), float(U_ref),
                               rtol=2e-4, atol=2e-3)
    scale = float(jnp.max(jnp.abs(g_ref))) + 1.0
    np.testing.assert_allclose(np.asarray(g_f) / scale,
                               np.asarray(g_ref) / scale, atol=5e-3)


def test_eligibility_gate(monkeypatch):
    monkeypatch.setenv("GGP_FUSED_NUTS", "1")
    from ggp_tpu.kernels.base import RBF, Matern52, Scale
    from ggp_tpu.likelihoods import BernoulliProbit, GaussianLikelihood
    assert fused_potential_is_eligible(
        Scale(RBF(ard=True)), GaussianLikelihood(), prior_tree_rbf())
    monkeypatch.delenv("GGP_FUSED_NUTS")
    assert not fused_potential_is_eligible(
        Scale(RBF(ard=True)), GaussianLikelihood(), prior_tree_rbf())
    monkeypatch.setenv("GGP_FUSED_NUTS", "1")
    assert not fused_potential_is_eligible(
        Scale(Matern52(ard=True)), GaussianLikelihood(), prior_tree_rbf())
    assert not fused_potential_is_eligible(
        Scale(RBF(ard=True)), BernoulliProbit(), prior_tree_rbf())
    assert not fused_potential_is_eligible(
        Scale(RBF(ard=True)), GaussianLikelihood(), {"log_noise": None})
    # envelope: too many dims / too many rows -> factory declines
    X = jnp.zeros((10, 127))
    assert make_rbf_vfe_potential(X, jnp.zeros(10), 1e-6) is None
    X2 = jnp.zeros((100, 2))
    assert make_rbf_vfe_potential(X2, jnp.zeros(100), 1e-6, max_n=50) is None


_CUSTOM_TREES = {
    "gamma_lognormal": lambda: {
        "kernel": {"log_outputscale": LogNormal(0.3, 2.0),
                   "base": {"log_lengthscale": Gamma(3.0, 0.5)}},
        "log_noise": HalfNormal(0.7)},
    "hc_flat": lambda: {
        "kernel": {"log_outputscale": HalfCauchy(2.5),
                   "base": {"log_lengthscale": Flat()}},
        "log_noise": HalfCauchyOnStd(0.4)},
}


@pytest.mark.parametrize("tree_name", sorted(_CUSTOM_TREES))
def test_fused_potential_custom_priors(rng, tree_name):
    """VERDICT r4 item 7: the fused potential under NON-default prior trees
    (every supported leaf family with non-default parameters) must match
    jax.value_and_grad of -(sgpr_elbo + log_prior(tree)) — previously any
    custom prior silently dropped the model to the XLA path."""
    from ggp_tpu.models.sgpr import sgpr_elbo
    from ggp_tpu.ops.fused_bound import prior_spec_of_tree
    ptree = _CUSTOM_TREES[tree_name]()
    spec = prior_spec_of_tree(ptree)
    assert spec is not None
    n, m, d = 40, 8, 3
    X = jnp.asarray(rng.normal(size=(n, d)))
    y = jnp.asarray(rng.normal(size=(n,)))
    Z = jnp.asarray(rng.normal(size=(m, d)))
    kern = default_rbf(ard=True)
    jitter = 1e-6
    hypers = {
        "kernel": {"base": {"log_lengthscale":
                            jnp.asarray(rng.normal(size=(d,)) * 0.5)},
                   "log_outputscale": jnp.asarray(0.4)},
        "log_noise": jnp.asarray(-1.2),
    }
    zvec, unravel = jax.flatten_util.ravel_pytree(hypers)

    def ref(v):
        th = unravel(v)
        return -(sgpr_elbo(kern, {**th, "Z": Z}, X, y, jitter)
                 + log_prior(ptree, th))

    U_ref, g_ref = jax.value_and_grad(ref)(zvec)
    pot = make_rbf_vfe_potential(X, y, jitter, prior_spec=spec)
    U_f, g_f = jax.jit(pot)(zvec, Z)
    np.testing.assert_allclose(float(U_f), float(U_ref), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=1e-7, atol=1e-9)


def test_structure_gate_accepts_custom_priors():
    """fused_structure_matches no longer requires prior_tree == default
    (VERDICT r4 item 7): parameterised families pass, unsupported
    structures still fail."""
    from ggp_tpu.kernels.base import RBF, Scale
    from ggp_tpu.likelihoods import GaussianLikelihood
    from ggp_tpu.ops.fused_bound import (fused_structure_matches,
                                         prior_spec_of_tree)
    from ggp_tpu.priors import Gamma, LogNormal
    kern, lik = Scale(RBF(ard=True)), GaussianLikelihood()
    custom = prior_tree_rbf()
    custom = {**custom,
              "kernel": {**custom["kernel"],
                         "base": {"log_lengthscale": Gamma(5.0, 2.0)}}}
    assert fused_structure_matches(kern, lik, custom)
    lognorm_all = {
        "kernel": {"log_outputscale": LogNormal(0.0, 3.0),
                   "base": {"log_lengthscale": LogNormal(1.0, 1.0)}},
        "log_noise": LogNormal(-2.0, 1.5)}
    assert fused_structure_matches(kern, lik, lognorm_all)
    # wrong structure / unsupported leaf object -> refuse
    assert prior_spec_of_tree({"log_noise": Gamma()}) is None
    assert prior_spec_of_tree({
        "kernel": {"log_outputscale": Gamma(),
                   "base": {"log_lengthscale": object()}},
        "log_noise": Gamma()}) is None
    assert not fused_structure_matches(kern, lik, {"log_noise": None})
    # default tree spec reproduces the pre-round-5 hard-coded constants
    from ggp_tpu.ops.fused_bound import _SPEC_RBF_DEFAULT
    assert prior_spec_of_tree(prior_tree_rbf()) == _SPEC_RBF_DEFAULT


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["w", "v2", "v1"])
@pytest.mark.parametrize("floor", [None, 1e-3])
def test_chol_u_inv_inplace_modes(rng, monkeypatch, mode, floor):
    """The three mini-factorisation layouts (single-pass W, scalar-free v2,
    scalar v1) must produce the same U = chol(K)^T and V = U^-1 through the
    full blocked kernel (interpret mode). The coarse floor (1e-3, pivots
    well clear of the threshold) keeps the floored/unfloored classification
    deterministic across the two f32 summation orders — knife-edge floors
    legitimately diverge (PERF.md round 4)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ggp_tpu.ops.fused_bound import chol_u_inv_inplace

    monkeypatch.setenv("GGP_MINI", mode)
    monkeypatch.delenv("GGP_MINI_V1", raising=False)
    Mp = 64
    A = rng.normal(size=(Mp, Mp))
    K = jnp.asarray(A @ A.T + Mp * np.eye(Mp), jnp.float32)

    def body(k_ref, u_ref, v_ref, Ks_s, Ds_s):
        Ks_s[:] = k_ref[:]
        chol_u_inv_inplace(Ks_s, u_ref, v_ref, Ds_s, block=16,
                           pivot_floor=floor)

    U, V = pl.pallas_call(
        body,
        out_shape=(jax.ShapeDtypeStruct((Mp, Mp), jnp.float32),) * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        scratch_shapes=[pltpu.VMEM((Mp, Mp), jnp.float32),
                        pltpu.VMEM((Mp, 128), jnp.float32)],
        interpret=True)(K)
    Lref = np.linalg.cholesky(np.asarray(K, np.float64))
    assert np.abs(np.asarray(U, np.float64).T - Lref).max() \
        / np.abs(Lref).max() < 1e-4
    assert np.abs(np.asarray(U, np.float64) @ np.asarray(V, np.float64)
                  - np.eye(Mp)).max() < 1e-3


@pytest.mark.slow
def test_chol_u_inv_inplace_w_floored_parity(rng, monkeypatch):
    """W-form floored semantics == v2 floored semantics through the blocked
    kernel on a rank-deficient K (floor binds on most pivots)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ggp_tpu.ops.fused_bound import chol_u_inv_inplace

    Mp = 32
    v = rng.normal(size=(Mp, 6))
    K = jnp.asarray(v @ v.T, jnp.float32)
    floor = 1e-2   # coarse: classification deterministic across orders

    def run(mode):
        monkeypatch.setenv("GGP_MINI", mode)

        def body(k_ref, u_ref, v_ref, Ks_s, Ds_s):
            Ks_s[:] = k_ref[:]
            chol_u_inv_inplace(Ks_s, u_ref, v_ref, Ds_s, block=16,
                               pivot_floor=floor)

        return pl.pallas_call(
            body,
            out_shape=(jax.ShapeDtypeStruct((Mp, Mp), jnp.float32),) * 2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
            scratch_shapes=[pltpu.VMEM((Mp, Mp), jnp.float32),
                            pltpu.VMEM((Mp, 128), jnp.float32)],
            interpret=True)(K)

    Uw, Vw = run("w")
    U2, V2 = run("v2")
    # same pivots floored (diag(U) == sqrt(floor) at bound positions)
    fw = np.isclose(np.diag(np.asarray(Uw)), np.sqrt(floor), rtol=1e-3)
    f2 = np.isclose(np.diag(np.asarray(U2)), np.sqrt(floor), rtol=1e-3)
    assert (fw == f2).all()
    sU = float(jnp.abs(U2).max())
    sV = float(jnp.abs(V2).max())
    assert float(jnp.abs(Uw - U2).max()) / sU < 1e-4
    # V compounds 1/sqrt(floor)-scaled rows across ~26 floored pivots: the
    # two f32 summation orders legitimately differ at ~1e-3 relative (both
    # modes' V are equally far from inv(U) here — when the floor binds the
    # blocked kernel's outputs are regularised approximations BY DESIGN,
    # see _pivot_row / CLAUDE.md round-3 facts)
    assert float(jnp.abs(Vw - V2).max()) / sV < 5e-3


@pytest.mark.parametrize("noise_comp", ["matern32", "rbf"])
def test_co2_potential_matches_autodiff(rng, noise_comp):
    """CO2 composite fused core (VERDICT r4 item 6): value+grad parity
    against jax.value_and_grad of -(sgpr_elbo(co2_kernel) +
    log_prior(LogNormal(0,3)^11)) — the exact NUTS target of
    experiments/co2_bayesian_sgpr_hmc.py."""
    from ggp_tpu.kernels import co2_kernel
    from ggp_tpu.models.sgpr import sgpr_elbo
    from ggp_tpu.ops.fused_bound import co2_fused_spec, make_co2_vfe_potential
    from ggp_tpu.priors import LogNormal

    kern = co2_kernel(noise_comp)
    n, m = 80, 12
    X = jnp.asarray(np.sort(rng.uniform(0, 8, n))[:, None])
    y = jnp.asarray(np.sin(2 * np.pi * np.asarray(X[:, 0]))
                    + 0.05 * np.asarray(X[:, 0]) ** 2
                    + 0.1 * rng.normal(size=n))
    Z = X[:: n // m][:m]
    jitter = 1e-6
    kp = kern.init_params(1)
    kp = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal() * 0.3), kp)
    hypers = {"kernel": kp, "log_noise": jnp.asarray(-1.1)}
    ptree = {"kernel": jax.tree_util.tree_map(
        lambda _: LogNormal(0.0, 3.0), kp),
        "log_noise": LogNormal(0.0, 3.0)}
    from ggp_tpu.likelihoods import GaussianLikelihood
    spec = co2_fused_spec(kern, GaussianLikelihood(), ptree)
    assert spec is not None
    nc, pspec = spec
    assert nc == ("m32" if noise_comp == "matern32" else "rbf")
    assert all(leaf == ("lognormal", 0.0, 3.0) for leaf in pspec)

    zvec, unravel = jax.flatten_util.ravel_pytree(hypers)
    assert zvec.shape == (11,)
    from ggp_tpu.priors import log_prior

    def ref(v):
        th = unravel(v)
        return -(sgpr_elbo(kern, {**th, "Z": Z}, X, y, jitter)
                 + log_prior(ptree, th))

    U_ref, g_ref = jax.value_and_grad(ref)(zvec)
    pot = make_co2_vfe_potential(X, y, jitter, noise_comp=nc,
                                 prior_spec=pspec)
    U_f, g_f = jax.jit(pot)(zvec, Z)
    np.testing.assert_allclose(float(U_f), float(U_ref), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-8)


def test_co2_fused_spec_gate():
    """The CO2 gate refuses structures it cannot fuse."""
    from ggp_tpu.kernels import co2_kernel, default_rbf
    from ggp_tpu.likelihoods import BernoulliProbit, GaussianLikelihood
    from ggp_tpu.ops.fused_bound import co2_fused_spec
    from ggp_tpu.priors import Gamma, LogNormal

    kern = co2_kernel("matern32")
    kp = kern.init_params(1)
    ptree = {"kernel": jax.tree_util.tree_map(
        lambda _: LogNormal(0.0, 3.0), kp), "log_noise": Gamma(2.0, 1.0)}
    assert co2_fused_spec(kern, GaussianLikelihood(), ptree) is not None
    assert co2_fused_spec(kern, BernoulliProbit(), ptree) is None
    assert co2_fused_spec(default_rbf(), GaussianLikelihood(), ptree) is None
    assert co2_fused_spec(kern, GaussianLikelihood(),
                          {"log_noise": None}) is None
