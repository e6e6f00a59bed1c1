"""Kernel Gram matrices vs naive closed forms (SURVEY §4 implication 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ggp_tpu.kernels import (
    RBF, Matern12, Matern32, Matern52, Periodic, RationalQuadratic,
    Scale, Sum, Product, Linear, co2_kernel, sq_dist,
)


def naive_sqdist(x1, x2):
    return ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)


@pytest.fixture
def xy(rng):
    x1 = rng.normal(size=(17, 3))
    x2 = rng.normal(size=(11, 3))
    return jnp.asarray(x1), jnp.asarray(x2)


def test_sq_dist_matches_naive(xy):
    x1, x2 = xy
    np.testing.assert_allclose(sq_dist(x1, x2), naive_sqdist(np.asarray(x1), np.asarray(x2)), rtol=1e-10)


def test_rbf_closed_form(xy, rng):
    x1, x2 = xy
    k = RBF(ard=True)
    ls = rng.uniform(0.5, 2.0, size=3)
    p = {"log_lengthscale": jnp.log(jnp.asarray(ls))}
    expected = np.exp(-0.5 * naive_sqdist(np.asarray(x1) / ls, np.asarray(x2) / ls))
    np.testing.assert_allclose(k.gram(p, x1, x2), expected, rtol=1e-8)
    np.testing.assert_allclose(k.diag(p, x1), np.ones(17))


def test_matern_closed_forms(xy):
    x1, x2 = xy
    r = np.sqrt(naive_sqdist(np.asarray(x1), np.asarray(x2)))
    p = {"log_lengthscale": jnp.zeros(3)}
    np.testing.assert_allclose(Matern12().gram(p, x1, x2), np.exp(-r), rtol=1e-7)
    np.testing.assert_allclose(
        Matern32().gram(p, x1, x2),
        (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r), rtol=1e-7)
    np.testing.assert_allclose(
        Matern52().gram(p, x1, x2),
        (1 + np.sqrt(5) * r + 5 * r ** 2 / 3) * np.exp(-np.sqrt(5) * r), rtol=1e-7)


def test_matern_diag_is_one_and_gram_psd(rng):
    x = jnp.asarray(rng.normal(size=(30, 2)))
    for K in (Matern12(), Matern32(), Matern52()):
        p = K.init_params(2)
        G = np.asarray(K.gram(p, x, x))
        # matmul-trick sq_dist leaves ~1e-15 residue on the diagonal; |r| ~ 1e-7
        np.testing.assert_allclose(np.diag(G), 1.0, atol=1e-6)
        w = np.linalg.eigvalsh(G + 1e-10 * np.eye(30))
        assert w.min() > -1e-8


def test_rq_limits_to_rbf(xy):
    """RQ -> RBF as alpha -> inf."""
    x1, x2 = xy
    rq = RationalQuadratic()
    p = {"log_lengthscale": jnp.zeros(3), "log_alpha": jnp.asarray(12.0)}
    rbf = RBF().gram({"log_lengthscale": jnp.zeros(3)}, x1, x2)
    np.testing.assert_allclose(rq.gram(p, x1, x2), rbf, atol=1e-4)


def test_periodic_closed_form(rng):
    x1 = jnp.asarray(rng.normal(size=(9, 1)))
    x2 = jnp.asarray(rng.normal(size=(7, 1)))
    k = Periodic()
    p = {"log_lengthscale": jnp.log(jnp.asarray(0.7)), "log_period": jnp.log(jnp.asarray(2.0))}
    d = np.asarray(x1)[:, None, 0] - np.asarray(x2)[None, :, 0]
    expected = np.exp(-2 * np.sin(np.pi * d / 2.0) ** 2 / 0.49)
    np.testing.assert_allclose(k.gram(p, x1, x2), expected, rtol=1e-5, atol=1e-8)


def test_periodic_fixed_period_excluded_from_params():
    k = Periodic(fixed_period=1.0)
    assert "log_period" not in k.init_params(1)


def test_combinators(xy):
    x1, x2 = xy
    k = Scale(RBF()) + Scale(Matern32())
    p = k.init_params(3)
    g1 = Scale(RBF()).gram(p["terms"][0], x1, x2)
    g2 = Scale(Matern32()).gram(p["terms"][1], x1, x2)
    np.testing.assert_allclose(k.gram(p, x1, x2), np.asarray(g1) + np.asarray(g2), rtol=1e-10)

    kp = RBF() * Matern32()
    pp = kp.init_params(3)
    np.testing.assert_allclose(
        kp.gram(pp, x1, x2),
        np.asarray(RBF().gram(pp["terms"][0], x1, x2)) * np.asarray(Matern32().gram(pp["terms"][1], x1, x2)),
        rtol=1e-10)


def test_co2_composite_structure(rng):
    """4 summed components, seasonal period frozen
    (reference: experiments/co2_baseline.py:89-98)."""
    k = co2_kernel()
    p = k.init_params(1)
    assert len(p["terms"]) == 4
    seasonal = p["terms"][0]
    assert "log_period" not in seasonal["base"]["terms"][0]
    x = jnp.asarray(rng.uniform(0, 10, size=(20, 1)))
    G = np.asarray(k.gram(p, x, x))
    np.testing.assert_allclose(G, G.T, atol=1e-10)
    assert np.linalg.eigvalsh(G + 1e-8 * np.eye(20)).min() > -1e-8
    np.testing.assert_allclose(k.diag(p, x), np.diag(G), rtol=1e-8)
