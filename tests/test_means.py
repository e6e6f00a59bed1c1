"""Mean-function unit tests (ggp_tpu.means)."""

import jax
import jax.numpy as jnp
import numpy as np

from ggp_tpu.means import Constant, Linear, Zero, linear_mean_prior_tree
from ggp_tpu.priors import Normal, log_prior


def test_zero_and_constant():
    X = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)))
    z = Zero()
    assert z.init_params(3) == {}
    np.testing.assert_array_equal(np.asarray(z({}, X)), np.zeros(7))
    c = Constant()
    p = c.init_params(3)
    p = {"c": jnp.asarray(1.5)}
    np.testing.assert_allclose(np.asarray(c(p, X)), 1.5)


def test_linear_matches_gpflow_convention():
    """gpflow.mean_functions.Linear defaults: A = ones, b = 0 -> f(x) = sum x
    (reference experiments/co2_sgpmc.py:60)."""
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.normal(size=(9, 2)))
    lin = Linear()
    p = lin.init_params(2)
    np.testing.assert_array_equal(np.asarray(p["A"]), np.ones(2))
    assert float(p["b"]) == 0.0
    np.testing.assert_allclose(np.asarray(lin(p, X)),
                               np.asarray(X).sum(axis=1), rtol=1e-12)
    p2 = {"A": jnp.asarray([2.0, -1.0]), "b": jnp.asarray(0.5)}
    np.testing.assert_allclose(np.asarray(lin(p2, X)),
                               2 * np.asarray(X)[:, 0]
                               - np.asarray(X)[:, 1] + 0.5, rtol=1e-12)


def test_linear_mean_prior_tree():
    pt = linear_mean_prior_tree(3.0)
    assert pt == {"A": Normal(0.0, 3.0), "b": Normal(0.0, 3.0)}
    params = {"A": jnp.zeros(2), "b": jnp.zeros(())}
    lp = float(log_prior(pt, params))
    # 3 standard-normal-at-zero terms with sigma=3
    expect = 3 * (-0.5 * np.log(2 * np.pi) - np.log(3.0))
    np.testing.assert_allclose(lp, expect, rtol=1e-10)


def test_mean_params_are_differentiable():
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.normal(size=(12, 2)))
    y = jnp.asarray(rng.normal(size=(12,)))
    lin = Linear()
    p = lin.init_params(2)

    def loss(p):
        return jnp.sum((lin(p, X) - y) ** 2)

    g = jax.grad(loss)(p)
    assert g["A"].shape == (2,) and np.all(np.isfinite(np.asarray(g["A"])))
    assert np.isfinite(float(g["b"]))
