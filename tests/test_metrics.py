import numpy as np
import jax.numpy as jnp

from ggp_tpu.utils.metrics import (
    negative_log_predictive_mixture_density, nlpd, nlpd_mixture, rmse,
)


def test_rmse_destandardises():
    y = jnp.asarray([0.0, 1.0])
    pred = jnp.asarray([0.0, 0.0])
    np.testing.assert_allclose(float(rmse(pred, y, y_std=2.0)), 2.0 / np.sqrt(2))


def test_nlpd_gaussian_exact():
    # N(0,1) at y=0: nlpd = 0.5 log(2 pi)
    val = nlpd(jnp.zeros(5), jnp.ones(5), jnp.zeros(5), y_std=1.0)
    np.testing.assert_allclose(float(val), 0.5 * np.log(2 * np.pi), rtol=1e-7)


def test_mixture_nlpds_agree_for_identical_components():
    m = jnp.zeros((4, 6))
    v = jnp.ones((4, 6))
    y = jnp.zeros(6)
    a = float(nlpd_mixture(m, v, y))
    b = float(negative_log_predictive_mixture_density(m, v, y))
    np.testing.assert_allclose(a, b, rtol=1e-7)
    np.testing.assert_allclose(a, 0.5 * np.log(2 * np.pi), rtol=1e-7)


def test_proper_mixture_below_mean_of_components():
    """Jensen: proper mixture NLPD <= mean of per-component NLPDs."""
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.normal(size=(5, 20)))
    v = jnp.asarray(rng.uniform(0.5, 2.0, size=(5, 20)))
    y = jnp.asarray(rng.normal(size=20))
    assert float(negative_log_predictive_mixture_density(m, v, y)) <= float(
        nlpd_mixture(m, v, y)) + 1e-9
