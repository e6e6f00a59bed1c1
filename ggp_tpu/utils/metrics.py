"""Benchmark metrics with the reference's exact conventions.

All de-standardise by ``y_std`` the same way the reference does
(utils/metrics.py:38-78). Two deliberate parity quirks are preserved:

* ``nlpd`` follows the reference's convention of treating the joint MVN
  log-prob divided by N (utils/metrics.py:42-47) — for a diagonal predictive
  this equals the mean marginal NLPD; we compute it from marginal moments.
* ``nlpd_mixture`` is the *mean of per-component NLPDs* over hyper samples
  (utils/metrics.py:61-67), NOT the proper log-mixture density; the proper
  version is ``negative_log_predictive_mixture_density``
  (utils/metrics.py:70-78). The benchmark CSVs were produced with the former.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "rmse",
    "nlpd",
    "nlpd_marginal",
    "nlpd_mixture",
    "negative_log_predictive_mixture_density",
    "get_trainable_param_names",
    "print_trainable_param_names",
]


def rmse(pred_mean, y, y_std=1.0):
    """Reference: utils/metrics.py:38-40 (de-standardised RMSE)."""
    pred_mean = jnp.asarray(pred_mean)
    y = jnp.asarray(y)
    return jnp.sqrt(jnp.mean((pred_mean - y) ** 2)) * y_std


def _marginal_nlpd(pred_mean, pred_var, y, y_std=1.0):
    lp = -0.5 * (jnp.log(2.0 * jnp.pi * pred_var) + (y - pred_mean) ** 2 / pred_var)
    return -jnp.mean(lp) + jnp.log(jnp.asarray(y_std, lp.dtype))


def nlpd(pred_mean, pred_var, y, y_std=1.0):
    """Per-point NLPD + log y_std (reference: utils/metrics.py:42-47)."""
    return _marginal_nlpd(jnp.asarray(pred_mean), jnp.asarray(pred_var),
                          jnp.asarray(y), y_std)


def nlpd_marginal(pred_mean, pred_var, y, y_std=1.0):
    """Reference: utils/metrics.py:49-58 — identical to ``nlpd`` here since we
    always work from marginal moments."""
    return nlpd(pred_mean, pred_var, y, y_std)


def nlpd_mixture(pred_means, pred_vars, y, y_std=1.0):
    """Mean of per-component NLPDs over S hyper samples
    (reference: utils/metrics.py:61-67). pred_means/vars: (S, Nt)."""
    per = jax.vmap(lambda m, v: _marginal_nlpd(m, v, jnp.asarray(y), y_std))(
        jnp.asarray(pred_means), jnp.asarray(pred_vars))
    return jnp.mean(per)


def negative_log_predictive_mixture_density(pred_means, pred_vars, y, y_std=1.0):
    """Proper per-point mixture density: -mean_i log( (1/S) sum_s N(y_i | m_si,
    v_si) ) + log y_std.

    DELIBERATE DEVIATION from reference utils/metrics.py:70-78, which (despite
    its name) averages per-component log-pdfs with no logsumexp — that variant
    is ``nlpd_mixture`` above and is the one the benchmark CSVs were produced
    with. Values from this function are the mathematically proper mixture
    density and are NOT comparable to reference CSV numbers."""
    m = jnp.asarray(pred_means)
    v = jnp.asarray(pred_vars)
    y = jnp.asarray(y)[None, :]
    comp_lp = -0.5 * (jnp.log(2.0 * jnp.pi * v) + (y - m) ** 2 / v)  # (S, Nt)
    mix_lp = jax.scipy.special.logsumexp(comp_lp, axis=0) - jnp.log(m.shape[0])
    return -jnp.mean(mix_lp) + jnp.log(jnp.asarray(y_std, mix_lp.dtype))


def get_trainable_param_names(params: dict):
    """Flat list of parameter paths (reference's PrettyTable dump,
    utils/metrics.py:13-36, reduced to the useful part)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [jax.tree_util.keystr(path) for path, _ in flat]


def print_trainable_param_names(params: dict) -> None:
    """Tabular parameter dump (reference's PrettyTable printer,
    utils/metrics.py:13-26)."""
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    width = max((len(jax.tree_util.keystr(p)) for p, _ in flat), default=4)
    print(f"{'parameter':{width}}  shape        value")
    for path, leaf in flat:
        a = np.asarray(leaf)
        val = (f"{a.item():.4f}" if a.size == 1
               else f"mean {a.mean():.4f}")
        print(f"{jax.tree_util.keystr(path):{width}}  {str(a.shape):12} {val}")
