"""Headline benchmark: BayesianSGPR_HMC total MCMC sampling seconds.

Reproduces the reference's measurement (sampler_runtimes.csv row "SGPR+HMC",
Boston column: 14.57 s of pure NUTS sampling per run, harvested from pymc3
``perf_counter_diff`` stats — SURVEY §6) on a Boston-shaped problem:
N_train=404, D=13, M=100, alternating schedule with sampling rounds
(tune=100, n=20) x2 + (tune=25, n=10) x2 (models/bayesian_sgpr_hmc.py:144-152).

We time ONLY the NUTS sampling calls (compile excluded via warmup calls with
identical shapes, matching pymc3's exclusion of Theano compile time).

Prints one JSON line:
  {"metric": "...", "value": seconds, "unit": "s", "vs_baseline": ratio}
vs_baseline > 1 means faster than the reference CPU run.
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_SECONDS = 14.57     # sampler_runtimes.csv:2, Boston, SGPR+HMC


def main():
    import jax
    import jax.numpy as jnp

    from ggp_tpu.models import BayesianSparseGPR_HMC
    from ggp_tpu.utils.datasets import normalize

    # Boston-shaped synthetic data (N=506, D=13, 80% train)
    rng = np.random.default_rng(173)
    N, D, M = 506, 13, 100
    X_raw = rng.normal(size=(N, D))
    w = rng.normal(size=(D, 8)) / np.sqrt(D)
    f = np.cos(X_raw @ w + rng.uniform(0, 2 * np.pi, 8)).sum(1)
    y_raw = f + 0.3 * rng.normal(size=N)
    Xn, _, _ = normalize(X_raw)
    yn, _, _ = normalize(y_raw[:, None])
    n_train = int(0.8 * N)
    X = jnp.asarray(Xn[:n_train], jnp.float32)
    y = jnp.asarray(yn[:n_train, 0], jnp.float32)
    Z_init = X[rng.integers(0, n_train, M)]

    model = BayesianSparseGPR_HMC(X, y, Z_init=Z_init)
    # ML-II warm start (not timed; reference excludes it too)
    model.warm_start(num_steps=500, lr=0.01)

    # Reference sampling schedule: first/last (100, 20), middle (25, 10)
    rounds = [(100, 20), (25, 10), (25, 10), (100, 20)]

    # compile warmup: one call per distinct config
    for tune, n in set(rounds):
        model.sample_hypers(tune, n, key=jax.random.PRNGKey(99))
        jax.block_until_ready(model.trace)

    key = jax.random.PRNGKey(0)
    total = 0.0
    div_frac = []
    acc = []
    for i, (tune, n) in enumerate(rounds):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        model.sample_hypers(tune, n, key=sub)
        jax.block_until_ready(model.trace)
        total += time.perf_counter() - t0
        div_frac.append(float(np.asarray(model.stats["diverging"]).mean()))
        acc.append(float(np.asarray(model.stats["accept_prob"]).mean()))
        if i < len(rounds) - 1:
            model.optimize_Z(num_steps=100, lr=0.01)   # not timed (torch side
            # of the reference's alternation isn't in its sampling seconds)

    # sanity gate: a diverging sampler terminates trees early and would
    # report a bogus speedup — refuse to emit a healthy-looking number.
    # (mean accept, not min: the reference's tune=25 mid-rounds legitimately
    # adapt poorly, which is part of the protocol being timed)
    if max(div_frac) > 0.1 or float(np.mean(acc)) < 0.5:
        print(json.dumps({
            "metric": "bayesian_sgpr_hmc_sampling_seconds_boston_shaped",
            "value": -1.0, "unit": "s", "vs_baseline": 0.0,
            "error": f"sampler unhealthy: divergence={max(div_frac):.2f} "
                     f"accept={min(acc):.2f}",
        }))
        return

    print(json.dumps({
        "metric": "bayesian_sgpr_hmc_sampling_seconds_boston_shaped",
        "value": round(total, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / total, 2),
    }))


if __name__ == "__main__":
    main()
