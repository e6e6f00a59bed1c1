"""Mauna Loa CO2 extrapolation with the composite kernel, SGPR + ML-II.

Rebuild of the reference baseline (experiments/co2_baseline.py): composite
kernel seasonal Scale(Periodic(period=1 frozen) x RBF) + trend Scale(RBF) +
medium Scale(RationalQuadratic) + noise Scale(RBF) summed into the sparse
model (:89-98), M=400 inducing points (:148), noise floor 5e-4 (:158).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from co2_data import load_co2_dataset
from ggp_tpu.kernels import co2_kernel
from ggp_tpu.models import SparseGPR
from ggp_tpu.utils.metrics import nlpd, rmse


def init_co2_params(model: SparseGPR):
    """Sensible starting hypers for the CO2 decomposition (the reference
    relies on gpytorch defaults + long training; we seed the component
    scales/lengthscales near their known roles)."""
    p = model.params
    terms = list(p["kernel"]["terms"])
    # seasonal: moderate scale, periodic ls ~ 1, decay RBF ls long (90 yr)
    terms[0] = {"log_outputscale": jnp.log(jnp.asarray(1.0)),
                "base": {"terms": (
                    {"log_lengthscale": jnp.log(jnp.asarray(1.3))},
                    {"log_lengthscale": jnp.log(jnp.asarray(90.0))})}}
    # trend: large scale, long ls
    terms[1] = {"log_outputscale": jnp.log(jnp.asarray(4.0)),
                "base": {"log_lengthscale": jnp.log(jnp.asarray(40.0))}}
    # medium-term RQ
    terms[2] = {"log_outputscale": jnp.log(jnp.asarray(0.5)),
                "base": {"log_lengthscale": jnp.log(jnp.asarray(1.2)),
                         "log_alpha": jnp.log(jnp.asarray(0.8))}}
    # short-scale noise component
    terms[3] = {"log_outputscale": jnp.log(jnp.asarray(0.05)),
                "base": {"log_lengthscale": jnp.log(jnp.asarray(0.15))}}
    p["kernel"]["terms"] = tuple(terms)
    p["log_noise"] = jnp.log(jnp.asarray(0.01))
    return p


def main(M=400, max_iters=3000, lr=0.01, year_split=2003, plot=True):
    Xtr, ytr, Xte, yte, y_mean, y_std, synth = load_co2_dataset(year_split)
    if synth:
        print("NOTE: mauna.txt not found - using synthetic CO2 stand-in")
    X = jnp.asarray(Xtr, jnp.float32)
    y = jnp.asarray(ytr, jnp.float32)
    Xt = jnp.asarray(Xte, jnp.float32)
    yt = jnp.asarray(yte, jnp.float32)

    Z_init = X[:: max(1, X.shape[0] // M)][:M]
    model = SparseGPR(X, y, Z_init=Z_init, kernel=co2_kernel(), jitter=1e-4)
    model.params = init_co2_params(model)
    losses = model.train_model(optimizer=optax.adam(lr), max_steps=max_iters,
                               verbose=False)
    # noise floor (reference: GreaterThan(5e-4), experiments/co2_baseline.py:158)
    model.params["log_noise"] = jnp.maximum(model.params["log_noise"],
                                            jnp.log(jnp.asarray(5e-4)))
    print(f"train loss {float(losses[0]):.1f} -> {float(losses[-1]):.1f}")

    mean, var = model.posterior_predictive(Xt, full_cov=False)
    print(f"extrapolation rmse={float(rmse(mean, yt, y_std)):.3f} ppm  "
          f"nlpd={float(nlpd(mean, var, yt, y_std)):.3f}")

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import os
        from ggp_tpu.config import RESULTS_DIR
        fig, ax = plt.subplots(figsize=(11, 4))
        ax.plot(np.asarray(X).ravel(), np.asarray(y) * y_std + y_mean, "k.",
                ms=2, label="train")
        ax.plot(np.asarray(Xt).ravel(), np.asarray(yt) * y_std + y_mean, "g.",
                ms=2, label="test")
        m = np.asarray(mean) * y_std + y_mean
        s = np.sqrt(np.asarray(var)) * y_std
        ax.plot(np.asarray(Xt).ravel(), m, "b-", lw=1, label="SGPR mean")
        ax.fill_between(np.asarray(Xt).ravel(), m - 1.96 * s, m + 1.96 * s,
                        color="b", alpha=0.2)
        ax.legend(); ax.set_xlabel("years (centred)"); ax.set_ylabel("CO2 ppm")
        os.makedirs(RESULTS_DIR, exist_ok=True)
        out = f"{RESULTS_DIR}/co2_baseline.png"
        fig.savefig(out, dpi=120, bbox_inches="tight")
        print("saved", out)
    return model


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=400)
    p.add_argument("--max_iters", type=int, default=3000)
    p.add_argument("--year_split", type=int, default=2003)
    p.add_argument("--no_plot", action="store_true")
    a = p.parse_args()
    main(M=a.M, max_iters=a.max_iters, year_split=a.year_split,
         plot=not a.no_plot)
