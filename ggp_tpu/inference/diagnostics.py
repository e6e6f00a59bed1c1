"""Sampler diagnostics: effective sample size, split-R̂, summaries.

The reference harvests only ``step_size`` and ``perf_counter_diff`` from
pymc3 traces (models/bayesian_sgpr_hmc.py:156-157) and reports sampling
seconds (experiments/sampler_runtimes.py). We additionally compute ESS and
R̂ (pymc3 printed these in its ``pm.summary`` CSVs,
regression_allin.py:118-121) so ESS/sec — the BASELINE.json north-star
metric — is first-class.
"""

from __future__ import annotations

import numpy as np

__all__ = ["effective_sample_size", "split_rhat", "summary",
           "trace_to_named_dict", "summary_to_csv"]


def _autocov_fft(x: np.ndarray) -> np.ndarray:
    """Autocovariance per chain via FFT. x: (chains, draws)."""
    n = x.shape[1]
    xc = x - x.mean(axis=1, keepdims=True)
    m = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, m, axis=1)
    acov = np.fft.irfft(f * np.conj(f), m, axis=1)[:, :n].real
    return acov / n


def effective_sample_size(x: np.ndarray) -> float:
    """Stan-style bulk ESS with Geyer's initial monotone positive sequence.

    x: (chains, draws) scalar chain values.
    """
    x = np.atleast_2d(np.asarray(x, np.float64))
    c, n = x.shape
    if n < 4:
        return float(c * n)
    acov = _autocov_fft(x)
    chain_var = acov[:, 0] * n / (n - 1.0)
    mean_var = chain_var.mean()
    var_plus = mean_var * (n - 1.0) / n
    if c > 1:
        var_plus += x.mean(axis=1).var(ddof=1)
    if var_plus <= 0:
        return float(c * n)

    rho = 1.0 - (mean_var - acov.mean(axis=0)) / var_plus
    rho[0] = 1.0
    # Geyer: sum consecutive pairs, keep while positive, enforce monotone
    max_pairs = (n - 1) // 2
    tau = 0.0
    prev = np.inf
    s = 0.0
    for k in range(max_pairs):
        pair = rho[2 * k] + rho[2 * k + 1]
        if pair < 0:
            break
        pair = min(pair, prev)
        prev = pair
        s += pair
    tau = max(2.0 * s - 1.0, 1.0 / n)
    return float(c * n / tau)


def split_rhat(x: np.ndarray) -> float:
    """Split-R̂ (Gelman). x: (chains, draws)."""
    x = np.atleast_2d(np.asarray(x, np.float64))
    c, n = x.shape
    half = n // 2
    if half < 2:
        return float("nan")
    halves = np.concatenate([x[:, :half], x[:, half:2 * half]], axis=0)
    m, hn = halves.shape
    chain_means = halves.mean(axis=1)
    chain_vars = halves.var(axis=1, ddof=1)
    W = chain_vars.mean()
    B = hn * chain_means.var(ddof=1)
    var_plus = (hn - 1.0) / hn * W + B / hn
    if W <= 0:
        return float("nan")
    return float(np.sqrt(var_plus / W))


def summary(samples_dict: dict, stats: dict | None = None) -> dict:
    """Per-parameter mean/sd/ESS/R̂ table (replacement for the reference's
    pm.summary(trace) CSV dumps, experiments/regression.py:192-195)."""
    out = {}
    for name, arr in samples_dict.items():
        a = np.asarray(arr)
        if a.ndim == 1:
            a = a[None, :]
        flatdims = a.shape[2:]
        a2 = a.reshape(a.shape[0], a.shape[1], -1)
        for j in range(a2.shape[-1]):
            key = name if a2.shape[-1] == 1 else f"{name}[{np.unravel_index(j, flatdims)}]"
            x = a2[..., j]
            out[key] = {
                "mean": float(x.mean()),
                "sd": float(x.std()),
                "ess": effective_sample_size(x),
                "rhat": split_rhat(x),
            }
    if stats is not None and "diverging" in stats:
        out["_diverging"] = int(np.asarray(stats["diverging"]).sum())
    return out


def trace_to_named_dict(trace) -> dict:
    """Flatten a trace pytree (leading axis = draws, or (chains, draws)) into
    a {dotted.path: array} dict for :func:`summary` — the naming convention
    the reference gets for free from pymc3 variable names in its
    ``pm.summary(trace)`` CSVs (experiments/regression.py:192-195)."""
    import jax

    out = {}
    leaves = jax.tree_util.tree_flatten_with_path(trace)[0]
    for path, leaf in leaves:
        name = ".".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[name or "param"] = np.asarray(leaf)
    return out


def summary_to_csv(summ: dict, path: str) -> str:
    """Write a :func:`summary` table as CSV (columns: param, mean, sd, ess,
    rhat) — the per-run artifact the reference produces with
    ``pm.summary(trace).to_csv`` (experiments/regression.py:192-195,
    regression_allin.py:118-121). ``_diverging`` lands in an extra row."""
    with open(path, "w") as f:
        f.write("param,mean,sd,ess,rhat\n")
        for name, row in summ.items():
            if name == "_diverging":
                f.write(f"_diverging,{row},,,\n")
                continue
            f.write(f"\"{name}\",{row['mean']:.6g},{row['sd']:.6g},"
                    f"{row['ess']:.6g},{row['rhat']:.6g}\n")
    return path
