"""Observability: timers, sampler perf stats, and jax.profiler hooks.

The reference's entire observability story is wall-clock brackets and pymc3
step_size/perf_counter_diff harvesting (SURVEY §5.1). Here:

* ``timed`` / ``Timer`` — block timers that block_until_ready their result,
* ``sampler_perf`` — ESS/sec and friends from a trace + wall time (the
  BASELINE.json north-star metric),
* ``trace_profile`` — context manager around ``jax.profiler.trace`` for
  TensorBoard-compatible device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict

import jax
import numpy as np

from ..inference.diagnostics import effective_sample_size, split_rhat

__all__ = ["Timer", "timed", "sampler_perf", "trace_profile"]


class Timer:
    """with Timer() as t: ...; t.seconds"""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.t0
        return False


def timed(fn, *args, **kwargs):
    """Run fn, block on its outputs, return (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def sampler_perf(samples: Dict[str, Any], wall_seconds: float,
                 stats: Dict[str, Any] | None = None) -> Dict[str, float]:
    """ESS/sec summary over every scalar component of a (chains, draws, ...)
    trace. Reports the minimum ESS (the binding constraint) and its rate."""
    ess_all = []
    rhat_all = []
    for arr in jax.tree_util.tree_leaves(samples):
        a = np.asarray(arr)
        if a.ndim == 1:
            a = a[None]
        a2 = a.reshape(a.shape[0], a.shape[1], -1)
        for j in range(a2.shape[-1]):
            ess_all.append(effective_sample_size(a2[..., j]))
            rhat_all.append(split_rhat(a2[..., j]))
    out = {
        "wall_seconds": wall_seconds,
        "min_ess": float(np.min(ess_all)),
        "mean_ess": float(np.mean(ess_all)),
        "min_ess_per_sec": float(np.min(ess_all) / max(wall_seconds, 1e-12)),
        "max_rhat": float(np.nanmax(rhat_all)),
    }
    if stats is not None:
        if "diverging" in stats:
            out["num_divergent"] = int(np.asarray(stats["diverging"]).sum())
        if "step_size" in stats:
            out["step_size"] = float(np.asarray(stats["step_size"]).mean())
        if "n_leapfrog" in stats:
            out["total_leapfrogs"] = int(np.asarray(stats["n_leapfrog"]).sum())
    return out


@contextlib.contextmanager
def trace_profile(logdir: str = "/tmp/ggp_profile"):
    """Device trace for TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
