"""Prebuilt composite kernels.

The CO2 composite mirrors the reference structure
(experiments/co2_baseline.py:89-98): seasonal Scale(Periodic x RBF) with the
period frozen at 1 year, long-term trend Scale(RBF), medium-term
Scale(RationalQuadratic), and a short-scale noise component Scale(RBF) — all
summed. The pymc3 twin additionally swaps the noise component for Matern32
(experiments/co2_bayesian_sgpr_hmc.py:145); we expose both variants.
"""

from __future__ import annotations

from .base import RBF, Kernel, Matern32, Periodic, RationalQuadratic, Scale, Sum


def co2_kernel(noise_component: str = "rbf") -> Kernel:
    seasonal = Scale(Periodic(fixed_period=1.0) * RBF(ard=False))
    trend = Scale(RBF(ard=False))
    medium = Scale(RationalQuadratic(ard=False))
    if noise_component == "matern32":
        noise = Scale(Matern32(ard=False))
    else:
        noise = Scale(RBF(ard=False))
    return Sum((seasonal, trend, medium, noise))


def default_rbf(ard: bool = True) -> Kernel:
    """Scale(RBF(ard)) — the reference's default model kernel
    (models/sgpr.py:35-37)."""
    return Scale(RBF(ard=ard))
