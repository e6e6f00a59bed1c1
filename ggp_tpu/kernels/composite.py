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


def co2_sgpmc_kernel() -> Kernel:
    """The reference CO2 JointHMC composite (experiments/co2_sgpmc.py:65-71):
    seasonal Periodic(SE, period=1 fixed) x Matern52 (M52 variance fixed at 1
    — our unit-variance bases encode that for free), medium RationalQuadratic,
    trend SE initialised at variance log(2)^2, noise Matern52 + White."""
    import numpy as _np

    from .base import Matern52, White
    seasonal = Scale(Periodic(fixed_period=1.0) * Matern52(ard=False))
    medium = Scale(RationalQuadratic(ard=False))
    trend = Scale(RBF(ard=False),
                  init_log_outputscale=float(_np.log(_np.log(2.0) ** 2)))
    noise = Scale(Matern52(ard=False)) + White()
    return Sum((seasonal, medium, trend, noise))


def co2_sgpmc_prior_tree() -> dict:
    """Per-component priors of the reference CO2 JointHMC
    (experiments/co2_sgpmc.py:74-93,107): HalfNormal on variances, Gamma on
    lengthscales/alpha, Gamma(2,1) on likelihood noise. Structure mirrors
    ``co2_sgpmc_kernel().init_params(1)``."""
    from ..priors import Gamma, HalfNormal
    seasonal = {"log_outputscale": HalfNormal(2.0),
                "base": {"terms": ({"log_lengthscale": Gamma(4.0, 3.0)},
                                   {"log_lengthscale": Gamma(10.0, 0.075)})}}
    medium = {"log_outputscale": HalfNormal(0.5),
              "base": {"log_lengthscale": Gamma(2.0, 0.75),
                       "log_alpha": Gamma(5.0, 2.0)}}
    trend = {"log_outputscale": HalfNormal(2.0),
             "base": {"log_lengthscale": Gamma(4.0, 0.1)}}
    noise = {"terms": ({"log_outputscale": HalfNormal(0.5),
                        "base": {"log_lengthscale": Gamma(2.0, 4.0)}},
                       {"log_variance": HalfNormal(0.25)})}
    return {
        "kernel": {"terms": (seasonal, medium, trend, noise)},
        "lik": {"log_noise": Gamma(2.0, 1.0)},
    }
