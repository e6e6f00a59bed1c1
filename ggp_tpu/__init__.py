"""ggp_tpu — TPU-native Generalised (fully-Bayesian) Gaussian Processes.

From-scratch JAX/XLA/Pallas rebuild of vr308/Generalised-Gaussian-Processes:
sparse GP regression and classification with distributions over kernel
hyperparameters, inferred by jitted HMC/NUTS (vmapped parallel chains) or
variational inference — one compiled program end-to-end instead of the
reference's GPyTorch/pymc3/gpflow three-backend sprawl.
"""

import jax as _jax

# GP linear algebra is Cholesky-bound: bf16 MXU passes (the TPU default) put
# ~1e-3 error into Gram matrices, which exceeds any reasonable jitter and
# breaks PSD-ness. Force f32 matmul accumulation (still MXU, multi-pass).
_jax.config.update("jax_default_matmul_precision", "highest")

from . import config, kernels, likelihoods, means, priors
from .likelihoods import BernoulliProbit, GaussianLikelihood, PoissonLogCox, Softmax
from .means import Constant, Linear, Zero

__version__ = "0.1.0"
