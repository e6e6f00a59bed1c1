from .base import (
    RBF,
    Constant,
    Cosine,
    Kernel,
    Linear,
    Matern12,
    Matern32,
    Matern52,
    Periodic,
    Product,
    RationalQuadratic,
    Scale,
    Sum,
    White,
    dist,
    sq_dist,
)
from .composite import co2_kernel, default_rbf

__all__ = [
    "Kernel", "RBF", "Matern12", "Matern32", "Matern52", "RationalQuadratic",
    "Periodic", "Cosine", "Linear", "Constant", "White", "Scale", "Sum",
    "Product", "sq_dist", "dist", "co2_kernel", "default_rbf",
]
