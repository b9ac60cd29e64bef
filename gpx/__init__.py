"""gpx — a TPU-native Gaussian-process framework (JAX / XLA / Pallas / pjit).

Ground-up rebuild of the capabilities of jonnylaw/gaussian-processes
(single-JVM Scala + Breeze/netlib BLAS) as an idiomatic JAX library:
pytree parameters, fused Pallas Gram kernels, lax.scan samplers with
vmapped parallel chains, and jax.sharding scale-out. See SURVEY.md for the
capability map this implements.
"""

from gpx import bijectors, distributions, kernels, means, params
from gpx.kernels import (
    Ard,
    Linear,
    Matern,
    Periodic,
    Product,
    RationalQuadratic,
    SquaredExponential,
    Sum,
    White,
    ard,
    linear,
    matern,
    periodic,
    rational_quadratic,
    se,
    white,
)
from gpx.means import Plane, Zero, plane, zero
from gpx.params import Parameters

__all__ = [
    "bijectors",
    "distributions",
    "kernels",
    "means",
    "params",
    "Ard",
    "Linear",
    "Matern",
    "Periodic",
    "Product",
    "RationalQuadratic",
    "SquaredExponential",
    "Sum",
    "White",
    "ard",
    "linear",
    "matern",
    "periodic",
    "rational_quadratic",
    "se",
    "white",
    "Plane",
    "Zero",
    "plane",
    "zero",
    "Parameters",
]

__version__ = "0.1.0"
