"""Mean functions and mean parameters as pytrees.

Replaces ``MeanFunction`` (core/src/main/scala/gp/MeanFunction.scala:5-18) and
the ``MeanParameters`` ADT (core/src/main/scala/gp/MeanParameters.scala:8-46).
Locations are ``(N, D)`` arrays (D=1 is the reference's ``One``, D=2 ``Two``;
any D works — Location.scala:5-13 generalized).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpx import bijectors as bij
from gpx.utils.pytree import pytree_dataclass


class MeanFunction:
    def __call__(self, x):
        """Mean at locations ``x: (N, D)`` -> ``(N,)``."""
        raise NotImplementedError

    def bijectors(self):
        raise NotImplementedError


@pytree_dataclass
class Zero(MeanFunction):
    """MeanFunction.scala:12."""

    def __call__(self, x):
        return jnp.zeros(x.shape[:-1], dtype=x.dtype)

    def bijectors(self):
        return Zero()


@pytree_dataclass
class Plane(MeanFunction):
    """Linear-in-location mean ``beta_0 + x @ beta_1:`` —
    MeanFunction.scala:7-10 generalized to any input dimension.
    ``beta``: shape ``(D + 1,)``."""

    beta: jnp.ndarray

    def __call__(self, x):
        return self.beta[0] + x @ self.beta[1:]

    def bijectors(self):
        return Plane(beta=bij.identity)


def design_matrix(x):
    """Prepend a column of ones — MeanParameters.makeDesignMatrix
    (MeanParameters.scala:58-66). ``x: (N, D)`` -> ``(N, D+1)``."""
    ones = jnp.ones((*x.shape[:-1], 1), dtype=x.dtype)
    return jnp.concatenate([ones, x], axis=-1)


def plane(beta) -> Plane:
    return Plane(beta=jnp.asarray(beta))


def zero() -> Zero:
    return Zero()
