"""Bijectors mapping unconstrained sampler space to constrained parameter space.

Re-implements the reference's ``Parameter``/``unbounded``/``bounded``/
``boundedBelow``/``boundedAbove`` toolkit and ``logistic``/``logit``/
``softplus`` helpers (core/src/main/scala/gp/KernelParameters.scala:323-370)
as stateless bijector objects. Unlike the reference — which hand-derives the
Jacobian ``derivative`` terms and gets them wrong for the SE kernel
(KernelParameters.scala:276-277) — gradients of the change-of-variables
correction here come from autodiff of ``log_det_jacobian``.

Bijectors are *static* objects (they parameterize model structure, not
values), so they are deliberately NOT pytrees: a same-structure dataclass
holding bijectors in its array slots zips cleanly against a parameter pytree
under ``jax.tree_util.tree_map``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn


class Bijector:
    """Monotone map ``forward: R -> constrained domain``."""

    def forward(self, u):
        raise NotImplementedError

    def inverse(self, c):
        raise NotImplementedError

    def log_det_jacobian(self, u):
        """``log |d forward(u) / du|`` evaluated elementwise at ``u``."""
        raise NotImplementedError

    def __repr__(self):
        return type(self).__name__

    def __eq__(self, other):  # structural equality so treedefs compare equal
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self), tuple(sorted(self.__dict__.items()))))


class Identity(Bijector):
    """Reference ``unbounded`` (KernelParameters.scala:344-345)."""

    def forward(self, u):
        return u

    def inverse(self, c):
        return c

    def log_det_jacobian(self, u):
        return jnp.zeros_like(u)


class BoundedBelow(Bijector):
    """``c = exp(u) + min`` — reference ``boundedBelow``
    (KernelParameters.scala:356-362); with ``min=0`` this is the log/exp
    transform used by ``unconstrainParams``/``constrainParams``
    (KernelParameters.scala:251-264)."""

    def __init__(self, minimum: float = 0.0):
        self.minimum = float(minimum)

    def forward(self, u):
        return jnp.exp(u) + self.minimum

    def inverse(self, c):
        return jnp.log(c - self.minimum)

    def log_det_jacobian(self, u):
        return u


class BoundedAbove(Bijector):
    """``c = max - exp(-u)`` (KernelParameters.scala:364-370)."""

    def __init__(self, maximum: float = 0.0):
        self.maximum = float(maximum)

    def forward(self, u):
        return self.maximum - jnp.exp(-u)

    def inverse(self, c):
        return -jnp.log(self.maximum - c)

    def log_det_jacobian(self, u):
        return -u


class Bounded(Bijector):
    """``c = logistic(u) * (max - min) + min`` (KernelParameters.scala:347-354)."""

    def __init__(self, minimum: float, maximum: float):
        self.minimum = float(minimum)
        self.maximum = float(maximum)

    def forward(self, u):
        return nn.sigmoid(u) * (self.maximum - self.minimum) + self.minimum

    def inverse(self, c):
        p = (c - self.minimum) / (self.maximum - self.minimum)
        return jnp.log(p) - jnp.log1p(-p)

    def log_det_jacobian(self, u):
        # log((max-min) * sigmoid(u) * sigmoid(-u)); numerically stable form.
        return (
            jnp.log(self.maximum - self.minimum)
            - nn.softplus(-u)
            - nn.softplus(u)
        )


class Softplus(Bijector):
    """``c = log1p(exp(u))`` — the reference exposes ``softplus``
    (KernelParameters.scala:329-330) but never uses it; offered as a
    better-conditioned alternative to exp for positive parameters."""

    def forward(self, u):
        return nn.softplus(u)

    def inverse(self, c):
        # inverse-softplus: log(exp(c) - 1), stable for large c
        return c + jnp.log(-jnp.expm1(-c))

    def log_det_jacobian(self, u):
        return -nn.softplus(-u)


def logistic(x):
    """KernelParameters.scala:323-324."""
    return nn.sigmoid(x)


def logit(p):
    """KernelParameters.scala:326-327."""
    return jnp.log(p) - jnp.log1p(-p)


def softplus(x):
    """KernelParameters.scala:329-330."""
    return nn.softplus(x)


identity = Identity()
positive = BoundedBelow(0.0)
