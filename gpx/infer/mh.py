"""Metropolis-Hastings on unconstrained parameter space.

Rebuild of ``KernelParameters.sample`` / ``MarkovChain.Kernels.metropolis``
(KernelParameters.scala:231-246). The reference proposes with a log-scale
Gaussian random walk directly on constrained parameters
(SimulatedGp.scala:115-130) but uses a *symmetric*-proposal Metropolis kernel
— a multiplicative proposal is not symmetric, so the reference's chain has a
small systematic bias. Here the same move is expressed correctly: a symmetric
Gaussian random walk on *unconstrained* (log-transformed) parameters plus the
bijector log-Jacobian in the target density — exactly the intended log-scale
walk, with the right stationary distribution.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import random

from gpx import params as gparams


class MHState(NamedTuple):
    position: Any            # pytree (usually a flat unconstrained vector)
    log_prob: jnp.ndarray
    accepted: jnp.ndarray    # running acceptance count


def init(position, log_posterior) -> MHState:
    return MHState(
        position=position,
        log_prob=log_posterior(position),
        accepted=jnp.zeros((), jnp.int32),
    )


def gaussian_random_walk(scale):
    """Symmetric proposal ``q' = q + scale * z`` over any pytree position."""

    def propose(key, position):
        leaves, treedef = jax.tree_util.tree_flatten(position)
        keys = random.split(key, len(leaves))
        new = [
            l + scale * random.normal(k, jnp.shape(l), dtype=jnp.result_type(l))
            for k, l in zip(keys, leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, new)

    return propose


def kernel(log_posterior: Callable, proposal: Callable):
    """One MH transition ``(key, MHState) -> MHState``; NaN-guarded accept
    (the reference guards HMC the same way, Hmc.scala:84)."""

    def step(key, state: MHState) -> MHState:
        k_prop, k_accept = random.split(key)
        prop = proposal(k_prop, state.position)
        lp = log_posterior(prop)
        lp = jnp.where(jnp.isnan(lp), -jnp.inf, lp)
        log_alpha = lp - state.log_prob
        accept = jnp.log(random.uniform(k_accept)) < log_alpha
        position = jax.tree_util.tree_map(
            lambda p, q: jnp.where(accept, p, q), prop, state.position
        )
        return MHState(
            position=position,
            log_prob=jnp.where(accept, lp, state.log_prob),
            accepted=state.accepted + accept.astype(jnp.int32),
        )

    return step


def make_unconstrained_log_posterior(
    log_density: Callable, template, bij_tree=None
):
    """Lift a log-density over constrained parameter pytrees to a density
    over flat unconstrained vectors (+ Jacobian), the space every gradient
    and random-walk sampler here runs in (KernelParameters.scala:146-148's
    unconstrain-then-sample pattern, with the Jacobian term the reference's
    MH omits).

    Returns ``(log_posterior(flat) -> scalar, flat0, unravel)``.
    """
    if bij_tree is None:
        bij_tree = template.bijectors()
    u0 = gparams.unconstrain(bij_tree, template)
    flat0, unravel = gparams.unraveler(u0)

    def log_posterior(flat):
        u = unravel(flat)
        c = gparams.constrain(bij_tree, u)
        return log_density(c) + gparams.log_det_jacobian(bij_tree, u)

    return log_posterior, flat0, unravel
