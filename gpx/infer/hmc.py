"""Hamiltonian Monte Carlo with a fori_loop leapfrog integrator.

Rebuild of ``Hmc`` (core/src/main/scala/gp/Hmc.scala). Differences from the
reference, on purpose:

* gradients come from one jitted ``jax.value_and_grad`` of the log-posterior
  (the reference calls a separate hand-derived ``mllGradient`` per half-step,
  KernelParameters.scala:137-144 — with known sign bugs, SURVEY.md §7);
* the leapfrog caches the gradient between steps (the reference re-evaluates
  it twice per step, Hmc.scala:30-39);
* the kinetic energy honours the mass matrix: the reference draws momentum
  from ``N(0, M)`` but computes ``0.5 * p.p`` regardless of ``M``
  (Hmc.scala:59-68) — correct only for ``M = I``. Here ``M`` is a diagonal
  mass vector used consistently (draw ``N(0, M)``, kinetic
  ``0.5 p^T M^{-1} p``).
* the trajectory length ``l`` may be a traced value (lowered to a while
  loop), which is what eHMC's empirically drawn lengths need.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random


class HMCState(NamedTuple):
    position: jnp.ndarray    # flat unconstrained vector
    log_prob: jnp.ndarray
    grad: jnp.ndarray
    accepted: jnp.ndarray


def init(position, log_posterior, force_log_posterior=None) -> HMCState:
    """``force_log_posterior`` (optional): a surrogate whose gradient
    drives the leapfrog while ``log_posterior`` supplies the (exact)
    accept-ratio values — see :func:`kernel`."""
    if force_log_posterior is None:
        lp, g = jax.value_and_grad(log_posterior)(position)
    else:
        lp = log_posterior(position)
        g = jax.grad(force_log_posterior)(position)
    return HMCState(position, lp, g, jnp.zeros((), jnp.int32))


def leapfrog(value_and_grad_fn, q, p, grad, eps, l, inv_mass):
    """``l`` leapfrog steps (Hmc.leapfrogs, Hmc.scala:44-56), one gradient
    evaluation per step instead of two."""

    def body(_, carry):
        q, p, grad, _ = carry
        p_half = p + 0.5 * eps * grad
        q_new = q + eps * (inv_mass * p_half)
        lp_new, grad_new = value_and_grad_fn(q_new)
        p_new = p_half + 0.5 * eps * grad_new
        return q_new, p_new, grad_new, lp_new

    lp0 = jnp.asarray(-jnp.inf, q.dtype)
    return lax.fori_loop(0, l, body, (q, p, grad, lp0))


def _kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * p * inv_mass)


def log_acceptance(lp_prop, p_prop, lp0, p0, inv_mass):
    """Hmc.logAcceptance with the NaN guard (Hmc.scala:78-85)."""
    a = (lp_prop - _kinetic(p_prop, inv_mass)) - (lp0 - _kinetic(p0, inv_mass))
    a = jnp.where(jnp.isnan(a), -jnp.inf, a)
    return jnp.minimum(a, 0.0)


def kernel(
    log_posterior: Callable,
    eps,
    l,
    mass: jnp.ndarray | None = None,
    force_log_posterior: Callable | None = None,
):
    """One HMC transition ``(key, HMCState) -> HMCState`` (Hmc.step,
    Hmc.scala:87-105). ``eps`` and ``l`` may be traced (eHMC draws ``l``
    per-iteration; dual averaging adapts ``eps``).

    ``force_log_posterior`` (optional): a cheaper surrogate whose GRADIENT
    drives the leapfrog, while the Metropolis accept evaluates the exact
    ``log_posterior`` — exact-stationarity HMC at surrogate-gradient cost
    (round 5, VERDICT Next-4). Valid for ANY deterministic position-
    dependent force field: the leapfrog map stays volume-preserving and
    reversible whether or not the force is ∇log π, so the exact-π accept
    keeps π invariant; only the ACCEPT RATE pays for force mismatch (the
    energy drift along a trajectory is no longer O(eps^3) but
    O(l·eps·|∇logπ - force|)). The intended surrogate is the fixed-probe-
    key hybrid gradient (gp.log_marginal_likelihood_hybrid_vjp), whose
    probe noise is a deterministic function of position."""
    vag = jax.value_and_grad(log_posterior)
    value_fn = None
    if force_log_posterior is not None:
        vag = jax.value_and_grad(force_log_posterior)
        value_fn = log_posterior

    def step(key, state: HMCState) -> HMCState:
        return _step(key, state, vag, eps, l, mass, value_fn=value_fn)[0]

    return step


def _step(key, state: HMCState, vag, eps, l, mass, value_fn=None):
    """One transition; returns ``(new_state, log_acceptance)`` — the
    log-acceptance feeds dual-averaging adaptation. ``value_fn`` (optional)
    re-evaluates the accept-ratio log-density at the proposal endpoint
    (the surrogate-force mode of :func:`kernel`: ``vag`` is then the
    surrogate and its carried values are ignored)."""
    inv_mass = 1.0 if mass is None else 1.0 / mass
    k_mom, k_acc = random.split(key)
    std = 1.0 if mass is None else jnp.sqrt(mass)
    p0 = std * random.normal(k_mom, state.position.shape, state.position.dtype)

    q_new, p_new, grad_new, lp_new = leapfrog(
        vag, state.position, p0, state.grad, eps, l, inv_mass
    )
    # lp at q_new is carried by leapfrog (exact mode) or re-evaluated on
    # the exact density (surrogate-force mode: ONE exact value per
    # trajectory instead of one per leapfrog step)
    if value_fn is not None:
        lp_new = value_fn(q_new)
    log_a = log_acceptance(lp_new, p_new, state.log_prob, p0, inv_mass)
    accept = jnp.log(random.uniform(k_acc)) < log_a

    new_state = HMCState(
        position=jnp.where(accept, q_new, state.position),
        log_prob=jnp.where(accept, lp_new, state.log_prob),
        grad=jnp.where(accept, grad_new, state.grad),
        accepted=state.accepted + accept.astype(jnp.int32),
    )
    return new_state, log_a
