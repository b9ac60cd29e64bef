"""Nesterov dual-averaging step-size adaptation (NUTS-paper scheme, δ=0.65).

Rebuild of ``DualAverage`` (core/src/main/scala/gp/DualAveraging.scala) as a
single ``lax.scan`` warmup. Two reference bugs are deliberately fixed
(SURVEY.md §7):

* the reference constructs ``DualAverageState`` with fields out of order
  (``hm`` passed where ``logeps`` belongs, DualAveraging.scala:64); and
* ``tuneStepsize`` returns ``logepsbar`` — a *log* step size — which
  ``Ehmc.sample`` then uses directly as ``eps`` (DualAveraging.scala:121-125,
  Ehmc.scala:112-114). Here warmup returns ``eps = exp(logepsbar)``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random

from gpx.infer import hmc


class DAState(NamedTuple):
    """DualAverageState (DualAveraging.scala:7-11), minus the chain position."""

    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray


def update_eps(m, mu, delta, accept_prob, s: DAState, k=0.75, gamma=0.05, t0=10.0):
    """DualAverage.updateEps (DualAveraging.scala:26-46)."""
    md = m.astype(jnp.result_type(float))
    ra = 1.0 / (md + t0)
    h_bar = (1.0 - ra) * s.h_bar + ra * (delta - accept_prob)
    log_eps = mu - (jnp.sqrt(md) * h_bar) / gamma
    power = md ** (-k)
    log_eps_bar = power * log_eps + (1.0 - power) * s.log_eps_bar
    return DAState(log_eps=log_eps, log_eps_bar=log_eps_bar, h_bar=h_bar)


def find_reasonable_epsilon(key, position, log_posterior, mass=None,
                            force_log_posterior=None):
    """DualAverage.findReasonableEpsilon (DualAveraging.scala:70-100): double
    or halve ``eps`` until the one-step acceptance crosses 1/2.
    ``force_log_posterior``: surrogate-force mode (see hmc.kernel) — the
    trial steps integrate the surrogate gradient but the acceptance is
    measured on the exact density."""
    if force_log_posterior is None:
        vag = jax.value_and_grad(log_posterior)
        lp0, grad0 = vag(position)
        value_fn = None
    else:
        vag = jax.value_and_grad(force_log_posterior)
        lp0 = log_posterior(position)
        grad0 = jax.grad(force_log_posterior)(position)
        value_fn = log_posterior
    inv_mass = 1.0 if mass is None else 1.0 / mass
    std = 1.0 if mass is None else jnp.sqrt(mass)
    p0 = std * random.normal(key, position.shape, position.dtype)

    def log_accept(eps):
        q1, p1, _, lp1 = hmc.leapfrog(vag, position, p0, grad0, eps, 1,
                                      inv_mass)
        if value_fn is not None:
            lp1 = value_fn(q1)
        return hmc.log_acceptance(lp1, p1, lp0, p0, inv_mass)

    eps0 = jnp.asarray(1.0, position.dtype)
    a = jnp.where(log_accept(eps0) > jnp.log(0.5), 1.0, -1.0)

    def cond(carry):
        eps, count = carry
        return (a * log_accept(eps) > -a * jnp.log(2.0)) & (count < 100)

    def body(carry):
        eps, count = carry
        return eps * (2.0**a), count + 1

    eps, _ = lax.while_loop(cond, body, (eps0, jnp.asarray(0)))
    return eps


def _da_body(vag, value_fn, mu, delta, mass, l0):
    """Scan body of :func:`warmup` — one HMC transition + one dual-average
    update. Factored out so the host-chunked sampler driver
    (gpx.infer.mcmc._sample_hmc_chunked) can run the SAME body in bounded
    device launches with ``mu``/``mass`` as traced jit arguments (they
    differ per chain, so they must not be baked into a shared program)."""

    def body(carry, inp):
        m, k = inp
        hstate, da = carry
        hstate2, log_a = hmc._step(k, hstate, vag, jnp.exp(da.log_eps), l0,
                                   mass, value_fn=value_fn)
        accept_prob = jnp.minimum(1.0, jnp.exp(log_a))
        da2 = update_eps(m, mu, delta, accept_prob, da)
        return (hstate2, da2), None

    return body


def warmup(
    key,
    position,
    log_posterior: Callable,
    n_warmup: int,
    l0: int,
    *,
    delta: float = 0.65,
    mass=None,
    force_log_posterior: Callable | None = None,
):
    """DualAverage.tuneStepsize (DualAveraging.scala:108-126) as one scan.

    Returns ``(eps, warmed_position)`` — the adapted step size (corrected to
    ``exp(logepsbar)``) and the post-warmup chain position, so sampling
    resumes from the warmed state instead of re-starting cold.
    ``force_log_posterior``: surrogate-force mode (see hmc.kernel) — the
    warmup chain then adapts on the SAME transition kernel sampling will
    use (surrogate leapfrogs, exact accepts), so the tuned eps reflects
    the force mismatch it will face.
    """
    k_eps, k_scan = random.split(key)
    eps0 = find_reasonable_epsilon(k_eps, position, log_posterior, mass,
                                   force_log_posterior)
    mu = jnp.log(10.0 * eps0)
    hmc_state = hmc.init(position, log_posterior, force_log_posterior)
    da = DAState(
        log_eps=jnp.log(eps0),
        log_eps_bar=jnp.zeros_like(eps0),
        h_bar=jnp.zeros_like(eps0),
    )
    if force_log_posterior is None:
        vag = jax.value_and_grad(log_posterior)
        value_fn = None
    else:
        vag = jax.value_and_grad(force_log_posterior)
        value_fn = log_posterior

    body = _da_body(vag, value_fn, mu, delta, mass, l0)

    ms = jnp.arange(1, n_warmup + 1)
    keys = random.split(k_scan, n_warmup)
    (hstate, da), _ = lax.scan(body, (hmc_state, da), (ms, keys))
    return jnp.exp(da.log_eps_bar), hstate.position


def window_warmup(
    key,
    position,
    log_posterior: Callable,
    *,
    l0: int = 10,
    init_window: int = 150,
    mass_window: int = 300,
    final_window: int = 150,
    delta: float = 0.65,
    force_log_posterior: Callable | None = None,
):
    """Stan-style windowed warmup: dual-average the step size with unit mass,
    estimate a diagonal mass matrix from a sampling window (momentum
    precision = posterior variance), then re-tune the step size under the
    adapted metric. Beyond the reference, whose HMC takes a fixed mass
    matrix and then ignores it in the kinetic energy (Hmc.scala:59-68).

    Returns ``(eps, mass, position)``.
    """
    k1, k2, k3 = random.split(key, 3)
    eps0, position = warmup(k1, position, log_posterior, init_window, l0,
                            delta=delta,
                            force_log_posterior=force_log_posterior)

    if force_log_posterior is None:
        vag = jax.value_and_grad(log_posterior)
        value_fn = None
    else:
        vag = jax.value_and_grad(force_log_posterior)
        value_fn = log_posterior
    state = hmc.init(position, log_posterior, force_log_posterior)

    def body(s, kk):
        s2, _ = hmc._step(kk, s, vag, eps0, l0, None, value_fn=value_fn)
        return s2, s2.position

    state, draws = lax.scan(body, state, random.split(k2, mass_window))
    var = jnp.var(draws, axis=0) + 1e-6
    mass = 1.0 / var  # momentum ~ N(0, M); M^{-1} ≈ posterior covariance

    eps, position = warmup(k3, state.position, log_posterior, final_window,
                           l0, delta=delta, mass=mass,
                           force_log_posterior=force_log_posterior)
    return eps, mass, position
