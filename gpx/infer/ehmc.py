"""Empirical HMC (Wu et al.): no hand-tuning of step size or path length.

Rebuild of ``Ehmc`` (core/src/main/scala/gp/Ehmc.scala): dual-averaging
warmup picks the step size, a second warmup phase measures the distribution
of U-turn-free trajectory lengths, and the main chain draws its leapfrog
count from that empirical distribution each iteration.

TPU shape: the U-turn search is a capped ``lax.while_loop``, the length
distribution is a ``(k,)`` device array, and the main chain's per-iteration
leapfrog count is a *traced* ``fori_loop`` bound — one compiled program for
warmup + measurement + sampling. Reference quirks fixed (SURVEY.md §7):
``Ehmc.sample`` shadows its mass-matrix argument with the identity
(Ehmc.scala:111) and consumes a log step size as if it were linear
(Ehmc.scala:112-114 with DualAveraging.scala:121-125); the MH-corrected
proposal here always integrates exactly ``l0`` steps, so detailed balance
holds (the reference sometimes integrates ``l0 - l`` steps from the wrong
state, Ehmc.scala:64-68).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random

from gpx.infer import base, dual_averaging, hmc


def is_u_turn(q0, q, p):
    """(q - q0) . p < 0, NaN-guarded — Ehmc.isUTurn (Ehmc.scala:9-26)."""
    out = jnp.sum((q - q0) * p)
    return jnp.where(jnp.isnan(out), True, out < 0.0)


def longest_batch_step(key, state: hmc.HMCState, vag, eps, l0: int, l_max: int, mass):
    """One fixed-``l0`` HMC transition that *also* measures the U-turn-free
    trajectory length (Ehmc.longestBatch + longestBatchStep,
    Ehmc.scala:28-78). Returns ``(new_state, length)``."""
    inv_mass = 1.0 if mass is None else 1.0 / mass
    std = 1.0 if mass is None else jnp.sqrt(mass)
    k_mom, k_acc = random.split(key)
    q0 = state.position
    p0 = std * random.normal(k_mom, q0.shape, q0.dtype)

    def one_leap(q, p, g):
        p_half = p + 0.5 * eps * g
        q_new = q + eps * (inv_mass * p_half)
        lp_new, g_new = vag(q_new)
        return q_new, p_half + 0.5 * eps * g_new, g_new, lp_new

    class Carry(NamedTuple):
        q: jnp.ndarray
        p: jnp.ndarray
        g: jnp.ndarray
        lp: jnp.ndarray
        prop_q: jnp.ndarray
        prop_p: jnp.ndarray
        prop_g: jnp.ndarray
        prop_lp: jnp.ndarray
        turned: jnp.ndarray
        length: jnp.ndarray
        step: jnp.ndarray

    def cond(c: Carry):
        return (c.step < l0) | (~c.turned & (c.step < l_max))

    def body(c: Carry):
        q, p, g, lp = one_leap(c.q, c.p, c.g)
        step = c.step + 1
        at_l0 = step == l0
        turn_now = ~c.turned & is_u_turn(q0, q, p)
        return Carry(
            q=q,
            p=p,
            g=g,
            lp=lp,
            prop_q=jnp.where(at_l0, q, c.prop_q),
            prop_p=jnp.where(at_l0, p, c.prop_p),
            prop_g=jnp.where(at_l0, g, c.prop_g),
            prop_lp=jnp.where(at_l0, lp, c.prop_lp),
            turned=c.turned | turn_now,
            length=jnp.where(turn_now, step, c.length),
            step=step,
        )

    init = Carry(
        q=q0,
        p=p0,
        g=state.grad,
        lp=state.log_prob,
        prop_q=q0,
        prop_p=p0,
        prop_g=state.grad,
        prop_lp=state.log_prob,
        turned=jnp.asarray(False),
        length=jnp.asarray(l_max, jnp.int32),
        step=jnp.asarray(0, jnp.int32),
    )
    c = lax.while_loop(cond, body, init)

    log_a = hmc.log_acceptance(c.prop_lp, c.prop_p, state.log_prob, p0, inv_mass)
    accept = jnp.log(random.uniform(k_acc)) < log_a
    new_state = hmc.HMCState(
        position=jnp.where(accept, c.prop_q, state.position),
        log_prob=jnp.where(accept, c.prop_lp, state.log_prob),
        grad=jnp.where(accept, c.prop_g, state.grad),
        accepted=state.accepted + accept.astype(jnp.int32),
    )
    return new_state, c.length


def empirical_lengths(key, state, vag, eps, l0: int, k: int, l_max: int, mass):
    """Distribution of U-turn-free lengths over ``k`` warmup transitions —
    Ehmc.empiricalLongestStep (Ehmc.scala:85-99)."""

    def body(s, kk):
        s2, length = longest_batch_step(kk, s, vag, eps, l0, l_max, mass)
        return s2, length

    state, lengths = lax.scan(body, state, random.split(key, k))
    return state, lengths


def sample(
    log_posterior: Callable,
    init_position,
    key,
    n_samples: int,
    *,
    l0: int = 10,
    warmup_iters: int = 1000,
    k: int = 2000,
    l_max: int = 1024,
    burn_in: int = 0,
    thin: int = 1,
    mass=None,
    collect=lambda s: s.position,
):
    """Full eHMC pipeline (Ehmc.sample, Ehmc.scala:101-123): dual-averaging
    step-size warmup -> empirical length measurement -> main chain drawing
    leapfrog counts from the measured distribution."""
    vag = jax.value_and_grad(log_posterior)
    k_wu, k_len, k_main = random.split(key, 3)

    eps, position = dual_averaging.warmup(
        k_wu, init_position, log_posterior, warmup_iters, l0, mass=mass
    )
    state = hmc.init(position, log_posterior)
    state, lengths = empirical_lengths(k_len, state, vag, eps, l0, k, l_max, mass)

    def step(kk, s):
        k_idx, k_hmc = random.split(kk)
        idx = random.randint(k_idx, (), 0, k)
        l = lengths[idx]
        return hmc._step(k_hmc, s, vag, eps, l, mass)[0]

    result = base.sample(
        step,
        hmc.HMCState(state.position, state.log_prob, state.grad, jnp.zeros((), jnp.int32)),
        k_main,
        n_samples,
        burn_in=burn_in,
        thin=thin,
        collect=collect,
    )
    return result, {"eps": eps, "lengths": lengths}
