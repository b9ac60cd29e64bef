"""No-U-Turn Sampler (iterative, multinomial) — beyond the reference.

The reference's answer to path-length tuning is empirical HMC
(Ehmc.scala); NUTS is the standard modern alternative, included here as a
TPU-shaped implementation: no recursion, all ``lax`` control flow, fixed
``max_depth``. Subtree U-turn checks use the checkpoint-stack trick of
iterative NUTS (Phan & Pradhan): leaf ``n`` of a subtree stores its state in
slot ``popcount(n)`` when ``n`` is even, and when leaf ``n`` completes every
power-of-two-aligned interval ending at ``n`` is checked against the slot of
its left endpoint — O(max_depth) memory, no tree data structure.

Sampling is progressive multinomial (Stan-style biased doubling): each new
subtree's proposal replaces the running one with probability
``exp(logw_subtree - logw_tree)``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random

from gpx.infer import base, dual_averaging, hmc


class NUTSState(NamedTuple):
    position: jnp.ndarray
    log_prob: jnp.ndarray
    grad: jnp.ndarray
    accepted: jnp.ndarray      # counts depth>0 transitions (diagnostics)
    depth: jnp.ndarray         # tree depth reached last transition (Stan treedepth)


def init(position, log_posterior) -> NUTSState:
    lp, g = jax.value_and_grad(log_posterior)(position)
    z = jnp.zeros((), jnp.int32)
    return NUTSState(position, lp, g, z, z)


def _popcount(n):
    def body(carry):
        n, c = carry
        return n >> 1, c + (n & 1)

    _, count = lax.while_loop(lambda s: s[0] > 0, lambda s: body(s), (n, 0))
    return count


def kernel(log_posterior: Callable, eps, max_depth: int = 10, mass=None):
    """One NUTS transition ``(key, NUTSState) -> NUTSState``."""
    vag = jax.value_and_grad(log_posterior)
    inv_mass = 1.0 if mass is None else 1.0 / mass
    std = 1.0 if mass is None else jnp.sqrt(mass)
    max_delta = 1000.0  # divergence threshold (Stan's default)

    def kinetic(p):
        return 0.5 * jnp.sum(p * p * inv_mass)

    def leapfrog(q, p, g, direction):
        e = eps * direction
        p_half = p + 0.5 * e * g
        q_new = q + e * (inv_mass * p_half)
        lp_new, g_new = vag(q_new)
        return q_new, p_half + 0.5 * e * g_new, g_new, lp_new

    def is_turn_dq(dq, p_a, p_b):
        """Generalized U-turn criterion given ``dq`` already oriented in
        trajectory-time order (time-later minus time-earlier position)."""
        turn = (jnp.dot(dq, inv_mass * p_a) < 0) | (jnp.dot(dq, inv_mass * p_b) < 0)
        return turn | jnp.isnan(jnp.dot(dq, p_a))

    def is_turn(q_minus, p_minus, q_plus, p_plus):
        return is_turn_dq(q_plus - q_minus, p_minus, p_plus)

    def step(key, state: NUTSState) -> NUTSState:
        dim = state.position.shape[0]
        k_mom, k_loop = random.split(key)
        p0 = std * random.normal(k_mom, (dim,), state.position.dtype)
        h0 = state.log_prob - kinetic(p0)

        # tree ends: (q, p, grad) for left (index 0) and right (index 1)
        ends_q = jnp.stack([state.position, state.position])
        ends_p = jnp.stack([p0, p0])
        ends_g = jnp.stack([state.grad, state.grad])

        class Carry(NamedTuple):
            key: jnp.ndarray
            ends_q: jnp.ndarray
            ends_p: jnp.ndarray
            ends_g: jnp.ndarray
            prop_q: jnp.ndarray
            prop_lp: jnp.ndarray
            prop_g: jnp.ndarray
            log_w: jnp.ndarray          # total tree weight (log)
            depth: jnp.ndarray
            done: jnp.ndarray

        def build_subtree(k, q, p, g, direction, depth):
            """2^depth leapfrogs from (q, p, g); returns subtree summary."""
            ck_q = jnp.zeros((max_depth + 1, dim), q.dtype)
            ck_p = jnp.zeros((max_depth + 1, dim), q.dtype)
            n_leaf = jnp.asarray(1, jnp.int32) << depth

            class Sub(NamedTuple):
                key: jnp.ndarray
                q: jnp.ndarray
                p: jnp.ndarray
                g: jnp.ndarray
                prop_q: jnp.ndarray
                prop_lp: jnp.ndarray
                prop_g: jnp.ndarray
                log_w: jnp.ndarray
                ck_q: jnp.ndarray
                ck_p: jnp.ndarray
                turning: jnp.ndarray
                diverging: jnp.ndarray

            def leaf_body(n, s: Sub):
                kk, k_sel = random.split(s.key)
                q1, p1, g1, lp1 = leapfrog(s.q, s.p, s.g, direction)
                w1 = lp1 - kinetic(p1) - h0
                w1 = jnp.where(jnp.isnan(w1), -jnp.inf, w1)
                diverging = s.diverging | (w1 < -max_delta)

                # progressive multinomial within the subtree
                log_w_new = jnp.logaddexp(s.log_w, w1)
                take = jnp.log(random.uniform(k_sel)) < (w1 - log_w_new)
                prop_q = jnp.where(take, q1, s.prop_q)
                prop_lp = jnp.where(take, lp1, s.prop_lp)
                prop_g = jnp.where(take, g1, s.prop_g)

                # checkpoint-stack U-turn checks
                slot = _popcount(n)
                even = (n & 1) == 0
                ck_q = jnp.where(even, s.ck_q.at[slot].set(q1), s.ck_q)
                ck_p = jnp.where(even, s.ck_p.at[slot].set(p1), s.ck_p)

                def check_body(carry):
                    j, turning = carry
                    aligned = ((n + 1) % (1 << j)) == 0
                    a = n + 1 - (1 << j)
                    a_slot = _popcount(a)
                    # Checkpoint ``a`` precedes leaf ``n`` in GENERATION
                    # order; for backward subtrees (direction = -1) that is
                    # time-REVERSED, so orient dq into trajectory-time order
                    # before the U-turn dot products (momenta are stored
                    # unsigned, so only dq needs the sign).
                    dq = direction * (q1 - ck_q[a_slot])
                    t = is_turn_dq(dq, ck_p[a_slot], p1)
                    return j + 1, turning | (aligned & t)

                def check_cond(carry):
                    j, _ = carry
                    return ((n + 1) % (1 << j)) == 0

                _, turning = lax.while_loop(
                    check_cond, check_body, (jnp.asarray(1, jnp.int32), s.turning)
                )
                return Sub(kk, q1, p1, g1, prop_q, prop_lp, prop_g,
                           log_w_new, ck_q, ck_p, turning, diverging)

            def leaf_cond_body(n, s: Sub):
                return lax.cond(
                    s.turning | s.diverging, lambda s_: s_,
                    lambda s_: leaf_body(n, s_), s,
                )

            init_sub = Sub(
                key=k, q=q, p=p, g=g,
                prop_q=q, prop_lp=jnp.asarray(-jnp.inf, q.dtype),
                prop_g=g, log_w=jnp.asarray(-jnp.inf, q.dtype),
                ck_q=ck_q, ck_p=ck_p,
                turning=jnp.asarray(False), diverging=jnp.asarray(False),
            )
            return lax.fori_loop(0, n_leaf, leaf_cond_body, init_sub)

        def doubling(c: Carry):
            k1, k2, k3, k4 = random.split(c.key, 4)
            go_right = random.bernoulli(k1)
            end_idx = jnp.where(go_right, 1, 0)
            direction = jnp.where(go_right, 1.0, -1.0).astype(c.ends_q.dtype)

            sub = build_subtree(
                k2, c.ends_q[end_idx], c.ends_p[end_idx], c.ends_g[end_idx],
                direction, c.depth,
            )
            valid = ~(sub.turning | sub.diverging)

            # biased progressive acceptance of the new subtree's proposal
            take = jnp.log(random.uniform(k3)) < (sub.log_w - c.log_w)
            take = take & valid
            prop_q = jnp.where(take, sub.prop_q, c.prop_q)
            prop_lp = jnp.where(take, sub.prop_lp, c.prop_lp)
            prop_g = jnp.where(take, sub.prop_g, c.prop_g)
            log_w = jnp.where(valid, jnp.logaddexp(c.log_w, sub.log_w), c.log_w)

            ends_q = jnp.where(valid, c.ends_q.at[end_idx].set(sub.q), c.ends_q)
            ends_p = jnp.where(valid, c.ends_p.at[end_idx].set(sub.p), c.ends_p)
            ends_g = jnp.where(valid, c.ends_g.at[end_idx].set(sub.g), c.ends_g)

            full_turn = is_turn(ends_q[0], ends_p[0], ends_q[1], ends_p[1])
            done = ~valid | full_turn
            return Carry(k4, ends_q, ends_p, ends_g, prop_q, prop_lp, prop_g,
                         log_w, c.depth + 1, done)

        init_carry = Carry(
            key=k_loop, ends_q=ends_q, ends_p=ends_p, ends_g=ends_g,
            prop_q=state.position, prop_lp=state.log_prob, prop_g=state.grad,
            log_w=jnp.zeros((), state.position.dtype),  # w(z0) = exp(0)
            depth=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
        )
        final = lax.while_loop(
            lambda c: (~c.done) & (c.depth < max_depth), doubling, init_carry
        )
        moved = jnp.any(final.prop_q != state.position)
        return NUTSState(
            position=final.prop_q,
            log_prob=final.prop_lp,
            grad=final.prop_g,
            accepted=state.accepted + moved.astype(jnp.int32),
            depth=final.depth,
        )

    return step


def sample(
    log_posterior: Callable,
    init_position,
    key,
    n_samples: int,
    *,
    max_depth: int = 10,
    eps: float | None = None,
    warmup_iters: int = 500,
    burn_in: int = 0,
    thin: int = 1,
    mass=None,
    adapt_mass: bool = False,
    collect=lambda s: s.position,
    warmup_log_posterior: Callable | None = None,
):
    """NUTS with optional dual-averaging step-size warmup.

    ``warmup_log_posterior``: cheaper surrogate driven ONLY during the
    warmup phase (e.g. the 2-pass fast-gradient GP likelihood,
    gpx.infer.mcmc ``fast_warmup``); the kept draws always target
    ``log_posterior``.

    ``adapt_mass=True`` runs the Stan-style windowed warmup instead
    (``dual_averaging.window_warmup``): eps with unit metric, a sampling
    window estimating a diagonal mass matrix (momentum precision =
    posterior variance), then eps re-tuned under the adapted metric —
    anisotropic GP posteriors (signal amplitude vs length-scale scales
    differing by orders of magnitude) tree-double poorly under a unit
    metric."""
    if adapt_mass and eps is not None:
        raise ValueError(
            "adapt_mass=True estimates the mass matrix during the "
            "dual-averaging warmup, which only runs when eps is None — "
            "pass eps=None (or drop adapt_mass and supply mass= directly)"
        )
    k_wu, k_main = random.split(key)
    position = jnp.asarray(init_position)
    lp_wu = log_posterior if warmup_log_posterior is None else (
        warmup_log_posterior
    )
    if eps is None and adapt_mass:
        third = max(warmup_iters // 3, 10)
        eps, mass, position = dual_averaging.window_warmup(
            k_wu, position, lp_wu,
            init_window=third, mass_window=third, final_window=third,
        )
    elif eps is None:
        eps, position = dual_averaging.warmup(
            k_wu, position, lp_wu, warmup_iters, 10, mass=mass
        )
    step = kernel(log_posterior, eps, max_depth=max_depth, mass=mass)
    result = base.sample(
        step, init(position, log_posterior), k_main, n_samples,
        burn_in=burn_in, thin=thin, collect=collect,
    )
    extras = {"eps": eps}
    if adapt_mass:
        extras["mass"] = mass
    return result, extras
