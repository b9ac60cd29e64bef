"""Sampler driver: chains as ``lax.scan`` loops, vmapped over a chains axis.

Replaces Breeze's lazy ``MarkovChain`` stream + the external
``Streaming.writeParallelChain`` 2-thread runner (SimulatedGp.scala:163-165)
with one compiled program: ``sample`` scans a transition kernel over
iterations (burn-in and thinning folded into the scan, nothing materialized
host-side), and ``sample_chains`` vmaps it over independent keys/inits so 4+
chains run as one XLA program (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random

# A transition kernel: (key, state) -> state, where state is any pytree.
TransitionKernel = Callable[[jax.Array, Any], Any]


class ChainResult(NamedTuple):
    samples: Any          # pytree stacked along a leading draws axis
    final_state: Any      # carry for checkpoint/resume
    accept_rate: jnp.ndarray


def sample(
    step: TransitionKernel,
    init_state,
    key,
    n_samples: int,
    *,
    burn_in: int = 0,
    thin: int = 1,
    collect: Callable[[Any], Any] = lambda s: s,
) -> ChainResult:
    """Run one chain: ``burn_in + n_samples * thin`` transitions, keeping
    every ``thin``-th post-burn-in state (the reference drops burn-in and
    thins at CSV-read time, Temperature.scala:137-141 — here it happens
    on-device so only kept draws ever leave HBM)."""

    def burn_body(state, k):
        return step(k, state), None

    def keep_body(state, k):
        def inner(s, kk):
            return step(kk, s), None

        state, _ = lax.scan(inner, state, random.split(k, thin))
        return state, collect(state)

    if burn_in > 0:
        kb, key = random.split(key)
        init_state, _ = lax.scan(burn_body, init_state, random.split(kb, burn_in))

    final, draws = lax.scan(keep_body, init_state, random.split(key, n_samples))
    accept = _accept_rate(final, burn_in + n_samples * thin)
    return ChainResult(samples=draws, final_state=final, accept_rate=accept)


def sample_chains(
    step: TransitionKernel,
    init_states,
    key,
    n_samples: int,
    n_chains: int,
    *,
    burn_in: int = 0,
    thin: int = 1,
    collect: Callable[[Any], Any] = lambda s: s,
    sequential: bool = False,
) -> ChainResult:
    """Run ``n_chains`` independent chains as ONE jit-compiled program
    (vmapped; ``sequential=True`` maps them back-to-back with ``lax.map``
    instead — right for big-N Pallas-path chains, see
    gpx.infer.mcmc._run_chains). The outer jit matters: an un-jitted vmap
    executes eagerly and pays the remote-dispatch round trip per
    primitive (round-3 measurement).

    ``init_states`` may be a single state (broadcast to all chains) or a
    pytree stacked along a leading chains axis (e.g. over-dispersed inits).
    Results have shape ``(n_chains, n_samples, ...)``.
    """
    leaves = jax.tree_util.tree_leaves(init_states)
    stacked = leaves and all(
        hasattr(l, "shape") and l.shape[:1] == (n_chains,) for l in leaves
    )
    if not stacked:
        init_states = jax.tree_util.tree_map(
            lambda l: jnp.broadcast_to(jnp.asarray(l), (n_chains, *jnp.shape(l))),
            init_states,
        )
    keys = random.split(key, n_chains)
    runner = lambda k, s: sample(
        step, s, k, n_samples, burn_in=burn_in, thin=thin, collect=collect
    )
    if sequential:
        return jax.jit(
            lambda ks, ss: lax.map(lambda t: runner(*t), (ks, ss))
        )(keys, init_states)
    return jax.jit(jax.vmap(runner))(keys, init_states)


def _accept_rate(state, n_steps: int):
    accepted = getattr(state, "accepted", None)
    if accepted is None:
        return jnp.asarray(jnp.nan)
    return accepted / n_steps
