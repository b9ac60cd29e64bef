"""Failure detection: Cholesky of near-singular Grams with nugget escalation.

SURVEY.md §5: the reference has no failure handling beyond thrown exceptions
and a NaN guard in the HMC accept step (Hmc.scala:84). On TPU a failed
``cholesky`` returns NaNs instead of raising, so the detection must be
value-based and branchless: factorize, test the result, escalate the
Tikhonov nugget by 10x and retry — all inside ``jit`` via ``lax.scan`` over
a fixed escalation ladder (no data-dependent Python control flow).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from gpx.ops.chol import cholesky


class SafeCholResult(NamedTuple):
    chol: jnp.ndarray
    nugget_used: jnp.ndarray   # scalar: the nugget that succeeded
    failed: jnp.ndarray        # True if even the largest nugget failed


def chol_ok(l):
    """A factorization succeeded iff every diagonal entry is finite and
    positive (XLA cholesky emits NaNs on non-PSD input)."""
    d = jnp.diagonal(l, axis1=-2, axis2=-1)
    return jnp.all(jnp.isfinite(l)) & jnp.all(d > 0)


def safe_cholesky(
    k,
    *,
    base_nugget: float = 0.0,
    max_escalations: int = 6,
    start: float = 1e-8,
) -> SafeCholResult:
    """Cholesky with automatic nugget escalation.

    Tries ``base_nugget``, then ``start * 10^i`` for i < max_escalations,
    keeping the first success. Runs as one compiled scan: each rung only
    pays its factorization if every previous rung failed (``lax.cond``).
    """
    n = k.shape[-1]
    eye = jnp.eye(n, dtype=k.dtype)
    nuggets = jnp.concatenate([
        jnp.asarray([base_nugget], dtype=k.dtype),
        start * (10.0 ** jnp.arange(max_escalations, dtype=k.dtype)),
    ])

    def rung(carry, nugget):
        l_best, found, used = carry

        def attempt(_):
            l_try = cholesky(k + nugget * eye)
            ok = chol_ok(l_try)
            return (
                jnp.where(ok, l_try, l_best),
                ok,
                jnp.where(ok, nugget, used),
            )

        carry = lax.cond(found, lambda _: carry, attempt, None)
        return carry, None

    init = (jnp.full_like(k, jnp.nan), jnp.asarray(False), jnp.asarray(jnp.nan, k.dtype))
    (l, found, used), _ = lax.scan(rung, init, nuggets)
    return SafeCholResult(chol=l, nugget_used=used, failed=~found)
