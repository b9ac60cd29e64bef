"""Cholesky factorization and triangular solves.

The reference reaches LAPACK ``dpotrf`` via Breeze ``cholesky``
(GaussianProcess.scala:123, Predict.scala:69, MeanParameters.scala:86,98) and
BLAS ``dtrsv``/``dtrsm`` via hand-wrapped netlib calls
(Predict.forwardSolve, Predict.scala:40-45; Mcmc.backSolve, Mcmc.scala:35-58).
On TPU these map to XLA's blocked ``lax.linalg`` kernels, which tile onto the
MXU; the crucial structural change is *batching*: the reference's predict
path calls ``dtrsv`` once per test point (O(M N^2), Predict.scala:71-93) —
here a single ``trsm`` with an (N, M) RHS does all test points in one MXU
pass (see gpx.models.gp.predict).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular


def cholesky(a):
    """Lower Cholesky factor of an SPD matrix."""
    return lax.linalg.cholesky(a)


def forward_solve(l, b):
    """Solve ``L x = b`` with lower-triangular ``L`` — Predict.forwardSolve
    (Predict.scala:40-45). ``b`` may be a vector or a matrix of RHS columns
    (the batched-trsm upgrade of the reference's per-vector dtrsv)."""
    return solve_triangular(l, b, lower=True)


def back_solve(u, b):
    """Solve ``U x = b`` with upper-triangular ``U`` — Mcmc.backSolve
    (Mcmc.scala:35-58), vector or matrix RHS."""
    return solve_triangular(u, b, lower=False)


def cho_solve(l, b):
    """Solve ``(L L^T) x = b`` given the lower Cholesky factor — replaces the
    reference's generic ``kxx \\ ys`` LAPACK solves (GaussianProcess.scala:184)
    without ever forming ``K^{-1}``."""
    return solve_triangular(
        l, solve_triangular(l, b, lower=True), lower=True, trans=1
    )


def logdet_from_chol(l):
    """``log det K = 2 sum log diag(L)``; the loglikelihood uses the
    half-logdet ``sum log diag(L)`` directly (GaussianProcess.scala:126)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)), axis=-1)


def add_jitter(a, jitter):
    """``a + jitter * I`` — the reference's nugget discipline
    (1e-3: GaussianProcess.scala:71,117; 1e-6: Predict.scala:67)."""
    return a + jitter * jnp.eye(a.shape[-1], dtype=a.dtype)
