"""Sparse GP regression with inducing points (Titsias SGPR).

Beyond the reference: the collapsed variational bound makes exact-flavoured
GP regression O(N M^2) for M inducing points — the classic alternative to
the dense (gpx.models.gp) and matrix-free (gpx.models.gp_iterative) paths
when N is large but the function is simple. Everything is differentiable:
the bound trains kernel hyperparameters AND inducing locations with
``jax.grad``; all heavy ops are (N, M) / (M, M) matmuls that map straight
onto the MXU.

Stable formulation (the standard one):
  Luu = chol(Kuu + jitter I)
  A   = Luu^{-1} Kuf / sigma
  B   = I + A A^T,  LB = chol(B)
  c   = LB^{-1} (A err) / sigma
  elbo = -N/2 log(2 pi sigma^2) - sum log diag(LB)
         - ||err||^2/(2 sigma^2) + ||c||^2/2
         - tr(Kff)/(2 sigma^2) + tr(A A^T)/2
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpx.ops.chol import cholesky, forward_solve
from gpx.ops.distance import as_locations
from gpx.params import Parameters

JITTER = 1e-6          # f64 lane
JITTER_F32 = 1e-4      # f32 needs ~eps-scaled regularization: near-duplicate
                       # inducing points make Kuu singular beyond f32 at 1e-6
                       # (measured: NaN Cholesky on chip with 64 inducing
                       # points drawn from 4096 clustered training inputs)


def _jitter(dtype) -> float:
    return JITTER if jnp.finfo(dtype).bits >= 64 else JITTER_F32


def _common(params: Parameters, z, x, y, noise):
    x = as_locations(x)
    z = as_locations(z)
    n = x.shape[0]
    m = z.shape[0]
    sigma = jnp.sqrt(noise)

    kuu = params.kernel.gram(z, nugget=_jitter(z.dtype))
    kuf = params.kernel.gram(z, x)                 # (M, N)
    luu = cholesky(kuu)
    err = y - params.mean(x)

    a = forward_solve(luu, kuf) / sigma            # (M, N)
    # HIGHEST: SPD build ahead of a Cholesky — the TPU's single-pass bf16
    # matmul default (5.8e-4 rel) erodes definiteness; M is small so the
    # f32-faithful contraction is free
    b = jnp.eye(m, dtype=a.dtype) + jnp.matmul(
        a, a.T, precision=jax.lax.Precision.HIGHEST
    )
    lb = cholesky(b)
    aerr = a @ err
    c = forward_solve(lb, aerr) / sigma            # (M,)
    return x, z, n, sigma, luu, lb, a, c, err


def elbo(params: Parameters, z, x, y, *, noise: float):
    """Collapsed variational lower bound on the exact logML. Equals the
    exact marginal likelihood when the inducing points cover the data
    (``z = x``); always a lower bound otherwise."""
    x, z, n, sigma, luu, lb, a, c, err = _common(params, z, x, y, noise)
    kff_diag = params.kernel.diag(x, dtype=err.dtype)
    bound = (
        -0.5 * n * jnp.log(2.0 * jnp.pi * sigma**2)
        - jnp.sum(jnp.log(jnp.diagonal(lb)))
        - 0.5 * (err @ err) / sigma**2
        + 0.5 * (c @ c)
        - 0.5 * jnp.sum(kff_diag) / sigma**2
        + 0.5 * jnp.sum(a * a)
    )
    return bound


class SparseSummary(NamedTuple):
    x: jnp.ndarray
    mean: jnp.ndarray
    variance: jnp.ndarray


def fit(params: Parameters, z, x, y, xs, *, noise: float) -> SparseSummary:
    """Approximate posterior at test points ``xs`` (O(N M^2 + M^2 S))."""
    x, z, n, sigma, luu, lb, a, c, err = _common(params, z, x, y, noise)
    xs = as_locations(xs)
    kus = params.kernel.gram(z, xs)                # (M, S)
    tmp1 = forward_solve(luu, kus)                 # Luu^{-1} Kus
    tmp2 = forward_solve(lb, tmp1)                 # LB^{-1} ...
    mean = params.mean(xs) + tmp2.T @ c
    kss = params.kernel.diag(xs, dtype=mean.dtype)
    var = jnp.maximum(
        kss - jnp.sum(tmp1 * tmp1, axis=0) + jnp.sum(tmp2 * tmp2, axis=0),
        0.0,
    )
    return SparseSummary(x=xs, mean=mean, variance=var)


def init_inducing(key, x, m: int):
    """Random data subset as initial inducing locations."""
    from jax import random

    x = as_locations(x)
    idx = random.choice(key, x.shape[0], (m,), replace=False)
    return x[idx]
