"""Conjugate Gibbs updates: plane-mean coefficients and noise precision.

Rebuilds ``MeanParameters.samplePlane`` (MeanParameters.scala:74-103) and
``KernelParameters.samplePrecY`` (KernelParameters.scala:209-222).

Correctness divergences from the reference (documented; SURVEY.md §7):

* samplePlane: the full-conditional mean must use ``X^T K^{-1} y``; the
  reference uses ``X^T L^{-1} y`` (one triangular solve short,
  MeanParameters.scala:96-99), and draws with ``chol(prec) \\ z`` where the
  correct root is ``chol(prec)^{-T} z`` (MeanParameters.scala:98-101). Both
  fixed here — the update below is the standard GLS conjugate posterior.
* samplePrecY: the Gamma "scale" update ``scale + ssy/2`` is a *rate* update;
  gpx's Gamma is rate-parameterized so the conjugacy is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random

from gpx.distributions import Gamma, Normal
from gpx.means import Plane, design_matrix
from gpx.ops.chol import back_solve, cholesky, forward_solve
from gpx.params import Parameters
from gpx.utils.pytree import tree_replace


def sample_plane(key, prior: Normal, x, y, params: Parameters, *, nugget=1e-6):
    """Draw plane-mean coefficients from their GLS full conditional.

    beta | y ~ N(A^{-1} b, A^{-1}) with
    A = X^T K^{-1} X + P0,  b = P0 m0 + X^T K^{-1} y,
    where P0 = I / prior.scale^2 and m0 = prior.loc (the reference's
    elementwise iid Gaussian prior, MeanParameters.scala:88-97).
    """
    from gpx.ops.distance import as_locations

    x = as_locations(x)
    xd = design_matrix(x)
    q = xd.shape[-1]
    kxx = params.kernel.gram(x, nugget=nugget)
    l = cholesky(kxx)

    w = forward_solve(l, xd)       # L^{-1} X
    u = forward_solve(l, y)        # L^{-1} y
    prior_prec = jnp.eye(q, dtype=kxx.dtype) / (prior.scale**2)
    # HIGHEST: the conjugate precision is Cholesky-factored next — TPU's
    # bf16 default matmul (5.8e-4 rel) is too loose for a (q, q) SPD build
    hi = jax.lax.Precision.HIGHEST
    prec = jnp.matmul(w.T, w, precision=hi) + prior_prec  # X^T K^{-1} X + P0
    b = prior_prec @ (prior.loc * jnp.ones(q, dtype=kxx.dtype)) + jnp.matmul(
        w.T, u, precision=hi
    )

    l_prec = cholesky(prec)
    mean = back_solve(l_prec.T, forward_solve(l_prec, b))
    z = random.normal(key, (q,), dtype=kxx.dtype)
    beta = mean + back_solve(l_prec.T, z)  # cov = prec^{-1}
    return Plane(beta=beta)


def sample_mean(key, prior: Normal, x, y, params: Parameters, *, nugget=1e-6):
    """Gibbs update dispatcher — MeanParameters.sample
    (MeanParameters.scala:111-121): Plane means get the conjugate draw,
    Zero means pass through."""
    if isinstance(params.mean, Plane):
        return tree_replace(
            params, mean=sample_plane(key, prior, x, y, params, nugget=nugget)
        )
    return params


def sample_precision_y(key, prior: Gamma, y, fx):
    """Conjugate Gibbs draw of the observation noise *precision* given
    latent function values — KernelParameters.samplePrecY
    (KernelParameters.scala:209-222), with the rate-vs-scale fix."""
    ssy = jnp.sum((y - fx) ** 2)
    posterior = Gamma(
        concentration=prior.concentration + 0.5 * y.shape[-1],
        rate=prior.rate + 0.5 * ssy,
    )
    return posterior.sample(key), posterior
