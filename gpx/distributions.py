"""Probability distributions: log-pdfs, samplers, and gradient support.

Replaces the reference's dependency on Breeze distributions (``Gaussian``,
``Gamma``, ``Uniform``, ``MultivariateGaussian`` — build.sbt:64-72) and the
``GradDist`` wrapper that hand-attaches ``gradLogPdf`` for HMC priors
(core/src/main/scala/gp/GradDist.scala:5-24). Here ``grad_logpdf`` is just
``jax.grad`` of the log-pdf, so every distribution is HMC-ready for free.

Randomness: Breeze's global MersenneTwister ``RandBasis`` becomes explicit
``jax.random`` key plumbing (SURVEY.md §2.3).

Parameterization notes
----------------------
* ``Gamma(concentration, rate)``. Breeze's ``Gamma(shape, scale)`` is a
  scale parameterization; the reference's conjugate noise-precision update
  adds ``0.5 * ssy`` to the *scale* (KernelParameters.samplePrecY,
  KernelParameters.scala:209-222), which is only correct for a *rate*
  parameter — we use rate so the conjugate update is right.
* ``InverseGamma(concentration, scale)`` for DLM variance Gibbs steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random
from jax.scipy import special, stats

from gpx.utils.pytree import pytree_dataclass


def grad_logpdf(dist, x):
    """``d log p(x) / dx`` — the GradDist capability (GradDist.scala:5-24),
    via autodiff instead of hand-derived formulas."""
    return jax.grad(lambda v: jnp.sum(dist.logpdf(v)))(jnp.asarray(x, float))


@pytree_dataclass
class Normal:
    loc: jnp.ndarray
    scale: jnp.ndarray

    def logpdf(self, x):
        return stats.norm.logpdf(x, self.loc, self.scale)

    def sample(self, key, shape=()):
        return self.loc + self.scale * random.normal(key, shape)

    def ppf(self, q):
        """Inverse CDF — Summarise.getInterval (Summarise.scala:10-12)."""
        return self.loc + self.scale * special.ndtri(q)


@pytree_dataclass
class Gamma:
    """Gamma with shape ``concentration`` and ``rate`` (mean = conc / rate)."""

    concentration: jnp.ndarray
    rate: jnp.ndarray

    def logpdf(self, x):
        return stats.gamma.logpdf(x, self.concentration, scale=1.0 / self.rate)

    def sample(self, key, shape=()):
        return random.gamma(key, self.concentration, shape) / self.rate


@pytree_dataclass
class InverseGamma:
    """InverseGamma(concentration a, scale b): mean = b / (a - 1)."""

    concentration: jnp.ndarray
    scale: jnp.ndarray

    def logpdf(self, x):
        a, b = self.concentration, self.scale
        return a * jnp.log(b) - special.gammaln(a) - (a + 1.0) * jnp.log(x) - b / x

    def sample(self, key, shape=()):
        return self.scale / random.gamma(key, self.concentration, shape)


@pytree_dataclass
class Uniform:
    low: jnp.ndarray
    high: jnp.ndarray

    def logpdf(self, x):
        inside = (x >= self.low) & (x <= self.high)
        return jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)

    def sample(self, key, shape=()):
        return random.uniform(key, shape, minval=self.low, maxval=self.high)


@pytree_dataclass
class MultivariateNormal:
    """MVN parameterized by mean and lower Cholesky factor of the covariance
    (Cholesky-based draws replace the reference's eigendecomposition sampling,
    GaussianProcess.draw at GaussianProcess.scala:79-82; see SURVEY.md §2.3)."""

    mean: jnp.ndarray
    chol: jnp.ndarray

    @staticmethod
    def from_cov(mean, cov, jitter: float = 0.0):
        if jitter:
            cov = cov + jitter * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        return MultivariateNormal(mean=mean, chol=jnp.linalg.cholesky(cov))

    def logpdf(self, x):
        from jax.scipy.linalg import solve_triangular

        d = x - self.mean
        u = solve_triangular(self.chol, d, lower=True)
        n = self.mean.shape[-1]
        half_logdet = jnp.sum(jnp.log(jnp.diagonal(self.chol)))
        return -0.5 * u @ u - half_logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)

    def sample(self, key, shape=()):
        n = self.mean.shape[-1]
        z = random.normal(key, (*shape, n), dtype=self.chol.dtype)
        return self.mean + z @ self.chol.T


@pytree_dataclass
class StudentT:
    """Location-scale Student-t — the one-step forecast distribution of the
    conjugate DLM filter (``gpx.models.dlm.conjugate_filter``; the
    reference's held-out-sensor forecast, TemperatureDlm.scala:361-402,
    gets Student-t predictions from bayesian_dlms' conjugate filter)."""

    df: jnp.ndarray
    loc: jnp.ndarray
    scale: jnp.ndarray

    def logpdf(self, x):
        return stats.t.logpdf(x, self.df, self.loc, self.scale)

    def sample(self, key, shape=()):
        return self.loc + self.scale * random.t(key, self.df, shape)

    def cdf(self, x):
        """CDF via the regularized incomplete beta:
        ``F(t) = 1 - I_{df/(df+t^2)}(df/2, 1/2) / 2`` for ``t >= 0``."""
        z = (jnp.asarray(x, float) - self.loc) / self.scale
        w = special.betainc(0.5 * self.df, 0.5, self.df / (self.df + z * z))
        return jnp.where(z >= 0, 1.0 - 0.5 * w, 0.5 * w)

    def ppf(self, q):
        """Inverse CDF by bisection on :meth:`cdf` (jax.scipy has no
        ``betaincinv``): 90 halvings of a [-1e8, 1e8] standardized bracket
        reach ~f64 precision for any ``df >= 0.5`` and q in (1e-9, 1-1e-9);
        fully vectorized and jittable."""
        q = jnp.asarray(q, float)
        std = StudentT(df=self.df, loc=jnp.zeros_like(self.loc),
                       scale=jnp.ones_like(self.scale))
        shape = jnp.broadcast_shapes(
            q.shape, jnp.shape(self.df), jnp.shape(self.loc),
            jnp.shape(self.scale),
        )
        lo = jnp.full(shape, -1e8)
        hi = -lo

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            below = std.cdf(mid) < q
            return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 90, body, (lo, hi))
        return self.loc + self.scale * 0.5 * (lo + hi)


def student_t_interval(mean, scale, df, q):
    """Student-t inverse-CDF interval for the conjugate-filter forecasts —
    the t analog of :func:`normal_interval`."""
    mean, scale, df = (jnp.asarray(v, float) for v in (mean, scale, df))
    return StudentT(df=df, loc=mean, scale=scale).ppf(q)


def normal_interval(mean, variance, q):
    """Gaussian inverse-CDF interval — Summarise.getInterval
    (Summarise.scala:10-12)."""
    return mean + jnp.sqrt(variance) * special.ndtri(q)
