"""Matrix-free exact-structure GP inference: CG solves + stochastic Lanczos
quadrature (SLQ) for the log-determinant.

The GPyTorch-style scalable path (PAPERS.md: "Blackbox Matrix-Matrix
Gaussian Process Inference"): every operation is a streamed Gram matvec
(gpx.ops.pallas_matvec — K never materializes), so N is limited by O(N)
memory instead of the dense paths' O(N^2). Estimators:

* ``alpha = K^{-1} (y - m)`` by conjugate gradients (exact up to tolerance);
* ``log det K`` by SLQ: Rademacher probes z, m Lanczos steps each, and the
  Gauss quadrature identity
  ``z^T log(K) z ≈ ||z||^2 * sum_k w_k log(theta_k)`` from the eigen-pairs
  of the small tridiagonal T;
* hyperparameter gradients by the Hutchinson trace estimator
  ``d logdet / d theta = E[(K^{-1} z)^T (dK/d theta) z]`` where the
  directional contractions come from ``jax.grad`` of scalar matvec forms —
  no dK/d theta matrix is ever built.

Use the dense ``gp.logml_value_and_grad`` below ~16k points; this path above.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random

from gpx.models.gp import LOGML_NUGGET
from gpx.ops.distance import as_locations
from gpx.ops.pallas_matvec import gram_matvec
from gpx.params import Parameters


def cg_solve(matvec, b, *, tol: float = 1e-6, max_iters: int = 1000, x0=None):
    """Conjugate gradients for SPD systems; supports (N,) or (N, R) RHS."""
    squeeze = b.ndim == 1
    b2 = b[:, None] if squeeze else b
    x = jnp.zeros_like(b2) if x0 is None else (x0[:, None] if squeeze else x0)

    r = b2 - matvec(x)
    p = r
    rs = jnp.sum(r * r, axis=0)

    def cond(state):
        _, r, _, rs, it = state
        return (jnp.max(rs) > tol * tol) & (it < max_iters)

    def body(state):
        x, r, p, rs, it = state
        ap = matvec(p)
        alpha = rs / jnp.sum(p * ap, axis=0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        rs_new = jnp.sum(r * r, axis=0)
        beta = rs_new / rs
        p = r + beta[None, :] * p
        return x, r, p, rs_new, it + 1

    x, _, _, rs, iters = lax.while_loop(
        cond, body, (x, r, p, rs, jnp.asarray(0))
    )
    converged = jnp.max(rs) <= tol * tol
    return (x[:, 0] if squeeze else x), iters, converged


def lanczos(matvec, z, m: int):
    """``m`` steps of Lanczos tridiagonalization from start vector ``z``.
    Returns (alphas (m,), betas (m-1,)) of T. No reorthogonalization —
    adequate for SLQ logdet estimates."""
    n = z.shape[0]
    q0 = z / jnp.linalg.norm(z)

    def step(carry, _):
        q_prev, q, beta_prev = carry
        w = matvec(q) - beta_prev * q_prev
        alpha = jnp.dot(w, q)
        w = w - alpha * q
        beta = jnp.linalg.norm(w)
        q_next = jnp.where(beta > 1e-12, w / jnp.maximum(beta, 1e-12), w)
        return (q, q_next, beta), (alpha, beta)

    (_, _, _), (alphas, betas) = lax.scan(
        step, (jnp.zeros(n, z.dtype), q0, jnp.asarray(0.0, z.dtype)), None,
        length=m,
    )
    return alphas, betas[:-1]


def slq_logdet(matvec, n: int, key, *, n_probes: int = 16, m: int = 32,
               dtype=jnp.float32):
    """Stochastic Lanczos quadrature estimate of ``log det K``."""
    keys = random.split(key, n_probes)

    def one_probe(k):
        z = random.rademacher(k, (n,), dtype=dtype)
        alphas, betas = lanczos(matvec, z, m)
        t = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
        theta, vecs = jnp.linalg.eigh(t)
        theta = jnp.maximum(theta, 1e-12)
        weights = vecs[0, :] ** 2
        return jnp.sum(weights * jnp.log(theta)) * n

    return jnp.mean(jax.vmap(one_probe)(keys))


class IterativeLogML(NamedTuple):
    value: jnp.ndarray
    grads: Parameters
    cg_iters: jnp.ndarray
    cg_converged: jnp.ndarray  # False => raise cg_max_iters or recondition
                               # (larger noise/nugget, shorter lengthscale)


def logml_value_and_grad_iterative(
    params: Parameters,
    x,
    y,
    key,
    *,
    nugget: float = LOGML_NUGGET,
    n_probes: int = 16,
    lanczos_iters: int = 32,
    cg_tol: float = 1e-5,
    cg_max_iters: int = 1000,
) -> IterativeLogML:
    """Matrix-free logML value + hyperparameter gradient estimate.

    The quadratic term and its gradient are CG-exact (up to ``cg_tol``);
    the logdet and its gradient are SLQ/Hutchinson estimates with shared
    probes. Memory is O(N (D + probes)).
    """
    x = as_locations(x)
    n = x.shape[0]
    k_quad, k_slq, k_probe = random.split(key, 3)

    def matvec_with(kern, v):
        return gram_matvec(kern, x, v, nugget=nugget)

    matvec = partial(matvec_with, params.kernel)

    mean_val, mean_vjp = jax.vjp(lambda m: m(x), params.mean)
    r = y - mean_val

    # quadratic term: alpha = K^{-1} r, plus probe solves K^{-1} z (batched)
    probes = random.rademacher(k_probe, (n, n_probes), dtype=r.dtype)
    rhs = jnp.concatenate([r[:, None], probes], axis=1)
    solves, cg_iters, cg_converged = cg_solve(
        matvec, rhs, tol=cg_tol, max_iters=cg_max_iters
    )
    alpha = solves[:, 0]
    probe_solves = solves[:, 1:]

    logdet = slq_logdet(
        matvec, n, k_slq, n_probes=n_probes, m=lanczos_iters, dtype=r.dtype
    )
    value = -0.5 * alpha @ r - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)

    # gradients:
    #   d/d theta [-1/2 r^T K^{-1} r] = 1/2 alpha^T (dK/d theta) alpha
    #   d/d theta [-1/2 logdet]      = -1/2 E[(K^{-1} z)^T (dK/d theta) z]
    # both as jax.grad of scalar matvec forms with stopped vectors.
    alpha_s = lax.stop_gradient(alpha)
    probes_s = lax.stop_gradient(probes)
    probe_solves_s = lax.stop_gradient(probe_solves)

    # the contraction differentiates *through the matvec* w.r.t. kernel
    # hyperparameters, so it uses the XLA row-blocked path (differentiable;
    # the Pallas forward has no AD rule) — still O(block * N) memory.
    from gpx.ops.pallas_matvec import _gram_matvec_xla

    def contraction(kern):
        quad = 0.5 * alpha_s @ _gram_matvec_xla(
            kern, x, alpha_s[:, None], nugget
        )[:, 0]
        tr = jnp.mean(
            jnp.sum(
                probe_solves_s * _gram_matvec_xla(kern, x, probes_s, nugget),
                axis=0,
            )
        )
        return quad - 0.5 * tr

    d_kernel = jax.grad(contraction)(params.kernel)
    (d_mean,) = mean_vjp(alpha)
    return IterativeLogML(
        value=value,
        grads=Parameters(mean=d_mean, kernel=d_kernel),
        cg_iters=cg_iters,
        cg_converged=cg_converged,
    )
