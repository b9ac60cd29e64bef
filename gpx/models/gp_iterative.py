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


def cg_solve(matvec, b, *, tol: float = 1e-6, max_iters: int = 1000, x0=None,
             precond=None):
    """(Preconditioned) conjugate gradients for SPD systems; supports (N,)
    or (N, R) RHS. ``precond``: callable applying an approximate inverse
    (see :func:`pivoted_cholesky_preconditioner`)."""
    squeeze = b.ndim == 1
    b2 = b[:, None] if squeeze else b
    x = jnp.zeros_like(b2) if x0 is None else (x0[:, None] if squeeze else x0)
    m_inv = (lambda v: v) if precond is None else precond

    r = b2 - matvec(x)
    z = m_inv(r)
    p = z
    rz = jnp.sum(r * z, axis=0)
    rs = jnp.sum(r * r, axis=0)

    def cond(state):
        _, r, _, _, rs, it = state
        return (jnp.max(rs) > tol * tol) & (it < max_iters)

    tiny = jnp.asarray(1e-30, b2.dtype)

    def body(state):
        x, r, p, rz, rs, it = state
        # freeze converged columns: letting them iterate underflows their
        # residual norms to exactly 0 and beta = 0/0 poisons the batch
        active = rs > tol * tol
        ap = matvec(p)
        denom = jnp.sum(p * ap, axis=0)
        # non-positive curvature = f32 breakdown for that column: freeze it
        # (finite, unconverged) instead of producing NaNs
        ok = active & (denom > 0.0) & jnp.isfinite(denom)
        alpha = jnp.where(ok, rz / jnp.where(ok, denom, 1.0), 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        z = m_inv(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(active, rz_new / jnp.maximum(rz, tiny), 0.0)
        p = z + beta[None, :] * p
        return x, r, p, rz_new, jnp.sum(r * r, axis=0), it + 1

    x, _, _, _, rs, iters = lax.while_loop(
        cond, body, (x, r, p, rz, rs, jnp.asarray(0))
    )
    converged = jnp.max(rs) <= tol * tol
    return (x[:, 0] if squeeze else x), iters, converged


def pivoted_cholesky(kernel, x, rank: int, *, method: str = "auto"):
    """Rank-``rank`` pivoted (greedy) Cholesky of the *noise-free* Gram:
    ``K ≈ L_r L_r^T`` built from ``rank`` adaptively chosen kernel columns —
    O(N rank^2) time, O(N rank) memory, K never materializes (the GPyTorch
    preconditioner construction, PAPERS.md)."""
    from gpx.ops.distance import sq_distances

    x = as_locations(x)
    n = x.shape[0]
    leaves = jax.tree_util.tree_leaves(kernel)
    dtype = jnp.result_type(x.dtype, *(l.dtype for l in leaves))
    diag = kernel.variance(n, dtype=dtype)

    def column(pivot_idx):
        xp = lax.dynamic_slice_in_dim(x, pivot_idx, 1, 0)   # (1, D)
        r2 = sq_distances(x, xp)[:, 0]
        # exact-zero self-distance so White contributes at the pivot
        r2 = r2.at[pivot_idx].set(0.0)
        return kernel.evaluate_r2(r2)

    floor = 1e-7 * jnp.max(diag)  # stop once the residual trace is exhausted

    def step(carry, i):
        l, d = carry
        pivot = jnp.argmax(d)
        k_col = column(pivot)
        l_pivot = lax.dynamic_slice_in_dim(l, pivot, 1, 0)[0]   # (rank,)
        resid = k_col - l @ l_pivot
        d_pivot = d[pivot]
        # emit a zero column once pivots are exhausted (dividing by a
        # cancelled-to-zero d produces NaN/inf columns in f32)
        new_col = jnp.where(
            d_pivot > floor,
            resid / jnp.sqrt(jnp.maximum(d_pivot, floor)),
            jnp.zeros_like(resid),
        )
        l = l.at[:, i].set(new_col)
        d = jnp.maximum(d - new_col**2, 0.0)
        d = d.at[pivot].set(0.0)
        return (l, d), None

    l0 = jnp.zeros((n, rank), dtype)
    (l_r, _), _ = lax.scan(step, (l0, diag), jnp.arange(rank))
    return l_r


def pivoted_cholesky_preconditioner(kernel, x, rank: int, noise: float):
    """Woodbury-form inverse of ``P = L_r L_r^T + noise I`` as a callable
    for :func:`cg_solve`. ``noise`` should be the additive diagonal (white
    variance + nugget) so P matches K's noise floor."""
    l_r = pivoted_cholesky(kernel, x, rank)
    rank_eye = jnp.eye(rank, dtype=l_r.dtype)
    small = noise * rank_eye + l_r.T @ l_r
    small_chol = jnp.linalg.cholesky(small)

    def apply(v):
        squeeze = v.ndim == 1
        v2 = v[:, None] if squeeze else v
        ltv = l_r.T @ v2
        from jax.scipy.linalg import cho_solve

        inner = cho_solve((small_chol, True), ltv)
        out = (v2 - l_r @ inner) / noise
        return out[:, 0] if squeeze else out

    return apply


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
    precond_rank: int = 0,
) -> IterativeLogML:
    """Matrix-free logML value + hyperparameter gradient estimate.

    The quadratic term and its gradient are CG-exact (up to ``cg_tol``);
    the logdet and its gradient are SLQ/Hutchinson estimates with shared
    probes. Memory is O(N (D + probes)). ``precond_rank > 0`` builds a
    pivoted-Cholesky preconditioner for the CG solves (essential when the
    kernel's smooth part dominates the noise floor).
    """
    x = as_locations(x)
    n = x.shape[0]
    k_quad, k_slq, k_probe = random.split(key, 3)

    def matvec_with(kern, v):
        return gram_matvec(kern, x, v, nugget=nugget)

    matvec = partial(matvec_with, params.kernel)

    precond = None
    if precond_rank > 0:
        # factor the SMOOTH part only; White terms + nugget form the
        # Woodbury diagonal (a mismatched noise floor makes P^{-1}K worse
        # conditioned than K — measured on-chip)
        from gpx.kernels import split_noise

        smooth, noise_var = split_noise(params.kernel)
        if smooth is not None:
            precond = pivoted_cholesky_preconditioner(
                smooth, x, precond_rank, noise=noise_var + nugget + 1e-8
            )

    mean_val, mean_vjp = jax.vjp(lambda m: m(x), params.mean)
    r = y - mean_val

    # quadratic term: alpha = K^{-1} r, plus probe solves K^{-1} z (batched)
    probes = random.rademacher(k_probe, (n, n_probes), dtype=r.dtype)
    rhs = jnp.concatenate([r[:, None], probes], axis=1)
    solves, cg_iters, cg_converged = cg_solve(
        matvec, rhs, tol=cg_tol, max_iters=cg_max_iters, precond=precond
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
