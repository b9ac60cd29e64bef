"""Multi-class GP classification via the Laplace approximation.

Rebuild of ``Classify`` (core/src/main/scala/gp/Classify.scala): softmax
likelihood, GPML Algorithm 3.3 Newton iteration for the posterior mode and
approximate marginal likelihood, and GPML Algorithm 3.4 prediction — which
the reference declares but leaves unimplemented (``predict = ???``,
Classify.scala:150-152).

TPU shape: classes are a leading axis of stacked (C, N, N) Grams so the
per-class Cholesky/solve work is one batched ``vmap`` (batched MXU kernels),
and the Newton loop is a ``lax.while_loop`` on the objective change
(replacing the reference's unbounded recursion, Classify.scala:110-136).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random

from gpx.ops.chol import cholesky, forward_solve
from gpx.ops.distance import as_locations
from gpx.ops.gram import gram


def softmax_probs(f):
    """Class probabilities per data point; ``f: (C, N)`` latent values —
    the stable version of Classify.softmax (Classify.scala:14-15)."""
    return jax.nn.softmax(f, axis=0)


def encode_labels(y, n_classes: int):
    """One-hot encode as (C, N) — Classify.encodeLabels (Classify.scala:46-52)."""
    return jax.nn.one_hot(y, n_classes, axis=0)


def softmax_log_likelihood(f, y_onehot):
    """Multi-class log-likelihood  sum_i [ f_{y_i, i} - logsumexp_c f_{c,i} ]
    — the corrected Classify.softmaxLl (Classify.scala:29-41, whose inner
    ``log(sum(fxs))`` sums latent values instead of exponentials)."""
    return jnp.sum(jnp.sum(y_onehot * f, axis=0) - jax.nn.logsumexp(f, axis=0))


class LaplaceFit(NamedTuple):
    f: jnp.ndarray             # (C, N) posterior mode
    pi: jnp.ndarray            # (C, N) class probabilities at the mode
    log_marginal: jnp.ndarray  # Laplace approximate log Z
    e: jnp.ndarray             # (C, N, N) per-class E matrices
    m_chol: jnp.ndarray        # (N, N) chol(sum_c E_c)
    k: jnp.ndarray             # (C, N, N) per-class Grams
    y_onehot: jnp.ndarray      # (C, N)
    n_iters: jnp.ndarray


def _newton_quantities(f, k, y_onehot):
    """One Newton step of GPML Algorithm 3.3, batched over classes."""
    c, n = f.shape
    pi = softmax_probs(f)
    sqrt_pi = jnp.sqrt(pi)

    def per_class(kc, sp):
        dk = sp[:, None] * kc * sp[None, :]
        lc = cholesky(jnp.eye(n, dtype=kc.dtype) + dk)
        inner = forward_solve(lc, jnp.diag(sp))
        # HIGHEST: E_c feeds a summed Cholesky; TPU's bf16 default
        # matrix-matrix precision (5.8e-4 rel) is too loose there
        ec = jnp.matmul(                         # D^1/2 (I + D^1/2 K D^1/2)^-1 D^1/2
            inner.T, inner, precision=jax.lax.Precision.HIGHEST
        )
        zc = jnp.sum(jnp.log(jnp.diagonal(lc)))
        return ec, zc

    e, z = jax.vmap(per_class)(k, sqrt_pi)       # (C,N,N), (C,)
    m_chol = cholesky(jnp.sum(e, axis=0))

    # b = (D - Pi Pi^T) f + y - pi   [W f + grad log p(y|f)]
    pif = jnp.sum(pi * f, axis=0)                # (N,)
    b = pi * f - pi * pif[None, :] + y_onehot - pi
    # HIGHEST: batched ("cij,cj->ci") matvecs lower to batch matmuls on
    # the MXU, where the chip's single-pass bf16 default costs ~2e-3
    # (measured round 3) — unlike plain matvecs, which are faithful;
    # the Newton fixed point would otherwise drift on chip
    hi = jax.lax.Precision.HIGHEST
    cvec = jnp.einsum(
        "cij,cj->ci", e, jnp.einsum("cij,cj->ci", k, b, precision=hi),
        precision=hi,
    )
    rc = jnp.sum(cvec, axis=0)                   # R^T c
    sol = _back_then_forward(m_chol, rc)         # M^T \ (M \ R^T c)
    a = b - cvec + jnp.einsum("cij,j->ci", e, sol, precision=hi)
    f_new = jnp.einsum("cij,cj->ci", k, a, precision=hi)
    return f_new, a, pi, e, m_chol, z


def _back_then_forward(m_chol, rhs):
    from jax.scipy.linalg import solve_triangular

    return solve_triangular(
        m_chol.T, solve_triangular(m_chol, rhs, lower=True), lower=False
    )


def fit(
    x,
    kernels,
    y,
    n_classes: int,
    *,
    jitter: float = 1e-6,
    tol: float = 1e-4,
    max_iters: int = 50,
):
    """Find the softmax-Laplace posterior mode — Classify.fit
    (Classify.scala:89-140), as a ``lax.while_loop`` Newton iteration with
    vmapped per-class Cholesky factorizations.

    ``kernels``: one Kernel (shared across classes) or a list of C kernels
    (the reference's independent per-class covariances).
    """
    x = as_locations(x)
    n = x.shape[0]
    if not isinstance(kernels, (list, tuple)):
        kernels = [kernels] * n_classes
    k = jnp.stack([gram(kern, x, nugget=jitter) for kern in kernels])
    y_onehot = encode_labels(jnp.asarray(y), n_classes).astype(k.dtype)

    def objective(f, a):
        # psi(f) = -1/2 a^T f + log p(y|f)
        return -0.5 * jnp.sum(a * f) + softmax_log_likelihood(f, y_onehot)

    def cond(state):
        _, _, obj, obj_prev, it = state
        return (jnp.abs(obj - obj_prev) > tol) & (it < max_iters)

    def body(state):
        f, _, obj, _, it = state
        f_new, a, *_ = _newton_quantities(f, k, y_onehot)
        return f_new, a, objective(f_new, a), obj, it + 1

    f0 = jnp.zeros((n_classes, n), dtype=k.dtype)
    a0 = jnp.zeros_like(f0)
    state0 = (f0, a0, jnp.asarray(1.0, k.dtype), jnp.asarray(0.0, k.dtype),
              jnp.asarray(0, jnp.int32))
    f, a, obj, _, it = lax.while_loop(cond, body, state0)

    # final quantities at the mode + approximate log marginal likelihood
    _, _, pi, e, m_chol, z = _newton_quantities(f, k, y_onehot)
    log_z = objective(f, a) - jnp.sum(z)
    return LaplaceFit(
        f=f, pi=pi, log_marginal=log_z, e=e, m_chol=m_chol, k=k,
        y_onehot=y_onehot, n_iters=it,
    )


def latent_predict(fitres: LaplaceFit, x, kernels, xs):
    """Latent softmax-Laplace predictive moments at test locations — the
    mean/covariance half of GPML Algorithm 3.4 (Classify.scala:150-152 left
    it ``???``). Returns ``mu (C, M)`` and the per-test-point cross-class
    covariance ``sigma (M, C, C)``."""
    x = as_locations(x)
    xs = as_locations(xs)
    c = fitres.f.shape[0]
    if not isinstance(kernels, (list, tuple)):
        kernels = [kernels] * c
    kxs = jnp.stack([gram(kern, x, xs) for kern in kernels])     # (C, N, M)
    kss = jnp.stack(
        [kern.diag(xs, dtype=fitres.f.dtype) for kern in kernels]
    )                                                            # (C, M)

    # HIGHEST throughout: sigma is a difference of like-sized terms and
    # TPU's bf16 default (5.8e-4 rel) can flip small predictive variances
    # negative; BATCHED matvecs ("cn,cnm->cm") also lower to batch
    # matmuls and lose ~2e-3 at the default (measured round 3 — only
    # UNbatched matvecs are f32-faithful on this chip)
    hi = jax.lax.Precision.HIGHEST
    diff = fitres.y_onehot - fitres.pi                           # (C, N)
    mu = jnp.einsum("cn,cnm->cm", diff, kxs, precision=hi)       # (C, M)
    b = jnp.einsum("cij,cjm->cim", fitres.e, kxs, precision=hi)  # (C, N, M)
    # Solve (sum_c E_c)^{-1} b_d PER CLASS (one batched trsm over the C*M
    # columns): Sigma*_{cd} = b_c^T (sum E)^{-1} b_d + delta_cd (kss - b_c^T k*_c).
    # Summing b over classes before the solve collapses the class axis and
    # cancels the -b^T k* term, inflating latent variance to the prior's
    # (ADVICE r1, high).
    n, m = b.shape[1], b.shape[2]
    sol = _back_then_forward(
        fitres.m_chol, jnp.moveaxis(b, 1, 0).reshape(n, c * m)
    )
    sol = jnp.moveaxis(sol.reshape(n, c, m), 0, 1)               # (C, N, M)
    sigma = jnp.einsum("cim,dim->mcd", b, sol, precision=hi)     # (M, C, C)
    diag_term = kss.T - jnp.einsum("cim,cim->mc", b, kxs)        # (M, C)
    sigma = sigma + jax.vmap(jnp.diag)(diag_term)
    return mu, sigma


def predict(
    key,
    fitres: LaplaceFit,
    x,
    kernels,
    xs,
    *,
    n_classes: int | None = None,
    n_mc: int = 2000,
):
    """Class probabilities at test locations — GPML Algorithm 3.4, completing
    the reference's unimplemented Classify.predict (Classify.scala:150-152).

    Monte-Carlo softmax integration over the Gaussian latent posterior at
    each test point. Returns (M, C) probabilities.
    """
    mu, sigma = latent_predict(fitres, x, kernels, xs)
    c = fitres.f.shape[0]

    def mc_one(k_i, mu_i, sigma_i):
        chol = jnp.linalg.cholesky(
            sigma_i + 1e-6 * jnp.eye(c, dtype=sigma_i.dtype)
        )
        zs = random.normal(k_i, (n_mc, c), dtype=sigma_i.dtype)
        fs = mu_i[None, :] + zs @ chol.T
        return jnp.mean(jax.nn.softmax(fs, axis=-1), axis=0)

    keys = random.split(key, mu.shape[1])
    return jax.vmap(mc_one)(keys, mu.T, sigma)
