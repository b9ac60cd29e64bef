"""Multi-output GPs: intrinsic coregionalization (ICM) and the LMC.

Beyond the reference: its only multi-sensor treatment shares ONE latent
structure across outputs through a DLM (TemperatureDlm.scala:83-118,
rebuilt in gpx.models.dlmgp) and its kernel TODO explicitly asks for more
combinators (KernelFunction.scala:40-41). The ICM is the standard GP
answer to the same 8-sensor temperature problem: T correlated outputs
share a base kernel ``k`` over locations, coupled by a PSD
coregionalization matrix ``B = W Wᵀ + diag(κ)`` (rank ``R`` controls the
sharing), per-output observation noise on top —

    Cov[f_i(x), f_j(x')] = B[i, j] · k(x, x'),
    y_i(x) = f_i(x) + ε_i,   ε_i ~ N(0, noise_i).

TPU-first design: everything is Kronecker algebra. With shared noise the
(NT × NT) operator ``B ⊗ K + σ²I`` is diagonalized by the pair of small
eigendecompositions ``eigh(K)`` (N×N) and ``eigh(B)`` (T×T), and every
downstream quantity — logML, posterior mean, marginal variance — becomes
a chain of dense (N,T)-shaped matmuls on the MXU: O(N³ + N²T + NT²)
instead of the O(N³T³) naive factorization, with no NT-sized matrix ever
materialized. Per-output noise breaks the joint diagonalization, so that
case routes through a dense (NT) Cholesky on the same safe_chol/chol
machinery the single-output model uses.

Parameters are an ordinary gpx pytree: ``IcmParams`` carries bijectors
(``w`` unconstrained, ``κ``/``noise`` positive, base kernel its own), so
the whole inference stack — :func:`gpx.models.optimize.optimize`-style
L-BFGS, the MH/HMC/NUTS machinery — lifts to multi-output models through
the same ``make_unconstrained_log_posterior`` composition
(KernelParameters.scala:146-148's unconstrain-then-sample pattern);
:func:`sample_mh` packages that composition.

:class:`LmcParams` generalizes to the full linear model of
coregionalization — Q latent processes with distinct base kernels
(fast + slow components), ``K = Σ_q B_q ⊗ K_q`` — on the dense path;
every entry point (logML, fit, draw, optimize, sample_mh, mask=) accepts
either parameter type.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import random

from gpx import bijectors as bij
from gpx.kernels import Kernel
from gpx.models import gp
from gpx.ops import chol
from gpx.ops.distance import as_locations
from gpx.utils.pytree import pytree_dataclass

HI = jax.lax.Precision.HIGHEST


@pytree_dataclass
class IcmParams:
    """ICM hyperparameters: base kernel + coregionalization + noise.

    ``w``: (T, R) factor loadings; ``kappa``: (T,) diagonal boost (keeps
    ``B`` full-rank for R < T); ``noise``: scalar (shared — enables the
    fast Kronecker path) or (T,) per-output observation noise variance.
    """

    kernel: Kernel
    w: jnp.ndarray
    kappa: jnp.ndarray
    noise: jnp.ndarray

    @property
    def n_outputs(self) -> int:
        return self.w.shape[0]

    def bijectors(self) -> "IcmParams":
        return IcmParams(
            kernel=self.kernel.bijectors(),
            w=bij.identity,
            kappa=bij.positive,
            noise=bij.positive,
        )


def icm(kernel: Kernel, n_outputs: int, rank: int = 1, *, w=None,
        kappa=1.0, noise=0.1) -> IcmParams:
    """Convenience constructor. The default ``w`` couples outputs near-
    equally but deliberately STAGGERED (a mild per-output ramp): an exactly
    symmetric ``W`` makes ``B``'s spectrum degenerate, and the eigh VJP the
    Kronecker path differentiates through is NaN at repeated eigenvalues —
    a symmetric init would trap gradient-based fits (optimize / HMC) at a
    non-differentiable point. Pass an explicit (T, R) array to control the
    coupling exactly (MH-style samplers don't care)."""
    if w is None:
        ramp = 1.0 + 0.05 * jnp.arange(n_outputs)[:, None]
        w = ramp * jnp.full((n_outputs, rank), 1.0 / math.sqrt(rank))
    w = jnp.asarray(w, jnp.result_type(float))
    kappa = jnp.broadcast_to(jnp.asarray(kappa, w.dtype), (n_outputs,))
    return IcmParams(kernel=kernel, w=w, kappa=kappa,
                     noise=jnp.asarray(noise, w.dtype))


@pytree_dataclass
class LmcTerm:
    """One latent process of an LMC: a base kernel and its coregionalization
    ``B_q = W_q W_qᵀ + diag(κ_q)``."""

    kernel: Kernel
    w: jnp.ndarray
    kappa: jnp.ndarray

    def bijectors(self) -> "LmcTerm":
        return LmcTerm(kernel=self.kernel.bijectors(), w=bij.identity,
                       kappa=bij.positive)


@pytree_dataclass
class LmcParams:
    """Linear model of coregionalization: ``Cov[f_i(x), f_j(x')] =
    Σ_q B_q[i, j] · k_q(x, x')`` — Q latent processes with their own
    kernels (e.g. a fast and a slow component) mixed into T outputs.

    Generalizes :class:`IcmParams` (the Q=1 case); the sum of Kronecker
    products has no joint diagonalization, so all LMC inference runs the
    dense (NT) path — suited to the reference's scale (handfuls of
    sensors), not the Kronecker fast path's."""

    terms: tuple
    noise: jnp.ndarray

    @property
    def n_outputs(self) -> int:
        return self.terms[0].w.shape[0]

    def bijectors(self) -> "LmcParams":
        return LmcParams(terms=tuple(t.bijectors() for t in self.terms),
                         noise=bij.positive)


def lmc(kernels, n_outputs: int, rank: int = 1, *, kappa=1.0,
        noise=0.1) -> LmcParams:
    """Convenience constructor: one LMC term per base kernel, each with a
    staggered rank-``rank`` loading (see :func:`icm` on why staggered)."""
    terms = []
    for q, k in enumerate(kernels):
        ramp = 1.0 + 0.05 * jnp.arange(n_outputs)[:, None] + 0.01 * q
        w = ramp * jnp.full((n_outputs, rank), 1.0 / math.sqrt(rank))
        terms.append(LmcTerm(
            kernel=k, w=w,
            kappa=jnp.broadcast_to(jnp.asarray(kappa, w.dtype),
                                   (n_outputs,)),
        ))
    return LmcParams(terms=tuple(terms),
                     noise=jnp.asarray(noise, jnp.result_type(float)))


def coregion_matrix(p) -> jnp.ndarray:
    """``B = W Wᵀ + diag(κ)`` — PSD by construction, (T, T). For an LMC,
    the sum over terms (the coregionalization of the total process)."""
    if isinstance(p, LmcParams):
        bs = [coregion_matrix(t) for t in p.terms]
        return sum(bs[1:], bs[0])
    return jnp.matmul(p.w, p.w.T, precision=HI) + jnp.diag(p.kappa)


def _terms(p):
    """Uniform view: a tuple of (kernel, B_q) pairs for ICM (one term) or
    LMC (Q terms)."""
    if isinstance(p, LmcParams):
        return tuple((t.kernel, coregion_matrix(t)) for t in p.terms)
    return ((p.kernel, coregion_matrix(p)),)


def _check_xy(x, Y, p):
    x = as_locations(x)
    Y = jnp.asarray(Y)
    if Y.ndim != 2:
        raise ValueError(
            f"multi-output observations must be (N, T); got shape {Y.shape}"
        )
    if Y.shape[0] != x.shape[0]:
        raise ValueError(
            f"x has {x.shape[0]} locations but Y has {Y.shape[0]} rows"
        )
    if Y.shape[1] != p.n_outputs:
        raise ValueError(
            f"params declare {p.n_outputs} outputs but Y has {Y.shape[1]} "
            "columns"
        )
    return x, Y


def _noise_vec(p) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(p.noise), (p.n_outputs,))


def _is_shared_noise(p) -> bool:
    return jnp.ndim(p.noise) == 0


def gram_full(p, x, *, nugget: float = 0.0) -> jnp.ndarray:
    """The dense (NT, NT) covariance ``Σ_q B_q ⊗ K_q + diag(noise) ⊗ I +
    nugget·I`` in output-major ordering (flat index = output·N +
    location). Reference material for tests and the per-output-noise/LMC
    paths — the Kronecker path never builds it."""
    x = as_locations(x)
    n = x.shape[0]
    full = sum(jnp.kron(b, kern.gram(x)) for kern, b in _terms(p))
    d = jnp.repeat(_noise_vec(p), n) + nugget
    return full + jnp.diag(d)


def _kron_eig(p: IcmParams, x, nugget):
    """Eigen-split of ``B ⊗ K + (σ² + nugget) I``: returns
    ``(Qk, lam_k, Qb, lam_b, S)`` with ``S[n, a] = lam_k[n]·lam_b[a] + σ²
    + nugget`` — the full operator's spectrum arranged (N, T).

    QR/eigh lower to blocked Householder matmuls that run single-pass bf16
    by default on TPU (measured: orthonormality loss corrupts downstream
    solves) — forced HIGHEST here; N×N eigh is the same O(N³) class as the
    Cholesky it replaces."""
    kxx = p.kernel.gram(x)
    b = coregion_matrix(p)
    with jax.default_matmul_precision("highest"):
        lam_k, qk = jnp.linalg.eigh(kxx)
        lam_b, qb = jnp.linalg.eigh(b)
    # clamp tiny negative f32 eigenvalues of the PSD factors; positivity of
    # S is carried by the noise + nugget shift
    lam_k = jnp.maximum(lam_k, 0.0)
    lam_b = jnp.maximum(lam_b, 0.0)
    s = lam_k[:, None] * lam_b[None, :] + jnp.asarray(p.noise) + nugget
    return qk, lam_k, qb, lam_b, s


def _obs_index(mask, n, t):
    """Flat output-major indices of the observed entries of an (N, T)
    boolean mask. The mask must be CONCRETE (a numpy/bool array, not a
    traced value): the observed count sets array shapes, and XLA programs
    are static-shaped — re-jitting per missingness pattern is the correct
    TPU semantics, exactly like the samplers re-tracing per data size."""
    import numpy as np

    mask = np.asarray(mask)
    if mask.shape != (n, t):
        raise ValueError(f"mask must be (N, T) = {(n, t)}; got {mask.shape}")
    if mask.dtype != np.bool_:
        raise ValueError("mask must be boolean (True = observed)")
    return jnp.asarray(np.flatnonzero(mask.T.reshape(-1)))


def log_marginal_likelihood(
    p, x, Y, *, nugget: float = gp.LOGML_NUGGET,
    method: str = "auto", mask=None,
) -> jnp.ndarray:
    """Multi-output marginal log-likelihood ``log N(vec Y | 0, B⊗K + D⊗I)``
    (zero prior mean across outputs; center ``Y`` for anything else).

    ``method``: ``"kron"`` (shared noise only — two eigendecompositions,
    never materializes NT), ``"dense"`` (NT Cholesky; any noise), or
    ``"auto"``. The single-output T=1 case reduces exactly to
    ``gp.log_marginal_likelihood`` (GaussianProcess.scala:110-118, with
    B = w² + κ folded into the kernel amplitude).

    AD note: the kron path differentiates through ``eigh``, whose VJP is
    undefined at repeated eigenvalues (of B or of K); generic data and a
    staggered W (see :func:`icm`) keep spectra simple, but gradient-based
    fits that hit degeneracy should switch to ``method="dense"`` — the
    Cholesky VJP has no such restriction.

    ``mask`` (N, T) boolean, True = observed: incomplete grids (sensors
    down, staggered deployments — the reference's held-out-sensor setting,
    TemperatureDlm.scala:361-402) marginalize exactly by selecting the
    observed sub-block; irregular structure breaks the Kronecker
    diagonalization, so a mask forces the dense path. Masked-out entries
    of ``Y`` are ignored (safe to hold NaN placeholders)."""
    x, Y = _check_xy(x, Y, p)
    n, t = Y.shape
    if isinstance(p, LmcParams) and method == "kron":
        raise ValueError(
            "method='kron' is ICM-only — a sum of Kronecker products has "
            "no joint diagonalization; LMC inference is dense"
        )
    if mask is not None or isinstance(p, LmcParams):
        method = "dense"
    elif method == "auto":
        method = "kron" if _is_shared_noise(p) else "dense"
    if method == "kron":
        if not _is_shared_noise(p):
            raise ValueError(
                "method='kron' needs scalar (shared) noise — per-output "
                "noise breaks the joint diagonalization; use method='dense'"
            )
        qk, _, qb, _, s = _kron_eig(p, x, nugget)
        w = jnp.matmul(
            jnp.matmul(qk.T, Y, precision=HI), qb, precision=HI
        )
        quad = jnp.sum(w * w / s)
        logdet = jnp.sum(jnp.log(s))
        return -0.5 * (quad + logdet + n * t * jnp.log(2.0 * jnp.pi))
    if method != "dense":
        raise ValueError(f"unknown method: {method!r}")
    kfull = gram_full(p, x, nugget=nugget)
    v = Y.T.reshape(-1)
    if mask is not None:
        ix = _obs_index(mask, n, t)
        kfull = kfull[jnp.ix_(ix, ix)]
        v = jnp.where(jnp.isfinite(v), v, 0.0)[ix]
    l = chol.cholesky(kfull)
    u = chol.forward_solve(l, v)
    return (
        -0.5 * jnp.dot(u, u)
        - jnp.sum(jnp.log(jnp.diagonal(l)))
        - 0.5 * v.shape[0] * jnp.log(2.0 * jnp.pi)
    )


def draw(key, p, x, *, nugget: float = gp.LOGML_NUGGET,
         include_noise: bool = True) -> jnp.ndarray:
    """One joint draw of all T outputs at ``x`` — (N, T). Matrix-normal
    sampling (the Kronecker analogue of gp.draw's Cholesky route,
    GaussianProcess.scala:60-75): per latent process ``F_q = L_q Z_q Bᵃᵀ_q``
    has ``Cov[vec F_q] = B_q ⊗ K_q`` with ``L_q = chol(K_q + nugget·I)``
    and ``Bᵃ_q = eig-sqrt(B_q)`` (eig, not Cholesky: rank-deficient B —
    κ → 0, R < T — is a valid model); an LMC draw sums independent terms."""
    x = as_locations(x)
    n, t = x.shape[0], p.n_outputs
    terms = _terms(p)
    keys = random.split(key, len(terms) + 1)
    f = jnp.zeros((n, t))
    for kq, (kern, bq) in zip(keys[:-1], terms):
        lk = chol.cholesky(kern.gram(x, nugget=nugget))
        with jax.default_matmul_precision("highest"):
            lam_b, qb = jnp.linalg.eigh(bq)
        bh = qb * jnp.sqrt(jnp.maximum(lam_b, 0.0))[None, :]
        z = random.normal(kq, (n, t), dtype=lk.dtype)
        f = f + jnp.matmul(
            jnp.matmul(lk, z, precision=HI), bh.T, precision=HI
        )
    if include_noise:
        f = f + jnp.sqrt(_noise_vec(p))[None, :] * random.normal(
            keys[-1], (n, t), dtype=f.dtype
        )
    return f


def _dense_cross_solve(p, x, Y, xs, nugget, mask):
    """Shared dense-path assembly for :func:`fit` and
    :func:`posterior_draw`: Cholesky of the (mask-subset) observed block,
    ``alpha = K⁻¹ vec Y``, the output-major cross-covariance columns, and
    their forward-solved block ``V = L⁻¹ C`` (so ``VᵀV = Cᵀ K⁻¹ C``)."""
    n, t = Y.shape
    m = xs.shape[0]
    kfull = gram_full(p, x, nugget=nugget)
    yv = Y.T.reshape(-1)
    # cross block for (output i, test s) is Σ_q B_q[:, i] ⊗ k_q,xs[:, s]
    # (NT,) per column — output-major on both axes
    cross = sum(
        jnp.einsum("ji,nm->jnim", bq, kern.gram(x, xs))
        for kern, bq in _terms(p)
    ).reshape(t * n, t * m)
    if mask is not None:
        ix = _obs_index(mask, n, t)
        kfull = kfull[jnp.ix_(ix, ix)]
        yv = jnp.where(jnp.isfinite(yv), yv, 0.0)[ix]
        cross = cross[ix]
    l = chol.cholesky(kfull)
    u = chol.forward_solve(l, yv)
    alpha = chol.back_solve(l.T, u)
    v = chol.forward_solve(l, cross)
    return alpha, cross, v


def posterior_draw(key, p, x, Y, xs, *, nugget: float = gp.PREDICT_NUGGET,
                   jitter: float = 1e-8, shape=(),
                   include_noise: bool = True, mask=None) -> jnp.ndarray:
    """Joint draw of all T outputs from the multi-output posterior at
    ``xs`` — ``(*shape, M, T)``, the coupled-outputs analogue of
    :func:`gpx.models.gp.posterior_draw` (the ``efficientDraw`` capability,
    GaussianProcess.scala:146-164). Exact: Cholesky of the (MT × MT)
    posterior covariance, so draws carry the full cross-output AND
    cross-location dependence that marginal intervals (``fit``) lose.
    ``include_noise`` adds the observation noise ``D ⊗ I`` (matching the
    variance convention of :func:`fit`); ``mask`` conditions on an
    incomplete grid, so a draw jointly imputes a downed sensor."""
    x, Y = _check_xy(x, Y, p)
    xs = as_locations(xs)
    t = Y.shape[1]
    m = xs.shape[0]
    kss = sum(
        jnp.einsum("ij,su->isju", bq, kern.gram(xs))
        for kern, bq in _terms(p)
    ).reshape(t * m, t * m)
    if include_noise:
        kss = kss + jnp.diag(jnp.repeat(_noise_vec(p), m)).astype(kss.dtype)
    alpha, cross, v = _dense_cross_solve(p, x, Y, xs, nugget, mask)
    mean = jnp.matmul(cross.T, alpha, precision=HI)          # (MT,)
    # HIGHEST: difference of like-sized terms (same rationale as gp.fit's
    # full_cov path — bf16 default matmul pushes small variances negative)
    cov = kss - jnp.matmul(v.T, v, precision=HI)
    lp = chol.cholesky(cov + jitter * jnp.eye(t * m, dtype=cov.dtype))
    z = random.normal(key, (*shape, t * m), dtype=lp.dtype)
    draws = mean + jnp.matmul(z, lp.T, precision=HI)
    return jnp.moveaxis(draws.reshape(*shape, t, m), -2, -1)


class MultiOutputSummary(NamedTuple):
    """Marginal posterior over every output at M test locations — the
    (M, T) analogue of gp.PosteriorSummary (Predict.scala:61)."""

    x: jnp.ndarray         # (M, D)
    mean: jnp.ndarray      # (M, T)
    variance: jnp.ndarray  # (M, T) — includes observation noise

    def interval(self, q):
        """Credible bound at quantile ``q`` per output
        (Summarise.getInterval, Summarise.scala:10-12)."""
        from gpx.distributions import Normal

        return Normal(self.mean, jnp.sqrt(self.variance)).ppf(q)


def fit(p, x, Y, xs, *, nugget: float = gp.PREDICT_NUGGET,
        method: str = "auto", mask=None) -> MultiOutputSummary:
    """Posterior mean/variance of every output at test locations ``xs`` —
    GPML Alg 2.1 lifted through the Kronecker structure (the multi-output
    extension of Predict.fit, Predict.scala:57-94).

    Kron path (shared noise): with ``W = Qkᵀ Y Qb`` and the spectrum ``S``,
    the posterior mean is ``K*ₓ α B`` for ``α = Qk (W/S) Qbᵀ``, and the
    variance reduction at (test s, output i) is
    ``Σₙₐ (Qkᵀ k*ₛ)ₙ² (Qbᵀ Bᵢ)ₐ² / Sₙₐ`` — three (M,N)/(N,T)/(T,T)
    matmuls, MXU end to end. Returned variance includes the observation
    noise (the reference's predict adds its White component the same way,
    KernelFunction.scala:33-35).

    ``mask`` (N, T) boolean, True = observed: condition on an incomplete
    grid (dense path; see :func:`log_marginal_likelihood`) — the coupled
    outputs then fill a downed sensor in from its neighbours through B,
    the ICM version of the reference's held-out-sensor forecast
    (TemperatureDlm.scala:361-402)."""
    x, Y = _check_xy(x, Y, p)
    xs = as_locations(xs)
    if isinstance(p, LmcParams) and method == "kron":
        raise ValueError(
            "method='kron' is ICM-only — a sum of Kronecker products has "
            "no joint diagonalization; LMC inference is dense"
        )
    if mask is not None or isinstance(p, LmcParams):
        method = "dense"
    elif method == "auto":
        method = "kron" if _is_shared_noise(p) else "dense"
    # prior marginal variance sums over latent processes: Σ_q B_q[i,i] k_q*
    prior_var = sum(
        kern.diag(xs)[:, None] * jnp.diag(bq)[None, :]
        for kern, bq in _terms(p)
    )

    if method == "kron":
        if not _is_shared_noise(p):
            raise ValueError(
                "method='kron' needs scalar (shared) noise — use "
                "method='dense' for per-output noise"
            )
        b = coregion_matrix(p)
        kxs = p.kernel.gram(x, xs)                  # (N, M)
        qk, _, qb, _, s = _kron_eig(p, x, nugget)
        w = jnp.matmul(jnp.matmul(qk.T, Y, precision=HI), qb, precision=HI)
        alpha = jnp.matmul(
            jnp.matmul(qk, w / s, precision=HI), qb.T, precision=HI
        )                                           # (N, T) = mat(K⁻¹ vecY)
        mean = jnp.matmul(
            jnp.matmul(kxs.T, alpha, precision=HI), b, precision=HI
        )                                           # (M, T)
        w2 = jnp.square(jnp.matmul(qk.T, kxs, precision=HI))   # (N, M)
        u2 = jnp.square(jnp.matmul(qb.T, b, precision=HI))     # (T, T)
        red = jnp.matmul(
            jnp.matmul(w2.T, 1.0 / s, precision=HI), u2, precision=HI
        )                                           # (M, T)
    elif method == "dense":
        t, m = Y.shape[1], xs.shape[0]
        alpha, cross, v = _dense_cross_solve(p, x, Y, xs, nugget, mask)
        mean = jnp.matmul(cross.T, alpha, precision=HI).reshape(t, m).T
        red = jnp.sum(v * v, axis=0).reshape(t, m).T
    else:
        raise ValueError(f"unknown method: {method!r}")

    variance = jnp.maximum(prior_var - red, 0.0) + _noise_vec(p)[None, :]
    return MultiOutputSummary(x=xs, mean=mean, variance=variance)


def optimize(
    template,
    x,
    Y,
    *,
    nugget: float = gp.LOGML_NUGGET,
    log_prior: Callable | None = None,
    method: str = "auto",
    mask=None,
    steps: int = 100,
    optimizer: str = "lbfgs",
    learning_rate: float = 0.05,
    grad_tol: float = 1e-3,
    history_size: int = 10,
    key=None,
    n_probes: int = 16,
    lanczos_iters: int = 32,
    cg_tol: float = 1e-5,
    cg_max_iters: int = 1000,
    precond_rank: int = 0,
    mesh=None,
    mesh_axis: str = "data",
):
    """Type-II MLE / MAP over all ICM hyperparameters — the multi-output
    counterpart of :func:`gpx.models.optimize.optimize`, via the generic
    ``optimize_log_density`` core. The default (kron) objective
    differentiates through ``eigh``: if a fit drives B toward a degenerate
    spectrum (NaN gradient), pass ``method="dense"``. ``mask`` fits to an
    incomplete grid (dense likelihood).

    ``method="iterative"`` optimizes the MATRIX-FREE multi-output logML
    estimate (gpx.models.multioutput_iterative: streamed Kronecker matvec,
    CG + SLQ + Hutchinson) — large-N·T type-II MLE. Requires
    ``optimizer="adam"`` (stochastic gradients); accepts ``key`` /
    ``n_probes`` / ``lanczos_iters`` / ``cg_tol`` / ``precond_rank``
    (ICM + shared noise only) / ``mesh`` (row-sharded matvecs); no
    ``mask`` (the masked operator loses the Kronecker stream — use the
    dense path)."""
    from gpx.models.optimize import (
        optimize_log_density,
        stochastic_log_density_vjp,
    )

    x, Y = _check_xy(x, Y, template)

    if method == "iterative":
        if optimizer != "adam":
            raise ValueError(
                "method='iterative' has stochastic (SLQ/Hutchinson) "
                "gradients — use optimizer='adam'"
            )
        if mask is not None:
            raise ValueError(
                "method='iterative' does not support mask= — incomplete "
                "grids break the streamed Kronecker matvec; use the dense "
                "path"
            )
        from gpx.models.multioutput_iterative import (
            logml_value_and_grad_iterative,
        )

        def _run(p, kb):
            return logml_value_and_grad_iterative(
                p, x, Y, kb, nugget=nugget, n_probes=n_probes,
                lanczos_iters=lanczos_iters, cg_tol=cg_tol,
                cg_max_iters=cg_max_iters, precond_rank=precond_rank,
                mesh=mesh, mesh_axis=mesh_axis,
            )

        loglik = stochastic_log_density_vjp(_run)
        step_keys = random.split(
            key if key is not None else random.PRNGKey(0), steps + 1
        )

        def log_density(p, kb):
            val = loglik(p, kb)
            return val if log_prior is None else val + log_prior(p)

        return optimize_log_density(
            template, log_density, steps=steps, optimizer=optimizer,
            learning_rate=learning_rate, grad_tol=grad_tol,
            history_size=history_size, step_keys=step_keys,
        )

    def log_density(p):
        val = log_marginal_likelihood(p, x, Y, nugget=nugget, method=method,
                                      mask=mask)
        return val if log_prior is None else val + log_prior(p)

    return optimize_log_density(
        template, log_density, steps=steps, optimizer=optimizer,
        learning_rate=learning_rate, grad_tol=grad_tol,
        history_size=history_size,
    )


def sample_mh(
    key,
    x,
    Y,
    template,
    log_prior: Callable,
    n_samples: int,
    *,
    proposal_scale: float = 0.1,
    n_chains: int = 4,
    burn_in: int = 0,
    thin: int = 1,
    nugget: float = gp.LOGML_NUGGET,
    init_jitter: float = 0.1,
    method: str = "auto",
    mask=None,
):
    """Random-walk MH over all multi-output hyperparameters (base
    kernel(s), W, κ, noise) — the KernelParameters.sample composition
    (KernelParameters.scala:231-246) lifted to the ICM/LMC likelihood via
    the generic ``sample_mh_log_density``; returns the same
    PosteriorSamples the single-output samplers do. ``mask`` samples
    against an incomplete grid (dense likelihood)."""
    from gpx.infer import sample_mh_log_density

    x, Y = _check_xy(x, Y, template)

    def log_density(p):
        return log_prior(p) + log_marginal_likelihood(
            p, x, Y, nugget=nugget, method=method, mask=mask
        )

    return sample_mh_log_density(
        key, template, log_density, n_samples,
        proposal_scale=proposal_scale, n_chains=n_chains, burn_in=burn_in,
        thin=thin, init_jitter=init_jitter,
    )


def sample_nuts(
    key,
    x,
    Y,
    template,
    log_prior: Callable,
    n_samples: int,
    *,
    max_depth: int = 8,
    eps: float | None = None,
    warmup_iters: int = 500,
    adapt_mass: bool = False,
    n_chains: int = 4,
    burn_in: int = 0,
    thin: int = 1,
    nugget: float = gp.LOGML_NUGGET,
    init_jitter: float = 0.1,
    method: str = "auto",
    mask=None,
):
    """NUTS over all multi-output hyperparameters — gradients flow by
    autodiff through the kron (eigh VJP) or dense (Cholesky VJP) logML;
    if warmup wanders into a degenerate-B region and NaNs the eigh VJP,
    pass ``method="dense"`` (see :func:`log_marginal_likelihood`)."""
    from gpx.infer import sample_nuts_log_density

    x, Y = _check_xy(x, Y, template)

    def log_density(p):
        return log_prior(p) + log_marginal_likelihood(
            p, x, Y, nugget=nugget, method=method, mask=mask
        )

    return sample_nuts_log_density(
        key, template, log_density, n_samples,
        max_depth=max_depth, eps=eps, warmup_iters=warmup_iters,
        adapt_mass=adapt_mass, n_chains=n_chains, burn_in=burn_in,
        thin=thin, init_jitter=init_jitter,
    )
