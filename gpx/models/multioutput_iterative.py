"""Matrix-free multi-output GP inference: large-N ICM/LMC.

The dense multi-output paths (gpx.models.multioutput) cap where the dense
single-output paths do — the Kronecker eigen-path needs an N×N ``eigh``
and the LMC/per-output-noise path a dense NT Cholesky. Here every
operation is a streamed Kronecker matvec

    (Σ_q B_q ⊗ K_q + D ⊗ I) vec(V)  =  vec( Σ_q mv_q(V) B_q + V·diag(D) )

where ``mv_q`` is the single-output streamed Gram matvec
(gpx.ops.pallas_matvec — K_q never materializes) applied to all T·R
columns at once, and ``B_q`` is a tiny (T, T) MXU matmul. Memory is
O(N (D + T·R)); the estimators are the single-output iterative engine's
(gpx.models.gp_iterative: CG quadratic term, SLQ logdet, Hutchinson
gradients), consumed unchanged on flat output-major (NT,)-vectors.

Preconditioning generalizes the pivoted-Cholesky Woodbury through the
Kronecker structure: with shared noise, ``P = B ⊗ L_r L_rᵀ + σ²I``
diagonalizes per output-eigenvector — ``eigh(B)`` (T×T, exact) rotates the
output axis, and each rotated column ``a`` is a standard Woodbury with
eigenvalues ``λ_a · lam`` (:class:`KronWoodburyPreconditioner`). Apply,
logdet, and probe sampling stay exact and O(N·T·r).

``mesh=`` row-shards every K_q matvec over the data axis
(gpx.parallel.dist_matvec) — multi-chip matrix-free multi-output.

Beyond the reference (its multi-sensor coverage is the 8-sensor DLM,
TemperatureDlm.scala:83-118): this is the scalable leg of the ICM/LMC
family gpx adds on top, mirroring how gp_iterative extends gp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random

from gpx.models.gp import LOGML_NUGGET, PREDICT_NUGGET
from gpx.models.gp_iterative import (
    cg_solve,
    pivoted_cholesky_preconditioner,
    slq_logdet,
    slq_logdet_preconditioned,
)
from gpx.models.multioutput import (
    IcmParams,
    LmcParams,
    MultiOutputSummary,
    _check_xy,
    _is_shared_noise,
    _noise_vec,
    _terms,
    coregion_matrix,
)
from gpx.ops.distance import as_locations

HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# flat output-major <-> (N, T[, R]) matrix views
# ---------------------------------------------------------------------------

def _to_mat(v, n, t):
    """Flat output-major (NT, R) -> (N, T, R) (flat index = output·N + loc,
    matching multioutput.gram_full's ordering)."""
    return jnp.moveaxis(v.reshape(t, n, -1), 0, 1)


def _to_flat(V):
    """(N, T, R) -> flat output-major (NT, R)."""
    n, t, r = V.shape
    return jnp.moveaxis(V, 1, 0).reshape(t * n, r)


def kron_matvec(p, x, *, nugget: float = 0.0, mesh=None,
                mesh_axis: str = "data", method: str = "auto"):
    """Return ``mv(v) = (Σ_q B_q ⊗ K_q + (noise + nugget) I) @ v`` on flat
    output-major vectors ``v``: (NT,) or (NT, R) — the multi-output
    analogue of :func:`gpx.ops.pallas_matvec.gram_matvec`.

    Per term: one streamed Gram matvec on all T·R columns (Pallas on TPU,
    XLA row blocks elsewhere), then the (T, T) coregionalization matmul.
    ``method="xla"`` forces the row-blocked XLA kernel — differentiable
    w.r.t. ALL hyperparameters (kernels, W, κ, noise), for the Hutchinson
    gradient contraction. ``mesh=`` row-shards each Gram matvec over
    ``mesh[mesh_axis]`` (vectors stay replicated)."""
    x = as_locations(x)
    n = x.shape[0]
    t = p.n_outputs
    terms = _terms(p)
    d = _noise_vec(p) + nugget                      # (T,) additive diagonal

    if mesh is not None:
        from gpx.parallel.dist_matvec import distributed_gram_matvec

        mvs = [
            distributed_gram_matvec(
                kern, x, mesh, axis=mesh_axis, nugget=0.0, method=method
            )
            for kern, _ in terms
        ]
    elif method == "xla":
        from gpx.ops.pallas_matvec import _gram_matvec_xla

        mvs = [
            (lambda v2, kern=kern: _gram_matvec_xla(kern, x, v2, 0.0))
            for kern, _ in terms
        ]
    else:
        from gpx.ops.pallas_matvec import gram_matvec

        mvs = [
            (lambda v2, kern=kern: gram_matvec(kern, x, v2, nugget=0.0))
            for kern, _ in terms
        ]

    def mv(v):
        squeeze = v.ndim == 1
        v2 = v[:, None] if squeeze else v           # (NT, R)
        r = v2.shape[1]
        V = _to_mat(v2, n, t)                       # (N, T, R)
        cols = V.reshape(n, t * r)
        out = V * d[None, :, None]
        for mv_q, (_, bq) in zip(mvs, terms):
            w = mv_q(cols).reshape(n, t, r)         # (K_q V) per column
            out = out + jnp.einsum("ntr,ts->nsr", w, bq, precision=HI)
        flat = _to_flat(out)
        return flat[:, 0] if squeeze else flat

    return mv


# ---------------------------------------------------------------------------
# Kronecker Woodbury preconditioner
# ---------------------------------------------------------------------------

class KronWoodburyPreconditioner(NamedTuple):
    """``P = B ⊗ (L_r L_rᵀ + σ_w² I) + σ² I`` held jointly diagonalized:
    ``eigh(B) = Qb Λb Qbᵀ`` (T×T, exact) and the SMOOTH part of the base
    kernel's pivoted-Cholesky eigenbasis ``W`` (N×r, orthonormal —
    gp_iterative's WoodburyPreconditioner construction; any White
    component σ_w² is split out, same as the single-output path, so the
    rank-r budget goes to the smooth spectrum). In the rotated basis
    ``(Qbᵀ ⊗ I)``, output-column ``a`` is the standard Woodbury with
    spectrum ``λb[a]·lam`` and its OWN noise floor
    ``noise[a] = λb[a]·σ_w² + σ²``, so apply/logdet/sample are exact:

        P⁻¹ = (Qb ⊗ I) blockdiag_a[ Wc_aWᵀ-form ] (Qbᵀ ⊗ I),
        log det P = Σ_{a,i} log(λb[a]·lam[i] + noise[a])
                    + (N − r)·Σ_a log noise[a].

    Same symmetric eigen-scale form (not textbook Woodbury solves) for the
    same f32 reason documented on the single-output class. Operates on
    flat output-major (NT,[R]) vectors."""

    w: jnp.ndarray        # (N, r) orthonormal
    lam: jnp.ndarray      # (r,) eigenvalues of L_r L_rᵀ, >= 0
    lam_b: jnp.ndarray    # (T,) eigenvalues of B, >= 0
    qb: jnp.ndarray       # (T, T) orthonormal
    noise: jnp.ndarray    # (T,) per-rotated-column floor λb·σ_w² + σ²
    n: int
    t: int

    def _rot(self, V, back: bool = False):
        q = self.qb.astype(V.dtype)
        sub = "ntr,ta->nar" if not back else "nar,ta->ntr"
        return jnp.einsum(sub, V, q, precision=HI)

    def apply(self, v):
        squeeze = v.ndim == 1
        v2 = v[:, None] if squeeze else v
        V = self._rot(_to_mat(v2, self.n, self.t))          # (N, T, R) rotated
        w = self.w.astype(V.dtype)
        lam_at = self.lam_b[:, None] * self.lam[None, :]     # (T, r)
        scale = (lam_at / (lam_at + self.noise[:, None])).astype(V.dtype)
        tproj = jnp.einsum("nk,nar->kar", w, V, precision=HI)
        out = (
            V - jnp.einsum(
                "nk,kar->nar", w, scale.T[:, :, None] * tproj, precision=HI
            )
        ) / self.noise[None, :, None].astype(V.dtype)
        flat = _to_flat(self._rot(out, back=True))
        return flat[:, 0] if squeeze else flat

    @property
    def logdet(self):
        rank = self.lam.shape[0]
        lam_at = self.lam_b[:, None] * self.lam[None, :]
        return jnp.sum(jnp.log(lam_at + self.noise[:, None])) + (
            self.n - rank
        ) * jnp.sum(jnp.log(self.noise))

    def sample(self, key, n_probes: int, base: str = "normal"):
        """Probes ``z = P^{1/2} u`` (E[z zᵀ] = P for any unit-covariance
        ``u`` — Rademacher base for the gradient probes, same variance
        rationale as the single-output class)."""
        shape = (self.n, self.t, n_probes)
        if base == "rademacher":
            u = random.rademacher(key, shape, dtype=self.w.dtype)
        else:
            u = random.normal(key, shape, self.w.dtype)
        lam_at = self.lam_b[:, None] * self.lam[None, :]     # (T, r)
        root = jnp.sqrt(self.noise)                          # (T,)
        gain = jnp.sqrt(lam_at + self.noise[:, None]) - root[:, None]
        tproj = jnp.einsum("nk,nar->kar", self.w, u, precision=HI)
        z = jnp.einsum(
            "nk,kar->nar", self.w, gain.T[:, :, None] * tproj, precision=HI
        ) + root[None, :, None] * u
        return _to_flat(self._rot(z, back=True))


def kron_preconditioner(p: IcmParams, x, rank: int, *,
                        nugget: float = 0.0) -> KronWoodburyPreconditioner:
    """Build the Kronecker Woodbury for an ICM with shared noise: pivoted
    Cholesky of the smooth part of the base kernel (rank ``rank``) + exact
    ``eigh(B)``; a White component in the base kernel moves to the
    per-rotated-column noise floor instead of eating the rank budget
    (the single-output guard, gp_iterative.py:495-503, lifted through
    the Kronecker structure)."""
    if isinstance(p, LmcParams):
        raise ValueError(
            "preconditioning is ICM-only — an LMC's sum of Kronecker "
            "products has no joint (B, K) eigen-split; use precond_rank=0"
        )
    if not _is_shared_noise(p):
        raise ValueError(
            "preconditioning needs scalar (shared) noise — per-output "
            "noise breaks the output-axis rotation; use precond_rank=0"
        )
    from gpx.kernels import split_noise

    x = as_locations(x)
    smooth, noise_w = split_noise(p.kernel)
    if smooth is None:
        raise ValueError(
            "the ICM base kernel is pure White — there is no smooth "
            "spectrum to precondition; use precond_rank=0"
        )
    wp = pivoted_cholesky_preconditioner(
        smooth, x, rank, noise=float(1.0)  # noise substituted below
    )
    b = coregion_matrix(p)
    with jax.default_matmul_precision("highest"):
        lam_b, qb = jnp.linalg.eigh(b)
    lam_b = jnp.maximum(lam_b, 0.0)
    floor = jnp.asarray(p.noise) + nugget + 1e-8
    return KronWoodburyPreconditioner(
        w=wp.w, lam=wp.lam, lam_b=lam_b, qb=qb,
        noise=lam_b * jnp.asarray(noise_w) + floor, n=x.shape[0],
        t=p.n_outputs,
    )


# ---------------------------------------------------------------------------
# logML value + gradients
# ---------------------------------------------------------------------------

class IterativeMoLogML(NamedTuple):
    value: jnp.ndarray
    grads: object                  # IcmParams/LmcParams-shaped cotangent
    cg_iters: jnp.ndarray
    cg_converged: jnp.ndarray


def logml_value_and_grad_iterative(
    p, x, Y, key, *,
    nugget: float = LOGML_NUGGET,
    n_probes: int = 16,
    lanczos_iters: int = 32,
    cg_tol: float = 1e-5,
    cg_max_iters: int = 1000,
    precond_rank: int = 0,
    mesh=None,
    mesh_axis: str = "data",
) -> IterativeMoLogML:
    """Matrix-free multi-output logML + hyperparameter gradient estimate —
    ``log N(vec Y | 0, Σ_q B_q ⊗ K_q + D ⊗ I)`` by CG (quadratic term,
    exact to ``cg_tol``) + SLQ (logdet) + Hutchinson probes (gradient
    trace), exactly the single-output estimator set
    (gp_iterative.logml_value_and_grad_iterative) run against the
    streamed Kronecker matvec. Gradients cover every hyperparameter:
    base kernel(s) through the differentiable XLA matvec, ``W``/``κ``
    through the (T, T) coregionalization contraction, noise through the
    diagonal. ``precond_rank > 0`` builds the Kronecker Woodbury
    (ICM + shared noise only)."""
    x, Y = _check_xy(x, Y, p)
    n, t = Y.shape
    nt = n * t
    k_slq, k_probe = random.split(key)

    matvec = kron_matvec(p, x, nugget=nugget, mesh=mesh, mesh_axis=mesh_axis)

    precond = None
    if precond_rank > 0:
        precond = kron_preconditioner(p, x, precond_rank, nugget=nugget)

    y = Y.T.reshape(-1)                               # flat output-major

    if precond is not None:
        probes = precond.sample(k_probe, n_probes, base="rademacher").astype(
            y.dtype
        )
        probe_weights = precond.apply(probes)
    else:
        probes = random.rademacher(k_probe, (nt, n_probes), dtype=y.dtype)
        probe_weights = probes
    rhs = jnp.concatenate([y[:, None], probes], axis=1)
    solves, cg_iters, cg_converged = cg_solve(
        matvec, rhs, tol=cg_tol, max_iters=cg_max_iters, precond=precond
    )
    alpha = solves[:, 0]
    probe_solves = solves[:, 1:]

    if precond is not None:
        logdet = slq_logdet_preconditioned(
            matvec, precond, k_slq, n_probes=n_probes, m=lanczos_iters
        )
    else:
        logdet = slq_logdet(
            matvec, nt, k_slq, n_probes=n_probes, m=lanczos_iters,
            dtype=y.dtype,
        )
    value = -0.5 * alpha @ y - 0.5 * logdet - 0.5 * nt * jnp.log(2.0 * jnp.pi)

    # Hutchinson gradients through the DIFFERENTIABLE matvec (xla path):
    #   d/dθ [-1/2 yᵀK⁻¹y]  = 1/2 αᵀ (dK/dθ) α
    #   d/dθ [-1/2 logdet]  = -1/2 E[(K⁻¹z)ᵀ (dK/dθ) (P⁻¹z)]
    alpha_s = lax.stop_gradient(alpha)
    weights_s = lax.stop_gradient(probe_weights)
    probe_solves_s = lax.stop_gradient(probe_solves)

    def contraction(p_):
        mv_d = kron_matvec(
            p_, x, nugget=nugget, mesh=mesh, mesh_axis=mesh_axis,
            method="xla",
        )
        quad = 0.5 * alpha_s @ mv_d(alpha_s[:, None])[:, 0]
        tr = jnp.mean(jnp.sum(probe_solves_s * mv_d(weights_s), axis=0))
        return quad - 0.5 * tr

    grads = jax.grad(contraction)(p)
    return IterativeMoLogML(
        value=value, grads=grads, cg_iters=cg_iters,
        cg_converged=cg_converged,
    )


# ---------------------------------------------------------------------------
# prediction
# ---------------------------------------------------------------------------

class IterativeMoPosterior(NamedTuple):
    x: jnp.ndarray
    mean: jnp.ndarray              # (M, T)
    variance: jnp.ndarray          # (M, T); (0, 0) when variance="none"
    cg_iters: jnp.ndarray
    cg_converged: jnp.ndarray

    def interval(self, q):
        from gpx.distributions import Normal

        return Normal(self.mean, jnp.sqrt(self.variance)).ppf(q)


def fit_iterative(
    p, x, Y, xs, *,
    nugget: float = PREDICT_NUGGET,
    cg_tol: float = 1e-5,
    cg_max_iters: int = 1000,
    precond_rank: int = 0,
    variance: str = "exact",
    variance_block: int = 32,
    mesh=None,
    mesh_axis: str = "data",
) -> IterativeMoPosterior:
    """Matrix-free multi-output posterior at ``xs`` — the large-N
    counterpart of :func:`gpx.models.multioutput.fit` (zero prior mean;
    returned variance includes observation noise, same convention).

    * mean: one CG solve for ``A = mat(K⁻¹ vec Y)`` (N, T), then per term
      the streamed cross matvec ``K_q(xs, x) A B_q`` — K(xs, x) never
      materializes.
    * variance ``"exact"``: per block of ``variance_block`` test points,
      batched CG on all T·block cross columns; memory O(N·T²·block) —
      shrink the block (or pass ``variance="none"``) at very large N·T.
    """
    if variance not in ("exact", "none"):
        raise ValueError(f"unknown variance mode: {variance}")
    x, Y = _check_xy(x, Y, p)
    xs = as_locations(xs)
    n, t = Y.shape
    m = xs.shape[0]
    terms = _terms(p)

    matvec = kron_matvec(p, x, nugget=nugget, mesh=mesh, mesh_axis=mesh_axis)
    precond = None
    if precond_rank > 0:
        precond = kron_preconditioner(p, x, precond_rank, nugget=nugget)

    y = Y.T.reshape(-1)
    alpha, cg_iters, cg_converged = cg_solve(
        matvec, y, tol=cg_tol, max_iters=cg_max_iters, precond=precond
    )
    a_mat = _to_mat(alpha[:, None], n, t)[..., 0]            # (N, T)

    from gpx.ops.pallas_matvec import cross_matvec

    mean = jnp.zeros((m, t), a_mat.dtype)
    for kern, bq in terms:
        ka = cross_matvec(kern, xs, x, a_mat)                # (M, T)
        mean = mean + jnp.matmul(ka, bq, precision=HI)

    if variance == "none":
        return IterativeMoPosterior(
            x=xs, mean=mean, variance=jnp.zeros((0, 0), mean.dtype),
            cg_iters=cg_iters, cg_converged=cg_converged,
        )

    prior_var = sum(
        kern.diag(xs, dtype=mean.dtype)[:, None] * jnp.diag(bq)[None, :]
        for kern, bq in terms
    )

    pad = (-m) % variance_block
    xs_p = jnp.pad(xs, ((0, pad), (0, 0)))
    blocks = xs_p.reshape(-1, variance_block, xs.shape[1])

    def one_block(xb):
        # cross columns for (test s, output i): C[:, j, (s, i)] =
        # Σ_q B_q[j, i] · k_q(x, ·)[:, s] — (N, T, b·T) flat-batched CG
        cross = sum(
            jnp.einsum(
                "ji,ns->njsi", bq, kern.gram(x, xb), precision=HI
            )
            for kern, bq in terms
        ).reshape(n, t, variance_block * t)
        sol, _, ok = cg_solve(
            matvec, _to_flat(cross), tol=cg_tol, max_iters=cg_max_iters,
            precond=precond,
        )
        red = jnp.sum(_to_flat(cross) * sol, axis=0)         # (b·T,)
        return red.reshape(variance_block, t), ok

    quad, ok_blocks = lax.map(one_block, blocks)
    red = quad.reshape(-1, t)[:m]
    var = jnp.maximum(prior_var - red, 0.0) + _noise_vec(p)[None, :]
    return IterativeMoPosterior(
        x=xs, mean=mean, variance=var, cg_iters=cg_iters,
        cg_converged=jnp.logical_and(cg_converged, ok_blocks.all()),
    )
