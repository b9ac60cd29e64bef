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

from gpx.models.gp import LOGML_NUGGET, PREDICT_NUGGET
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
    if precond is None:
        m_inv = lambda v: v
    elif callable(precond):
        m_inv = precond
    else:                       # WoodburyPreconditioner (or anything .apply)
        m_inv = precond.apply

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
        # non-positive curvature or a non-positive preconditioned residual
        # norm = f32 breakdown for that column: freeze it (finite,
        # unconverged) instead of producing NaNs. rz <= 0 happens when an
        # inexact (e.g. low-precision) preconditioner loses definiteness —
        # without the guard, beta = rz_new / tiny overflows p to inf and
        # the frozen alpha * p = 0 * inf then poisons x with NaN (measured
        # at N=32k on chip).
        ok = active & (denom > 0.0) & jnp.isfinite(denom) & (rz > 0.0)
        alpha = jnp.where(ok, rz / jnp.where(ok, denom, 1.0), 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        z = m_inv(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(ok, rz_new / jnp.maximum(rz, tiny), 0.0)
        p = jnp.where(ok[None, :], z + beta[None, :] * p, p)
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
    diag = kernel.diag(x, dtype=dtype)

    from gpx.kernels import has_white

    exact = x.shape[-1] > 8 and has_white(kernel)

    def column(pivot_idx):
        xp = lax.dynamic_slice_in_dim(x, pivot_idx, 1, 0)   # (1, D)
        r2 = sq_distances(x, xp, exact=exact)
        # exact-zero self-distance so White contributes at the pivot
        r2 = r2.at[pivot_idx, 0].set(0.0)
        # evaluate_xx, not evaluate_r2: anisotropic (Ard) and
        # non-stationary (Linear) kernels need the coordinates
        return kernel.evaluate_xx(x, xp, r2)[:, 0]

    floor = 1e-7 * jnp.max(diag)  # stop once the residual trace is exhausted

    def step(carry, i):
        l, d = carry
        pivot = jnp.argmax(d)
        k_col = column(pivot)
        l_pivot = lax.dynamic_slice_in_dim(l, pivot, 1, 0)[0]   # (rank,)
        # HIGHEST: the residual is a cancellation of near-equal columns;
        # the TPU's default single-pass bf16 matmul destroys it at f32
        resid = k_col - jnp.dot(
            l, l_pivot, preferred_element_type=l.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
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


class WoodburyPreconditioner(NamedTuple):
    """``P = L_r L_r^T + noise I`` held in its eigenbasis: ``P = W (lam +
    noise) W^T + noise (I - W W^T)`` with ``W`` orthonormal (n, r).

    Why not the textbook Woodbury ``cho_solve(noise I + L^T L)``: at f32
    with n = 32k, cond(noise I + L^T L) ~ 1e5 and the solve's asymmetric
    rounding makes P^{-1} non-symmetric enough that PCG *diverges*
    (measured: residual grew 217 -> 1329 where plain CG converged). The
    ``W c W^T`` form applies the inverse as an elementwise scale in an
    orthonormal basis — symmetric to machine precision.

    ``apply`` = P^{-1}; ``logdet`` = log det P (exact); ``sample`` draws
    z ~ N(0, P) via the exact square root ``W sqrt(lam + noise) W^T +
    sqrt(noise)(I - W W^T)`` — the probe distribution of preconditioned
    SLQ."""

    w: jnp.ndarray         # (n, r) orthonormal
    lam: jnp.ndarray       # (r,) eigenvalues of L_r L_r^T, >= 0
    noise: jnp.ndarray
    n: int

    def apply(self, v):
        squeeze = v.ndim == 1
        v2 = v[:, None] if squeeze else v
        scale = (self.lam / (self.lam + self.noise)).astype(v2.dtype)
        w = self.w.astype(v2.dtype)
        hi = jax.lax.Precision.HIGHEST       # bf16 default breaks symmetry
        t = jnp.matmul(w.T, v2, precision=hi)
        out = (v2 - jnp.matmul(w, scale[:, None] * t, precision=hi)) / (
            self.noise.astype(v2.dtype)
        )
        return out[:, 0] if squeeze else out

    @property
    def logdet(self):
        rank = self.lam.shape[0]
        return jnp.sum(jnp.log(self.lam + self.noise)) + (
            self.n - rank
        ) * jnp.log(self.noise)

    def sample(self, key, n_probes: int, base: str = "normal"):
        """Probes ``z = P^{1/2} u`` through the exact symmetric square
        root. ``base="normal"`` gives z ~ N(0, P) (the SLQ probes);
        ``base="rademacher"`` keeps ``E[z z^T] = P`` with Rademacher
        ``u`` — required for the Hutchinson GRADIENT probes, where the
        estimated matrix ``P^{1/2} K^{-1} G P^{-1/2}`` is diagonal-
        dominant for white-noise components and Gaussian probes pay the
        full diagonal variance that Rademacher cancels (measured: the
        noise-gradient variance exploded 30x with Gaussian P-probes)."""
        if base == "rademacher":
            u = random.rademacher(key, (self.n, n_probes), dtype=self.w.dtype)
        else:
            u = random.normal(key, (self.n, n_probes), self.w.dtype)
        gain = jnp.sqrt(self.lam + self.noise) - jnp.sqrt(self.noise)
        hi = jax.lax.Precision.HIGHEST
        t = jnp.matmul(self.w.T, u, precision=hi)
        return jnp.matmul(self.w, gain[:, None] * t, precision=hi) + jnp.sqrt(
            self.noise
        ) * u


def pivoted_cholesky_preconditioner(kernel, x, rank: int, noise: float):
    """Build a :class:`WoodburyPreconditioner` for ``K ≈ L_r L_r^T +
    noise I``. ``noise`` should be the additive diagonal (white variance +
    nugget) so P matches K's noise floor. ``.apply`` is the ``precond``
    callable for :func:`cg_solve`."""
    l_r = pivoted_cholesky(kernel, x, rank)
    noise = jnp.asarray(noise, l_r.dtype)
    # HIGHEST matmul precision: QR/eigh lower to blocked Householder
    # matmuls which default to single-pass bf16 on TPU — the resulting W
    # loses orthonormality to ~1e-2 and the 'SPD' preconditioner breaks
    # PCG (measured NaN at N=32k)
    with jax.default_matmul_precision("highest"):
        q, r_mat = jnp.linalg.qr(l_r)             # (n, r), (r, r)
        lam, u = jnp.linalg.eigh(r_mat @ r_mat.T)
        w = q @ u
    return WoodburyPreconditioner(
        w=w, lam=jnp.maximum(lam, 0.0), noise=noise, n=l_r.shape[0]
    )


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


def _pcg_tridiag(matvec, z, m: int, precond):
    """``m`` fixed PCG iterations on ``K x = z``, returning the Lanczos
    tridiagonal of ``P^{-1/2} K P^{-1/2}`` recovered from the CG step/
    direction coefficients (Saad 2003 §6.7; the mBCG device of the BBMM
    paper, PAPERS.md): ``T_jj = 1/a_j + b_{j-1}/a_{j-1}``,
    ``T_{j,j+1} = sqrt(b_j)/a_j``. Columns that converge early are frozen
    and their trailing T entries extend with (1, 0) — a log-eigenvalue
    contribution of zero."""
    m_inv = precond.apply if hasattr(precond, "apply") else precond
    r = z
    zz = m_inv(r)
    p = zz
    rz = jnp.sum(r * zz, axis=0)
    tiny = jnp.asarray(1e-30, z.dtype)

    def step(carry, _):
        x_unused, r, p, rz, a_prev, b_prev = carry
        active = rz > tiny
        ap = matvec(p)
        denom = jnp.sum(p * ap, axis=0)
        ok = active & (denom > 0.0) & jnp.isfinite(denom)
        a = jnp.where(ok, rz / jnp.where(ok, denom, 1.0), 1.0)
        # STICKY freeze: a broken-down column (converged or non-SPD
        # breakdown) must keep r/p/rz unchanged — then every later
        # iteration sees the same state, stays non-ok, and keeps emitting
        # the (1, 0) identity extension. Updating r with the a=1.0 filler
        # instead lets the column 'recover' and emit garbage T entries
        # (found by review: reproduced on a diag(-1, 2, 3) system).
        r_new = jnp.where(ok[None, :], r - a[None, :] * ap, r)
        z_new = m_inv(r_new)
        rz_new = jnp.where(ok, jnp.sum(r_new * z_new, axis=0), rz)
        b = jnp.where(ok, rz_new / jnp.maximum(rz, tiny), 0.0)
        p_new = jnp.where(ok[None, :], z_new + b[None, :] * p, p)
        t_diag = jnp.where(ok, 1.0 / a + b_prev / a_prev, 1.0)
        t_off = jnp.where(ok, jnp.sqrt(jnp.maximum(b, 0.0)) / a, 0.0)
        return (x_unused, r_new, p_new, rz_new, a, b), (t_diag, t_off)

    one = jnp.ones_like(rz)
    (_, _, _, _, _, _), (t_diags, t_offs) = lax.scan(
        step, (z, r, p, rz, one, jnp.zeros_like(rz)), None, length=m
    )
    return t_diags, t_offs[:-1]        # (m, R), (m-1, R)


def slq_logdet_preconditioned(matvec, precond: "WoodburyPreconditioner",
                              key, *, n_probes: int = 16, m: int = 32):
    """Preconditioned SLQ: ``logdet K = logdet P + E_{u~N(0,I)}[u^T
    log(P^{-1/2} K P^{-1/2}) u]`` with probes ``z = P^{1/2} u`` and the
    quadrature tridiagonals recovered from ``m`` PCG iterations
    (:func:`_pcg_tridiag`). Since ``P^{-1}K ≈ I``, the stochastic part is
    small and concentrated — the variance-reduction that makes SLQ usable
    at cond(K) ~ 1e5 where plain Lanczos underestimates badly (BBMM,
    PAPERS.md). Each probe is weighted by its own ``||u||^2 = z^T P^{-1}
    z`` — weight and quadrature are correlated, so substituting the
    expectation n would re-inject O(1/sqrt(n)) variance (measured: 4.5 vs
    0.5 absolute logdet error at n=400)."""
    z = precond.sample(key, n_probes)          # z ~ N(0, P)
    weights = jnp.sum(z * precond.apply(z), axis=0)      # ||u||^2 per probe
    t_diags, t_offs = _pcg_tridiag(matvec, z, m, precond)

    def quad(diag, off):
        t = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
        theta, vecs = jnp.linalg.eigh(t)
        theta = jnp.maximum(theta, 1e-12)
        return jnp.sum(vecs[0, :] ** 2 * jnp.log(theta))

    quads = jax.vmap(quad, in_axes=(1, 1))(t_diags, t_offs)
    return precond.logdet + jnp.mean(weights * quads)


class IterativePosterior(NamedTuple):
    x: jnp.ndarray
    mean: jnp.ndarray
    variance: jnp.ndarray      # empty (0,) array when variance="none"
    cg_iters: jnp.ndarray
    cg_converged: jnp.ndarray


def fit_iterative(
    params: Parameters,
    x,
    y,
    xs,
    *,
    nugget: float = PREDICT_NUGGET,
    cg_tol: float = 1e-5,
    cg_max_iters: int = 1000,
    precond_rank: int = 0,
    variance: str = "exact",
    variance_block: int = 256,
    mesh=None,
    mesh_axis: str = "data",
) -> IterativePosterior:
    """Matrix-free GP posterior at ``xs`` — GPML Alg 2.1 (Predict.fit,
    Predict.scala:57-94) for N beyond the dense paths: K(x, x) never
    materializes (streamed matvecs), so memory is O(N (D + block)).

    * mean: one (preconditioned) CG solve for ``alpha``, then the streamed
      cross matvec ``K(xs, x) @ alpha`` — O(N M) compute, O(N + M) memory.
    * variance (``variance="exact"``): per block of ``variance_block`` test
      points, batched CG on the cross-covariance columns gives
      ``K^{-1} K(x, S)`` and ``var = k_ss - diag(K(S, x) K^{-1} K(x, S))``
      — exact up to ``cg_tol`` but M/block extra CG solves; pass
      ``variance="none"`` for the mean-only fit at large M.

    ``mesh=`` shards every Gram matvec's row range over ``mesh[mesh_axis]``
    (gpx.parallel.distributed_gram_matvec) — the O(N^2)-per-iteration CG
    cost splits across chips while vectors stay O(N); the matrix-free
    regime then scales past one chip's FLOPs, not just its memory.
    """
    if variance not in ("exact", "none"):
        raise ValueError(f"unknown variance mode: {variance}")
    x = as_locations(x)
    xs = as_locations(xs)
    m = xs.shape[0]

    if mesh is not None:
        from gpx.parallel.dist_matvec import distributed_gram_matvec

        matvec = distributed_gram_matvec(
            params.kernel, x, mesh, axis=mesh_axis, nugget=nugget
        )
    else:
        def matvec(v):
            return gram_matvec(params.kernel, x, v, nugget=nugget)

    precond = None
    if precond_rank > 0:
        from gpx.kernels import split_noise

        smooth, noise_var = split_noise(params.kernel)
        if smooth is not None:
            precond = pivoted_cholesky_preconditioner(
                smooth, x, precond_rank, noise=noise_var + nugget + 1e-8
            )

    r = y - params.mean(x)
    alpha, cg_iters, cg_converged = cg_solve(
        matvec, r, tol=cg_tol, max_iters=cg_max_iters, precond=precond
    )
    from gpx.ops.pallas_matvec import cross_matvec

    mean = params.mean(xs) + cross_matvec(params.kernel, xs, x, alpha)

    if variance == "none":
        return IterativePosterior(
            x=xs, mean=mean, variance=jnp.zeros((0,), mean.dtype),
            cg_iters=cg_iters, cg_converged=cg_converged,
        )

    kss = params.kernel.diag(xs, dtype=mean.dtype)
    pad = (-m) % variance_block
    xs_p = jnp.pad(xs, ((0, pad), (0, 0)))
    blocks = xs_p.reshape(-1, variance_block, xs.shape[1])

    def one_block(xb):
        ks = params.kernel.gram(x, xb)         # K(x, S_b): (N, B)
        sol, _, ok = cg_solve(
            matvec, ks, tol=cg_tol, max_iters=cg_max_iters, precond=precond
        )
        return jnp.sum(ks * sol, axis=0), ok

    quad, ok_blocks = lax.map(one_block, blocks)
    var = jnp.maximum(kss - quad.reshape(-1)[:m], 0.0)
    return IterativePosterior(
        x=xs, mean=mean, variance=var, cg_iters=cg_iters,
        cg_converged=jnp.logical_and(cg_converged, ok_blocks.all()),
    )


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
    mesh=None,
    mesh_axis: str = "data",
) -> IterativeLogML:
    """Matrix-free logML value + hyperparameter gradient estimate.

    The quadratic term and its gradient are CG-exact (up to ``cg_tol``);
    the logdet and its gradient are SLQ/Hutchinson estimates with shared
    probes. Memory is O(N (D + probes)). ``precond_rank > 0`` builds a
    pivoted-Cholesky preconditioner for the CG solves (essential when the
    kernel's smooth part dominates the noise floor).

    ``mesh=`` runs every matvec — CG solves, Lanczos/SLQ, and the
    Hutchinson gradient contractions — with its row range sharded over
    ``mesh[mesh_axis]`` (gpx.parallel.distributed_gram_matvec); probes,
    vectors and the preconditioner stay replicated.
    """
    x = as_locations(x)
    n = x.shape[0]
    k_quad, k_slq, k_probe = random.split(key, 3)

    if mesh is not None:
        from gpx.parallel.dist_matvec import distributed_gram_matvec

        def matvec_with(kern, v):
            return distributed_gram_matvec(
                kern, x, mesh, axis=mesh_axis, nugget=nugget
            )(v)
    else:
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

    # quadratic term: alpha = K^{-1} r, plus probe solves K^{-1} z (batched).
    # With a preconditioner the probes come from N(0, P) and the Hutchinson
    # weight vector is P^{-1} z: E[z^T K^{-1} G P^{-1} z] = tr(K^{-1} G)
    # still, but since P ~ K the quadratic form concentrates — the BBMM
    # preconditioned-probe variance reduction, now applied to the GRADIENT
    # trace term too (round-3 VERDICT 8; measured reduction in PERF.md).
    if precond is not None:
        probes = precond.sample(
            k_probe, n_probes, base="rademacher"
        ).astype(r.dtype)
        probe_weights = precond.apply(probes)
    else:
        probes = random.rademacher(k_probe, (n, n_probes), dtype=r.dtype)
        probe_weights = probes
    rhs = jnp.concatenate([r[:, None], probes], axis=1)
    solves, cg_iters, cg_converged = cg_solve(
        matvec, rhs, tol=cg_tol, max_iters=cg_max_iters, precond=precond
    )
    alpha = solves[:, 0]
    probe_solves = solves[:, 1:]

    if precond is not None:
        # preconditioned SLQ: logdet P exactly + a small stochastic
        # correction for log det(P^{-1}K) — dramatically lower variance
        # than plain SLQ when P tracks K (ROADMAP item 7)
        logdet = slq_logdet_preconditioned(
            matvec, precond, k_slq, n_probes=n_probes, m=lanczos_iters
        )
    else:
        logdet = slq_logdet(
            matvec, n, k_slq, n_probes=n_probes, m=lanczos_iters,
            dtype=r.dtype,
        )
    value = -0.5 * alpha @ r - 0.5 * logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)

    # gradients:
    #   d/d theta [-1/2 r^T K^{-1} r] = 1/2 alpha^T (dK/d theta) alpha
    #   d/d theta [-1/2 logdet]      = -1/2 E[(K^{-1} z)^T (dK/d theta) z]
    # both as jax.grad of scalar matvec forms with stopped vectors.
    alpha_s = lax.stop_gradient(alpha)
    probes_s = lax.stop_gradient(probe_weights)
    probe_solves_s = lax.stop_gradient(probe_solves)

    # the contraction differentiates *through the matvec* w.r.t. kernel
    # hyperparameters, so it uses the XLA row-blocked path (differentiable;
    # the Pallas forward has no AD rule) — still O(block * N) memory.
    from gpx.ops.pallas_matvec import _gram_matvec_xla

    if mesh is not None:
        from gpx.parallel.dist_matvec import distributed_gram_matvec

        def _grad_mv(kern, v):
            return distributed_gram_matvec(
                kern, x, mesh, axis=mesh_axis, nugget=nugget, method="xla"
            )(v)
    else:
        def _grad_mv(kern, v):
            return _gram_matvec_xla(kern, x, v, nugget)

    def contraction(kern):
        quad = 0.5 * alpha_s @ _grad_mv(kern, alpha_s[:, None])[:, 0]
        tr = jnp.mean(
            jnp.sum(
                probe_solves_s * _grad_mv(kern, probes_s),
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
