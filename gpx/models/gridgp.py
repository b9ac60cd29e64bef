"""Grid-structured GPs: exact inference with separable kernels on
Cartesian-product inputs.

When the N inputs form a grid ``X = axes[0] × axes[1] × ...`` (a time
lattice, an image raster, a spatio-temporal stack) and the kernel is
separable across the axes — ``k(x, x') = Π_i k_i(x_i, x'_i)`` — the Gram
matrix is a Kronecker product ``K = K_1 ⊗ K_2 ⊗ ...`` and exact GP
inference needs only per-axis eigendecompositions:

    K + σ²I = (⊗_i Q_i) (⊗_i Λ_i + σ²I) (⊗_i Q_i)ᵀ,

O(Σ n_i³) instead of O((Π n_i)³) — exact logML, prediction, and draws at
N = Π n_i in the millions. Everything after the small per-axis ``eigh``
calls is a chain of dense tensor contractions (one MXU matmul per axis),
which is exactly the shape TPUs want.

The reference caps at the dense Cholesky of its flattened inputs
(GaussianProcess.scala:109-125, Predict.scala:57-94 — its temperature
grids are time × sensor lattices it never exploits); this module is the
structured-data leg gpx adds, mirroring how `multioutput` exploits the
output-axis Kronecker and `gp_iterative` the matrix-free regime.

Incomplete grids (a downed sensor, missing frames): the Kronecker
eigen-identity needs the full lattice, so ``fit(mask=...)`` routes the
posterior-mean solve through CG on the mask-embedded operator — the
Kronecker *matvec* (O(N Σ n_i), no eigh) stays exact under masking.
"""

from __future__ import annotations

import math
from functools import reduce

import jax
import jax.numpy as jnp
from jax import random

from gpx import bijectors as bij
from gpx.kernels import Kernel
from gpx.models import gp
from gpx.ops.distance import as_locations
from gpx.utils.pytree import pytree_dataclass

HI = jax.lax.Precision.HIGHEST


@pytree_dataclass
class GridParams:
    """Separable-kernel hyperparameters: one kernel per grid axis + shared
    observation noise. ``k(x, x') = Π_i k_i(x_i, x'_i)`` — note the signal
    variance multiplies across axes, so fix ``h = 1`` on all but one."""

    kernels: tuple
    noise: jnp.ndarray

    @property
    def n_axes(self) -> int:
        return len(self.kernels)

    def bijectors(self) -> "GridParams":
        return GridParams(
            kernels=tuple(k.bijectors() for k in self.kernels),
            noise=bij.positive,
        )


def grid(kernels, noise: float = 0.1) -> GridParams:
    """Convenience constructor from a list of per-axis kernels."""
    kernels = tuple(kernels)
    return GridParams(kernels=kernels,
                      noise=jnp.asarray(noise, jnp.result_type(float)))


@pytree_dataclass
class CoregionAxis:
    """Pseudo-kernel for an OUTPUT axis of a grid model: its "gram" is the
    coregionalization matrix ``B = W Wᵀ + diag(κ)`` and its coordinates
    are output indices (T, 1). Dropping this in as one of
    :class:`GridParams`' kernels composes the two Kronecker structures —
    multi-output GPs over a lattice, ``B ⊗ K_time ⊗ K_space + σ²I`` —
    which neither `gpx.models.multioutput` (one unstructured input set)
    nor a plain separable grid expresses. ``W``/``κ`` are inferable leaves
    exactly as in `multioutput.IcmParams`."""

    w: jnp.ndarray       # (T, R) factor loadings
    kappa: jnp.ndarray   # (T,) diagonal boost

    @property
    def n_outputs(self) -> int:
        return self.w.shape[0]

    def _b(self, dtype=None):
        b = jnp.matmul(self.w, self.w.T, precision=HI) + jnp.diag(self.kappa)
        return b if dtype is None else b.astype(dtype)

    def gram(self, a, a2=None, *, nugget: float = 0.0, method: str = "auto"):
        b = self._b()
        i1 = jnp.asarray(a).reshape(-1).astype(jnp.int32)
        if a2 is None:
            out = b[jnp.ix_(i1, i1)]
            if nugget:
                out = out + nugget * jnp.eye(out.shape[0], dtype=out.dtype)
            return out
        i2 = jnp.asarray(a2).reshape(-1).astype(jnp.int32)
        return b[jnp.ix_(i1, i2)]

    def diag(self, x, dtype=None):
        i = jnp.asarray(x).reshape(-1).astype(jnp.int32)
        d = jnp.diagonal(self._b(dtype))
        return d[i]

    def bijectors(self) -> "CoregionAxis":
        return CoregionAxis(w=bij.identity, kappa=bij.positive)


def coregion_axis(n_outputs: int, rank: int = 1, *, w=None,
                  kappa=0.2) -> CoregionAxis:
    """Constructor mirroring ``multioutput.icm``'s staggered default ``W``
    (an exactly symmetric init puts the eigh VJP at a repeated-eigenvalue
    point — same rationale, multioutput.py)."""
    if w is None:
        ramp = 1.0 + 0.05 * jnp.arange(n_outputs)[:, None]
        w = ramp * jnp.full((n_outputs, rank), 1.0 / math.sqrt(rank))
    w = jnp.asarray(w, jnp.result_type(float))
    kappa = jnp.broadcast_to(jnp.asarray(kappa, w.dtype), (n_outputs,))
    return CoregionAxis(w=w, kappa=kappa)


def output_axis(n_outputs: int):
    """The grid-axis coordinates for a :class:`CoregionAxis`: output
    indices ``(T, 1)``."""
    return jnp.arange(n_outputs, dtype=jnp.result_type(float))[:, None]


def _check_axes(p: GridParams, axes):
    axes = [as_locations(a) for a in axes]
    if len(axes) != p.n_axes:
        raise ValueError(
            f"{p.n_axes} per-axis kernels but {len(axes)} grid axes"
        )
    return axes


def grid_shape(axes):
    return tuple(a.shape[0] for a in [as_locations(a) for a in axes])


def grid_coords(axes):
    """Materialize the full (N, ΣD_i) Cartesian-product locations — for
    comparing against dense paths; inference never builds this."""
    axes = [as_locations(a) for a in axes]
    idx = jnp.meshgrid(*[jnp.arange(a.shape[0]) for a in axes],
                       indexing="ij")
    return jnp.concatenate(
        [a[i.reshape(-1)] for a, i in zip(axes, idx)], axis=1
    )


def _axis_contract(m, t, axis):
    """Contract matrix ``m`` (r, n_axis) against tensor axis ``axis`` of
    ``t`` — the per-axis step of every Kronecker identity here."""
    # HIGHEST: every Kronecker identity here chains these rotations; the
    # chip's single-pass bf16 matmul default would stack 5.8e-4-grade
    # error per axis into the "exact" logML/solve
    out = jnp.tensordot(m, t, axes=((1,), (axis,)), precision=HI)
    return jnp.moveaxis(out, 0, axis)


def _shard0(t, mesh, mesh_axis):
    """Constrain a grid tensor's leading axis over ``mesh[mesh_axis]`` —
    contractions along other axes are then device-local, and the axis-0
    rotation is one GSPMD-sharded matmul (partial products + reduce)."""
    if mesh is None:
        return t
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(mesh_axis, *([None] * (t.ndim - 1)))
    return jax.lax.with_sharding_constraint(t, NamedSharding(mesh, spec))


def _rotate(t, mats, mesh=None, mesh_axis: str = "data"):
    """``(⊗_i M_i) vec(t)`` as a chain of per-axis contractions."""
    t = _shard0(t, mesh, mesh_axis)
    for i, m in enumerate(mats):
        t = _shard0(_axis_contract(m, t, i), mesh, mesh_axis)
    return t


def _eigs(p: GridParams, axes, nugget):
    """Per-axis ``eigh`` (HIGHEST: Householder matmuls default to
    single-pass bf16 on TPU — same forcing as multioutput._kron_eig) and
    the full eigenvalue tensor ``S = ⊗Λ + noise + nugget``."""
    qs, lams = [], []
    with jax.default_matmul_precision("highest"):
        for k, a in zip(p.kernels, axes):
            lam, q = jnp.linalg.eigh(k.gram(a))
            qs.append(q)
            lams.append(jnp.maximum(lam, 0.0))
    s = reduce(lambda acc, lam: acc[..., None] * lam, lams[1:], lams[0])
    return qs, lams, s + p.noise + nugget


def _check_y(Y, shape):
    Y = jnp.asarray(Y)
    n = int(math.prod(shape))
    if Y.shape == shape:
        return Y
    if Y.ndim == 1 and Y.shape[0] == n:
        return Y.reshape(shape)
    raise ValueError(
        f"Y has shape {Y.shape}; expected the grid shape {shape} or a "
        f"flat ({n},) vector (C order over the axes)"
    )


def log_marginal_likelihood(p: GridParams, axes, Y, *,
                            nugget: float = gp.LOGML_NUGGET,
                            mesh=None, mesh_axis: str = "data"):
    """Exact ``log N(vec Y | 0, ⊗_i K_i + (noise + nugget) I)`` — the
    Kronecker eigen-identity form of GaussianProcess.scala:109-125. ``Y``
    is the observation tensor in grid shape (or flat, C order).

    ``mesh=`` shards the lattice tensor's LEADING axis over
    ``mesh[mesh_axis]`` (n_1 must divide by the axis size; put the long
    axis first): rotations along the other axes are device-local and the
    axis-0 rotation is one sharded matmul — multi-chip exact grid GPs."""
    axes = _check_axes(p, axes)
    shape = tuple(a.shape[0] for a in axes)
    Y = _check_y(Y, shape)
    qs, _, s = _eigs(p, axes, nugget)
    yt = _rotate(Y, [q.T for q in qs], mesh, mesh_axis)
    n = math.prod(shape)
    quad = jnp.sum(yt * yt / _shard0(s, mesh, mesh_axis))
    logdet = jnp.sum(jnp.log(s))
    return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))


def draw(key, p: GridParams, axes, *, shape=(), include_noise: bool = True,
         nugget: float = 1e-8):
    """Joint prior draw over the whole lattice — ``(*shape, n_1, ..., n_k)``
    (gp.draw's Cholesky route replaced by the per-axis eigen square root:
    ``f = (⊗ Q_i Λ_i^{1/2}) z``)."""
    axes = _check_axes(p, axes)
    gshape = tuple(a.shape[0] for a in axes)
    qs, lams, _ = _eigs(p, axes, nugget=0.0)
    roots = [q * jnp.sqrt(lam + nugget)[None, :]
             for q, lam in zip(qs, lams)]
    k_f, k_n = random.split(key)
    z = random.normal(k_f, (*shape, *gshape))
    batch = z.reshape((-1,) + gshape)
    f = jax.vmap(lambda zb: _rotate(zb, roots))(batch).reshape(z.shape)
    if include_noise:
        f = f + jnp.sqrt(p.noise) * random.normal(k_n, f.shape)
    return f


def _split_xs(p, axes, xs):
    """Split full-dimension test locations into per-axis coordinate blocks
    (column order = axis order, matching :func:`grid_coords`)."""
    xs = as_locations(xs)
    dims = [a.shape[1] for a in axes]
    if xs.shape[1] != sum(dims):
        raise ValueError(
            f"test locations have D={xs.shape[1]}; the grid axes "
            f"concatenate to D={sum(dims)}"
        )
    out, off = [], 0
    for d in dims:
        out.append(xs[:, off:off + d])
        off += d
    return out


def _mean_chain(mats, t):
    """``mean[m] = Σ_j Π_i mats_i[m, j_i] · t[j]`` — contract a per-test-
    point factorized row against a grid tensor, one batched matmul per
    axis."""
    out = jnp.einsum("mi,i...->m...", mats[0], t, precision=HI)
    for c in mats[1:]:
        out = jnp.einsum("mi,mi...->m...", c, out, precision=HI)
    return out


def fit(p: GridParams, axes, Y, xs, *, nugget: float = gp.PREDICT_NUGGET,
        variance: bool = True, mask=None, cg_tol: float = 1e-6,
        cg_max_iters: int = 1000, mesh=None, mesh_axis: str = "data"):
    """Posterior at arbitrary test locations ``xs`` (M, ΣD_i) — GPML
    Alg 2.1 through the Kronecker eigen-identity (the grid form of
    Predict.fit, Predict.scala:57-94). Returned variance includes the
    observation noise, matching :func:`gpx.models.gp.fit`.

    ``mask`` (grid-shaped boolean, True = observed): posterior mean on an
    INCOMPLETE lattice by CG on the mask-embedded Kronecker matvec (the
    eigen-identity needs the full grid; the matvec does not). Variance is
    unavailable under a mask (returns ``variance=False`` behavior)."""
    axes = _check_axes(p, axes)
    shape = tuple(a.shape[0] for a in axes)
    Y = _check_y(Y, shape)
    xs = as_locations(xs)
    xs_blocks = _split_xs(p, axes, xs)
    cross = [k.gram(a_xs, a) for k, a_xs, a in
             zip(p.kernels, xs_blocks, axes)]          # (M, n_i) each

    if mask is not None:
        alpha = _masked_alpha(p, axes, Y, mask, nugget, cg_tol, cg_max_iters)
        mean = _mean_chain(cross, alpha)
        return gp.PosteriorSummary(
            x=xs, mean=mean, variance=jnp.zeros((0,), mean.dtype)
        )

    qs, _, s = _eigs(p, axes, nugget)
    yt = _rotate(Y, [q.T for q in qs], mesh, mesh_axis)
    alpha = _rotate(yt / s, qs, mesh, mesh_axis)        # K⁻¹ vec Y, tensor
    mean = _mean_chain(cross, alpha)

    if not variance:
        return gp.PosteriorSummary(
            x=xs, mean=mean, variance=jnp.zeros((0,), mean.dtype)
        )
    # rotated cross rows factorize per axis: (⊗Qᵀ)k*_m = ⊗(Q_iᵀ k*_m,i),
    # so the variance reduction is the same chain on elementwise squares
    a_sq = [jnp.square(jnp.matmul(c, q, precision=HI))
            for c, q in zip(cross, qs)]
    red = _mean_chain(a_sq, 1.0 / _shard0(s, mesh, mesh_axis))
    prior = reduce(
        lambda acc, pair: acc * pair[0].diag(pair[1], dtype=mean.dtype),
        zip(p.kernels, xs_blocks), jnp.ones_like(mean),
    )
    var = jnp.maximum(prior - red, 0.0) + p.noise
    return gp.PosteriorSummary(x=xs, mean=mean, variance=var)


def posterior_draw(key, p: GridParams, axes, Y, xs, *,
                   nugget: float = gp.PREDICT_NUGGET, jitter: float = 1e-8,
                   shape=(), include_noise: bool = True):
    """Joint draw from the grid posterior at ``xs`` — ``(*shape, M)``, the
    lattice counterpart of :func:`gpx.models.gp.posterior_draw` (the
    ``efficientDraw`` capability, GaussianProcess.scala:146-164). The
    (M, M) posterior covariance never touches the N-sized operator
    densely: with per-axis rotated cross factors ``P_i = C_i Q_i``, the
    reduction ``AAᵀ[m, m'] = Σ_j Π_i P_i[m, j_i] P_i[m', j_i] / s_j`` is
    the same Kronecker chain run on pairwise products — O(M² Σ n_i)."""
    axes = _check_axes(p, axes)
    gshape = tuple(a.shape[0] for a in axes)
    Y = _check_y(Y, gshape)
    xs = as_locations(xs)
    m = xs.shape[0]
    xs_blocks = _split_xs(p, axes, xs)
    cross = [k.gram(a_xs, a) for k, a_xs, a in
             zip(p.kernels, xs_blocks, axes)]

    qs, _, s = _eigs(p, axes, nugget)
    yt = _rotate(Y, [q.T for q in qs])
    alpha = _rotate(yt / s, qs)
    mean = _mean_chain(cross, alpha)                          # (M,)

    pair = [
        jnp.einsum(
            "mi,ri->mri", pm, pm, precision=HI
        ).reshape(m * m, -1)
        for pm in (jnp.matmul(c, q, precision=HI)
                   for c, q in zip(cross, qs))
    ]
    red = _mean_chain(pair, 1.0 / s).reshape(m, m)            # A Aᵀ
    kss = reduce(
        lambda acc, pair_: acc * pair_[0].gram(pair_[1]),
        zip(p.kernels, xs_blocks), jnp.ones((m, m), mean.dtype),
    )
    cov = kss - red
    if include_noise:
        cov = cov + p.noise * jnp.eye(m, dtype=cov.dtype)
    from gpx.ops import chol

    lp = chol.cholesky(cov + jitter * jnp.eye(m, dtype=cov.dtype))
    z = random.normal(key, (*shape, m), dtype=lp.dtype)
    return mean + jnp.matmul(z, lp.T, precision=HI)


def kron_matvec(p: GridParams, axes, *, nugget: float = 0.0):
    """``mv(V) = (⊗_i K_i + (noise + nugget) I) vec(V)`` on grid-shaped
    tensors — O(N Σ n_i) per apply, no eigendecomposition. The building
    block for masked solves and a drop-in for the iterative engines."""
    axes = _check_axes(p, axes)
    grams = [k.gram(a) for k, a in zip(p.kernels, axes)]
    d = p.noise + nugget

    def mv(V):
        out = V
        for i, g in enumerate(grams):
            out = _axis_contract(g, out, i)
        return out + d * V

    return mv


def _masked_alpha(p, axes, Y, mask, nugget, cg_tol, cg_max_iters):
    from gpx.models.gp_iterative import cg_solve

    shape = tuple(a.shape[0] for a in axes)
    mask = jnp.asarray(mask).reshape(shape)
    y0 = jnp.where(mask, jnp.where(jnp.isfinite(Y), Y, 0.0), 0.0)
    mv = kron_matvec(p, axes, nugget=nugget)

    def _one(col):
        v = col.reshape(shape)
        masked_v = jnp.where(mask, v, 0.0)
        out = jnp.where(mask, mv(masked_v), v)   # identity off-grid
        return out.reshape(-1)

    def embedded(vflat):
        if vflat.ndim == 1:
            return _one(vflat)
        return jax.vmap(_one, in_axes=1, out_axes=1)(vflat)

    sol, _, converged = cg_solve(
        embedded, y0.reshape(-1), tol=cg_tol, max_iters=cg_max_iters
    )
    # converged flag intentionally not returned on the summary (shape
    # parity with gp.fit); masked solves at these sizes converge in
    # O(100) iterations — raise cg_max_iters if the operator is stiff
    del converged
    return jnp.where(mask, sol.reshape(shape), 0.0)


def optimize(template: GridParams, axes, Y, *, log_prior=None, **kwargs):
    """Type-II MLE / MAP over all per-axis hyperparameters + noise — the
    grid counterpart of :func:`gpx.models.optimize.optimize` via the
    generic log-density core."""
    from gpx.models.optimize import optimize_log_density

    axes_c = _check_axes(template, axes)
    shape = tuple(a.shape[0] for a in axes_c)
    Y = _check_y(Y, shape)

    def log_density(p):
        val = log_marginal_likelihood(p, axes_c, Y)
        return val if log_prior is None else val + log_prior(p)

    return optimize_log_density(template, log_density, **kwargs)


def sample_mh(key, axes, Y, template: GridParams, log_prior, n_samples:
              int, **kwargs):
    """MH over the separable hyperparameters (the Mcmc.sample composition,
    Mcmc.scala:63-76, against the Kronecker logML)."""
    from gpx.infer.mcmc import sample_mh_log_density

    axes_c = _check_axes(template, axes)
    shape = tuple(a.shape[0] for a in axes_c)
    Y = _check_y(Y, shape)

    def log_density(p):
        return log_marginal_likelihood(p, axes_c, Y) + log_prior(p)

    return sample_mh_log_density(key, template, log_density, n_samples,
                                 **kwargs)
