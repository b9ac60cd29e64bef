"""Dynamic linear models: Kalman filtering, FFBS, Gibbs, forecasting.

The reference reaches DLM machinery through the external ``bayesian_dlms``
library (build.sbt:84-89): seasonal/polynomial model builders and ``|+|``
composition (TemperatureDlm.scala:83), SVD/FFBS state sampling and Gibbs V/W
updates (FitDlmGp.scala:72, TemperatureDlm.scala:98-128), Kalman forecasting
(DlmGp.scala:100-133). This module is the TPU-native equivalent: filters and
samplers are ``lax.scan`` loops over time, so a whole Gibbs sweep (FFBS +
variance draws) is one XLA program.

Model: ``y_t = F x_t + v_t``, ``v_t ~ N(0, V)``;
``x_t = G x_{t-1} + w_t``, ``w_t ~ N(0, W)``; ``x_0 ~ N(m0, C0)``.
``F: (d_obs, d_state)``, time-invariant (the reference's constant models).
Missing observations are NaNs, skipped in the update step (the reference's
missing-data handling, DlmGp.toGpData at examples/DlmGp.scala:139-149).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random

from gpx.distributions import InverseGamma
from gpx.utils.precision import highest_matmuls
from gpx.utils.pytree import pytree_dataclass


@pytree_dataclass
class DLM:
    """Model matrices (static structure, dynamic values)."""

    f: jnp.ndarray  # (d_obs, d_state) observation matrix
    g: jnp.ndarray  # (d_state, d_state) evolution matrix

    def __add__(self, other: "DLM") -> "DLM":
        """Block composition — bayesian_dlms ``|+|`` (TemperatureDlm.scala:83).
        Observation rows are summed contributions, so compose only
        same-d_obs components (the standard DLM superposition)."""
        f = jnp.concatenate([self.f, other.f], axis=1)
        g = jax.scipy.linalg.block_diag(self.g, other.g)
        return DLM(f=f, g=g)


def polynomial(order: int) -> DLM:
    """Polynomial trend DLM (order 1 = local level)."""
    g = jnp.eye(order) + jnp.diag(jnp.ones(order - 1), 1) if order > 1 else jnp.eye(1)
    f = jnp.zeros((1, order)).at[0, 0].set(1.0)
    return DLM(f=f, g=g)


def seasonal(period: int, harmonics: int) -> DLM:
    """Fourier-form seasonal DLM with ``harmonics`` harmonic pairs."""
    blocks = []
    f_parts = []
    for h in range(1, harmonics + 1):
        w = 2.0 * jnp.pi * h / period
        c, s = jnp.cos(w), jnp.sin(w)
        blocks.append(jnp.array([[c, s], [-s, c]]))
        f_parts.append(jnp.array([1.0, 0.0]))
    g = jax.scipy.linalg.block_diag(*blocks)
    f = jnp.concatenate(f_parts)[None, :]
    return DLM(f=f, g=g)


def replicate_observations(model: DLM, n: int) -> DLM:
    """Share one latent state across ``n`` sensors — the reference's
    8-sensor shared-state model (TemperatureDlm.scala:84-86):
    F becomes ``n`` identical observation rows."""
    return DLM(f=jnp.tile(model.f, (n, 1)), g=model.g)


class FilterResult(NamedTuple):
    """Per-time filtering output (all stacked over the leading time axis)."""

    m: jnp.ndarray        # (T, d_state) posterior state means
    c: jnp.ndarray        # (T, d_state, d_state) posterior state covs
    a: jnp.ndarray        # (T, d_state) one-step-ahead state means
    r: jnp.ndarray        # (T, d_state, d_state) one-step-ahead state covs
    log_likelihood: jnp.ndarray


def _sym(m):
    return 0.5 * (m + m.swapaxes(-1, -2))


def _chol_psd(m):
    """Cholesky of a nearly-PSD matrix with an escalating scale-relative
    jitter ladder. DLM covariances collapse toward singular as Gibbs sweeps
    shrink V/W, and in f32 the rounding of the (PSD-by-construction) Joseph
    sandwiches can still leave tiny negative eigenvalues — each rung costs
    one extra d_state-sized factorization, negligible at DLM dimensions."""
    m = _sym(m)
    d = m.shape[-1]
    eps0 = 1e-6 if m.dtype == jnp.float32 else 1e-12
    scale = jnp.trace(m) / d + jnp.asarray(1e-30, m.dtype)
    eye = jnp.eye(d, dtype=m.dtype)

    l = jnp.linalg.cholesky(m + (eps0 * scale) * eye)
    for mult in (1e3, 1e6):
        ok = jnp.all(jnp.isfinite(jnp.diagonal(l, axis1=-2, axis2=-1)))
        retry = jnp.linalg.cholesky(m + (eps0 * mult * scale) * eye)
        l = jnp.where(ok, l, retry)
    return l


@highest_matmuls
def kalman_filter(model: DLM, ys, v, w, m0, c0) -> FilterResult:
    """Forward Kalman filter as one scan. ``ys: (T, d_obs)`` with NaNs for
    missing entries; ``v``: (d_obs, d_obs) or (d_obs,) diagonal; ``w``:
    (d_state,) diagonal or full."""
    f, g = model.f, model.g
    d_obs, d_state = f.shape
    v_mat = jnp.diag(v) if v.ndim == 1 else v
    w_mat = jnp.diag(w) if w.ndim == 1 else w

    def step(carry, y):
        m_prev, c_prev, ll = carry
        a = g @ m_prev
        r = _sym(g @ c_prev @ g.T + w_mat)

        mask = jnp.isfinite(y)                       # observed entries
        y0 = jnp.where(mask, y, 0.0)
        # missing entries: zero their rows of F (no information), zero V's
        # cross-covariances with them (otherwise a non-diagonal V — e.g. the
        # DLM-GP path where V = K(x,x), FitDlmGp.scala:75 — couples missing
        # pseudo-observations into the innovation solve instead of
        # marginalizing them; ADVICE r1), and give them unit pseudo-variance
        # so Q stays invertible
        mvec = mask.astype(v_mat.dtype)
        f_eff = jnp.where(mask[:, None], f, 0.0)
        v_eff = mvec[:, None] * v_mat * mvec[None, :] + jnp.diag(1.0 - mvec)
        fhat = f_eff @ a
        q = f_eff @ r @ f_eff.T + v_eff
        e = jnp.where(mask, y0 - fhat, 0.0)

        q_chol = _chol_psd(q)
        sol = jax.scipy.linalg.cho_solve((q_chol, True), f_eff @ r)  # Q^{-1} F R
        k_gain = sol.swapaxes(-1, -2)                               # R F^T Q^{-1}
        m = a + k_gain @ e
        # Joseph-form update: PSD by construction, where R - K F R cancels
        # catastrophically in f32 (many observations per step collapse C)
        ikf = jnp.eye(d_state, dtype=r.dtype) - k_gain @ f_eff
        c = _sym(ikf @ r @ ikf.T + k_gain @ v_eff @ k_gain.T)

        u = jax.scipy.linalg.solve_triangular(q_chol, e, lower=True)
        n_obs = jnp.sum(mask)
        ll_t = -0.5 * (u @ u) - jnp.sum(
            jnp.where(mask, jnp.log(jnp.diagonal(q_chol)), 0.0)
        ) - 0.5 * n_obs * jnp.log(2.0 * jnp.pi)
        return (m, c, ll + ll_t), (m, c, a, r)

    (_, _, ll), (ms, cs, as_, rs) = lax.scan(step, (m0, c0, 0.0), ys)
    return FilterResult(m=ms, c=cs, a=as_, r=rs, log_likelihood=ll)


@highest_matmuls
def ffbs(key, model: DLM, filtered: FilterResult, w=None):
    """Forward-filter backward-sample state draw (the SvdSampler.ffbsDlm
    capability, FitDlmGp.scala:121-125) as a reverse scan.

    When the system covariance ``w`` is given, the backward covariance uses
    the Joseph form ``(I - BG) C (I - BG)^T + B W B^T`` — PSD by
    construction, where the textbook ``C - B R B^T`` cancels catastrophically
    in f32 once W has shrunk over Gibbs sweeps (observed NaNs on TPU in the
    seasonal example).

    Returns sampled states ``(T, d_state)``.
    """
    g = model.g
    ms, cs, as_, rs = filtered.m, filtered.c, filtered.a, filtered.r
    t_len, d_state = ms.shape
    w_mat = None
    if w is not None:
        w_mat = jnp.diag(w) if w.ndim == 1 else w

    def draw(k, mean, cov):
        chol = _chol_psd(cov)
        return mean + chol @ random.normal(k, (d_state,), dtype=mean.dtype)

    keys = random.split(key, t_len)
    x_last = draw(keys[-1], ms[-1], cs[-1])

    def back_step(x_next, inp):
        k, m, c, a_next, r_next = inp
        # B = C G^T R_{next}^{-1}
        r_chol = _chol_psd(r_next)
        sol = jax.scipy.linalg.cho_solve((r_chol, True), g @ c)  # R^{-1} G C
        b = sol.swapaxes(-1, -2)
        mean = m + b @ (x_next - a_next)
        if w_mat is None:
            cov = c - b @ r_next @ b.T
        else:
            ibg = jnp.eye(d_state, dtype=c.dtype) - b @ g
            cov = ibg @ c @ ibg.T + b @ w_mat @ b.T
        x = draw(k, mean, cov)
        return x, x

    inputs = (keys[:-1], ms[:-1], cs[:-1], as_[1:], rs[1:])
    _, xs_rev = lax.scan(back_step, x_last, inputs, reverse=True)
    return jnp.concatenate([xs_rev, x_last[None]], axis=0)


@highest_matmuls
def smooth(model: DLM, filtered: FilterResult):
    """RTS smoother (the reference's smoothing study,
    TemperatureDlm.scala:256-359). Returns (means, covs)."""
    g = model.g
    ms, cs, as_, rs = filtered.m, filtered.c, filtered.a, filtered.r
    d_state = ms.shape[1]

    def back_step(carry, inp):
        s_next, ss_next = carry
        m, c, a_next, r_next = inp
        r_chol = _chol_psd(r_next)
        sol = jax.scipy.linalg.cho_solve((r_chol, True), g @ c)
        b = sol.swapaxes(-1, -2)
        s = m + b @ (s_next - a_next)
        ss = _sym(c + b @ (ss_next - r_next) @ b.T)
        return (s, ss), (s, ss)

    inputs = (ms[:-1], cs[:-1], as_[1:], rs[1:])
    (_, _), (s_rev, ss_rev) = lax.scan(
        back_step, (ms[-1], cs[-1]), inputs, reverse=True
    )
    means = jnp.concatenate([s_rev, ms[-1][None]], axis=0)
    covs = jnp.concatenate([ss_rev, cs[-1][None]], axis=0)
    return means, covs


@highest_matmuls
def forecast(model: DLM, m_last, c_last, v, w, n_ahead: int):
    """Iterated one-step-ahead forecast (DlmGp.forecastStep,
    examples/DlmGp.scala:100-133). Returns (obs_means, obs_covs)."""
    f, g = model.f, model.g
    v_mat = jnp.diag(v) if v.ndim == 1 else v
    w_mat = jnp.diag(w) if w.ndim == 1 else w

    def step(carry, _):
        m, c = carry
        a = g @ m
        r = _sym(g @ c @ g.T + w_mat)
        fmean = f @ a
        fcov = f @ r @ f.T + v_mat
        return (a, r), (fmean, fcov)

    _, (means, covs) = lax.scan(step, (m_last, c_last), None, length=n_ahead)
    return means, covs


def sample_observation_variance(key, prior: InverseGamma, model: DLM, ys, xs):
    """d-inverse-gamma Gibbs update of diagonal V given sampled states
    (the GibbsSampling.stepSvd V-draw capability, FitDlmGp.scala:72)."""
    mask = jnp.isfinite(ys)
    resid = jnp.where(mask, ys - xs @ model.f.T, 0.0)   # (T, d_obs)
    n = jnp.sum(mask, axis=0)
    ss = jnp.sum(resid**2, axis=0)
    post = InverseGamma(
        concentration=prior.concentration + 0.5 * n,
        scale=prior.scale + 0.5 * ss,
    )
    return _ig_draw(key, post, ys.shape[1])


def sample_system_variance(key, prior: InverseGamma, model: DLM, xs):
    """d-inverse-gamma Gibbs update of diagonal W given sampled states."""
    innov = xs[1:] - xs[:-1] @ model.g.T          # (T-1, d_state)
    t1 = innov.shape[0]
    ss = jnp.sum(innov**2, axis=0)
    post = InverseGamma(
        concentration=prior.concentration + 0.5 * t1,
        scale=prior.scale + 0.5 * ss,
    )
    return _ig_draw(key, post, xs.shape[1])


def _ig_draw(key, post: InverseGamma, d: int):
    # element-wise IG draws with per-element concentration/scale
    g = random.gamma(key, post.concentration, (d,))
    return post.scale / g


class ConjugateFilterResult(NamedTuple):
    m: jnp.ndarray          # (T, d_state) state means
    c_star: jnp.ndarray     # (T, d_state, d_state) scale-free state covs
    v_shape: jnp.ndarray    # (T,) InverseGamma shape for the obs variance
    v_scale: jnp.ndarray    # (T,) InverseGamma scale
    forecast_mean: jnp.ndarray   # (T, d_obs) one-step-ahead means
    forecast_scale: jnp.ndarray  # (T, d_obs) Student-t scales
    forecast_df: jnp.ndarray     # (T,) Student-t degrees of freedom


@highest_matmuls
def conjugate_filter(model: DLM, ys, w_star, m0, c0, prior_v: InverseGamma):
    """Kalman filter with the observation variance integrated out.

    The reference forecasts a held-out sensor with bayesian_dlms'
    conjugate filter (TemperatureDlm.scala:361-402): ``V = v I`` with
    ``v ~ InverseGamma(a, b)`` updated conjugately each step, so one-step
    forecasts are Student-t with ``2a`` degrees of freedom. ``w_star`` is the
    system covariance *relative to v* (the standard scale-free form).
    """
    f, g = model.f, model.g
    d_obs, d_state = f.shape
    w_mat = jnp.diag(w_star) if w_star.ndim == 1 else w_star

    def step(carry, y):
        m_prev, c_prev, a_v, b_v = carry
        a = g @ m_prev
        r = _sym(g @ c_prev @ g.T + w_mat)

        mask = jnp.isfinite(y)
        f_eff = jnp.where(mask[:, None], f, 0.0)
        fhat = f_eff @ a
        # scale-free V* = I is diagonal, so masking its cross-covariances is
        # a no-op and the masked diagonal is exactly the unit pseudo-variance
        v_star = jnp.eye(d_obs, dtype=r.dtype)
        q = f_eff @ r @ f_eff.T + v_star
        e = jnp.where(mask, y - fhat, 0.0)

        q_chol = _chol_psd(q)
        u = jax.scipy.linalg.solve_triangular(q_chol, e, lower=True)
        sol = jax.scipy.linalg.cho_solve((q_chol, True), f_eff @ r)
        k_gain = sol.swapaxes(-1, -2)
        m = a + k_gain @ e
        # Joseph-form update (PSD in f32)
        ikf = jnp.eye(d_state, dtype=r.dtype) - k_gain @ f_eff
        c = _sym(ikf @ r @ ikf.T + k_gain @ v_star @ k_gain.T)

        n_obs = jnp.sum(mask)
        a_new = a_v + 0.5 * n_obs
        b_new = b_v + 0.5 * (u @ u)

        # Student-t one-step forecast: location fhat, scale from the
        # *pre-update* variance estimate b_v/a_v, df = 2 a_v
        v_hat = b_v / a_v
        scale = jnp.sqrt(v_hat * jnp.diagonal(q))
        return (m, c, a_new, b_new), (m, c, fhat, scale, 2.0 * a_v, a_new, b_new)

    init = (m0, c0, prior_v.concentration, prior_v.scale)
    _, (ms, cs, fmeans, fscales, dfs, a_t, b_t) = lax.scan(step, init, ys)
    return ConjugateFilterResult(
        m=ms, c_star=cs, v_shape=a_t, v_scale=b_t,
        forecast_mean=fmeans, forecast_scale=fscales, forecast_df=dfs,
    )


class GibbsResult(NamedTuple):
    v: jnp.ndarray   # (iters, d_obs)
    w: jnp.ndarray   # (iters, d_state)
    states: jnp.ndarray  # (iters, T, d_state) — last kept draw per iter


def gibbs_sample(
    key,
    model: DLM,
    ys,
    prior_v: InverseGamma,
    prior_w: InverseGamma,
    m0,
    c0,
    n_iters: int,
    *,
    v0=None,
    w0=None,
):
    """FFBS-within-Gibbs for (states, V, W) — the GibbsSampling.sample
    capability (TemperatureDlm.scala:98-128) as one scan."""
    d_obs, d_state = model.f.shape
    v = jnp.ones(d_obs) if v0 is None else jnp.asarray(v0)
    w = jnp.ones(d_state) * 0.1 if w0 is None else jnp.asarray(w0)

    def step(carry, k):
        v, w = carry
        k1, k2, k3 = random.split(k, 3)
        filtered = kalman_filter(model, ys, v, w, m0, c0)
        xs = ffbs(k1, model, filtered, w)
        v_new = sample_observation_variance(k2, prior_v, model, ys, xs)
        w_new = sample_system_variance(k3, prior_w, model, xs)
        return (v_new, w_new), (v_new, w_new, xs)

    (_, _), (vs, ws, states) = lax.scan(step, (v, w), random.split(key, n_iters))
    return GibbsResult(v=vs, w=ws, states=states)
