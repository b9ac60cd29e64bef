"""Spatio-temporal DLM + GP joint model.

Rebuild of the reference's DLM-GP layer (examples/src/main/scala/DlmGp.scala,
FitDlmGp.scala): a DLM carries the time dynamics of a latent state shared
across sensors; a GP over sensor locations models the spatial structure of
the observation residuals, and its covariance ``K(x, x)`` feeds back into the
DLM observation noise (``v = Kxx`` coupling, FitDlmGp.scala:75).

TPU design notes: the per-iteration Gibbs sweep (Kalman filter + FFBS +
kernel MH + W draw) is one jitted scan step; the GP likelihood over the T
per-time residual vectors shares a single Cholesky with a batched multi-RHS
solve (the reference re-enters the full GP likelihood machinery per sample).
Also completes ``DlmGp.simStep``, which the reference left as ``???``
(examples/DlmGp.scala:46-63).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, random

from gpx import params as gparams
from gpx.distributions import InverseGamma
from gpx.models import dlm as dlm_mod
from gpx.models import gp
from gpx.ops.chol import cholesky, forward_solve
from gpx.ops.distance import as_locations
from gpx.params import Parameters


def grid_locations(x_range, y_range, nx: int, ny: int):
    """Regular 2-D grid of locations — DlmGp.getGridLocations
    (examples/DlmGp.scala:204-216). Returns ``(nx * ny, 2)``."""
    xs = jnp.linspace(x_range[0], x_range[1], nx)
    ys = jnp.linspace(y_range[0], y_range[1], ny)
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def replicated_log_marginal_likelihood(
    params: Parameters, x, resids, *, nugget: float = gp.LOGML_NUGGET
):
    """GP marginal log-likelihood of T iid spatial replicates (the per-time
    residual vectors of FitDlmGp.residual, FitDlmGp.scala:29-47): one
    Cholesky + one multi-RHS trsm instead of T separate likelihoods.

    ``resids``: (T, N) — rows are replicates over the N locations.
    """
    x = as_locations(x)
    n = x.shape[0]
    t = resids.shape[0]
    kxx = params.kernel.gram(x, nugget=nugget)
    l = cholesky(kxx)
    centered = resids - params.mean(x)[None, :]
    u = forward_solve(l, centered.T)        # (N, T) — batched trsm
    half_logdet = jnp.sum(jnp.log(jnp.diagonal(l)))
    return (
        -0.5 * jnp.sum(u * u)
        - t * half_logdet
        - 0.5 * t * n * jnp.log(2.0 * jnp.pi)
    )


def simulate(key, model: dlm_mod.DLM, params: Parameters, x_locations,
             v_extra, w, m0, n_steps: int):
    """Simulate the joint DLM-GP — completing DlmGp.simStep
    (examples/DlmGp.scala:46-63): states evolve by G, observations add a GP
    draw over sensor locations plus iid noise ``v_extra``."""
    x_locations = as_locations(x_locations)
    kxx = params.kernel.gram(x_locations, nugget=gp.DRAW_NUGGET)
    l_k = cholesky(kxx)
    d_state = model.g.shape[0]
    w_chol = jnp.diag(jnp.sqrt(w)) if w.ndim == 1 else cholesky(w)

    def step(x_state, k):
        k1, k2, k3 = random.split(k, 3)
        x_new = model.g @ x_state + w_chol @ random.normal(k1, (d_state,))
        gp_noise = l_k @ random.normal(k2, (x_locations.shape[0],))
        obs = (
            model.f @ x_new
            + gp_noise
            + jnp.sqrt(v_extra) * random.normal(k3, (model.f.shape[0],))
        )
        return x_new, (x_new, obs)

    _, (states, ys) = lax.scan(step, m0, random.split(key, n_steps))
    return states, ys


class DlmGpResult(NamedTuple):
    kernel_flat: jnp.ndarray   # (iters, n_kernel_params) constrained draws
    w: jnp.ndarray             # (iters, d_state)
    states: jnp.ndarray        # (iters, T, d_state)
    accept_rate: jnp.ndarray


def gibbs_sample(
    key,
    model: dlm_mod.DLM,
    ys,
    x_locations,
    template: Parameters,
    log_prior_kernel,
    prior_w: InverseGamma,
    m0,
    c0,
    n_iters: int,
    *,
    proposal_scale: float = 0.1,
    w0=None,
    nugget: float = gp.LOGML_NUGGET,
):
    """Joint Gibbs — FitDlmGp.sample (FitDlmGp.scala:104-129):

    per iteration: (1) Kalman filter + FFBS state draw with the GP Gram as
    the DLM observation covariance (``v = Kxx``); (2) MH move on the GP
    kernel hyperparameters given the residuals; (3) conjugate W draw.
    """
    x_locations = as_locations(x_locations)
    d_state = model.g.shape[0]
    w = jnp.ones(d_state) * 0.1 if w0 is None else jnp.asarray(w0)

    bij_k = template.kernel.bijectors()
    u0 = gparams.unconstrain(bij_k, template.kernel)
    u0_flat, unravel_k = gparams.unraveler(u0)

    def kernel_logpost(u_flat, resids):
        kern = gparams.constrain(bij_k, unravel_k(u_flat))
        p = Parameters(mean=template.mean, kernel=kern)
        return (
            log_prior_kernel(kern)
            + replicated_log_marginal_likelihood(p, x_locations, resids, nugget=nugget)
            + gparams.log_det_jacobian(bij_k, unravel_k(u_flat))
        )

    def step(carry, k):
        u_flat, w, accepted = carry
        k1, k2, k3, k4 = random.split(k, 4)

        kern = gparams.constrain(bij_k, unravel_k(u_flat))
        kxx = kern.gram(x_locations, nugget=nugget)

        filtered = dlm_mod.kalman_filter(model, ys, kxx, w, m0, c0)
        xs = dlm_mod.ffbs(k1, model, filtered, w)
        resids = ys - xs @ model.f.T

        prop = u_flat + proposal_scale * random.normal(k2, u_flat.shape, u_flat.dtype)
        lp_cur = kernel_logpost(u_flat, resids)
        lp_prop = kernel_logpost(prop, resids)
        lp_prop = jnp.where(jnp.isnan(lp_prop), -jnp.inf, lp_prop)
        accept = jnp.log(random.uniform(k3)) < (lp_prop - lp_cur)
        u_new = jnp.where(accept, prop, u_flat)

        w_new = dlm_mod.sample_system_variance(k4, prior_w, model, xs)

        kern_flat = gparams.to_array(gparams.constrain(bij_k, unravel_k(u_new)))
        return (u_new, w_new, accepted + accept.astype(jnp.int32)), (
            kern_flat,
            w_new,
            xs,
        )

    (_, _, accepted), (kflat, ws, states) = lax.scan(
        step, (u0_flat, w, jnp.zeros((), jnp.int32)), random.split(key, n_iters)
    )
    return DlmGpResult(
        kernel_flat=kflat,
        w=ws,
        states=states,
        accept_rate=accepted / n_iters,
    )
