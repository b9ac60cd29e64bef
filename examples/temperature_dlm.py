"""Seasonal DLM for multi-sensor temperature — examples/src/main/scala/
TemperatureDlm.scala.

The reference's flagship example, all three studies:

1. **Gibbs fit** (TemperatureDlm.scala:98-128): latent state from
   ``polynomial(1) |+| seasonal(24, 3) |+| seasonal(7*24, 3)`` (daily AND
   weekly seasonality, :83) shared across 8 sensors (:84-86), FFBS-within-
   Gibbs over (states, V, W), then forecasting from the filtered state.
2. **Smoothing study** (:256-359): RTS-smoothed state at the posterior-mean
   variances, the smoothed level plotted with intervals, and a spatial GP
   fitted by MH on the *smoothed* residuals.
3. **Conjugate-filter held-out-sensor forecast** (:361-402): filter 7
   sensors with the observation variance integrated out; one-step Student-t
   predictions for the held-out sensor with `gpx.distributions.StudentT`
   intervals and a coverage check.

Makefile targets ``fit_temp_dlm`` / ``forecast_temperature_dlm``.
"""

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx import plots
from gpx.distributions import Gamma, InverseGamma, student_t_interval
from gpx.infer import sample_mh
from gpx.models import dlm, gp

OUT = pathlib.Path(__file__).parent / "output"
N_SENSORS = 8


def build_model(n_sensors: int = N_SENSORS):
    # polynomial(1) |+| seasonal(24, 3) |+| seasonal(7*24, 3)
    # (TemperatureDlm.scala:83) — hourly data: daily + weekly cycles
    base = dlm.polynomial(1) + dlm.seasonal(24, 3) + dlm.seasonal(7 * 24, 3)
    return dlm.replicate_observations(base, n_sensors)


def simulate(key, t=24 * 7 * 6):
    """Six weeks of hourly observations from the full daily+weekly model."""
    model = build_model()
    d_state = model.g.shape[0]
    w = jnp.full(d_state, 0.005)
    v = jnp.full(N_SENSORS, 0.3)
    k1, _ = jax.random.split(key)
    x0 = jnp.zeros(d_state).at[0].set(12.0).at[1].set(1.5).at[7].set(0.8)

    def step(x, k):
        ka, kb = jax.random.split(k)
        x_new = model.g @ x + jnp.sqrt(w) * jax.random.normal(ka, (d_state,))
        y = model.f @ x_new + jnp.sqrt(v) * jax.random.normal(kb, (N_SENSORS,))
        return x_new, y

    _, ys = jax.lax.scan(step, x0, jax.random.split(k1, t))
    return model, ys


def fit_and_forecast(args, model, ys, m0, c0):
    """Study 1: FFBS-within-Gibbs + forecast (TemperatureDlm.scala:98-128)."""
    prior = InverseGamma(concentration=jnp.asarray(3.0), scale=jnp.asarray(0.5))
    result = dlm.gibbs_sample(
        jax.random.PRNGKey(args.seed + 1), model, ys, prior, prior, m0, c0,
        args.n_iters,
    )
    v_hat = np.asarray(result.v)[args.n_iters // 2:].mean(0)
    w_hat = np.asarray(result.w)[args.n_iters // 2:].mean(0)
    print("posterior mean V:", np.round(v_hat, 3))
    print("posterior mean W:", np.round(w_hat, 4))

    filtered = dlm.kalman_filter(
        model, ys, jnp.asarray(v_hat), jnp.asarray(w_hat), m0, c0
    )
    means, covs = dlm.forecast(
        model, filtered.m[-1], filtered.c[-1], jnp.asarray(v_hat),
        jnp.asarray(w_hat), args.forecast,
    )
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 5))
    t_hist = np.arange(ys.shape[0])
    t_fc = np.arange(ys.shape[0], ys.shape[0] + args.forecast)
    ax.plot(t_hist[-240:], np.asarray(ys)[-240:, 0], lw=0.8, label="sensor 0")
    fc_m = np.asarray(means)[:, 0]
    fc_s = np.sqrt(np.asarray(covs)[:, 0, 0])
    ax.plot(t_fc, fc_m, color="red", label="forecast")
    ax.fill_between(t_fc, fc_m - 1.64 * fc_s, fc_m + 1.64 * fc_s, alpha=0.25,
                    color="red")
    ax.legend()
    plots.savefig(fig, OUT / "temperature_dlm_forecast.png")
    print(f"wrote {OUT}/temperature_dlm_forecast.png")
    return v_hat, w_hat, filtered


def smoothing_study(args, model, ys, filtered):
    """Study 2 (TemperatureDlm.scala:256-359): RTS smoothing at the
    posterior-mean variances, smoothed-level plot, and a spatial GP fitted
    on the SMOOTHED residuals by MH."""
    import matplotlib.pyplot as plt

    s_means, s_covs = dlm.smooth(model, filtered)
    t = np.arange(ys.shape[0])
    level = np.asarray(s_means[:, 0])
    level_sd = np.sqrt(np.asarray(s_covs[:, 0, 0]))

    fig, ax = plt.subplots(figsize=(10, 5))
    ax.plot(t, np.asarray(ys)[:, 0], lw=0.5, alpha=0.5, label="sensor 0")
    ax.plot(t, level, color="black", label="smoothed level")
    ax.fill_between(t, level - 1.64 * level_sd, level + 1.64 * level_sd,
                    alpha=0.3, color="gray", label="90% interval")
    ax.legend()
    plots.savefig(fig, OUT / "temperature_dlm_smoothed.png")
    print(f"wrote {OUT}/temperature_dlm_smoothed.png")

    # spatial GP on smoothed residuals (the reference fits the GP to the
    # residuals of the fitted DLM, TemperatureKriging feeds off the same
    # chain); time-averaged per-sensor residual field
    resid = np.asarray(ys - s_means @ model.f.T)          # (T, sensors)
    resid_mean = jnp.asarray(resid.mean(axis=0))
    locs = jax.random.uniform(jax.random.PRNGKey(9), (N_SENSORS, 2))
    template = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(0.5, 0.5) + gpx.white(0.3)
    )

    def log_prior(p):
        pr = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(2.0))
        k0, k1 = p.kernel.kernels
        return pr.logpdf(k0.h) + pr.logpdf(k0.sigma) + pr.logpdf(k1.sigma)

    post = sample_mh(
        jax.random.PRNGKey(args.seed + 2), locs, resid_mean, template,
        log_prior, n_samples=max(200, args.n_iters // 2), burn_in=100,
        n_chains=2,
    )
    print("GP-on-smoothed-residuals kernel posterior medians:",
          np.round(np.median(np.asarray(post.flat).reshape(-1, 3), 0), 3))


def heldout_conjugate_forecast(ys, m0_full, c0_full):
    """Study 3 (TemperatureDlm.scala:361-402): conjugate-filter the first 7
    sensors (observation variance integrated out), then one-step Student-t
    forecasts for the held-out 8th sensor through the shared latent state."""
    import matplotlib.pyplot as plt

    held = N_SENSORS - 1
    model7 = build_model(n_sensors=held)
    f_held = build_model().f[held]                         # (d_state,)
    d_state = model7.g.shape[0]
    m0, c0 = m0_full, c0_full
    w_star = jnp.full(d_state, 0.01)                       # scale-free W
    prior_v = InverseGamma(concentration=jnp.asarray(3.0),
                           scale=jnp.asarray(1.0))

    res = dlm.conjugate_filter(model7, ys[:, :held], w_star, m0, c0, prior_v)

    # one-step prediction of the held-out sensor: prior state (a_t, r_t)
    # from the previous posterior, Student-t via the pre-update (a_v, b_v)
    g = model7.g
    m_prev = jnp.concatenate([m0[None], res.m[:-1]], axis=0)
    c_prev = jnp.concatenate([c0[None], res.c_star[:-1]], axis=0)
    a_v_prev = jnp.concatenate(
        [prior_v.concentration[None], res.v_shape[:-1]], axis=0
    )
    b_v_prev = jnp.concatenate([prior_v.scale[None], res.v_scale[:-1]], axis=0)

    def one_step(m, c, av, bv):
        a = g @ m
        r = g @ c @ g.T + jnp.diag(w_star)
        mean = f_held @ a
        q = f_held @ r @ f_held + 1.0                      # scale-free + V*
        scale = jnp.sqrt((bv / av) * q)
        return mean, scale, 2.0 * av

    mean, scale, df = jax.vmap(one_step)(m_prev, c_prev, a_v_prev, b_v_prev)
    lo = np.asarray(student_t_interval(mean, scale, df, 0.05))
    hi = np.asarray(student_t_interval(mean, scale, df, 0.95))
    y_held = np.asarray(ys[:, held])
    warm = ys.shape[0] // 4                                 # skip filter warmup
    cover = float(np.mean((y_held[warm:] >= lo[warm:])
                          & (y_held[warm:] <= hi[warm:])))
    print(f"held-out sensor 90% Student-t interval coverage: {cover:.2f}")

    t = np.arange(ys.shape[0])
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.plot(t[-240:], y_held[-240:], lw=0.7, label=f"sensor {held} (held out)")
    ax.plot(t[-240:], np.asarray(mean)[-240:], color="red", lw=0.8,
            label="one-step t forecast")
    ax.fill_between(t[-240:], lo[-240:], hi[-240:], alpha=0.2, color="red",
                    label="90% t interval")
    ax.legend()
    plots.savefig(fig, OUT / "temperature_dlm_heldout.png")
    print(f"wrote {OUT}/temperature_dlm_heldout.png")
    return cover


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_iters", nargs="?", type=int, default=500)
    ap.add_argument("--forecast", type=int, default=48)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    OUT.mkdir(exist_ok=True)

    model, ys = simulate(jax.random.PRNGKey(args.seed))
    d_state = model.g.shape[0]
    m0 = jnp.zeros(d_state)
    c0 = jnp.eye(d_state) * 10.0

    v_hat, w_hat, filtered = fit_and_forecast(args, model, ys, m0, c0)
    smoothing_study(args, model, ys, filtered)
    heldout_conjugate_forecast(ys, m0, c0)


if __name__ == "__main__":
    main()
