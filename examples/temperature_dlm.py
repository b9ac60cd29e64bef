"""Seasonal DLM for multi-sensor temperature — examples/src/main/scala/
TemperatureDlm.scala.

Model: polynomial(1) + seasonal(24, 3) + seasonal(7*24, 3) latent state
shared across sensors (TemperatureDlm.scala:83-86), FFBS-within-Gibbs for
(states, V, W) (:98-128), forecasting from the filtered state (:361-402),
and a GP fit on the spatial residuals (:256-359) — the fit_temp_dlm /
forecast_temperature_dlm Makefile targets.
"""

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx import plots
from gpx.distributions import Gamma, InverseGamma
from gpx.infer import sample_mh
from gpx.models import dlm, gp

OUT = pathlib.Path(__file__).parent / "output"
N_SENSORS = 8


def build_model():
    base = dlm.polynomial(1) + dlm.seasonal(24, 3)
    return dlm.replicate_observations(base, N_SENSORS)


def simulate(key, t=480):
    model = build_model()
    d_state = model.g.shape[0]
    w = jnp.full(d_state, 0.005)
    v = jnp.full(N_SENSORS, 0.3)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jnp.zeros(d_state).at[0].set(12.0).at[1].set(1.5)

    def step(x, k):
        ka, kb = jax.random.split(k)
        x_new = model.g @ x + jnp.sqrt(w) * jax.random.normal(ka, (d_state,))
        y = model.f @ x_new + jnp.sqrt(v) * jax.random.normal(kb, (N_SENSORS,))
        return x_new, y

    _, ys = jax.lax.scan(step, x0, jax.random.split(k1, t))
    return model, ys


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
    prior = InverseGamma(concentration=jnp.asarray(3.0), scale=jnp.asarray(0.5))

    result = dlm.gibbs_sample(
        jax.random.PRNGKey(args.seed + 1), model, ys, prior, prior, m0, c0,
        args.n_iters,
    )
    v_hat = np.asarray(result.v)[args.n_iters // 2:].mean(0)
    w_hat = np.asarray(result.w)[args.n_iters // 2:].mean(0)
    print("posterior mean V:", np.round(v_hat, 3))
    print("posterior mean W:", np.round(w_hat, 4))

    # forecast from the filtered state at the posterior-mean variances
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
    ax.plot(t_hist[-200:], np.asarray(ys)[-200:, 0], lw=0.8, label="sensor 0")
    fc_m = np.asarray(means)[:, 0]
    fc_s = np.sqrt(np.asarray(covs)[:, 0, 0])
    ax.plot(t_fc, fc_m, color="red", label="forecast")
    ax.fill_between(t_fc, fc_m - 1.64 * fc_s, fc_m + 1.64 * fc_s, alpha=0.25,
                    color="red")
    ax.legend()
    plots.savefig(fig, OUT / "temperature_dlm_forecast.png")
    print(f"wrote {OUT}/temperature_dlm_forecast.png")

    # GP on the per-sensor residuals at the posterior state draw
    xs_state = result.states[-1]
    resid = np.asarray(ys - xs_state @ model.f.T)
    locs = jax.random.uniform(jax.random.PRNGKey(9), (N_SENSORS, 2))
    template = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(0.5, 0.5) + gpx.white(0.3)
    )

    def log_prior(p):
        pr = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(2.0))
        k0, k1 = p.kernel.kernels
        return pr.logpdf(k0.h) + pr.logpdf(k0.sigma) + pr.logpdf(k1.sigma)

    post = sample_mh(
        jax.random.PRNGKey(args.seed + 2), locs,
        jnp.asarray(resid[-1]), template, log_prior,
        n_samples=max(200, args.n_iters // 2), burn_in=100, n_chains=2,
    )
    print("GP-residual kernel posterior medians:",
          np.round(np.median(np.asarray(post.flat).reshape(-1, 3), 0), 3))


if __name__ == "__main__":
    main()
