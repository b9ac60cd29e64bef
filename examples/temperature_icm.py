"""Coupled-sensor temperatures with a multi-output (ICM) GP.

The reference models its 8 temperature sensors with one SHARED latent DLM
(TemperatureDlm.scala:83-118; rebuilt in examples/temperature_dlm.py).
The ICM is the GP answer to the same data: each sensor is an output,
coupled through B = W Wᵀ + diag(κ) over a common temporal SE kernel — it
learns per-sensor loadings (including anti-correlated sensors, which a
shared-trend DLM cannot express) and forecasts every sensor jointly.

Workflow: simulate 4 days of hourly temperatures at 8 coupled sensors →
type-II MLE of all ICM hyperparameters (`multioutput.optimize`, L-BFGS on
the Kronecker-diagonalized logML) → 24 h joint forecast for every sensor
→ short MH run for the posterior over the coupling. Run: ``make icm_temperature``.
"""

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx import diagnostics
from gpx.distributions import Gamma, Normal
from gpx.models import multioutput as mo

OUT = pathlib.Path(__file__).parent / "output"
N_SENSORS = 8


def synthetic_sensors(key, n_hours=96):
    """Hourly temps at 8 sensors: one latent daily cycle, per-sensor
    loadings (sensor 7 anti-correlated — an urban/valley site)."""
    hours = jnp.arange(n_hours, dtype=jnp.float32)[:, None]
    w = jnp.asarray(
        [[1.0], [0.9], [1.1], [0.8], [0.95], [1.05], [0.7], [-0.6]]
    )
    truth = mo.IcmParams(
        kernel=gpx.se(4.0, 10.0),       # ~10 h temporal correlation
        w=w,
        kappa=jnp.full((N_SENSORS,), 0.1),
        noise=jnp.asarray(0.2),
    )
    temps = 12.0 + mo.draw(key, truth, hours)
    return hours, temps, truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_iters", nargs="?", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    OUT.mkdir(exist_ok=True)

    x, temps, truth = synthetic_sensors(jax.random.PRNGKey(args.seed))
    y = temps - temps.mean(axis=0)      # zero-mean per output

    # --- type-II MLE over kernel + coupling + noise -----------------------
    template = mo.icm(gpx.se(2.0, 6.0), n_outputs=N_SENSORS, rank=1,
                      kappa=0.3, noise=0.5)
    res = mo.optimize(template, x, y, steps=80)
    b_hat = np.asarray(mo.coregion_matrix(res.params))
    print(f"logML {float(res.values[0]):.1f} -> {float(res.value):.1f} "
          f"(grad norm {float(res.grad_norm):.2e})")
    print("fitted coupling row 0:", np.round(b_hat[0], 2))
    print(f"fitted noise: {float(res.params.noise):.3f} (truth 0.2)")

    # --- joint 24 h forecast for every sensor -----------------------------
    xs = jnp.arange(x.shape[0], x.shape[0] + 24, dtype=jnp.float32)[:, None]
    fc = mo.fit(res.params, x, y, xs)
    lo, hi = fc.interval(0.05), fc.interval(0.95)
    print("24 h forecast, first hour, all sensors:")
    for i in range(N_SENSORS):
        print(f"  sensor {i}: {float(fc.mean[0, i] + temps[:, i].mean()):6.2f} "
              f"[{float(lo[0, i] + temps[:, i].mean()):6.2f}, "
              f"{float(hi[0, i] + temps[:, i].mean()):6.2f}]")

    # --- posterior over the coupling (short MH) ---------------------------
    def log_prior(p):
        g = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(1.0))
        nw = Normal(loc=jnp.asarray(0.0), scale=jnp.asarray(2.0))
        return (g.logpdf(p.kernel.h) + g.logpdf(p.kernel.sigma)
                + jnp.sum(nw.logpdf(p.w)) + jnp.sum(g.logpdf(p.kappa))
                + g.logpdf(p.noise))

    post = mo.sample_mh(
        jax.random.PRNGKey(args.seed + 1), x, y, res.params, log_prior,
        n_samples=args.n_iters, burn_in=args.n_iters // 5, n_chains=2,
        proposal_scale=0.05,
    )
    print(diagnostics.format_summary(diagnostics.summary(post.flat,
                                                         post.names)))
    # sensor 7's loading must come out negative (times sensor 0's sign)
    w = np.asarray(post.flat)[..., [post.names.index(f"w_{i}")
                                    for i in range(N_SENSORS)]]
    signs = np.sign(np.median(w.reshape(-1, N_SENSORS), axis=0))
    print("posterior coupling signs (up to joint flip):",
          signs * signs[0])

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(4, 2, figsize=(10, 10), sharex=True)
        for i, ax in enumerate(axes.ravel()):
            off = float(temps[:, i].mean())
            ax.plot(np.asarray(x[:, 0]), np.asarray(temps[:, i]), "k.",
                    ms=2)
            ax.plot(np.asarray(xs[:, 0]), np.asarray(fc.mean[:, i]) + off)
            ax.fill_between(np.asarray(xs[:, 0]),
                            np.asarray(lo[:, i]) + off,
                            np.asarray(hi[:, i]) + off, alpha=0.3)
            ax.set_title(f"sensor {i}")
        fig.tight_layout()
        fig.savefig(OUT / "temperature-icm.png", dpi=100)
        plt.close(fig)
        print(f"wrote {OUT / 'temperature-icm.png'}")
    except Exception as e:  # matplotlib is optional at runtime
        print(f"(skipping plot: {e})")


if __name__ == "__main__":
    main()
