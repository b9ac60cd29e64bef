"""Spatial temperature GP — examples/src/main/scala/Temperature.scala.

2-D sensor locations, Plane mean + SE + white kernel, MH-within-Gibbs over
(plane mean | kernel hyperparameters), then prediction at a held-out sensor
with posterior-mean parameters (Temperature.scala:64-180). The reference
reads a sensor CSV that isn't shipped with its repo; this example generates a
synthetic sensor network from the same model family (or reads
``--data <csv>`` with columns lon,lat,temp if you have one).
"""

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx import diagnostics, io, plots
from gpx.distributions import Gamma, Normal
from gpx.infer import sample_mh_within_gibbs
from gpx.models import gp

OUT = pathlib.Path(__file__).parent / "output"


def synthetic_sensors(key, n_sensors=25):
    k1, k2 = jax.random.split(key)
    locs = jax.random.uniform(
        k1, (n_sensors, 2), minval=jnp.array([-1.8, 54.8]),
        maxval=jnp.array([-1.2, 55.2]),
    )
    truth = gpx.Parameters(
        mean=gpx.plane(jnp.array([12.0, 2.0, 0.0])),
        kernel=gpx.se(1.5, 0.3) + gpx.white(0.2),
    )
    temps = gp.draw(k2, truth, locs)
    return locs, temps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_iters", nargs="?", type=int, default=1000)
    ap.add_argument("--data", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    OUT.mkdir(exist_ok=True)

    if args.data:
        flat, _ = io.read_chain_csv(args.data)
        locs, temps = jnp.asarray(flat[:, :2]), jnp.asarray(flat[:, 2])
    else:
        locs, temps = synthetic_sensors(jax.random.PRNGKey(args.seed))

    # hold out the last sensor for prediction (Temperature.scala:127-180)
    x_train, y_train = locs[:-1], temps[:-1]
    x_test = locs[-1:]

    template = gpx.Parameters(
        mean=gpx.plane(jnp.zeros(3)),
        kernel=gpx.se(1.0, 1.0) + gpx.white(0.5),
    )

    def log_prior_kernel(kern):
        pr = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(2.0))
        k0, k1 = kern.kernels
        return pr.logpdf(k0.h) + pr.logpdf(k0.sigma) + pr.logpdf(k1.sigma)

    post = sample_mh_within_gibbs(
        jax.random.PRNGKey(args.seed + 1), x_train, y_train, template,
        log_prior_kernel, Normal(loc=jnp.asarray(0.0), scale=jnp.asarray(10.0)),
        n_samples=args.n_iters, burn_in=args.n_iters // 5, n_chains=2,
        proposal_scale=0.1,
    )
    io.write_chains_csv(OUT / "temperature-mcmc.csv", post.flat, post.names)
    print(diagnostics.format_summary(diagnostics.summary(post.flat, post.names)))

    # posterior-mean parameters -> prediction at the held-out sensor
    mean_flat = jnp.asarray(np.asarray(post.flat).mean((0, 1)))
    p_hat = gpx.params.from_array(template, mean_flat)
    summary = gp.fit(p_hat, x_train, y_train, x_test)
    print(
        f"held-out sensor: observed {float(temps[-1]):.2f}, "
        f"predicted {float(summary.mean[0]):.2f} "
        f"± {1.64 * float(jnp.sqrt(summary.variance[0])):.2f} (90%)"
    )


if __name__ == "__main__":
    main()
