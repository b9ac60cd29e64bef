"""Simulated-GP example suite — examples/src/main/scala/SimulatedGp.scala.

Subcommands mirror the reference's App objects:
  simulate              SimulateGp (:39-45): draw + scatter plot
  replicate             SimulateGpReplicate (:48-60): repeated draws
  fit                   FitGp (:62-98): posterior fit on every-15th point
  parameters <nIters>   ParametersSimulatedGp (:100-166): MH, 4 chains
  hmc <nIters>          HmcSimulated (:168-195): eHMC sampling
  posterior-predictive  PosteriorPredictive (:197-247): spaghetti plot

Outputs land in examples/output/ (plots as PNG, chains as CSV).
"""

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx import diagnostics, io, plots
from gpx.distributions import Gamma
from gpx.infer import sample_ehmc, sample_mh
from gpx.models import gp

OUT = pathlib.Path(__file__).parent / "output"

# the docs model: se(h=3.0, sigma=5.5) + white(0.5)
# (docs/src/main/tut/docs/parameter_inference.md:18-27)
TRUTH = gpx.Parameters(mean=gpx.zero(), kernel=gpx.se(3.0, 5.5) + gpx.white(0.5))


def _simulate(key, n=300):
    k1, k2 = jax.random.split(key)
    x = gp.sample_points(k1, -10.0, 10.0, n)
    y = gp.draw(k2, TRUTH, x)
    return x, y


def _log_prior(p):
    # InverseGamma-flavoured Gamma(2, 2) priors as in the docs
    # (parameter_inference.md:48-58)
    pr = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(2.0))
    k0, k1 = p.kernel.kernels
    return pr.logpdf(k0.h) + pr.logpdf(k0.sigma) + pr.logpdf(k1.sigma)


def cmd_simulate(args):
    x, y = _simulate(jax.random.PRNGKey(args.seed), n=args.n)
    plots.savefig(plots.scatter_plot(x, y), OUT / "simulated_gp.png")
    io.write_chain_csv(OUT / "simulated_gp.csv", np.stack([x, y], -1), ["x", "y"])
    print(f"wrote {OUT}/simulated_gp.png")


def cmd_replicate(args):
    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)
    x = gp.sample_points(k1, -10.0, 10.0, 100)
    draws = gp.draw(k2, TRUTH, x, shape=(10,))
    fig = plots.pp_plot(x, np.asarray(draws))
    plots.savefig(fig, OUT / "simulated_replicates.png")
    print(f"wrote {OUT}/simulated_replicates.png")


def cmd_fit(args):
    x, y = _simulate(jax.random.PRNGKey(args.seed), n=args.n)
    xobs, yobs = x[::15], y[::15]  # every-15th-point subsample (FitGp)
    xs = jnp.arange(-10.0, 10.0, 0.01)
    summary = gp.fit(TRUTH, xobs, yobs, xs)
    plots.savefig(
        plots.gp_plot(summary, obs=(xobs, yobs)), OUT / "fitted_gp.png"
    )
    print(f"wrote {OUT}/fitted_gp.png")


def cmd_parameters(args):
    x, y = _simulate(jax.random.PRNGKey(args.seed), n=args.n)
    xobs, yobs = x[::15], y[::15]
    template = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(1.0, 1.0) + gpx.white(1.0)
    )
    post = sample_mh(
        jax.random.PRNGKey(args.seed + 1), xobs, yobs, template, _log_prior,
        n_samples=args.n_iters, burn_in=args.n_iters // 10, n_chains=4,
        proposal_scale=0.12,
    )
    io.write_chains_csv(OUT / "gpmcmc.csv", post.flat, post.names)
    plots.savefig(
        plots.diagnostic_plots(post.flat, post.names), OUT / "gpmcmc_diagnostics.png"
    )
    print(diagnostics.format_summary(diagnostics.summary(post.flat, post.names)))
    print("accept:", np.asarray(post.accept_rate))


def cmd_hmc(args):
    x, y = _simulate(jax.random.PRNGKey(args.seed), n=args.n)
    xobs, yobs = x[::15], y[::15]
    template = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(1.0, 1.0) + gpx.white(1.0)
    )
    post = sample_ehmc(
        jax.random.PRNGKey(args.seed + 2), xobs, yobs, template, _log_prior,
        n_samples=args.n_iters, warmup_iters=200, k=200, l_max=128, n_chains=2,
    )
    io.write_chains_csv(OUT / "gp_ehmc.csv", post.flat, post.names)
    print(diagnostics.format_summary(diagnostics.summary(post.flat, post.names)))
    print("accept:", np.asarray(post.accept_rate))


def cmd_posterior_predictive(args):
    # resume from the MH chains the way the reference re-reads gpmcmc_0.csv
    # (SimulatedGp.scala:209-219)
    chain_path = OUT / "gpmcmc_0.csv"
    if not chain_path.exists():
        raise SystemExit("run `parameters` first (needs gpmcmc_0.csv)")
    flat, names = io.read_chain_csv(chain_path, burn_in=0, thin=max(1, args.n_iters // 20))
    # SAME seed and --n as the `parameters` stage: the resumed chains were
    # inferred from this dataset, so re-simulating it must reproduce it
    # exactly (pass the same flags to both invocations)
    x, y = _simulate(jax.random.PRNGKey(args.seed), n=args.n)
    xobs, yobs = x[::15], y[::15]
    xs = jnp.arange(-10.0, 10.0, 0.05)
    template = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(1.0, 1.0) + gpx.white(1.0)
    )
    curves = gp.posterior_predictive_curves(
        flat, template, xobs, yobs, xs, n_curves=20
    )
    plots.savefig(plots.pp_plot(xs, np.asarray(curves)), OUT / "posterior_predictive.png")
    print(f"wrote {OUT}/posterior_predictive.png")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("command", choices=[
        "simulate", "replicate", "fit", "parameters", "hmc",
        "posterior-predictive",
    ])
    ap.add_argument("n_iters", nargs="?", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--n", type=int, default=300,
        help="simulated dataset size (the reference fixes 300, "
        "SimulatedGp.scala:43; larger values exercise the chip-scale "
        "workflow, e.g. the tests_tpu example lane runs --n 2048)",
    )
    args = ap.parse_args()
    OUT.mkdir(exist_ok=True)
    {
        "simulate": cmd_simulate,
        "replicate": cmd_replicate,
        "fit": cmd_fit,
        "parameters": cmd_parameters,
        "hmc": cmd_hmc,
        "posterior-predictive": cmd_posterior_predictive,
    }[args.command](args)


if __name__ == "__main__":
    main()
