"""Joint DLM-GP fit — examples/src/main/scala/FitDlmGp.scala /
TemperatureDlm.scala:181-253 (TemperatureDlmGp).

Simulates the joint spatio-temporal model (latent DLM state shared across
sensors + GP spatial residuals), then runs the joint Gibbs sampler: FFBS
state draw with ``v = Kxx``, kernel-MH on residuals, conjugate W draw.
"""

import argparse
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx import plots
from gpx.distributions import Gamma, InverseGamma
from gpx.models import dlm, dlmgp

OUT = pathlib.Path(__file__).parent / "output"
N_SENSORS = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_iters", nargs="?", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    OUT.mkdir(exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    k1, k2, k3 = jax.random.split(key, 3)
    locs = jax.random.uniform(k1, (N_SENSORS, 2), minval=0.0, maxval=5.0)
    model = dlm.replicate_observations(dlm.polynomial(1), N_SENSORS)
    truth = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(1.0, 2.0) + gpx.white(0.2)
    )
    states, ys = dlmgp.simulate(
        k2, model, truth, locs, v_extra=jnp.asarray(0.01),
        w=jnp.array([0.05]), m0=jnp.zeros(1), n_steps=200,
    )

    def log_prior_kernel(kern):
        pr = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(2.0))
        c0, c1 = kern.kernels
        return pr.logpdf(c0.h) + pr.logpdf(c0.sigma) + pr.logpdf(c1.sigma)

    template = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(0.5, 1.0) + gpx.white(0.5)
    )
    prior_w = InverseGamma(concentration=jnp.asarray(3.0), scale=jnp.asarray(0.1))
    result = dlmgp.gibbs_sample(
        k3, model, ys, locs, template, log_prior_kernel, prior_w,
        m0=jnp.zeros(1), c0=jnp.eye(1) * 10.0, n_iters=args.n_iters,
        proposal_scale=0.1,
    )

    keep = args.n_iters // 2
    kmed = np.median(np.asarray(result.kernel_flat)[keep:], axis=0)
    wmed = np.median(np.asarray(result.w)[keep:, 0])
    print(f"kernel posterior medians (truth 1.0, 2.0, 0.2): {np.round(kmed, 3)}")
    print(f"W posterior median (truth 0.05): {wmed:.4f}")
    print(f"kernel-MH accept rate: {float(result.accept_rate):.2f}")

    fig = plots.traceplot(np.asarray(result.kernel_flat)[:, 0])
    plots.savefig(fig, OUT / "dlmgp_trace_h.png")
    # state recovery
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.plot(np.asarray(states)[:, 0], label="true state", lw=1)
    ax.plot(np.asarray(result.states)[keep:, :, 0].mean(0), label="posterior mean",
            lw=1)
    ax.legend()
    plots.savefig(fig, OUT / "dlmgp_state.png")
    print(f"wrote {OUT}/dlmgp_state.png")


if __name__ == "__main__":
    main()
