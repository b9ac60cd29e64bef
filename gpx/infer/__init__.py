"""Bayesian inference engines: MH, HMC, dual-averaging, eHMC, Gibbs.

Rebuild of layer L4 (SURVEY.md §1): all samplers are ``lax.scan`` loops over
jitted transition kernels, vmapped over a chains axis.
"""

from gpx.infer import base, dual_averaging, ehmc, gibbs, hmc, mcmc, mh, nuts
from gpx.infer.mcmc import (
    PosteriorSamples,
    sample_ehmc,
    sample_ehmc_log_density,
    sample_hmc,
    sample_hmc_log_density,
    sample_mh,
    sample_mh_log_density,
    sample_mh_within_gibbs,
    sample_nuts,
    sample_nuts_log_density,
)

__all__ = [
    "base",
    "dual_averaging",
    "ehmc",
    "gibbs",
    "hmc",
    "mcmc",
    "mh",
    "nuts",
    "PosteriorSamples",
    "sample_ehmc",
    "sample_ehmc_log_density",
    "sample_hmc",
    "sample_hmc_log_density",
    "sample_mh",
    "sample_mh_log_density",
    "sample_mh_within_gibbs",
    "sample_nuts",
    "sample_nuts_log_density",
]
