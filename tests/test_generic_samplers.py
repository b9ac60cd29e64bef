"""Generic bring-your-own-likelihood samplers (sample_*_log_density).

The GP samplers are now thin wrappers over these cores (their posterior-
recovery suites in test_mcmc_gp.py exercise the same code paths); here the
cores are driven directly on a known closed-form target and on the
multi-output models."""

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx.distributions import Gamma, Normal
from gpx.infer import (
    sample_hmc_log_density,
    sample_mh_log_density,
    sample_nuts_log_density,
)
from gpx.models import multioutput as mo

# independent Gamma(3, rate 2) on both SE hyperparameters: mean 1.5,
# variance 0.75 — any pytree with bijectors() works as a template
G = Gamma(concentration=jnp.asarray(3.0), rate=jnp.asarray(2.0))


def _log_density(k):
    return G.logpdf(k.h) + G.logpdf(k.sigma)


def _check_target(post, mean_tol, var_tol):
    pooled = np.asarray(post.flat).reshape(-1, 2)
    np.testing.assert_allclose(pooled.mean(0), [1.5, 1.5], atol=mean_tol)
    np.testing.assert_allclose(pooled.var(0), [0.75, 0.75], atol=var_tol)


def test_generic_mh_recovers_gamma_target():
    post = sample_mh_log_density(
        jax.random.PRNGKey(0), gpx.se(1.0, 1.0), _log_density, 4000,
        n_chains=4, burn_in=500, proposal_scale=0.6,
    )
    assert (np.asarray(post.accept_rate) > 0.1).all()
    _check_target(post, mean_tol=0.12, var_tol=0.25)


def test_generic_hmc_recovers_gamma_target():
    post = sample_hmc_log_density(
        jax.random.PRNGKey(1), gpx.se(1.0, 1.0), _log_density, 1500,
        n_chains=2, burn_in=200, l=5, warmup_iters=150,
    )
    assert (np.asarray(post.accept_rate) > 0.5).all()
    _check_target(post, mean_tol=0.12, var_tol=0.25)


def test_surrogate_force_hmc_exact_stationarity():
    """force_log_density (round 5, VERDICT Next-4): leapfrogs driven by a
    deliberately WRONG force (a mis-scaled density — a 30% gradient bias
    everywhere) must still recover the exact Gamma target, because the
    accept evaluates the exact density: the surrogate only costs accept
    rate, never stationarity."""

    def biased_force(k):
        return 1.3 * _log_density(k)

    post = sample_hmc_log_density(
        jax.random.PRNGKey(7), gpx.se(1.0, 1.0), _log_density, 2000,
        n_chains=2, burn_in=300, l=5, warmup_iters=150,
        force_log_density=biased_force,
    )
    # mismatched force costs accept rate but must not break adaptation
    assert (np.asarray(post.accept_rate) > 0.3).all()
    _check_target(post, mean_tol=0.12, var_tol=0.25)

    import pytest

    with pytest.raises(ValueError, match="exclusive"):
        sample_hmc_log_density(
            jax.random.PRNGKey(7), gpx.se(1.0, 1.0), _log_density, 10,
            force_log_density=biased_force,
            warmup_log_density=biased_force,
        )


def test_chunked_hmc_matches_unchunked():
    """chunk_iters (round 5): the host-chunked HMC driver must reproduce
    the unchunked sampler — same per-chain key tree, same transition and
    warmup ops, state round-tripping through the host between bounded
    device launches (the sampler-scale analog of optimize(chunk_steps=);
    the unchunked 16k ESS program was one ~20-minute launch the TPU
    worker killed). Covers adaptive warmup + mass window + burn-in with
    an uneven chunk tail."""
    kwargs = dict(n_chains=2, burn_in=7, l=4, warmup_iters=24,
                  adapt_mass=True, init_jitter=0.05)
    post_ref = sample_hmc_log_density(
        jax.random.PRNGKey(11), gpx.se(1.0, 1.0), _log_density, 16, **kwargs
    )
    post_chk = sample_hmc_log_density(
        jax.random.PRNGKey(11), gpx.se(1.0, 1.0), _log_density, 16,
        chunk_iters=5, **kwargs
    )
    np.testing.assert_allclose(np.asarray(post_chk.extras["eps"]),
                               np.asarray(post_ref.extras["eps"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(post_chk.extras["mass"]),
                               np.asarray(post_ref.extras["mass"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(post_chk.flat),
                               np.asarray(post_ref.flat), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(post_chk.accept_rate),
                               np.asarray(post_ref.accept_rate), atol=1e-12)

    # surrogate-force mode rides the same chunked driver
    def biased_force(k):
        return 1.3 * _log_density(k)

    post_f_ref = sample_hmc_log_density(
        jax.random.PRNGKey(12), gpx.se(1.0, 1.0), _log_density, 12,
        n_chains=2, l=3, warmup_iters=15, force_log_density=biased_force,
    )
    post_f_chk = sample_hmc_log_density(
        jax.random.PRNGKey(12), gpx.se(1.0, 1.0), _log_density, 12,
        n_chains=2, l=3, warmup_iters=15, force_log_density=biased_force,
        chunk_iters=4,
    )
    np.testing.assert_allclose(np.asarray(post_f_chk.flat),
                               np.asarray(post_f_ref.flat),
                               rtol=1e-4, atol=1e-5)


def test_chunked_program_cache_reuses_and_matches():
    """program_cache (round 5): repeated chunked sample calls through one
    cache dict must (a) actually reuse the jitted chunk programs — the
    benchmark's timed second call must not pay the multi-minute N=16k
    recompile — and (b) change nothing about the math vs a fresh build."""
    import pytest

    kwargs = dict(n_chains=2, l=3, warmup_iters=12, adapt_mass=True,
                  init_jitter=0.05, chunk_iters=5)
    cache = {}
    post_a = sample_hmc_log_density(
        jax.random.PRNGKey(21), gpx.se(1.0, 1.0), _log_density, 10,
        program_cache=cache, **kwargs
    )
    progs_after_first = cache["progs"]
    post_b = sample_hmc_log_density(
        jax.random.PRNGKey(22), gpx.se(1.0, 1.0), _log_density, 10,
        program_cache=cache, **kwargs
    )
    assert cache["progs"] is progs_after_first  # reused, not rebuilt
    post_fresh = sample_hmc_log_density(
        jax.random.PRNGKey(22), gpx.se(1.0, 1.0), _log_density, 10,
        **kwargs
    )
    np.testing.assert_array_equal(np.asarray(post_b.flat),
                                  np.asarray(post_fresh.flat))
    assert not np.array_equal(np.asarray(post_a.flat),
                              np.asarray(post_b.flat))  # keys differ

    # a cache built for one (l, thin, delta) refuses another configuration
    with pytest.raises(ValueError, match="program_cache"):
        sample_hmc_log_density(
            jax.random.PRNGKey(23), gpx.se(1.0, 1.0), _log_density, 10,
            program_cache=cache, n_chains=2, l=4, warmup_iters=12,
            adapt_mass=True, init_jitter=0.05, chunk_iters=5,
        )


def test_hybrid_gradients_hmc_gp_end_to_end():
    """sample_hmc(gradients='hybrid'): the fixed-probe-key hybrid force +
    exact accepts, end-to-end on a small GP (CPU: the hybrid runs the
    Pallas kernels interpreted). Short chain — this locks the plumbing
    and the exact-accept wiring; throughput/recovery at scale is the chip
    benchmark's job (benchmarks/sampler_scale.py)."""
    from gpx.infer import sample_hmc

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-10, 10, size=(512, 1)), jnp.float32)
    truth = gpx.Parameters(mean=gpx.zero(),
                           kernel=gpx.se(3.0, 5.5) + gpx.white(0.5))
    from gpx.models import gp as gpmod

    y = gpmod.draw(jax.random.PRNGKey(4), truth, x)

    def log_prior(p):
        pr = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(0.5))
        a, b = p.kernel.kernels
        return pr.logpdf(a.h) + pr.logpdf(a.sigma) + pr.logpdf(b.sigma)

    post = sample_hmc(
        jax.random.PRNGKey(5), x, y, truth, log_prior, 12,
        n_chains=2, l=2, eps=0.02, gradients="hybrid", probes=16,
        deflate=32,
    )
    assert bool(np.isfinite(np.asarray(post.flat)).all())
    assert (np.asarray(post.accept_rate) > 0.3).all()

    import pytest

    with pytest.raises(ValueError, match="single-chip"):
        sample_hmc(
            jax.random.PRNGKey(5), x, y, truth, log_prior, 4,
            gradients="hybrid", fast_warmup=True, eps=0.02,
        )


def test_generic_nuts_recovers_gamma_target():
    post = sample_nuts_log_density(
        jax.random.PRNGKey(2), gpx.se(1.0, 1.0), _log_density, 1500,
        n_chains=2, burn_in=200, warmup_iters=150, max_depth=6,
    )
    assert (np.asarray(post.accept_rate) > 0.5).all()
    _check_target(post, mean_tol=0.12, var_tol=0.25)
    assert "depth" in post.extras


def test_warmup_surrogate_density_used_for_tuning_only():
    """warmup_log_density tunes eps on a surrogate but kept draws still
    target log_density: a deliberately mis-scaled surrogate (4x tighter)
    must push the adapted eps DOWN while the recovered posterior stays the
    true Gamma target (the fast_warmup plumbing, gpx.infer.mcmc)."""

    def tight_surrogate(k):
        return 16.0 * _log_density(k)

    post = sample_hmc_log_density(
        jax.random.PRNGKey(3), gpx.se(1.0, 1.0), _log_density, 1500,
        n_chains=2, burn_in=200, l=5, warmup_iters=150,
    )
    post_s = sample_hmc_log_density(
        jax.random.PRNGKey(3), gpx.se(1.0, 1.0), _log_density, 1500,
        n_chains=2, burn_in=200, l=5, warmup_iters=150,
        warmup_log_density=tight_surrogate,
    )
    assert float(np.max(post_s.extras["eps"])) < float(
        np.min(post.extras["eps"])
    )
    _check_target(post_s, mean_tol=0.12, var_tol=0.25)

    post_n = sample_nuts_log_density(
        jax.random.PRNGKey(4), gpx.se(1.0, 1.0), _log_density, 1500,
        n_chains=2, burn_in=200, warmup_iters=150, max_depth=6,
        warmup_log_density=tight_surrogate,
    )
    _check_target(post_n, mean_tol=0.12, var_tol=0.25)


def test_fast_warmup_end_to_end_gp():
    """sample_hmc(fast_warmup=True): runs and recovers off-TPU (where the
    2-pass leg is a no-op but the whole surrogate plumbing is exercised);
    rejects misuse without analytic gradients."""
    import pytest

    from gpx.models import gp as gpmod

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-10, 10, size=(24, 1)))
    truth = gpx.Parameters(mean=gpx.zero(),
                           kernel=gpx.se(3.0, 5.5) + gpx.white(0.5))
    y = gpmod.draw(jax.random.PRNGKey(12), truth, x)

    def log_prior(p):
        pr = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(0.5))
        a, b = p.kernel.kernels
        return pr.logpdf(a.h) + pr.logpdf(a.sigma) + pr.logpdf(b.sigma)

    from gpx.infer import sample_hmc

    post = sample_hmc(
        jax.random.PRNGKey(13), x, y, truth, log_prior, 300,
        n_chains=2, burn_in=50, l=5, warmup_iters=100,
        analytic_gradients=True, fast_warmup=True,
    )
    assert bool(np.isfinite(np.asarray(post.flat)).all())
    assert (np.asarray(post.accept_rate) > 0.3).all()

    with pytest.raises(ValueError):
        sample_hmc(
            jax.random.PRNGKey(13), x, y, truth, log_prior, 10,
            n_chains=1, fast_warmup=True,
        )

    # measured-broken configuration (PERF.md round 4): adaptive eps +
    # fast_warmup at N >= 2048 must be a hard error, not a warning
    x_big = jnp.linspace(-10.0, 10.0, 2048).reshape(-1, 1)
    y_big = jnp.zeros(2048)
    with pytest.raises(ValueError, match="measured-broken"):
        sample_hmc(
            jax.random.PRNGKey(13), x_big, y_big, truth, log_prior, 10,
            n_chains=1, analytic_gradients=True, fast_warmup=True,
        )


def test_multioutput_nuts_runs_and_recovers_coupling_sign():
    truth = mo.IcmParams(
        kernel=gpx.se(1.0, 1.2),
        w=jnp.asarray([[1.0], [-0.8]]),
        kappa=jnp.asarray([0.05, 0.05]),
        noise=jnp.asarray(0.05),
    )
    x = jnp.linspace(-3.0, 3.0, 30)[:, None]
    y = mo.draw(jax.random.PRNGKey(3), truth, x)
    template = mo.icm(gpx.se(1.5, 1.0), n_outputs=2, rank=1,
                      kappa=0.2, noise=0.1)

    def log_prior(p):
        nw = Normal(loc=jnp.asarray(0.0), scale=jnp.asarray(2.0))
        return (G.logpdf(p.kernel.h) + G.logpdf(p.kernel.sigma)
                + jnp.sum(nw.logpdf(p.w)) + jnp.sum(G.logpdf(p.kappa))
                + G.logpdf(p.noise))

    post = mo.sample_nuts(
        jax.random.PRNGKey(4), x, y, template, log_prior, 150,
        n_chains=2, burn_in=50, warmup_iters=100, max_depth=6,
    )
    flat = np.asarray(post.flat)
    assert np.isfinite(flat).all()
    assert (np.asarray(post.accept_rate) > 0.4).all()
    w0 = flat[..., post.names.index("w_0")]
    w1 = flat[..., post.names.index("w_1")]
    # anti-correlated outputs: loadings have opposite signs (up to flip)
    assert np.median(w0.reshape(-1) * w1.reshape(-1)) < 0
