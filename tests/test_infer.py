"""Inference engines: exactness on Gaussian targets, conjugate Gibbs parity,
dual-averaging sanity, and GP posterior recovery (the assertions the
reference's docs workflow only eyeballed — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpx import Parameters, se, white, plane, zero
from gpx.distributions import Gamma, Normal
from gpx.infer import base, dual_averaging, ehmc, gibbs, hmc, mh
from gpx.models import gp


def _std_normal_logpost(dim=2):
    return lambda q: -0.5 * jnp.sum(q * q)


def test_mh_recovers_gaussian_moments():
    logpost = _std_normal_logpost()
    step = mh.kernel(logpost, mh.gaussian_random_walk(1.0))
    state = mh.init(jnp.zeros(2), logpost)
    result = base.sample(step, state, jax.random.PRNGKey(0), 20000, burn_in=500,
                         collect=lambda s: s.position)
    draws = np.asarray(result.samples)
    assert 0.1 < float(result.accept_rate) < 0.9
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.08)
    np.testing.assert_allclose(draws.var(0), 1.0, atol=0.12)


def test_mh_nan_guard():
    # a log-posterior that returns NaN off the origin must never be accepted
    def logpost(q):
        return jnp.where(jnp.sum(q**2) > 0.5, jnp.nan, 0.0)

    step = mh.kernel(logpost, mh.gaussian_random_walk(5.0))
    state = mh.init(jnp.zeros(2), logpost)
    result = base.sample(step, state, jax.random.PRNGKey(1), 200,
                         collect=lambda s: s.position)
    assert np.isfinite(np.asarray(result.samples)).all()
    assert (np.sum(np.asarray(result.samples) ** 2, -1) <= 0.5 + 1e-9).all()


def test_hmc_recovers_gaussian_moments():
    logpost = _std_normal_logpost()
    step = hmc.kernel(logpost, eps=0.2, l=10)
    state = hmc.init(jnp.zeros(2), logpost)
    result = base.sample(step, state, jax.random.PRNGKey(2), 5000, burn_in=200,
                         collect=lambda s: s.position)
    draws = np.asarray(result.samples)
    assert float(result.accept_rate) > 0.8
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.1)
    np.testing.assert_allclose(draws.var(0), 1.0, atol=0.15)


def test_hmc_mass_matrix_consistency():
    # correlated-scale target: heavy mass on the wide direction still samples
    scales = jnp.array([1.0, 10.0])

    def logpost(q):
        return -0.5 * jnp.sum((q / scales) ** 2)

    mass = 1.0 / scales**2
    step = hmc.kernel(logpost, eps=0.8, l=10, mass=mass)
    state = hmc.init(jnp.zeros(2), logpost)
    result = base.sample(step, state, jax.random.PRNGKey(3), 5000, burn_in=200,
                         collect=lambda s: s.position)
    draws = np.asarray(result.samples)
    np.testing.assert_allclose(draws.var(0), np.asarray(scales) ** 2, rtol=0.25)


def test_dual_averaging_finds_reasonable_eps():
    logpost = _std_normal_logpost()
    eps, pos = dual_averaging.warmup(
        jax.random.PRNGKey(4), jnp.zeros(2), logpost, 300, l0=10
    )
    # for a 2-D standard normal with L=10, a sane step size is O(0.1..1.5)
    assert 0.05 < float(eps) < 2.5
    # and sampling at that eps accepts near the 0.65 target
    step = hmc.kernel(logpost, eps=eps, l=10)
    result = base.sample(step, hmc.init(pos, logpost), jax.random.PRNGKey(5),
                         1000, collect=lambda s: s.position)
    assert 0.4 < float(result.accept_rate) <= 1.0


def test_window_warmup_adapts_mass():
    # badly scaled target: adaptation should discover the scales
    scales = jnp.array([0.1, 10.0])

    def logpost(q):
        return -0.5 * jnp.sum((q / scales) ** 2)

    eps, mass, pos = dual_averaging.window_warmup(
        jax.random.PRNGKey(11), jnp.zeros(2), logpost,
        l0=10, init_window=150, mass_window=400, final_window=150,
    )
    # mass ≈ 1/var: ratio across dims should reflect the 10^4 variance ratio
    ratio = float(mass[0] / mass[1])
    assert ratio > 100.0, (ratio, np.asarray(mass))
    # sampling with the adapted metric recovers both variances
    step = hmc.kernel(logpost, eps=eps, l=10, mass=mass)
    result = base.sample(step, hmc.init(pos, logpost), jax.random.PRNGKey(12),
                         4000, collect=lambda s: s.position)
    draws = np.asarray(result.samples)
    np.testing.assert_allclose(draws.var(0), np.asarray(scales) ** 2, rtol=0.3)
    assert float(result.accept_rate) > 0.5


def test_ehmc_on_gaussian():
    logpost = _std_normal_logpost()
    result, extras = ehmc.sample(
        logpost, jnp.zeros(2), jax.random.PRNGKey(6), 3000,
        l0=10, warmup_iters=200, k=200, l_max=64,
    )
    draws = np.asarray(result.samples)
    lengths = np.asarray(extras["lengths"])
    assert lengths.min() >= 1 and lengths.max() <= 64
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.12)
    np.testing.assert_allclose(draws.var(0), 1.0, atol=0.2)


def test_nuts_recovers_gaussian_moments():
    from gpx.infer import nuts

    logpost = _std_normal_logpost()
    result, extras = nuts.sample(
        logpost, jnp.zeros(2), jax.random.PRNGKey(20), 4000,
        warmup_iters=200, max_depth=8,
    )
    draws = np.asarray(result.samples)
    assert 0.05 < float(extras["eps"]) < 2.5
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.1)
    np.testing.assert_allclose(draws.var(0), 1.0, atol=0.15)
    # NUTS should move nearly every iteration on a smooth target
    assert float(result.accept_rate) > 0.8


def test_nuts_backward_subtrees_grow():
    # Regression (ADVICE r1): the subtree U-turn check compared checkpoints
    # in generation order, so backward-built subtrees (direction = -1) saw a
    # time-reversed dq and nearly every backward doubling flagged turning.
    # With the direction-aware check, trajectories on a smooth target with a
    # small step size must reach substantial depths regardless of the
    # (random) doubling directions.
    from gpx.infer import nuts

    logpost = _std_normal_logpost()
    step = nuts.kernel(logpost, eps=0.1, max_depth=8)
    result = base.sample(
        step, nuts.init(jnp.zeros(2), logpost), jax.random.PRNGKey(30), 200,
        collect=lambda s: s.depth,
    )
    depths = np.asarray(result.samples)
    # optimal integration time ~pi => ~31 leapfrogs => depth ~5; the buggy
    # check capped roughly half of all transitions at depth 1.
    assert depths.mean() > 3.5, depths.mean()
    assert (depths <= 1).mean() < 0.1, (depths <= 1).mean()


def test_nuts_correlated_target():
    from gpx.infer import nuts

    # strongly correlated 2-D Gaussian: depth adaptation must cope
    rho = 0.9
    prec = np.linalg.inv(np.array([[1.0, rho], [rho, 1.0]]))
    pj = jnp.asarray(prec)

    def logpost(q):
        return -0.5 * q @ pj @ q

    result, _ = nuts.sample(
        logpost, jnp.zeros(2), jax.random.PRNGKey(21), 6000,
        warmup_iters=300, max_depth=8,
    )
    draws = np.asarray(result.samples)
    emp = np.cov(draws.T)
    np.testing.assert_allclose(emp[0, 1], rho, atol=0.12)
    np.testing.assert_allclose(np.diag(emp), 1.0, atol=0.15)


def test_nuts_on_gp_posterior(rng):
    # end-to-end: NUTS over GP hyperparameters agrees with HMC
    from gpx import Parameters, se, white, zero
    from gpx.distributions import Gamma
    from gpx.infer import mh, nuts
    from gpx.models import gp as gpmod

    x = jnp.asarray(rng.uniform(-10, 10, size=(30, 1)))
    truth = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    y = gpmod.draw(jax.random.PRNGKey(22), truth, x)

    def log_density(p):
        pr = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(0.5))
        a, b = p.kernel.kernels
        prior = pr.logpdf(a.h) + pr.logpdf(a.sigma) + pr.logpdf(b.sigma)
        return prior + gpmod.log_marginal_likelihood(p, x, y)

    logpost, flat0, unravel = mh.make_unconstrained_log_posterior(
        log_density, truth
    )
    result, _ = nuts.sample(
        logpost, flat0, jax.random.PRNGKey(23), 400, warmup_iters=150,
        max_depth=6,
    )
    draws = np.asarray(result.samples)
    assert np.isfinite(draws).all()
    # noise parameter (exp of the last coordinate) recovers ~0.5
    noise = np.exp(draws[:, 2])
    assert 0.2 < np.median(noise) < 1.2, np.median(noise)


def test_sample_chains_vmapped_shapes():
    logpost = _std_normal_logpost()
    step = mh.kernel(logpost, mh.gaussian_random_walk(1.0))
    init = mh.init(jnp.zeros(2), logpost)
    result = base.sample_chains(step, init, jax.random.PRNGKey(7), 100, 4,
                                collect=lambda s: s.position)
    assert result.samples.shape == (4, 100, 2)
    assert result.accept_rate.shape == (4,)
    # chains differ (independent keys)
    assert not np.allclose(result.samples[0], result.samples[1])


def test_thinning_and_burn_in():
    logpost = _std_normal_logpost()
    step = mh.kernel(logpost, mh.gaussian_random_walk(1.0))
    init = mh.init(jnp.zeros(2), logpost)
    r = base.sample(step, init, jax.random.PRNGKey(8), 50, burn_in=20, thin=5,
                    collect=lambda s: s.position)
    assert r.samples.shape == (50, 2)
    # accept counter saw burn_in + n*thin transitions
    assert float(r.accept_rate) <= 1.0


def test_sample_plane_conjugate_posterior(rng):
    # with K = sigma2*I the GLS conditional reduces to Bayesian linear
    # regression; compare Gibbs draws to the analytic posterior
    n = 60
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 1)))
    beta_true = np.array([2.0, -1.0])
    sigma2 = 0.25
    y = jnp.asarray(
        beta_true[0] + x[:, 0] * beta_true[1] + rng.normal(size=n) * np.sqrt(sigma2)
    )
    params = Parameters(mean=plane(jnp.zeros(2)), kernel=white(sigma2))
    prior = Normal(loc=jnp.asarray(0.0), scale=jnp.asarray(10.0))

    keys = jax.random.split(jax.random.PRNGKey(9), 4000)
    draws = jax.vmap(
        lambda k: gibbs.sample_plane(k, prior, x, y, params, nugget=0.0).beta
    )(keys)
    draws = np.asarray(draws)

    xd = np.concatenate([np.ones((n, 1)), np.asarray(x)], axis=1)
    prec = xd.T @ xd / sigma2 + np.eye(2) / 100.0
    cov = np.linalg.inv(prec)
    mean = cov @ (xd.T @ np.asarray(y) / sigma2)
    np.testing.assert_allclose(draws.mean(0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.02)


def test_sample_precision_y_conjugate(rng):
    y = jnp.asarray(rng.normal(size=100) * 0.5)
    fx = jnp.zeros(100)
    prior = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(2.0))
    _, posterior = gibbs.sample_precision_y(jax.random.PRNGKey(10), prior, y, fx)
    ssy = float(jnp.sum(y**2))
    assert float(posterior.concentration) == 2.0 + 50.0
    np.testing.assert_allclose(float(posterior.rate), 2.0 + 0.5 * ssy)
    # posterior mean precision should be near true precision 1/0.25 = 4
    assert 2.5 < float(posterior.concentration / posterior.rate) < 6.0
