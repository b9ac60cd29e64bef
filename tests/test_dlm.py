"""DLM: Kalman filter vs hand computation, FFBS/smoother coherence, Gibbs
variance recovery, forecasting, and the DLM-GP joint model."""

import jax
import jax.numpy as jnp
import numpy as np

from gpx import Parameters, se, white, zero
from gpx.distributions import InverseGamma
from gpx.models import dlm, dlmgp, gp


def _local_level(v=0.5, w=0.1):
    return dlm.polynomial(1), jnp.array([v]), jnp.array([w])


def _simulate_local_level(rng, t=200, v=0.5, w=0.1):
    x = np.zeros(t)
    for i in range(1, t):
        x[i] = x[i - 1] + rng.normal() * np.sqrt(w)
    y = x + rng.normal(size=t) * np.sqrt(v)
    return x, y[:, None]


def test_kalman_filter_matches_hand_rolled(rng):
    model, v, w = _local_level()
    _, ys = _simulate_local_level(rng, t=50)
    m0, c0 = jnp.zeros(1), jnp.eye(1) * 10.0
    result = dlm.kalman_filter(model, jnp.asarray(ys), v, w, m0, c0)

    # scalar local-level recursion by hand
    m, c = 0.0, 10.0
    lls = 0.0
    for t in range(50):
        a, r = m, c + 0.1
        q = r + 0.5
        e = ys[t, 0] - a
        k = r / q
        m, c = a + k * e, r - k * r
        lls += -0.5 * (e**2 / q + np.log(q) + np.log(2 * np.pi))
        np.testing.assert_allclose(float(result.m[t, 0]), m, rtol=1e-8)
        np.testing.assert_allclose(float(result.c[t, 0, 0]), c, rtol=1e-8)
    np.testing.assert_allclose(float(result.log_likelihood), lls, rtol=1e-8)


def test_kalman_filter_missing_data(rng):
    model, v, w = _local_level()
    _, ys = _simulate_local_level(rng, t=60)
    ys_missing = ys.copy()
    ys_missing[10:20] = np.nan
    m0, c0 = jnp.zeros(1), jnp.eye(1) * 10.0
    result = dlm.kalman_filter(model, jnp.asarray(ys_missing), v, w, m0, c0)
    assert np.isfinite(np.asarray(result.m)).all()
    # during the gap, uncertainty grows monotonically
    cs = np.asarray(result.c)[:, 0, 0]
    assert (np.diff(cs[10:20]) > 0).all()


def test_kalman_filter_missing_data_full_v_marginalizes(rng):
    # Regression (ADVICE r1): with a NON-diagonal V (the DLM-GP path sets
    # V = K(x,x), FitDlmGp.scala:75), missing dimensions must be fully
    # marginalized — V's cross-covariances between missing and observed
    # entries must not leak into the innovation solve. Compare against a
    # hand-rolled numpy filter that subsets F/V/y to the observed rows.
    state = dlm.polynomial(2)
    model = dlm.DLM(f=jnp.asarray(rng.normal(size=(3, 2))), g=state.g)
    v_half = rng.normal(size=(3, 3))
    v_np = v_half @ v_half.T + 0.5 * np.eye(3)       # dense SPD obs cov
    w_np = np.diag([0.2, 0.05])
    t = 30
    ys = rng.normal(size=(t, 3)).astype(float)
    miss = rng.random(size=(t, 3)) < 0.3
    ys[miss] = np.nan
    ys[5] = np.nan                                   # a fully-missing step

    m0, c0 = jnp.zeros(2), jnp.eye(2) * 4.0
    result = dlm.kalman_filter(
        model, jnp.asarray(ys), jnp.asarray(v_np),
        jnp.asarray(np.diag(w_np)), m0, c0,
    )

    f_np, g_np = np.asarray(model.f), np.asarray(model.g)
    m, c = np.zeros(2), np.eye(2) * 4.0
    ll = 0.0
    for ti in range(t):
        a = g_np @ m
        r = g_np @ c @ g_np.T + w_np
        obs = np.isfinite(ys[ti])
        if obs.any():
            fo = f_np[obs]
            vo = v_np[np.ix_(obs, obs)]
            e = ys[ti, obs] - fo @ a
            q = fo @ r @ fo.T + vo
            k = r @ fo.T @ np.linalg.inv(q)
            m = a + k @ e
            c = (np.eye(2) - k @ fo) @ r @ (np.eye(2) - k @ fo).T + k @ vo @ k.T
            ll += -0.5 * (
                e @ np.linalg.solve(q, e)
                + np.linalg.slogdet(q)[1]
                + obs.sum() * np.log(2 * np.pi)
            )
        else:
            m, c = a, r
        np.testing.assert_allclose(np.asarray(result.m[ti]), m, atol=1e-6)
        np.testing.assert_allclose(np.asarray(result.c[ti]), c, atol=1e-6)
    np.testing.assert_allclose(float(result.log_likelihood), ll, rtol=1e-8)


def test_ffbs_marginals_match_smoother(rng):
    model, v, w = _local_level()
    _, ys = _simulate_local_level(rng, t=40)
    m0, c0 = jnp.zeros(1), jnp.eye(1) * 10.0
    filtered = dlm.kalman_filter(model, jnp.asarray(ys), v, w, m0, c0)
    smooth_m, smooth_c = dlm.smooth(model, filtered)

    keys = jax.random.split(jax.random.PRNGKey(0), 3000)
    draws = jax.vmap(lambda k: dlm.ffbs(k, model, filtered))(keys)
    draws = np.asarray(draws)[:, :, 0]
    np.testing.assert_allclose(draws.mean(0), np.asarray(smooth_m)[:, 0], atol=0.05)
    np.testing.assert_allclose(
        draws.var(0), np.asarray(smooth_c)[:, 0, 0], atol=0.05
    )


def test_seasonal_polynomial_composition():
    model = dlm.polynomial(1) + dlm.seasonal(24, 3)
    assert model.g.shape == (7, 7)
    assert model.f.shape == (1, 7)
    rep = dlm.replicate_observations(model, 8)
    assert rep.f.shape == (8, 7)
    # seasonal rotation blocks are orthogonal: G_seas @ G_seas^T = I
    gs = np.asarray(dlm.seasonal(24, 3).g)
    np.testing.assert_allclose(gs @ gs.T, np.eye(6), atol=1e-12)


def test_gibbs_recovers_variances(rng):
    model, v, w = _local_level(v=0.5, w=0.05)
    _, ys = _simulate_local_level(rng, t=400, v=0.5, w=0.05)
    m0, c0 = jnp.zeros(1), jnp.eye(1) * 10.0
    prior = InverseGamma(concentration=jnp.asarray(3.0), scale=jnp.asarray(0.5))
    result = dlm.gibbs_sample(
        jax.random.PRNGKey(1), model, jnp.asarray(ys), prior, prior, m0, c0, 600
    )
    v_draws = np.asarray(result.v)[200:, 0]
    w_draws = np.asarray(result.w)[200:, 0]
    assert 0.3 < np.median(v_draws) < 0.8, np.median(v_draws)
    assert 0.01 < np.median(w_draws) < 0.15, np.median(w_draws)


def test_forecast_variance_grows(rng):
    model, v, w = _local_level()
    _, ys = _simulate_local_level(rng, t=100)
    m0, c0 = jnp.zeros(1), jnp.eye(1) * 10.0
    filtered = dlm.kalman_filter(model, jnp.asarray(ys), v, w, m0, c0)
    means, covs = dlm.forecast(model, filtered.m[-1], filtered.c[-1], v, w, 10)
    assert means.shape == (10, 1) and covs.shape == (10, 1, 1)
    assert (np.diff(np.asarray(covs)[:, 0, 0]) > 0).all()


def test_conjugate_filter_recovers_variance(rng):
    from gpx.distributions import InverseGamma

    model, v, w = _local_level(v=0.5, w=0.05)
    _, ys = _simulate_local_level(rng, t=400, v=0.5, w=0.05)
    prior = InverseGamma(concentration=jnp.asarray(2.0), scale=jnp.asarray(1.0))
    # scale-free W: W* = W / v
    result = dlm.conjugate_filter(
        model, jnp.asarray(ys), jnp.array([0.05 / 0.5]),
        jnp.zeros(1), jnp.eye(1) * 10.0, prior,
    )
    v_hat = float(result.v_scale[-1] / result.v_shape[-1])
    assert 0.3 < v_hat < 0.8, v_hat
    # df grows by n_obs/2 per step -> 2*a_T = 2*a_0 + T
    np.testing.assert_allclose(float(result.forecast_df[-1]), 2 * 2.0 + 399)
    # state tracking matches the fixed-variance Kalman filter closely
    filtered = dlm.kalman_filter(
        model, jnp.asarray(ys), v, w, jnp.zeros(1), jnp.eye(1) * 10.0
    )
    late = slice(100, None)
    np.testing.assert_allclose(
        np.asarray(result.m)[late, 0], np.asarray(filtered.m)[late, 0], atol=0.1
    )


def test_grid_locations():
    grid = dlmgp.grid_locations((0.0, 1.0), (0.0, 2.0), 3, 5)
    assert grid.shape == (15, 2)
    assert float(grid[:, 0].min()) == 0.0 and float(grid[:, 0].max()) == 1.0
    assert float(grid[:, 1].max()) == 2.0


def test_replicated_logml_matches_sum(rng):
    x = jnp.asarray(rng.uniform(-3, 3, size=(10, 2)))
    p = Parameters(mean=zero(), kernel=se(2.0, 3.0) + white(0.3))
    resids = jnp.asarray(rng.normal(size=(7, 10)))
    got = float(dlmgp.replicated_log_marginal_likelihood(p, x, resids))
    want = sum(
        float(gp.log_marginal_likelihood(p, x, resids[t])) for t in range(7)
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_dlmgp_simulate_and_gibbs_runs(rng):
    # small smoke: simulate the joint model, run a short Gibbs, check health
    locations = jnp.asarray(rng.uniform(0, 5, size=(6, 2)))
    model = dlm.replicate_observations(dlm.polynomial(1), 6)
    truth = Parameters(mean=zero(), kernel=se(1.0, 2.0) + white(0.2))
    states, ys = dlmgp.simulate(
        jax.random.PRNGKey(2), model, truth, locations,
        v_extra=jnp.asarray(0.01), w=jnp.array([0.1]), m0=jnp.zeros(1),
        n_steps=50,
    )
    assert ys.shape == (50, 6) and states.shape == (50, 1)

    from gpx.distributions import Gamma

    def log_prior_kernel(kern):
        pr = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(0.5))
        k0, k1 = kern.kernels
        return pr.logpdf(k0.h) + pr.logpdf(k0.sigma) + pr.logpdf(k1.sigma)

    prior_w = InverseGamma(concentration=jnp.asarray(3.0), scale=jnp.asarray(0.2))
    result = dlmgp.gibbs_sample(
        jax.random.PRNGKey(3), model, ys, locations, truth, log_prior_kernel,
        prior_w, m0=jnp.zeros(1), c0=jnp.eye(1) * 10.0, n_iters=100,
    )
    assert result.kernel_flat.shape == (100, 3)
    assert np.isfinite(np.asarray(result.kernel_flat)).all()
    assert np.isfinite(np.asarray(result.w)).all()
    assert 0.0 <= float(result.accept_rate) <= 1.0


def test_student_t_distribution():
    """StudentT (round-3 VERDICT 4): logpdf/cdf/ppf vs scipy, and the
    conjugate-filter forecast interval helper."""
    import scipy.stats as ss

    from gpx.distributions import StudentT, student_t_interval

    for df in (1.0, 2.5, 7.0, 30.0):
        d = StudentT(df=jnp.asarray(df), loc=jnp.asarray(1.5),
                     scale=jnp.asarray(2.0))
        x = np.linspace(-8.0, 8.0, 13)
        np.testing.assert_allclose(
            np.asarray(d.logpdf(x)), ss.t.logpdf(x, df, 1.5, 2.0), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(d.cdf(x)), ss.t.cdf(x, df, 1.5, 2.0), atol=1e-10
        )
        for q in (0.05, 0.5, 0.95):
            np.testing.assert_allclose(
                float(d.ppf(q)), float(ss.t.ppf(q, df, 1.5, 2.0)),
                rtol=1e-6, atol=1e-8,
            )
    # heavy tails: t interval wider than the normal one at the same scale
    from gpx.distributions import normal_interval

    hi_t = float(student_t_interval(0.0, 1.0, 4.0, 0.975))
    hi_n = float(normal_interval(0.0, 1.0, 0.975))
    assert hi_t > hi_n

    # sampling moments (df > 2 so the variance exists)
    d = StudentT(df=jnp.asarray(8.0), loc=jnp.asarray(-1.0),
                 scale=jnp.asarray(0.5))
    draws = d.sample(jax.random.PRNGKey(0), (20000,))
    assert abs(float(draws.mean()) + 1.0) < 0.02
    np.testing.assert_allclose(
        float(draws.std()), 0.5 * np.sqrt(8.0 / 6.0), rtol=0.05
    )


def test_heldout_conjugate_forecast_coverage():
    """End-to-end study 3 of the TemperatureDlm example: the held-out
    sensor's one-step Student-t 90% intervals must cover ~90%."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from examples import temperature_dlm as td

    model, ys = td.simulate(jax.random.PRNGKey(0), t=24 * 7 * 2)
    d_state = model.g.shape[0]
    cover = td.heldout_conjugate_forecast(
        ys, jnp.zeros(d_state), jnp.eye(d_state) * 10.0
    )
    assert 0.75 <= cover <= 0.99
