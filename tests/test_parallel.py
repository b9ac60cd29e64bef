"""Multi-chip sharding on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded results must equal single-device results exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpx import Parameters, se, white, zero
from gpx.infer import base, mh
from gpx.models import gp
from gpx.ops import gram
from gpx.parallel import (
    make_mesh,
    sample_chains_sharded,
    sharded_gram,
    sharded_logml,
    sharded_predict,
)

from .util import random_locations

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _toy(rng, n=64):
    x = random_locations(rng, n, 1, scale=5.0)
    p = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    y = rng.normal(size=n)
    return p, jnp.asarray(x), jnp.asarray(y)


def test_make_mesh_inference():
    mesh = make_mesh(chains=2, data=-1)
    assert mesh.shape == {"chains": 2, "data": 4}
    with pytest.raises(ValueError):
        make_mesh(chains=16)


def test_sharded_gram_matches_single_device(rng):
    p, x, _ = _toy(rng)
    mesh = make_mesh(i=4, j=2)
    k_sharded = sharded_gram(p.kernel, x, mesh, nugget=1e-3)
    k_local = gram(p.kernel, x, nugget=1e-3, method="xla")
    assert len(k_sharded.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(k_sharded), np.asarray(k_local), rtol=1e-12)


def test_sharded_logml_matches(rng):
    p, x, y = _toy(rng)
    mesh = make_mesh(data=8)
    got = sharded_logml(p, x, y, mesh)
    want = gp.log_marginal_likelihood(p, x, y)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)


def test_sharded_predict_matches(rng):
    p, x, y = _toy(rng)
    xs = jnp.asarray(random_locations(rng, 40, 1, scale=5.0))
    mesh = make_mesh(data=8)
    got = sharded_predict(p, x, y, xs, mesh)
    want = gp.fit(p, x, y, xs)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(got.variance), np.asarray(want.variance), rtol=1e-8, atol=1e-12
    )
    with pytest.raises(ValueError):
        sharded_predict(p, x, y, xs[:37], mesh)  # 37 doesn't divide over 8


def test_sharded_chains_run_and_differ(rng):
    mesh = make_mesh(chains=8)
    logpost = lambda q: -0.5 * jnp.sum(q * q)
    step = mh.kernel(logpost, mh.gaussian_random_walk(1.0))
    init = mh.init(jnp.zeros(2), logpost)
    result = sample_chains_sharded(
        step, init, jax.random.PRNGKey(0), 200, 8, mesh,
        collect=lambda s: s.position,
    )
    assert result.samples.shape == (8, 200, 2)
    # chains evolved independently
    assert not np.allclose(result.samples[0], result.samples[7])
    draws = np.asarray(result.samples[:, 50:, :]).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.2)


def test_sample_mh_2d_chains_times_data(rng):
    """2-D (chains x data) mesh MH: chains over one axis, every logML inside
    the chain distributed over the other (ROADMAP 6). Must produce finite,
    distinct chains and posterior samples near the single-device sampler's
    target density values."""
    from gpx.parallel.sharded import sample_mh_2d
    from gpx.infer import mcmc
    from gpx.distributions import Gamma

    mesh = make_mesh(chains=2, data=4)
    n = 256
    x = jnp.asarray(np.sort(random_locations(rng, n, 1, scale=8.0), axis=0))
    p_true = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    y = gp.draw(jax.random.PRNGKey(0), p_true, x, nugget=1e-6)

    def log_prior(params):
        g = Gamma(2.0, 2.0)
        leaves = jax.tree_util.tree_leaves(params.kernel)
        return sum(g.logpdf(leaf) for leaf in leaves)

    post = sample_mh_2d(
        jax.random.PRNGKey(1), x, y, p_true, log_prior, 40, mesh,
        proposal_scale=0.1, burn_in=20, panel=32,
    )
    flat = np.asarray(post.flat)                    # (chains, n, dim)
    assert flat.shape[0] == 2 and flat.shape[1] == 40
    assert np.isfinite(flat).all()
    # chains moved and are distinct
    assert not np.allclose(flat[0], flat[1])
    assert float(np.asarray(post.accept_rate).min()) > 0.01

    # the distributed log-posterior equals the single-device one: compare
    # the logml at the true params
    from gpx.parallel.dist_chol import distributed_logml

    ll_dist = float(distributed_logml(
        p_true, x, y, make_mesh(data=8), nugget=gp.LOGML_NUGGET, panel=32))
    ll_local = float(gp.log_marginal_likelihood(p_true, x, y))
    np.testing.assert_allclose(ll_dist, ll_local, rtol=1e-10)


def test_sample_mh_2d_more_chains_than_rows(rng):
    """n_chains > mesh rows (round-3 VERDICT 7): a 2x4 mesh runs 6 chains,
    3 vmapped per row, matching the single-device sampler's posterior."""
    from gpx.distributions import Gamma
    from gpx.infer import mcmc
    from gpx.parallel.sharded import sample_mh_2d

    mesh = make_mesh(chains=2, data=4)
    n = 128
    x = jnp.asarray(np.sort(random_locations(rng, n, 1, scale=8.0), axis=0))
    p_true = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    y = gp.draw(jax.random.PRNGKey(0), p_true, x, nugget=1e-6)

    def log_prior(params):
        g = Gamma(2.0, 2.0)
        leaves = jax.tree_util.tree_leaves(params.kernel)
        return sum(g.logpdf(leaf) for leaf in leaves)

    post = sample_mh_2d(
        jax.random.PRNGKey(1), x, y, p_true, log_prior, 60, mesh,
        proposal_scale=0.12, burn_in=30, panel=16, n_chains=6,
    )
    flat = np.asarray(post.flat)
    assert flat.shape[0] == 6 and flat.shape[1] == 60
    assert np.isfinite(flat).all()
    # all 6 chains distinct (different keys, different trajectories)
    for i in range(6):
        for j in range(i + 1, 6):
            assert not np.allclose(flat[i], flat[j])
    assert float(np.asarray(post.accept_rate).min()) > 0.01

    # posterior agrees with the single-device sampler on the same model
    ref = mcmc.sample_mh(
        jax.random.PRNGKey(2), x, y, p_true, log_prior, 400,
        n_chains=4, proposal_scale=0.12, burn_in=200,
    )
    got = flat.reshape(-1, flat.shape[-1]).mean(0)
    want = np.asarray(ref.flat).reshape(-1, flat.shape[-1]).mean(0)
    np.testing.assert_allclose(got, want, atol=0.75)

    # invalid n_chains (not a multiple of the rows) is rejected
    with pytest.raises(ValueError):
        sample_mh_2d(
            jax.random.PRNGKey(1), x, y, p_true, log_prior, 4, mesh,
            panel=16, n_chains=3,
        )
