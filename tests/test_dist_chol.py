"""Distributed blocked Cholesky / solves / logML on the 8-device virtual
mesh: must match single-device results (SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpx import Parameters, se, white, zero
from gpx.models import gp
from gpx.parallel import make_mesh
from gpx.parallel.dist_chol import (
    distributed_back_solve,
    distributed_cholesky,
    distributed_forward_solve,
    distributed_forward_solve_cols,
    distributed_half_logdet,
    distributed_logml,
    distributed_logml_value_and_grad,
    distributed_predict,
)

from .util import random_locations, symmetric_pos_def

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_distributed_cholesky_matches_local(rng):
    mesh = make_mesh(data=8)
    for n, panel in [(256, 32), (512, 64)]:
        k = jnp.asarray(symmetric_pos_def(rng, n, 100.0))
        l_dist = distributed_cholesky(k, mesh, panel=panel)
        l_local = np.linalg.cholesky(np.asarray(k))
        np.testing.assert_allclose(np.asarray(l_dist), l_local, atol=1e-8)


def test_distributed_cholesky_rejects_bad_shapes(rng):
    mesh = make_mesh(data=8)
    k = jnp.asarray(symmetric_pos_def(rng, 264, 10.0))  # 264/8 = 33: not panel-divisible
    with pytest.raises(ValueError):
        distributed_cholesky(k, mesh, panel=32)


def test_distributed_forward_solve_and_logdet(rng):
    mesh = make_mesh(data=8)
    n = 256
    k = jnp.asarray(symmetric_pos_def(rng, n, 50.0))
    b = jnp.asarray(rng.normal(size=n))
    l_dist = distributed_cholesky(k, mesh, panel=32)
    u = distributed_forward_solve(l_dist, b, mesh, panel=32)
    l_local = np.linalg.cholesky(np.asarray(k))
    want = np.linalg.solve(l_local, np.asarray(b))
    np.testing.assert_allclose(np.asarray(u), want, atol=1e-8)
    hld = distributed_half_logdet(l_dist, mesh)
    np.testing.assert_allclose(
        float(hld), np.sum(np.log(np.diag(l_local))), rtol=1e-10
    )


def test_distributed_logml_matches_local(rng):
    mesh = make_mesh(data=8)
    n = 256
    x = jnp.asarray(random_locations(rng, n, 1, scale=5.0))
    p = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    y = jnp.asarray(rng.normal(size=n))
    got = distributed_logml(p, x, y, mesh, panel=32)
    want = gp.log_marginal_likelihood(p, x, y)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-9)


def test_distributed_back_solve(rng):
    mesh = make_mesh(data=8)
    n = 256
    k = jnp.asarray(symmetric_pos_def(rng, n, 50.0))
    b = jnp.asarray(rng.normal(size=n))
    l_dist = distributed_cholesky(k, mesh, panel=32)
    a = distributed_back_solve(l_dist, b, mesh, panel=32)
    l_local = np.linalg.cholesky(np.asarray(k))
    want = np.linalg.solve(l_local.T, np.asarray(b))
    np.testing.assert_allclose(np.asarray(a), want, atol=1e-8)


def test_distributed_forward_solve_cols(rng):
    mesh = make_mesh(data=8)
    n, m = 256, 48
    k = jnp.asarray(symmetric_pos_def(rng, n, 50.0))
    b = jnp.asarray(rng.normal(size=(n, m)))
    l_dist = distributed_cholesky(k, mesh, panel=32)
    a = distributed_forward_solve_cols(l_dist, b, mesh, panel=32)
    l_local = np.linalg.cholesky(np.asarray(k))
    want = np.linalg.solve(l_local, np.asarray(b))
    np.testing.assert_allclose(np.asarray(a), want, atol=1e-8)


def test_distributed_logml_gradient_matches_local(rng):
    # VERDICT r1 item 3: the north-star quantity (value AND grad) with K, L
    # row-sharded — must match the single-device value_and_grad
    mesh = make_mesh(data=8)
    n = 256
    x = jnp.asarray(random_locations(rng, n, 1, scale=5.0))
    p = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    y = jnp.asarray(rng.normal(size=n))
    got_v, got_g = distributed_logml_value_and_grad(p, x, y, mesh, panel=32)
    want_v, want_g = gp.logml_value_and_grad(p, x, y, method="autodiff")
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-9)
    for leaf_got, leaf_want in zip(
        jax.tree_util.tree_leaves(got_g), jax.tree_util.tree_leaves(want_g)
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_got), np.asarray(leaf_want), rtol=1e-7, atol=1e-9
        )


def test_distributed_predict_matches_local(rng):
    # VERDICT r1 item 7: multi-chip prediction without full-L replication
    mesh = make_mesh(data=8)
    n, m = 256, 64
    x = jnp.asarray(random_locations(rng, n, 1, scale=5.0))
    p = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    y = jnp.asarray(rng.normal(size=n))
    xs = jnp.asarray(np.linspace(-5, 5, m)[:, None])
    got = distributed_predict(p, x, y, xs, mesh, panel=32)
    want = gp.fit(p, x, y, xs)
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(want.mean),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.variance),
                               np.asarray(want.variance), atol=1e-8)


def test_distributed_optimize_matches_local(rng):
    """Multi-chip type-II MLE: gp.optimize(mesh=...) — the L-BFGS loop over
    the fully distributed logML+gradient — must land on the same optimum as
    the single-device optimizer."""
    from gpx.models.optimize import optimize

    mesh = make_mesh(data=8)
    n = 256
    x = jnp.asarray(random_locations(rng, n, 1, scale=5.0))
    truth = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    y = gp.draw(jax.random.PRNGKey(5), truth, x, nugget=1e-6)
    init = Parameters(mean=zero(), kernel=se(1.0, 1.0) + white(1.0))

    # distributed_logml's nugget default (1e-3) is the local LOGML_NUGGET
    local = optimize(init, x, y, steps=30, method="autodiff")
    dist = optimize(init, x, y, steps=30, mesh=mesh, panel=32)
    np.testing.assert_allclose(float(dist.value), float(local.value),
                               rtol=1e-8)
    got = [float(v) for v in jax.tree_util.tree_leaves(dist.params.kernel)]
    want = [float(v) for v in jax.tree_util.tree_leaves(local.params.kernel)]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_distributed_logml_aot_cache(rng, tmp_path, monkeypatch):
    """Round-3 wiring: when the mesh spans every local device,
    distributed_logml_value_and_grad persists its executable through the
    on-disk AOT cache. Reload is exercised on the chip lane only — the
    XLA CPU runtime loses fused-function symbols on deserialization of
    these shard_map programs (see the docstring at the wiring site), so
    here the force flag covers the key/persist logic and value parity of
    the in-memory layer."""
    import gpx.parallel.dist_chol as dc
    import gpx.utils.aot as aot

    monkeypatch.setattr(aot, "_DEFAULT_DIR", tmp_path)
    monkeypatch.setenv("GPX_AOT_CACHE_DIST", "1")
    dc._DLVG_EXECUTABLES.clear()

    mesh = make_mesh(data=8)
    n = 256
    x = jnp.asarray(random_locations(rng, n, 1, scale=5.0))
    params = Parameters(mean=zero(), kernel=se(2.0, 3.0) + white(0.5))
    y = gp.draw(jax.random.PRNGKey(7), params, x, nugget=1e-6)

    v1, g1 = distributed_logml_value_and_grad(params, x, y, mesh, panel=32)
    assert list(tmp_path.glob("*.pkl")), "no executable persisted"
    v1 = np.asarray(v1)
    g1 = [np.asarray(l) for l in jax.tree_util.tree_leaves(g1)]

    # repeat call rides the in-memory executable layer
    v2, g2 = distributed_logml_value_and_grad(params, x, y, mesh, panel=32)
    np.testing.assert_array_equal(v1, np.asarray(v2))
    for a, b in zip(g1, jax.tree_util.tree_leaves(g2)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # cache off: plain jit path still agrees
    monkeypatch.setenv("GPX_AOT_CACHE", "0")
    v3, _ = distributed_logml_value_and_grad(params, x, y, mesh, panel=32)
    np.testing.assert_allclose(v1, np.asarray(v3), rtol=1e-12)


def test_hmc_nuts_over_mesh_match_local(rng):
    """Round-3: gradient-based samplers with mesh= — every leapfrog
    gradient is AD through the sharded panel Cholesky. With identical
    keys the distributed chain must retrace the local chain (x64; the
    two likelihoods agree to ~1e-12, far below proposal scales)."""
    from gpx.distributions import Gamma
    from gpx.infer.mcmc import sample_hmc, sample_nuts

    mesh = make_mesh(data=8)
    n = 256
    x = jnp.asarray(random_locations(rng, n, 1, scale=5.0))
    truth = Parameters(mean=zero(), kernel=se(2.0, 3.0) + white(0.5))
    y = gp.draw(jax.random.PRNGKey(11), truth, x, nugget=1e-6)

    def log_prior(p):
        g = Gamma(2.0, 2.0)
        return sum(g.logpdf(l) for l in jax.tree_util.tree_leaves(p.kernel))

    kw = dict(n_samples=10, l=4, eps=0.05, n_chains=2, init_jitter=0.05)
    local = sample_hmc(jax.random.PRNGKey(3), x, y, truth, log_prior, **kw)
    dist = sample_hmc(jax.random.PRNGKey(3), x, y, truth, log_prior,
                      mesh=mesh, panel=32, **kw)
    np.testing.assert_allclose(np.asarray(dist.flat), np.asarray(local.flat),
                               rtol=1e-5, atol=1e-7)

    nkw = dict(n_samples=6, eps=0.05, max_depth=4, n_chains=1,
               init_jitter=0.0)
    localn = sample_nuts(jax.random.PRNGKey(4), x, y, truth, log_prior, **nkw)
    distn = sample_nuts(jax.random.PRNGKey(4), x, y, truth, log_prior,
                        mesh=mesh, panel=32, **nkw)
    np.testing.assert_allclose(np.asarray(distn.flat),
                               np.asarray(localn.flat), rtol=1e-5, atol=1e-7)


def test_distributed_optimize_map(rng):
    """MAP over the mesh: log_prior composes with the distributed
    likelihood exactly as with the local one."""
    from gpx.distributions import Gamma
    from gpx.models.optimize import optimize

    mesh = make_mesh(data=8)
    n = 256
    x = jnp.asarray(random_locations(rng, n, 1, scale=5.0))
    truth = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    y = gp.draw(jax.random.PRNGKey(5), truth, x, nugget=1e-6)
    init = Parameters(mean=zero(), kernel=se(1.0, 1.0) + white(1.0))

    def log_prior(p):
        g = Gamma(2.0, 2.0)
        return sum(g.logpdf(l) for l in jax.tree_util.tree_leaves(p.kernel))

    local = optimize(init, x, y, steps=20, method="autodiff",
                     log_prior=log_prior)
    dist = optimize(init, x, y, steps=20, mesh=mesh, panel=32,
                    log_prior=log_prior)
    np.testing.assert_allclose(float(dist.value), float(local.value),
                               rtol=1e-8)


def test_mh_ehmc_over_mesh_match_local(rng):
    """Round-3: sample_mh/sample_ehmc with mesh= retrace the local chains
    with identical keys (x64)."""
    from gpx.distributions import Gamma
    from gpx.infer.mcmc import sample_ehmc, sample_mh

    mesh = make_mesh(data=8)
    n = 256
    x = jnp.asarray(random_locations(rng, n, 1, scale=5.0))
    truth = Parameters(mean=zero(), kernel=se(2.0, 3.0) + white(0.5))
    y = gp.draw(jax.random.PRNGKey(11), truth, x, nugget=1e-6)

    def log_prior(p):
        g = Gamma(2.0, 2.0)
        return sum(g.logpdf(l) for l in jax.tree_util.tree_leaves(p.kernel))

    kw = dict(n_samples=15, proposal_scale=0.2, n_chains=2, init_jitter=0.05)
    local = sample_mh(jax.random.PRNGKey(3), x, y, truth, log_prior, **kw)
    dist = sample_mh(jax.random.PRNGKey(3), x, y, truth, log_prior,
                     mesh=mesh, panel=32, **kw)
    np.testing.assert_allclose(np.asarray(dist.flat), np.asarray(local.flat),
                               rtol=1e-5, atol=1e-7)

    ekw = dict(n_samples=5, l0=3, warmup_iters=15, k=20, l_max=8,
               n_chains=1, init_jitter=0.0)
    locale = sample_ehmc(jax.random.PRNGKey(4), x, y, truth, log_prior, **ekw)
    diste = sample_ehmc(jax.random.PRNGKey(4), x, y, truth, log_prior,
                        mesh=mesh, panel=32, **ekw)
    np.testing.assert_allclose(np.asarray(diste.flat),
                               np.asarray(locale.flat), rtol=1e-5, atol=1e-7)
