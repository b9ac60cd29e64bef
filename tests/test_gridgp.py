"""Grid-structured (separable-kernel Kronecker) GPs vs the dense oracle.

The dense construction ``K = ⊗_i K_i + σ²I`` over the materialized
Cartesian product is the ground truth for every Kronecker-eigen quantity.
"""

from functools import reduce

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpx
from gpx.models import gridgp


def _params(noise=0.1):
    return gridgp.grid(
        [gpx.se(1.4, 0.8), gpx.matern(1.0, 1.5, 2.0)], noise=noise
    )


def _axes(n1=6, n2=5, seed=0):
    rng = np.random.default_rng(seed)
    a1 = jnp.asarray(np.sort(rng.uniform(-3, 3, n1))[:, None])
    a2 = jnp.asarray(rng.uniform(-2, 2, size=(n2, 2)))
    return [a1, a2]


def _dense(p, axes, nugget=0.0):
    grams = [np.asarray(k.gram(a)) for k, a in zip(p.kernels, axes)]
    K = reduce(np.kron, grams)
    return K + (float(p.noise) + nugget) * np.eye(K.shape[0])


def _y(shape, seed=1):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape))


def test_grid_coords_order_matches_kron():
    # the materialized product kernel on grid_coords must equal the
    # Kronecker of the per-axis grams — pins the C-order convention
    p = _params()
    axes = _axes(4, 3)
    coords = np.asarray(gridgp.grid_coords(axes))
    assert coords.shape == (12, 3)
    k1 = np.asarray(p.kernels[0].gram(coords[:, :1]))
    k2 = np.asarray(p.kernels[1].gram(coords[:, 1:]))
    np.testing.assert_allclose(
        k1 * k2, _dense(p, axes) - float(p.noise) * np.eye(12), atol=1e-10
    )


@pytest.mark.parametrize("three_axes", [False, True])
def test_logml_matches_dense(three_axes):
    p = _params()
    axes = _axes()
    if three_axes:
        p = gridgp.grid(list(p.kernels) + [gpx.se(1.0, 1.5)], noise=0.1)
        axes = axes + [jnp.linspace(-1.0, 1.0, 4)[:, None]]
    shape = gridgp.grid_shape(axes)
    y = _y(shape)
    nug = 1e-6
    got = float(gridgp.log_marginal_likelihood(p, axes, y, nugget=nug))
    K = _dense(p, axes, nug)
    yv = np.asarray(y).reshape(-1)
    n = K.shape[0]
    want = -0.5 * (yv @ np.linalg.solve(K, yv)
                   + np.linalg.slogdet(K)[1] + n * np.log(2 * np.pi))
    np.testing.assert_allclose(got, want, rtol=1e-8)
    # flat C-order input gives the identical value
    got_flat = float(gridgp.log_marginal_likelihood(
        p, axes, y.reshape(-1), nugget=nug
    ))
    np.testing.assert_allclose(got_flat, got, rtol=1e-12)


def test_fit_matches_dense():
    p = _params()
    axes = _axes()
    shape = gridgp.grid_shape(axes)
    y = _y(shape)
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.uniform(-2, 2, size=(9, 3)))
    s = gridgp.fit(p, axes, y, xs, nugget=1e-6)

    K = _dense(p, axes, 1e-6)
    c1 = np.asarray(p.kernels[0].gram(xs[:, :1], axes[0]))   # (M, n1)
    c2 = np.asarray(p.kernels[1].gram(xs[:, 1:], axes[1]))   # (M, n2)
    cross = np.einsum("mi,mj->mij", c1, c2).reshape(9, -1)   # (M, N)
    alpha = np.linalg.solve(K, np.asarray(y).reshape(-1))
    np.testing.assert_allclose(np.asarray(s.mean), cross @ alpha, rtol=1e-6,
                               atol=1e-8)
    prior = np.asarray(p.kernels[0].diag(xs[:, :1])) * np.asarray(
        p.kernels[1].diag(xs[:, 1:])
    )
    red = np.einsum("mn,nk,mk->m", cross, np.linalg.inv(K), cross)
    want_var = np.maximum(prior - red, 0.0) + float(p.noise)
    np.testing.assert_allclose(np.asarray(s.variance), want_var, rtol=1e-5,
                               atol=1e-8)


def test_fit_interpolates_at_grid_points():
    # near-zero noise: the posterior mean at the lattice points is Y
    p = _params(noise=1e-6)
    axes = _axes(5, 4)
    y = gridgp.draw(jax.random.PRNGKey(0), p, axes, include_noise=False)
    xs = gridgp.grid_coords(axes)
    s = gridgp.fit(p, axes, y, xs, nugget=1e-8)
    np.testing.assert_allclose(np.asarray(s.mean),
                               np.asarray(y).reshape(-1), atol=1e-3)


def test_draw_covariance_matches_kron():
    p = _params(noise=0.05)
    axes = _axes(4, 3)
    draws = gridgp.draw(jax.random.PRNGKey(1), p, axes, shape=(6000,))
    flat = np.asarray(draws).reshape(6000, -1)
    emp = flat.T @ flat / flat.shape[0]
    want = _dense(p, axes)
    assert np.max(np.abs(emp - want)) < 0.25 * np.max(np.abs(want))


def test_kron_matvec_matches_dense():
    p = _params()
    axes = _axes()
    K = _dense(p, axes, 1e-5)
    mv = gridgp.kron_matvec(p, axes, nugget=1e-5)
    v = _y(gridgp.grid_shape(axes), seed=7)
    got = np.asarray(mv(v)).reshape(-1)
    np.testing.assert_allclose(got, K @ np.asarray(v).reshape(-1),
                               rtol=1e-8, atol=1e-10)


def test_masked_fit_matches_dense_subblock():
    p = _params()
    axes = _axes()
    shape = gridgp.grid_shape(axes)
    y = _y(shape)
    rng = np.random.default_rng(5)
    mask = rng.uniform(size=shape) > 0.3          # ~70% observed
    xs = jnp.asarray(rng.uniform(-2, 2, size=(7, 3)))
    s = gridgp.fit(p, axes, y, xs, nugget=1e-6, mask=jnp.asarray(mask),
                   cg_tol=1e-10)

    K = _dense(p, axes, 1e-6)
    obs = mask.reshape(-1)
    yv = np.asarray(y).reshape(-1)[obs]
    c1 = np.asarray(p.kernels[0].gram(xs[:, :1], axes[0]))
    c2 = np.asarray(p.kernels[1].gram(xs[:, 1:], axes[1]))
    cross = np.einsum("mi,mj->mij", c1, c2).reshape(7, -1)[:, obs]
    want = cross @ np.linalg.solve(K[np.ix_(obs, obs)], yv)
    np.testing.assert_allclose(np.asarray(s.mean), want, rtol=1e-5,
                               atol=1e-7)
    assert s.variance.size == 0


def test_optimize_recovers_and_sample_mh_runs():
    truth = gridgp.grid([gpx.se(1.5, 0.7), gpx.se(1.0, 2.0)], noise=0.05)
    axes = _axes(10, 8, seed=9)
    y = gridgp.draw(jax.random.PRNGKey(2), truth, axes)
    start = gridgp.grid([gpx.se(0.8, 1.5), gpx.se(1.0, 1.0)], noise=0.3)
    before = float(gridgp.log_marginal_likelihood(start, axes, y))
    res = gridgp.optimize(start, axes, y, steps=40)
    after = float(gridgp.log_marginal_likelihood(res.params, axes, y))
    assert after > before + 1.0
    assert float(res.params.noise) < 0.25

    from gpx.distributions import Gamma

    def log_prior(p):
        g = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(2.0))
        return sum(g.logpdf(leaf) for leaf in
                   jax.tree_util.tree_leaves(p))

    post = gridgp.sample_mh(jax.random.PRNGKey(3), axes, y, start,
                            log_prior, n_samples=40, n_chains=2,
                            burn_in=20, proposal_scale=0.05)
    assert bool(jnp.isfinite(post.flat).all())


def test_shape_validation():
    p = _params()
    axes = _axes()
    with pytest.raises(ValueError, match="grid shape"):
        gridgp.log_marginal_likelihood(p, axes, jnp.zeros((4, 4)))
    with pytest.raises(ValueError, match="grid axes"):
        gridgp.log_marginal_likelihood(p, [axes[0]], jnp.zeros((6,)))
    with pytest.raises(ValueError, match="concatenate"):
        gridgp.fit(p, axes, jnp.zeros((6, 5)), jnp.zeros((3, 7)))


def test_coregion_axis_matches_multioutput_icm():
    # grid([k_time, coregion]) over [x, output indices] IS the ICM:
    # same logML (orderings are permutations — the quadratic form and
    # logdet are invariant) and same posterior mean at matched points
    from gpx.models import multioutput as mo

    t, n = 3, 14
    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.normal(size=(t, 2)) * 0.6)
    kappa = jnp.asarray(np.full(t, 0.3))
    kern = gpx.se(1.3, 0.9)
    icm = mo.IcmParams(kernel=kern, w=w, kappa=kappa,
                       noise=jnp.asarray(0.1))
    gp_grid = gridgp.GridParams(
        kernels=(kern, gridgp.CoregionAxis(w=w, kappa=kappa)),
        noise=jnp.asarray(0.1),
    )
    x = jnp.asarray(rng.uniform(-3, 3, size=(n, 1)))
    y = jnp.asarray(rng.normal(size=(n, t)))
    axes = [x, gridgp.output_axis(t)]

    got = float(gridgp.log_marginal_likelihood(gp_grid, axes, y,
                                               nugget=1e-8))
    # oracle: dense (NT) Gaussian over the matched ordering
    K = _dense(gp_grid, axes, 1e-8)
    yv = np.asarray(y).reshape(-1)
    want_dense = -0.5 * (yv @ np.linalg.solve(K, yv)
                         + np.linalg.slogdet(K)[1]
                         + K.shape[0] * np.log(2 * np.pi))
    np.testing.assert_allclose(got, want_dense, rtol=1e-8)
    # and equals the multioutput module's value (nugget enters mo through
    # the base-kernel gram, i.e. scaled by B's diagonal — use a nugget
    # small enough to be irrelevant)
    want_mo = float(mo.log_marginal_likelihood(icm, x, y, nugget=1e-8))
    np.testing.assert_allclose(got, want_mo, rtol=1e-6)

    # posterior mean at (new time, every output) matches mo.fit
    xs_t = jnp.asarray([[0.37]])
    xs = jnp.concatenate(
        [jnp.tile(xs_t, (t, 1)), gridgp.output_axis(t)], axis=1
    )
    s = gridgp.fit(gp_grid, axes, y, xs, nugget=1e-8)
    s_mo = mo.fit(icm, x, y, xs_t, nugget=1e-8)
    np.testing.assert_allclose(np.asarray(s.mean),
                               np.asarray(s_mo.mean)[0], rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(s.variance),
                               np.asarray(s_mo.variance)[0], rtol=1e-4,
                               atol=1e-6)


def test_coregion_axis_spatiotemporal_multioutput():
    # the composition neither module has alone: B ⊗ K_time ⊗ K_space
    t = 2
    p = gridgp.GridParams(
        kernels=(gpx.se(1.0, 1.0), gpx.matern(1.0, 1.5, 1.5),
                 gridgp.coregion_axis(t, rank=1)),
        noise=jnp.asarray(0.05),
    )
    rng = np.random.default_rng(13)
    axes = [
        jnp.linspace(0.0, 4.0, 6)[:, None],
        jnp.asarray(rng.uniform(-1, 1, size=(5, 2))),
        gridgp.output_axis(t),
    ]
    y = gridgp.draw(jax.random.PRNGKey(4), p, axes)
    assert y.shape == (6, 5, t)
    got = float(gridgp.log_marginal_likelihood(p, axes, y, nugget=1e-8))
    K = _dense(p, axes, 1e-8)
    yv = np.asarray(y).reshape(-1)
    want = -0.5 * (yv @ np.linalg.solve(K, yv) + np.linalg.slogdet(K)[1]
                   + K.shape[0] * np.log(2 * np.pi))
    np.testing.assert_allclose(got, want, rtol=1e-8)
    # W and kappa receive gradients through the grid logML
    g = jax.grad(lambda pp: gridgp.log_marginal_likelihood(
        pp, axes, y, nugget=1e-8
    ))(p)
    gw = np.asarray(g.kernels[2].w)
    assert np.all(np.isfinite(gw)) and np.any(gw != 0.0)


def test_mesh_logml_and_fit_match_local():
    mesh = jax.make_mesh(
        (8,), ("data",), axis_types=(jax.sharding.AxisType.Auto,)
    )
    p = _params()
    axes = [jnp.linspace(-3.0, 3.0, 16)[:, None],   # leading axis: 16 % 8
            _axes()[1]]
    y = _y((16, 5), seed=21)

    loc = float(gridgp.log_marginal_likelihood(p, axes, y, nugget=1e-6))
    dst = jax.jit(
        lambda pp, yy: gridgp.log_marginal_likelihood(
            pp, axes, yy, nugget=1e-6, mesh=mesh
        )
    )(p, y)
    np.testing.assert_allclose(float(dst), loc, rtol=1e-10)

    g_loc = jax.grad(lambda pp: gridgp.log_marginal_likelihood(
        pp, axes, y, nugget=1e-6))(p)
    g_dst = jax.jit(jax.grad(lambda pp: gridgp.log_marginal_likelihood(
        pp, axes, y, nugget=1e-6, mesh=mesh)))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_dst),
                    jax.tree_util.tree_leaves(g_loc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)

    xs = jnp.asarray(np.random.default_rng(22).uniform(-2, 2, size=(6, 3)))
    s_loc = gridgp.fit(p, axes, y, xs)
    s_dst = jax.jit(lambda pp, yy: gridgp.fit(pp, axes, yy, xs, mesh=mesh))(
        p, y
    )
    np.testing.assert_allclose(np.asarray(s_dst.mean),
                               np.asarray(s_loc.mean), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s_dst.variance),
                               np.asarray(s_loc.variance), rtol=1e-8)


def test_posterior_draw_moments_match_fit_and_dense_cov():
    p = _params(noise=0.1)
    axes = _axes(5, 4)
    y = gridgp.draw(jax.random.PRNGKey(6), p, axes)
    rng = np.random.default_rng(31)
    xs = jnp.asarray(rng.uniform(-2, 2, size=(6, 3)))
    draws = gridgp.posterior_draw(jax.random.PRNGKey(7), p, axes, y, xs,
                                  shape=(8000,), nugget=1e-6)
    assert draws.shape == (8000, 6)
    s = gridgp.fit(p, axes, y, xs, nugget=1e-6)
    np.testing.assert_allclose(np.asarray(draws.mean(0)),
                               np.asarray(s.mean), atol=0.05)
    np.testing.assert_allclose(np.asarray(draws.var(0)),
                               np.asarray(s.variance), rtol=0.15, atol=0.01)
    # full joint covariance vs the dense oracle
    K = _dense(p, axes, 1e-6)
    c1 = np.asarray(p.kernels[0].gram(xs[:, :1], axes[0]))
    c2 = np.asarray(p.kernels[1].gram(xs[:, 1:], axes[1]))
    cross = np.einsum("mi,mj->mij", c1, c2).reshape(6, -1)
    kss = np.asarray(p.kernels[0].gram(xs[:, :1])) * np.asarray(
        p.kernels[1].gram(xs[:, 1:])
    )
    want_cov = (kss - cross @ np.linalg.solve(K, cross.T)
                + float(p.noise) * np.eye(6))
    emp = np.cov(np.asarray(draws).T)
    assert np.max(np.abs(emp - want_cov)) < 0.1 * max(
        np.abs(want_cov).max(), 1e-3
    )
