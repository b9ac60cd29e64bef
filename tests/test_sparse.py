"""SGPR: bound properties and predictive parity vs the exact GP."""

import jax
import jax.numpy as jnp
import numpy as np

from gpx import Parameters, se, white, zero
from gpx.models import gp, sparse

from .util import random_locations


def _setup(rng, n=120):
    x = jnp.asarray(np.sort(random_locations(rng, n, 1, scale=8.0), axis=0))
    # exact GP comparisons fold the noise into a White term
    noise = 0.25
    p_exact = Parameters(mean=zero(), kernel=se(2.0, 3.0) + white(noise))
    p_smooth = Parameters(mean=zero(), kernel=se(2.0, 3.0))
    y = gp.draw(jax.random.PRNGKey(0), p_exact, x, nugget=1e-6)
    return x, y, p_exact, p_smooth, noise


def test_elbo_is_lower_bound_and_tight_at_z_eq_x(rng):
    x, y, p_exact, p_smooth, noise = _setup(rng)
    exact = float(gp.log_marginal_likelihood(p_exact, x, y, nugget=1e-6))

    # Z = X: the bound collapses to the exact logml (trace term -> 0)
    tight = float(sparse.elbo(p_smooth, x, x, y, noise=noise + 1e-6))
    np.testing.assert_allclose(tight, exact, rtol=1e-6)

    # fewer inducing points: still a lower bound
    z = sparse.init_inducing(jax.random.PRNGKey(1), x, 25)
    lower = float(sparse.elbo(p_smooth, z, x, y, noise=noise + 1e-6))
    assert lower <= tight + 1e-6
    # and not absurdly loose for a smooth function
    assert lower > tight - 0.2 * abs(tight) - 50.0


def test_sparse_predict_matches_exact_at_z_eq_x(rng):
    x, y, p_exact, p_smooth, noise = _setup(rng, n=80)
    xs = jnp.linspace(-8, 8, 40).reshape(-1, 1)
    approx = sparse.fit(p_smooth, x, x, y, xs, noise=noise + 1e-6)
    exact = gp.fit(p_exact, x, y, xs, nugget=1e-6)
    np.testing.assert_allclose(
        np.asarray(approx.mean), np.asarray(exact.mean), atol=1e-4
    )
    # sparse variance is the LATENT f variance; exact path's kyy includes
    # the white noise term -> compare after removing it
    np.testing.assert_allclose(
        np.asarray(approx.variance),
        np.asarray(exact.variance) - noise,
        atol=1e-4,
    )


def test_elbo_trains_hyperparameters_and_inducing(rng):
    x, y, _, p_smooth, noise = _setup(rng, n=100)
    z0 = sparse.init_inducing(jax.random.PRNGKey(2), x, 15)

    def loss(kern_and_z):
        p, z = kern_and_z
        return -sparse.elbo(p, z, x, y, noise=noise)

    grads = jax.grad(loss)((p_smooth, z0))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # a few gradient-descent steps must improve the bound
    import operator

    state = (p_smooth, z0)
    val0 = float(loss(state))
    for _ in range(25):
        g = jax.grad(loss)(state)
        state = jax.tree_util.tree_map(lambda s, gg: s - 1e-3 * gg, state, g)
    assert float(loss(state)) < val0
