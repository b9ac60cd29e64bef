"""Multi-output SVGP: ELBO correctness against exact LMC inference."""

import jax
import jax.numpy as jnp
import numpy as np

import gpx
from gpx.models import multioutput as mo
from gpx.models import svgp_mo


def _problem(n=48, t=3, seed=0):
    # data drawn from an exact rank-1 two-latent LMC
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, n))[:, None])
    truth = mo.lmc([gpx.se(1.0, 0.6), gpx.se(1.0, 2.2)], t, rank=1,
                   kappa=1e-6, noise=0.05)
    y = mo.draw(jax.random.PRNGKey(seed), truth, x)
    return truth, x, y


def test_elbo_lower_bounds_exact_logml():
    truth, x, y = _problem()
    p = svgp_mo.mo_svgp([gpx.se(1.0, 0.6), gpx.se(1.0, 2.2)], 3,
                        w=jnp.concatenate(
                            [t.w for t in truth.terms], axis=1
                        ))
    state = svgp_mo.init_state(2, x.shape[0], dtype=x.dtype)
    e = float(svgp_mo.elbo_minibatch(
        p, x, state, x, y, n_total=x.shape[0], noise=0.05
    ))
    # kappa ~ 0: the LMC logML is the true marginal for this model
    lm = float(mo.log_marginal_likelihood(truth, x, y, nugget=1e-8))
    assert e < lm + 1e-3


def test_train_full_inducing_approaches_exact_predictions():
    truth, x, y = _problem()
    p0 = svgp_mo.mo_svgp([gpx.se(0.8, 0.8), gpx.se(0.8, 1.8)], 3)
    params, z, state, noise, trace = svgp_mo.train(
        jax.random.PRNGKey(1), p0, x, x, y, noise=0.05,
        batch_size=24, steps=800, learning_rate=0.03,
        train_inducing=False, train_hyper=True,
    )
    # ELBO rises over training (compare averaged head/tail, it's noisy)
    assert float(trace[-50:].mean()) > float(trace[:50].mean())

    xs = jnp.linspace(-3.2, 3.2, 25)[:, None]
    got = svgp_mo.fit(params, z, state, xs, noise=noise)
    exact = mo.fit(truth, x, y, xs)
    scale = float(jnp.abs(exact.mean).max())
    assert float(jnp.abs(got.mean - exact.mean).max()) < 0.25 * scale
    assert bool((got.variance > 0).all())


def test_train_with_mask_and_noise_learning():
    truth, x, y = _problem(n=40)
    mask = np.ones(y.shape, dtype=bool)
    mask[25:, 2] = False
    p0 = svgp_mo.mo_svgp([gpx.se(1.0, 0.7), gpx.se(1.0, 2.0)], 3)
    params, z, state, noise, trace = svgp_mo.train(
        jax.random.PRNGKey(2), p0, x[::2], x, y, noise=0.3,
        batch_size=20, steps=200, learning_rate=0.05,
        train_noise=True, mask=jnp.asarray(mask),
    )
    assert bool(jnp.isfinite(trace).all())
    assert noise.shape == (3,)
    assert bool((noise > 0).all())
    s = svgp_mo.fit(params, z, state, x[25:], noise=noise)
    assert bool(jnp.isfinite(s.mean).all())


def test_shape_validation_and_gradients():
    _, x, y = _problem(n=16)
    p = svgp_mo.mo_svgp([gpx.se(1.0, 1.0)], 3)
    import pytest

    with pytest.raises(ValueError, match="expected"):
        svgp_mo.train(jax.random.PRNGKey(0), p, x, x, y[:, :2], noise=0.1,
                      steps=1, batch_size=4)
    # gradients flow to every leaf of the ELBO
    state = svgp_mo.init_state(1, x.shape[0], dtype=x.dtype)

    def obj(pp):
        return svgp_mo.elbo_minibatch(pp, x, state, x, y,
                                      n_total=x.shape[0], noise=0.1)

    g = jax.grad(obj)(p)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)
