"""Fused Pallas Gram kernel vs the XLA reference path (interpret mode on CPU;
the driver's bench exercises it compiled on the real chip)."""

import numpy as np
import pytest

from gpx import se, white, matern
from gpx.ops import gram
from gpx.ops.pallas_gram import pallas_gram

from .util import random_locations


@pytest.mark.parametrize("n,d", [(64, 1), (100, 2), (300, 2)])
def test_pallas_gram_symmetric(rng, n, d):
    x = random_locations(rng, n, d, scale=5.0).astype(np.float32)
    k = se(3.0, 5.5) + white(0.5)
    got = np.asarray(pallas_gram(k, x, nugget=1e-3, interpret=True))
    want = np.asarray(gram(k, x, nugget=1e-3, method="xla"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # white + nugget must land exactly on the diagonal
    np.testing.assert_allclose(np.diag(got), 3.0 + 0.5 + 1e-3, rtol=1e-6)


def test_explicit_pallas_method_off_tpu(rng):
    # method="pallas" off-TPU runs interpreted instead of crashing
    x = random_locations(rng, 40, 1, scale=5.0).astype(np.float32)
    k = se(2.0, 3.0)
    got = np.asarray(gram(k, x, nugget=1e-3, method="pallas"))
    want = np.asarray(gram(k, x, nugget=1e-3, method="xla"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_gram_cross(rng):
    x1 = random_locations(rng, 96, 2, scale=5.0).astype(np.float32)
    x2 = random_locations(rng, 160, 2, scale=5.0).astype(np.float32)
    k = se(2.0, 3.0)
    got = np.asarray(pallas_gram(k, x1, x2, interpret=True))
    want = np.asarray(gram(k, x1, x2, method="xla"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_gram_grad_matches_xla(rng):
    # autodiff must flow through the pallas forward (custom_vjp): the logml
    # gradient path selects pallas for large N on TPU
    import jax
    import jax.numpy as jnp

    x = random_locations(rng, 50, 1, scale=5.0).astype(np.float32)
    k = se(3.0, 5.5) + white(0.5)

    def loss_pallas(kk):
        return jnp.sum(pallas_gram(kk, x, nugget=1e-3, interpret=True) ** 2)

    def loss_xla(kk):
        return jnp.sum(gram(kk, x, nugget=1e-3, method="xla") ** 2)

    g1 = jax.grad(loss_pallas)(k)
    g2 = jax.grad(loss_xla)(k)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)


def test_pallas_gram_matern_sum(rng):
    x = random_locations(rng, 80, 1, scale=5.0).astype(np.float32)
    k = matern(2.0, 1.5, 3.0) + white(0.25)
    got = np.asarray(pallas_gram(k, x, interpret=True))
    want = np.asarray(gram(k, x, method="xla"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
