"""Parameter flatten/constrain round-trips and bijector correctness.

Rebuild of the reference's property suite (ParameterTest.scala:63-68:
``arrayToParams . paramsToArray == id`` over random kernel stacks + Plane
mean), plus bijector log-Jacobians checked against autodiff — which the
reference's hand-derived Jacobians get wrong (KernelParameters.scala:276-277).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpx import Parameters, bijectors, se, white, matern, plane, zero
from gpx import params as gparams


def _random_params(rng, n_kernels=3):
    ks = []
    for _ in range(n_kernels):
        choice = rng.integers(0, 3)
        if choice == 0:
            ks.append(se(rng.uniform(2, 10), rng.uniform(2, 10)))
        elif choice == 1:
            ks.append(white(rng.uniform(2, 10)))
        else:
            ks.append(matern(rng.uniform(2, 10), 1.5, rng.uniform(2, 10)))
    kernel = ks[0]
    for k in ks[1:]:
        kernel = kernel + k
    return Parameters(mean=plane(rng.normal(size=3)), kernel=kernel)


def test_array_round_trip_property(rng):
    # ParameterTest.scala:63-68
    for _ in range(20):
        p = _random_params(rng)
        flat = gparams.to_array(p)
        p2 = gparams.from_array(p, flat)
        for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # treedefs (static structure incl. Matern nu) must match exactly
        assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)


def test_constrain_unconstrain_round_trip(rng):
    for _ in range(10):
        p = _random_params(rng)
        bij = p.bijectors()
        u = gparams.unconstrain(bij, p)
        p2 = gparams.constrain(bij, u)
        for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


@pytest.mark.parametrize("bij,lo,hi", [
    (bijectors.Identity(), -5.0, 5.0),
    (bijectors.BoundedBelow(0.0), -3.0, 3.0),
    (bijectors.BoundedBelow(2.0), -3.0, 3.0),
    (bijectors.BoundedAbove(4.0), -3.0, 3.0),
    (bijectors.Bounded(-1.0, 2.5), -4.0, 4.0),
    (bijectors.Softplus(), -3.0, 3.0),
])
def test_bijector_inverse_and_log_det(bij, lo, hi, rng):
    u = jnp.asarray(rng.uniform(lo, hi, size=25))
    c = bij.forward(u)
    np.testing.assert_allclose(np.asarray(bij.inverse(c)), np.asarray(u), rtol=1e-8, atol=1e-8)
    # log|d forward/du| vs autodiff
    autodiff = jax.vmap(jax.grad(lambda v: bij.forward(v)))(u)
    np.testing.assert_allclose(
        np.asarray(bij.log_det_jacobian(u)), np.log(np.abs(np.asarray(autodiff))),
        rtol=1e-8, atol=1e-8,
    )


def test_log_det_jacobian_tree(rng):
    p = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    bij = p.bijectors()
    u = gparams.unconstrain(bij, p)
    ldj = gparams.log_det_jacobian(bij, u)
    # all-positive params via exp bijector: ldj = sum of unconstrained values
    expected = sum(float(v) for v in jax.tree_util.tree_leaves(u))
    np.testing.assert_allclose(float(ldj), expected, rtol=1e-10)


def test_names_unique_and_dict(rng):
    p = _random_params(rng)
    ns = gparams.names(p)
    assert len(ns) == len(set(ns)) == gparams.to_array(p).size
    d = gparams.to_dict(p)
    assert set(d) == set(ns)


def test_logistic_logit_softplus():
    # KernelParameters.scala:323-330
    x = jnp.asarray([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(bijectors.logit(bijectors.logistic(x))), np.asarray(x), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(bijectors.softplus(x)), np.log1p(np.exp(np.asarray(x))), rtol=1e-10
    )
