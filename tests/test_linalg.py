"""Linalg ops: blocked triangular inversion (both paths), SPD inverse,
solves on prescribed-condition-number SPD fixtures (ParameterTest.scala:19-36
ported), and the solver-equivalence test the reference disabled
(GradientTest.scala:18-28) — enabled here with tolerances."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpx.ops.chol import (
    back_solve,
    cho_solve,
    cholesky,
    forward_solve,
    logdet_from_chol,
    spd_inverse_from_chol,
    tri_inverse_lower,
)

from .util import symmetric_pos_def


def test_spd_fixture_has_prescribed_condition(rng):
    m = symmetric_pos_def(rng, 20, 1000.0)
    np.testing.assert_allclose(np.linalg.cond(m), 1000.0, rtol=1e-6)
    assert np.linalg.eigvalsh(m).min() > 0


@pytest.mark.parametrize("n", [64, 256, 512, 1000, 2048])
def test_tri_inverse_both_paths(rng, n):
    # power-of-two multiples of base take the batched levelwise path,
    # n=1000 exercises the recursive fallback
    m = symmetric_pos_def(rng, n, 100.0)
    l = np.linalg.cholesky(m)
    got = np.asarray(tri_inverse_lower(jnp.asarray(l)))
    want = np.linalg.inv(l)
    assert np.abs(got - want).max() < 1e-10
    # strictly lower-triangular output
    assert np.abs(np.triu(got, 1)).max() == 0.0


def test_spd_inverse(rng):
    m = symmetric_pos_def(rng, 300, 500.0)
    l = np.linalg.cholesky(m)
    got = np.asarray(spd_inverse_from_chol(jnp.asarray(l)))
    np.testing.assert_allclose(got, np.linalg.inv(m), atol=1e-9)


def test_forward_solve_equals_direct_solve(rng):
    # the reference's ignored GradientTest property, tolerance-based
    m = symmetric_pos_def(rng, 50, 100.0)
    b = rng.normal(size=50)
    l = np.asarray(cholesky(jnp.asarray(m)))
    x1 = np.asarray(cho_solve(jnp.asarray(l), jnp.asarray(b)))
    x2 = np.linalg.solve(m, b)
    np.testing.assert_allclose(x1, x2, rtol=1e-8)


def test_forward_back_solve_matrix_rhs(rng):
    m = symmetric_pos_def(rng, 40, 50.0)
    l = np.linalg.cholesky(m)
    rhs = rng.normal(size=(40, 7))
    u = np.asarray(forward_solve(jnp.asarray(l), jnp.asarray(rhs)))
    np.testing.assert_allclose(l @ u, rhs, atol=1e-10)
    v = np.asarray(back_solve(jnp.asarray(l.T), jnp.asarray(rhs)))
    np.testing.assert_allclose(l.T @ v, rhs, atol=1e-10)


def test_logdet_from_chol(rng):
    m = symmetric_pos_def(rng, 30, 100.0)
    l = np.linalg.cholesky(m)
    np.testing.assert_allclose(
        float(logdet_from_chol(jnp.asarray(l))),
        np.linalg.slogdet(m)[1],
        rtol=1e-10,
    )
