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
    distributed_cholesky,
    distributed_forward_solve,
    distributed_half_logdet,
    distributed_logml,
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
