"""Scheduled triangular matmul kernels vs dense reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpx.ops.pallas_trmm import trmm


@pytest.mark.parametrize("mode", ["right_lower", "left_lower"])
def test_trmm_matches_dense(rng, mode):
    n = 256
    b = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    l = jnp.asarray(np.tril(rng.normal(size=(n, n))), jnp.float32)
    got = np.asarray(trmm(b, l, mode=mode, bt=64, interpret=True))
    want = (
        np.asarray(b) @ np.asarray(l)
        if mode == "right_lower"
        else np.asarray(l) @ np.asarray(b)
    )
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 3e-4 * max(scale, 1.0)


def test_trmm_left_lower_rectangular_rhs(rng):
    n, m = 256, 128
    b = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    l = jnp.asarray(np.tril(rng.normal(size=(n, n))), jnp.float32)
    got = np.asarray(trmm(b, l, mode="left_lower", bt=64, interpret=True))
    want = np.asarray(l) @ np.asarray(b)
    assert got.shape == (n, m)
    assert np.abs(got - want).max() < 3e-4 * max(np.abs(want).max(), 1.0)


def test_trmm_rejects_bad_shapes(rng):
    b = jnp.asarray(rng.normal(size=(100, 100)), jnp.float32)
    with pytest.raises(ValueError):
        trmm(b, b, mode="right_lower", bt=64, interpret=True)
    with pytest.raises(ValueError):
        trmm(b, b, mode="sideways", bt=64, interpret=True)
