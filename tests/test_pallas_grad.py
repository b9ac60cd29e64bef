"""Fused logML-gradient Pallas kernel vs the autodiff reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpx import Parameters, matern, se, white, zero
from gpx.models import gp
from gpx.ops.chol import back_solve, cholesky, forward_solve, tri_inverse_lower
from gpx.ops.pallas_logml_grad import logml_kernel_grads


def _setup(rng, kernel, n=256, d=1):
    x = jnp.asarray(rng.uniform(-10, 10, size=(n, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    p = Parameters(mean=zero(), kernel=kernel)
    k = p.kernel.gram(x, nugget=gp.LOGML_NUGGET, method="xla")
    l = cholesky(k)
    alpha = back_solve(l.T, forward_solve(l, y))
    return p, x, y, alpha, tri_inverse_lower(l)


@pytest.mark.parametrize("kernel_fn", [
    lambda: se(3.0, 5.5) + white(0.5),
    lambda: matern(2.0, 1.5, 3.0) + white(0.25),
    lambda: se(2.0, 3.0) * matern(1.0, 2.5, 4.0) + white(0.1),
])
def test_fused_grads_match_autodiff(rng, kernel_fn):
    p, x, y, alpha, l_inv = _setup(rng, kernel_fn())
    got = logml_kernel_grads(p.kernel, x, alpha, l_inv, bt=64, interpret=True)
    _, want = gp.logml_value_and_grad(p, x, y, method="autodiff")
    for a, b in zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want.kernel)
    ):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-2, atol=1e-3)


def test_fused_grads_2d_locations(rng):
    p, x, y, alpha, l_inv = _setup(rng, se(3.0, 5.5) + white(0.5), n=192, d=2)
    got = logml_kernel_grads(p.kernel, x, alpha, l_inv, bt=64, interpret=True)
    _, want = gp.logml_value_and_grad(p, x, y, method="autodiff")
    for a, b in zip(
        jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want.kernel)
    ):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-2, atol=1e-3)


def test_fast_mode_tracks_exact(rng):
    """fast=True (2-pass bf16 split) stays within its documented ~2^-9
    envelope of the exact-mode gradients."""
    p, x, y, alpha, l_inv = _setup(rng, se(3.0, 5.5) + white(0.5))
    exact = logml_kernel_grads(p.kernel, x, alpha, l_inv, bt=64,
                               interpret=True)
    fast = logml_kernel_grads(p.kernel, x, alpha, l_inv, bt=64,
                              interpret=True, fast=True)
    for a, b in zip(
        jax.tree_util.tree_leaves(fast), jax.tree_util.tree_leaves(exact)
    ):
        np.testing.assert_allclose(float(a), float(b), rtol=2e-2, atol=5e-2)


def test_rejects_unaligned_n(rng):
    p, x, y, alpha, l_inv = _setup(rng, se(3.0, 5.5), n=100)
    with pytest.raises(ValueError):
        logml_kernel_grads(p.kernel, x, alpha, l_inv, bt=64, interpret=True)


@pytest.mark.parametrize("base_fn", [
    lambda: se(3.0, 1.0) + white(0.5),
    lambda: matern(2.0, 2.5, 1.0) + white(0.25),
])
def test_ard_lengthscale_grads_match_autodiff(rng, base_fn):
    """ard=True on pre-scaled coordinates: the extra per-dimension sums turn
    into d logML/d ell_d = -(2/ell_d) sdot_d, matching autodiff through the
    full ARD gram (gp._logml_value_and_grad_analytic's ARD branch)."""
    from gpx import ard

    ell = jnp.asarray([0.7, 2.3, 1.4])
    kernel = ard(base_fn(), ell)
    p, x, y, alpha, l_inv = _setup(rng, kernel, n=192, d=3)
    d_base, (tkw, trw), sdot = logml_kernel_grads(
        kernel.base, x / ell, alpha, l_inv, bt=64, interpret=True,
        with_correction=True, ard=True,
    )
    d_ell = -2.0 * sdot / ell
    _, want = gp.logml_value_and_grad(p, x, y, method="autodiff")
    np.testing.assert_allclose(
        np.asarray(d_ell), np.asarray(want.kernel.ell), rtol=1e-2, atol=1e-3
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(d_base),
        jax.tree_util.tree_leaves(want.kernel.base),
    ):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-2, atol=1e-3)
