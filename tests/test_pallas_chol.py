"""Recursive blocked Cholesky-and-inverse vs numpy (interpret mode).

Covers gpx.ops.pallas_chol.chol_inv — the TPU rebuild of LAPACK
dpotrf/dtrtri (GaussianProcess.scala:123, Predict.scala:69) — plus the
trmm/syrk building blocks it composes and the logdet correction the fused
gradient kernel emits for it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gpx.ops.pallas_chol import chol_inv, chol_inv_tile
from gpx.ops.pallas_trmm import syrk_lower, trmm


def _spd(rng, n):
    a = rng.normal(size=(n, n))
    return (a @ a.T + n * np.eye(n)).astype(np.float32)


@pytest.mark.parametrize("variant", ["recursion", "panel", "inplace"])
@pytest.mark.parametrize("n,base,bt", [
    (128, 128, 128),      # single-tile base case only
    (256, 128, 128),      # one recursion level
    (512, 128, 128),      # two levels
    (1024, 256, 128),     # bigger base tile, bt < base
    (384, 128, 128),      # non-power-of-2: 256 + 128 uneven Schur split
    (640, 128, 128),      # non-power-of-2: 512 + 128 (pow2 child recurses)
    (1664, 256, 128),     # non-power-of-2: 1024 + 512 + 128, three leaves
])
def test_chol_inv_matches_numpy(rng, n, base, bt, variant):
    a = _spd(rng, n)
    kw = (dict(fast_compile=True) if variant == "inplace"
          else dict(layout=variant))
    l, m = chol_inv(jnp.asarray(a), base=base, bt=bt, interpret=True, **kw)
    l_ref = np.linalg.cholesky(a.astype(np.float64))
    m_ref = np.linalg.inv(l_ref)
    scale_l = np.abs(l_ref).max()
    scale_m = np.abs(m_ref).max()
    assert np.abs(np.asarray(l) - l_ref).max() < 3e-5 * scale_l
    assert np.abs(np.asarray(m) - m_ref).max() < 3e-5 * scale_m
    # exact zeros above the diagonal (the gradient kernel relies on this)
    assert np.abs(np.triu(np.asarray(l), 1)).max() == 0.0
    assert np.abs(np.triu(np.asarray(m), 1)).max() == 0.0


@pytest.mark.parametrize("layout", ["recursion", "panel"])
def test_chol_inv_fast_loosens_only_top_m21(rng, layout):
    """fast=True: L is UNCHANGED (the factor chain never sees the 2-pass
    split), the diagonal blocks of M are unchanged, and only the outermost
    M21 block loosens to the ~2^-9 bf16x2 envelope."""
    n = 512
    a = _spd(rng, n)
    l3, m3 = chol_inv(jnp.asarray(a), base=128, bt=128, interpret=True,
                      layout=layout)
    lf, mf = chol_inv(jnp.asarray(a), base=128, bt=128, interpret=True,
                      fast=True, layout=layout)
    np.testing.assert_array_equal(np.asarray(l3), np.asarray(lf))
    h = n // 2
    np.testing.assert_array_equal(np.asarray(m3)[:h, :h],
                                  np.asarray(mf)[:h, :h])
    np.testing.assert_array_equal(np.asarray(m3)[h:, h:],
                                  np.asarray(mf)[h:, h:])
    scale = np.abs(np.asarray(m3)[h:, :h]).max()
    diff = np.abs(np.asarray(m3)[h:, :h] - np.asarray(mf)[h:, :h]).max()
    assert 0 < diff < 2e-2 * scale       # loosened, but 2-pass-grade


@pytest.mark.parametrize("fast_compile", [False, True])
def test_chol_inv_fast_uneven_outermost(rng, fast_compile):
    """fast=True at a non-power-of-2 size (both layouts): L unchanged,
    only the outermost (rectangular) M21 panel loosens."""
    n, h = 384, 256
    a = _spd(rng, n)
    kw = dict(base=128, bt=128, interpret=True, fast_compile=fast_compile)
    l3, m3 = chol_inv(jnp.asarray(a), **kw)
    lf, mf = chol_inv(jnp.asarray(a), fast=True, **kw)
    np.testing.assert_array_equal(np.asarray(l3), np.asarray(lf))
    np.testing.assert_array_equal(np.asarray(m3)[:h, :h],
                                  np.asarray(mf)[:h, :h])
    np.testing.assert_array_equal(np.asarray(m3)[h:, h:],
                                  np.asarray(mf)[h:, h:])
    scale = np.abs(np.asarray(m3)[h:, :h]).max()
    diff = np.abs(np.asarray(m3)[h:, :h] - np.asarray(mf)[h:, :h]).max()
    assert 0 < diff < 2e-2 * scale


def test_trmm_rectangular_right_modes(rng):
    """Rectangular B in the right trmm modes — the uneven-split panels."""
    from gpx.ops.pallas_trmm import trmm as _trmm

    n, m = 256, 128
    b = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    l = jnp.asarray(np.tril(rng.normal(size=(n, n))), jnp.float32)
    got_t = np.asarray(_trmm(b, l, mode="right_lower_t", bt=64, m=m,
                             interpret=True))
    want_t = np.asarray(b) @ np.asarray(l).T
    assert got_t.shape == (m, n)
    assert np.abs(got_t - want_t).max() < 3e-4 * max(np.abs(want_t).max(), 1.0)
    got_r = np.asarray(_trmm(b, l, mode="right_lower", bt=64, m=m,
                             interpret=True))
    want_r = np.asarray(b) @ np.asarray(l)
    assert got_r.shape == (m, n)
    assert np.abs(got_r - want_r).max() < 3e-4 * max(np.abs(want_r).max(), 1.0)


def test_syrk_lower_rectangular(rng):
    n, k = 128, 256
    a = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    got = np.asarray(syrk_lower(a, b, bt=64, interpret=True))
    want = np.asarray(a) - np.asarray(b) @ np.asarray(b).T
    il = np.tril_indices(n)
    assert got.shape == (n, n)
    assert np.abs(got[il] - want[il]).max() < 3e-4 * np.abs(want).max()


def test_chol_inv_tile_reads_lower_triangle_only(rng):
    # garbage (NaN) in the strict upper triangle must not leak through
    a = _spd(rng, 128)
    poisoned = a.copy()
    poisoned[np.triu_indices(128, 1)] = np.nan
    l, m = chol_inv_tile(jnp.asarray(poisoned), interpret=True)
    l_ref = np.linalg.cholesky(a.astype(np.float64))
    assert np.isfinite(np.asarray(l)).all()
    assert np.abs(np.asarray(l) - l_ref).max() < 3e-5 * np.abs(l_ref).max()
    assert np.isfinite(np.asarray(m)).all()


def test_chol_inv_rejects_bad_shapes(rng):
    a = jnp.zeros((96, 96), jnp.float32)   # not a power of 2
    with pytest.raises(ValueError):
        chol_inv(a, interpret=True)
    with pytest.raises(ValueError):
        chol_inv(jnp.zeros((128, 64), jnp.float32), interpret=True)
    with pytest.raises(ValueError):
        chol_inv(jnp.zeros((256, 256), jnp.float32), base=128, bt=256,
                 interpret=True)


def test_trmm_right_lower_t(rng):
    n = 256
    b = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    l = jnp.asarray(np.tril(rng.normal(size=(n, n))), jnp.float32)
    got = np.asarray(trmm(b, l, mode="right_lower_t", bt=64, interpret=True))
    want = np.asarray(b) @ np.asarray(l).T
    assert np.abs(got - want).max() < 3e-4 * max(np.abs(want).max(), 1.0)


def test_trmm_skips_upper_tiles_of_l(rng):
    """The guarantee is tile-granular: strictly-upper (bt, bt) tiles of L
    are never fetched (diagonal tiles are fetched whole — their within-tile
    upper entries must be clean, which chol_inv ensures with exact zeros)."""
    n, bt = 256, 64
    b = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    l_np = np.tril(rng.normal(size=(n, n)))
    poisoned = l_np.copy()
    for i in range(0, n, bt):
        for j in range(i + bt, n, bt):
            poisoned[i : i + bt, j : j + bt] = np.nan   # upper tiles only
    got = np.asarray(
        trmm(b, jnp.asarray(poisoned, jnp.float32), mode="right_lower_t",
             bt=bt, interpret=True)
    )
    want = np.asarray(b) @ l_np.T
    assert np.isfinite(got).all()
    assert np.abs(got - want).max() < 3e-4 * max(np.abs(want).max(), 1.0)


def test_syrk_lower(rng):
    n = 256
    a = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    got = np.asarray(syrk_lower(a, b, bt=64, interpret=True))
    want = np.asarray(a) - np.asarray(b) @ np.asarray(b).T
    # lower-triangle tiles only: compare the lower triangle
    il = np.tril_indices(n)
    assert np.abs(got[il] - want[il]).max() < 3e-4 * np.abs(want).max()


def test_logdet_correction_terms(rng):
    """with_correction returns tr(W_hat K_nonugget) and tr(W_hat) such that
    the corrected logdet is second-order exact in the factorization error."""
    import gpx
    from gpx.ops.chol import back_solve, cholesky, forward_solve, \
        tri_inverse_lower
    from gpx.ops.pallas_logml_grad import logml_kernel_grads

    n, nugget = 256, 1e-3
    x = jnp.asarray(rng.uniform(-10, 10, size=(n, 1)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    kernel = gpx.se(3.0, 5.5) + gpx.white(0.5)
    k = kernel.gram(x, nugget=nugget, method="xla")
    l = cholesky(k)
    l_inv = tri_inverse_lower(l)
    # perturb the factor: the corrected logdet must still recover the truth
    l_inv_pert = l_inv * (1.0 + 1e-3)
    alpha = back_solve(l.T, forward_solve(l, y))
    _, (tkw, trw) = logml_kernel_grads(
        kernel, x, alpha, l_inv_pert, bt=64, interpret=True,
        with_correction=True,
    )
    corrected = -2.0 * jnp.sum(jnp.log(jnp.diagonal(l_inv_pert))) + (
        tkw + nugget * trw - n
    )
    truth = float(
        np.linalg.slogdet(np.asarray(k, np.float64))[1]
    )
    naive = float(-2.0 * jnp.sum(jnp.log(jnp.diagonal(l_inv_pert))))
    # the naive logdet from the perturbed factor is off first-order:
    # 2*n*1e-3 ~ 0.5; the correction cancels it to second order, leaving
    # ~n*(2e-3)^2/2 ~ 5e-4 plus the f32 accumulation floor (~5e-3)
    assert abs(naive - truth) > 0.3
    assert abs(float(corrected) - truth) < 5e-2


@pytest.mark.parametrize("layout", ["recursion", "panel"])
@pytest.mark.parametrize("n", [512, 384])
def test_spine_factorization_and_solves(rng, n, layout):
    """spine=True: L bit-identical to the full recursion, trailing-spine
    M21 blocks zero, and the spine solves reproduce L^{-1} b / L^{-T} b."""
    from gpx.ops.pallas_chol import spine_solve_lower, spine_solve_lower_t

    a = _spd(rng, n)
    kw = dict(base=128, bt=128, interpret=True, layout=layout)
    l_full, m_full = chol_inv(jnp.asarray(a), **kw)
    l_sp, m_sp = chol_inv(jnp.asarray(a), spine=True, **kw)
    np.testing.assert_array_equal(np.asarray(l_sp), np.asarray(l_full))
    # trailing-spine M21 blocks are zero; everything else matches
    h = 256
    assert np.abs(np.asarray(m_sp)[h:, :h]).max() == 0.0
    np.testing.assert_array_equal(np.asarray(m_sp)[:h, :h],
                                  np.asarray(m_full)[:h, :h])

    b = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    got_f = np.asarray(spine_solve_lower(l_sp, m_sp, b, base=128))
    want_f = np.asarray(m_full) @ np.asarray(b)
    scale = np.abs(want_f).max()
    assert np.abs(got_f - want_f).max() < 5e-5 * scale
    got_t = np.asarray(spine_solve_lower_t(l_sp, m_sp, b, base=128))
    want_t = np.asarray(m_full).T @ np.asarray(b)
    assert np.abs(got_t - want_t).max() < 5e-5 * np.abs(want_t).max()
    # vector RHS shape passes through
    v = jnp.asarray(rng.normal(size=n), jnp.float32)
    assert spine_solve_lower(l_sp, m_sp, v, base=128).shape == (n,)

    with pytest.raises(ValueError, match="spine"):
        chol_inv(jnp.asarray(a), spine=True, fast=True, **kw)


def test_chol_inv_identity_pad_blockdiag_exact(rng):
    """The any-N padding contract (gp._pad_spd / _fused_logml_core): the
    factorization of blockdiag(K, I_p) must be blockdiag(L, I_p) with
    inverse blockdiag(L^{-1}, I_p) EXACTLY — zero blocks and unit pivots
    round-trip the bf16x3 kernels bitwise, which is what makes the padded
    solves/logdet identical to the unpadded problem's."""
    from gpx.models.gp import _pad_spd

    n, pad = 192, 64
    a = jnp.asarray(_spd(rng, n))
    ap = _pad_spd(a, pad)
    l, m = chol_inv(ap, base=128, bt=64, interpret=True)
    eye = jnp.eye(pad, dtype=jnp.float32)
    for out in (l, m):
        assert jnp.array_equal(out[n:, :n], jnp.zeros((pad, n)))
        assert jnp.array_equal(out[:n, n:], jnp.zeros((n, pad)))
        assert jnp.array_equal(out[n:, n:], eye)
    # and the real block still factors K: ||L L^T - K|| small
    ll = np.asarray(l[:n, :n], np.float64)
    np.testing.assert_allclose(ll @ ll.T, np.asarray(a, np.float64),
                               rtol=0, atol=2e-2 * float(jnp.abs(a).max()))
