"""Matrix-free GP path: streamed matvec vs dense, CG solves, SLQ logdet,
iterative logML value/grad vs the dense analytic path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpx import Parameters, se, white, zero
from gpx.models import gp
from gpx.models.gp_iterative import (
    cg_solve,
    lanczos,
    logml_value_and_grad_iterative,
    slq_logdet,
)
from gpx.ops.gram import gram
from gpx.ops.pallas_matvec import gram_matvec

from .util import random_locations, symmetric_pos_def


def _toy(rng, n=200):
    x = jnp.asarray(random_locations(rng, n, 1, scale=8.0))
    kern = se(3.0, 5.5) + white(0.5)
    p = Parameters(mean=zero(), kernel=kern)
    y = jnp.asarray(rng.normal(size=n))
    return p, x, y


def test_gram_matvec_matches_dense(rng):
    p, x, _ = _toy(rng, n=300)
    k = np.asarray(gram(p.kernel, x, nugget=1e-3, method="xla"))
    v = rng.normal(size=(300, 3))
    got = np.asarray(gram_matvec(p.kernel, x, jnp.asarray(v), nugget=1e-3))
    np.testing.assert_allclose(got, k @ v, rtol=1e-8)
    # single-vector form
    got1 = np.asarray(gram_matvec(p.kernel, x, jnp.asarray(v[:, 0]), nugget=1e-3))
    np.testing.assert_allclose(got1, k @ v[:, 0], rtol=1e-8)


def test_gram_matvec_pallas_interpret(rng):
    p, x, _ = _toy(rng, n=256)
    x32 = jnp.asarray(np.asarray(x), jnp.float32)
    k = np.asarray(gram(p.kernel, x32, nugget=1e-3, method="xla"))
    v = rng.normal(size=(256, 2)).astype(np.float32)
    got = np.asarray(
        gram_matvec(p.kernel, x32, jnp.asarray(v), nugget=1e-3, bt=128,
                    interpret=True)
    )
    np.testing.assert_allclose(got, k @ v, rtol=3e-4, atol=3e-4)


def test_cg_solves_spd_system(rng):
    m = jnp.asarray(symmetric_pos_def(rng, 80, 100.0))
    b = jnp.asarray(rng.normal(size=(80, 2)))
    x, iters, converged = cg_solve(lambda v: m @ v, b, tol=1e-10)
    np.testing.assert_allclose(np.asarray(m @ x), np.asarray(b), atol=1e-6)
    assert int(iters) <= 80 + 5
    assert bool(converged)


def test_lanczos_tridiagonal_spectrum(rng):
    # Lanczos on a small SPD matrix reproduces extreme Ritz values
    m = jnp.asarray(symmetric_pos_def(rng, 60, 50.0))
    z = jnp.asarray(rng.normal(size=60))
    alphas, betas = lanczos(lambda v: m @ v, z, 60)
    t = np.diag(np.asarray(alphas)) + np.diag(np.asarray(betas), 1) + np.diag(
        np.asarray(betas), -1
    )
    ritz = np.linalg.eigvalsh(t)
    eigs = np.linalg.eigvalsh(np.asarray(m))
    np.testing.assert_allclose(ritz.max(), eigs.max(), rtol=1e-6)


def test_slq_logdet_accuracy(rng):
    p, x, _ = _toy(rng, n=300)
    k = gram(p.kernel, x, nugget=1e-3, method="xla")
    exact = float(jnp.linalg.slogdet(k)[1])
    est = float(
        slq_logdet(lambda v: k @ v, 300, jax.random.PRNGKey(0),
                   n_probes=30, m=40, dtype=k.dtype)
    )
    assert abs(est - exact) / abs(exact) < 0.05, (est, exact)


def test_pivoted_cholesky_low_rank_accuracy(rng):
    from gpx.models.gp_iterative import pivoted_cholesky

    # smooth SE kernel: rapidly decaying spectrum -> small rank suffices
    x = jnp.asarray(random_locations(rng, 150, 1, scale=5.0))
    kern = se(3.0, 5.5)
    k = np.asarray(gram(kern, x, method="xla"))
    l_r = np.asarray(pivoted_cholesky(kern, x, rank=25))
    assert l_r.shape == (150, 25)
    err = np.abs(k - l_r @ l_r.T).max()
    assert err < 1e-3 * np.abs(k).max(), err


def test_preconditioned_cg_cuts_iterations(rng):
    from gpx.models.gp_iterative import pivoted_cholesky_preconditioner

    # ill-conditioned: smooth kernel dominates a small noise floor
    x = jnp.asarray(np.sort(rng.uniform(-5, 5, size=400)).reshape(-1, 1))
    kern = se(10.0, 3.0) + white(1e-2)
    k = gram(kern, x, nugget=1e-3, method="xla")
    b = jnp.asarray(rng.normal(size=400))
    mv = lambda v: k @ v

    _, iters_plain, conv_plain = cg_solve(mv, b, tol=1e-6, max_iters=2000)
    precond = pivoted_cholesky_preconditioner(kern, x, rank=40, noise=1.1e-2)
    sol, iters_pc, conv_pc = cg_solve(mv, b, tol=1e-6, max_iters=2000,
                                      precond=precond)
    assert bool(conv_pc)
    np.testing.assert_allclose(np.asarray(k @ sol), np.asarray(b), atol=1e-4)
    assert int(iters_pc) < int(iters_plain), (int(iters_pc), int(iters_plain))


def test_split_noise():
    from gpx import matern
    from gpx.kernels import split_noise

    smooth, nz = split_noise(se(3.0, 5.5) + white(0.5) + white(0.25))
    assert float(nz) == 0.75
    assert isinstance(smooth, type(se(1.0, 1.0)))
    smooth2, nz2 = split_noise(white(0.3))
    assert smooth2 is None and float(nz2) == 0.3
    smooth3, nz3 = split_noise(se(1.0, 1.0) * matern(1.0, 1.5, 2.0))
    assert float(nz3) == 0.0 and smooth3 is not None


def test_iterative_logml_precond_matches_plain(rng):
    p, x, y = _toy(rng, n=250)
    r_plain = logml_value_and_grad_iterative(
        p, x, y, jax.random.PRNGKey(5), n_probes=16, lanczos_iters=40,
        cg_tol=1e-8,
    )
    r_pc = logml_value_and_grad_iterative(
        p, x, y, jax.random.PRNGKey(5), n_probes=16, lanczos_iters=40,
        cg_tol=1e-8, precond_rank=30,
    )
    assert bool(r_pc.cg_converged)
    assert int(r_pc.cg_iters) <= int(r_plain.cg_iters)
    # the preconditioned path uses the variance-reduced SLQ (logdet P +
    # small stochastic correction): it must land at least as close to the
    # exact value as the plain estimate, and within 0.5%
    exact, _ = gp.logml_value_and_grad(p, x, y, method="autodiff")
    err_pc = abs(float(r_pc.value) - float(exact))
    err_plain = abs(float(r_plain.value) - float(exact))
    assert err_pc <= err_plain + 1e-6, (err_pc, err_plain)
    assert err_pc < 5e-3 * abs(float(exact)) + 0.5


def test_preconditioned_slq_beats_plain_on_ill_conditioned(rng):
    """Sharp case for ROADMAP item 7: smooth SE kernel with a tiny noise
    floor — plain 32-step SLQ underestimates the logdet badly; the
    Woodbury-preconditioned estimator is near-exact."""
    from gpx.models.gp_iterative import (
        pivoted_cholesky_preconditioner,
        slq_logdet,
        slq_logdet_preconditioned,
    )

    kern = se(10.0, 3.0) + white(1e-2)
    x = jnp.asarray(np.sort(random_locations(rng, 400, 1, scale=8.0), axis=0))
    k = gram(kern, x, nugget=1e-3, method="xla")
    exact = float(jnp.linalg.slogdet(k)[1])
    mv = lambda v: k @ v
    pc = pivoted_cholesky_preconditioner(kern, x, rank=120, noise=1.1e-2)

    # both estimators are stochastic: compare mean absolute error over
    # seeds (measured over 5 seeds: pc ~1.6 vs plain ~11.0)
    errs_pc, errs_plain = [], []
    for seed in range(3):
        e_pc = float(slq_logdet_preconditioned(
            mv, pc, jax.random.PRNGKey(seed), n_probes=16, m=32
        ))
        e_plain = float(slq_logdet(
            mv, 400, jax.random.PRNGKey(seed), n_probes=16, m=32,
            dtype=k.dtype,
        ))
        errs_pc.append(abs(e_pc - exact))
        errs_plain.append(abs(e_plain - exact))
    assert np.mean(errs_pc) < 0.6 * np.mean(errs_plain), (errs_pc, errs_plain)
    assert np.mean(errs_pc) < 4e-3 * abs(exact), (errs_pc, exact)


def test_iterative_logml_matches_dense(rng):
    p, x, y = _toy(rng, n=250)
    # config matches test_iterative_logml_precond_matches_plain so the two
    # tests share one jit compilation (suite wall-time; round-3 VERDICT 9)
    result = logml_value_and_grad_iterative(
        p, x, y, jax.random.PRNGKey(1), n_probes=16, lanczos_iters=40,
        cg_tol=1e-8,
    )
    dense_val, dense_grads = gp.logml_value_and_grad(p, x, y, method="autodiff")
    # value: quadratic term exact, logdet stochastic (few % of logdet)
    np.testing.assert_allclose(float(result.value), float(dense_val),
                               rtol=0.05, atol=5.0)
    # gradients: quad part exact, trace part Hutchinson (looser)
    got = np.asarray([float(v) for v in jax.tree_util.tree_leaves(result.grads.kernel)])
    want = np.asarray([float(v) for v in jax.tree_util.tree_leaves(dense_grads.kernel)])
    np.testing.assert_allclose(got, want, rtol=0.3, atol=0.5)


def test_cross_matvec_matches_dense(rng):
    from gpx.ops.pallas_matvec import cross_matvec

    kernel = se(3.0, 5.5) + white(0.5)
    x1 = jnp.asarray(random_locations(rng, 96, 2))
    x2 = jnp.asarray(random_locations(rng, 200, 2))
    v = jnp.asarray(rng.normal(size=(200, 3)))
    got = cross_matvec(kernel, x1, x2, v)
    want = gram(kernel, x1, x2) @ v
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    # single-vector form
    got1 = cross_matvec(kernel, x1, x2, v[:, 0])
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want[:, 0]),
                               rtol=1e-6)


def test_cross_matvec_pallas_interpret(rng):
    from gpx.ops.pallas_matvec import cross_matvec

    kernel = se(2.0, 3.0)
    x1 = jnp.asarray(random_locations(rng, 128, 1), jnp.float32)
    x2 = jnp.asarray(random_locations(rng, 256, 1), jnp.float32)
    v = jnp.asarray(rng.normal(size=(256, 2)), jnp.float32)
    got = cross_matvec(kernel, x1, x2, v, bt=128, interpret=True)
    want = gram(kernel, x1, x2) @ v
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want, np.float32), rtol=2e-5, atol=1e-4
    )


def test_fit_iterative_matches_dense(rng):
    from gpx.models.gp_iterative import fit_iterative

    params = Parameters(mean=zero(), kernel=se(2.0, 3.0) + white(0.5))
    x = jnp.asarray(np.sort(random_locations(rng, 300, 1, scale=8.0), axis=0))
    y = gp.draw(jax.random.PRNGKey(0), params, x, nugget=1e-6)
    xs = jnp.linspace(-8, 8, 70).reshape(-1, 1)

    dense = gp.fit(params, x, y, xs)
    it = fit_iterative(params, x, y, xs, cg_tol=1e-9, variance_block=32)
    assert bool(it.cg_converged)
    np.testing.assert_allclose(
        np.asarray(it.mean), np.asarray(dense.mean), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(it.variance), np.asarray(dense.variance), atol=1e-5
    )
    # mean-only mode skips the variance solves
    it2 = fit_iterative(params, x, y, xs, cg_tol=1e-9, variance="none")
    assert it2.variance.shape == (0,)
    np.testing.assert_allclose(
        np.asarray(it2.mean), np.asarray(dense.mean), atol=1e-6
    )


def test_pcg_tridiag_freeze_is_sticky(rng):
    """A broken-down column (non-SPD curvature) must emit the (1, 0)
    identity extension for ALL remaining iterations — a non-sticky freeze
    let it 'recover' and emit garbage T entries (review finding)."""
    from gpx.models.gp_iterative import _pcg_tridiag

    k = jnp.diag(jnp.asarray([-1.0, 2.0, 3.0]))   # indefinite on purpose
    z = jnp.asarray(rng.normal(size=(3, 2)))
    t_diags, t_offs = _pcg_tridiag(lambda v: k @ v, z, 6, lambda v: v)
    assert np.isfinite(np.asarray(t_diags)).all()
    assert np.isfinite(np.asarray(t_offs)).all()
    # every column breaks down (or converges) within 3 exact-arithmetic
    # steps on a 3x3 system; after that only the identity extension may
    # appear: diag 1.0 and off-diag 0.0
    np.testing.assert_allclose(np.asarray(t_diags)[4:], 1.0)
    np.testing.assert_allclose(np.asarray(t_offs)[4:], 0.0)


def test_preconditioned_probes_reduce_gradient_variance(rng):
    """Round-3 VERDICT 8: with a preconditioner the Hutchinson gradient
    trace uses z ~ N(0, P) probes weighted by P^{-1} z; across seeds the
    gradient estimates must (a) stay unbiased (match dense) and (b) have
    materially lower variance than the plain-Rademacher estimator."""
    # n/probes/lanczos/rank match the two logml tests above so ALL eight
    # calls here hit their already-compiled programs (the PRNGKey is a
    # traced argument) — suite wall-time, round-3 VERDICT 9
    p, x, y = _toy(rng, n=250)
    _, dense_grads = gp.logml_value_and_grad(p, x, y, method="autodiff")
    want = np.asarray(
        [float(v) for v in jax.tree_util.tree_leaves(dense_grads.kernel)]
    )

    def grads_for(seed, rank):
        res = logml_value_and_grad_iterative(
            p, x, y, jax.random.PRNGKey(seed), n_probes=16,
            lanczos_iters=40, cg_tol=1e-8, precond_rank=rank,
        )
        return np.asarray(
            [float(v) for v in jax.tree_util.tree_leaves(res.grads.kernel)]
        )

    plain = np.stack([grads_for(s, 0) for s in range(4)])
    pcond = np.stack([grads_for(s, 30) for s in range(4)])
    # unbiased: seed-mean close to dense for both estimators
    np.testing.assert_allclose(pcond.mean(0), want, rtol=0.25, atol=0.3)
    # Variance semantics: when P ~ K (rank 30 is near-exact at n=250), the
    # P-probe estimator u^T P^-1/2 Kdot K^-1 P^-1/2 u equals the plain one
    # EXACTLY for components whose Kdot commutes with K (SE amplitude h:
    # Kdot ∝ K - cI; White sigma: Kdot ∝ I) — so those variances match to
    # float jitter, and the reduction shows on the non-commuting component
    # (the lengthscale). Assert no component gets worse and at least one
    # improves materially.
    v_plain = plain.var(0)
    v_pcond = pcond.var(0)
    assert (v_pcond <= v_plain * 1.001 + 1e-12).all(), (v_pcond, v_plain)
    assert (v_pcond < 0.7 * v_plain).any(), (v_pcond, v_plain)
    # and overall
    assert v_pcond.sum() < v_plain.sum()


def test_distributed_matvec_and_iterative_mesh(rng):
    """Round-3 distributed matrix-free path: the row-sharded streamed
    matvec is exact vs the single-device one, and fit_iterative /
    logml_value_and_grad_iterative with mesh= reproduce the local results
    (same keys => same probes; CG/SLQ consume the identical operator)."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gpx.parallel import distributed_gram_matvec, make_mesh

    mesh = make_mesh(data=8)
    n = 256
    x = jnp.asarray(np.sort(random_locations(rng, n, 1, scale=8.0), axis=0))
    params = Parameters(mean=zero(), kernel=se(2.0, 3.0) + white(0.5))
    y = gp.draw(jax.random.PRNGKey(0), params, x, nugget=1e-6)

    v = jnp.asarray(np.asarray(
        np.random.default_rng(1).normal(size=(n, 3))))
    from gpx.ops.pallas_matvec import gram_matvec
    want = gram_matvec(params.kernel, x, v, nugget=1e-3)
    got = distributed_gram_matvec(params.kernel, x, mesh, nugget=1e-3)(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)

    from gpx.models import gp_iterative

    xs = jnp.linspace(-8, 8, 32).reshape(-1, 1)
    local = gp_iterative.fit_iterative(params, x, y, xs, precond_rank=16)
    dist = gp_iterative.fit_iterative(params, x, y, xs, precond_rank=16,
                                      mesh=mesh)
    np.testing.assert_allclose(np.asarray(dist.mean), np.asarray(local.mean),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dist.variance),
                               np.asarray(local.variance), atol=1e-8)

    key = jax.random.PRNGKey(7)
    loc = gp_iterative.logml_value_and_grad_iterative(
        params, x, y, key, n_probes=8, lanczos_iters=16, precond_rank=16)
    dst = gp_iterative.logml_value_and_grad_iterative(
        params, x, y, key, n_probes=8, lanczos_iters=16, precond_rank=16,
        mesh=mesh)
    np.testing.assert_allclose(float(dst.value), float(loc.value), rtol=1e-8)
    for a, b in zip(jax.tree_util.tree_leaves(dst.grads),
                    jax.tree_util.tree_leaves(loc.grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-10)
