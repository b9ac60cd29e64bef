"""Matrix-free multi-output GP: streamed Kronecker matvec vs the dense
(NT) construction; CG/SLQ/Hutchinson estimates vs dense logML and fit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpx
from gpx.models import multioutput as mo
from gpx.models import multioutput_iterative as moi


def _params(t=3, rank=2, noise=0.05):
    w = jnp.asarray(np.random.default_rng(7).normal(size=(t, rank)) * 0.6)
    return mo.IcmParams(
        kernel=gpx.se(1.3, 0.9),
        w=w,
        kappa=jnp.asarray(np.full(t, 0.3)),
        noise=jnp.asarray(noise),
    )


def _lmc_params(t=3):
    p = gpx.models.multioutput.lmc(
        [gpx.se(1.0, 0.5), gpx.se(0.6, 2.0)], t, rank=1, noise=0.08
    )
    return p


def _data(n=24, t=3, d=1, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3.0, 3.0, size=(n, d)))
    y = jnp.asarray(rng.normal(size=(n, t)))
    return x, y


def _coherent_data(p, n=32, d=1, seed=3):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3.0, 3.0, size=(n, d)))
    y = mo.draw(jax.random.PRNGKey(seed), p, x)
    return x, y


@pytest.mark.parametrize("make", [_params, _lmc_params])
def test_kron_matvec_matches_dense(make):
    p = make()
    x, _ = _data(n=20)
    nug = 1e-6
    kfull = np.asarray(mo.gram_full(p, x, nugget=nug))
    mv = moi.kron_matvec(p, x, nugget=nug)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(kfull.shape[0],)))
    np.testing.assert_allclose(np.asarray(mv(v)), kfull @ np.asarray(v),
                               rtol=1e-8, atol=1e-10)
    vb = jnp.asarray(rng.normal(size=(kfull.shape[0], 5)))
    np.testing.assert_allclose(np.asarray(mv(vb)), kfull @ np.asarray(vb),
                               rtol=1e-8, atol=1e-10)


def test_kron_matvec_per_output_noise():
    p = _params()
    p = mo.IcmParams(kernel=p.kernel, w=p.w, kappa=p.kappa,
                     noise=jnp.asarray([0.05, 0.2, 0.7]))
    x, _ = _data(n=16)
    kfull = np.asarray(mo.gram_full(p, x, nugget=0.0))
    mv = moi.kron_matvec(p, x)
    v = jnp.asarray(np.random.default_rng(2).normal(size=(kfull.shape[0],)))
    np.testing.assert_allclose(np.asarray(mv(v)), kfull @ np.asarray(v),
                               rtol=1e-8, atol=1e-10)


def test_kron_matvec_xla_path_matches_and_differentiates():
    p = _params()
    x, y = _data(n=16)
    v = jnp.asarray(np.random.default_rng(3).normal(size=(16 * 3,)))
    got = moi.kron_matvec(p, x, method="xla")(v)
    want = moi.kron_matvec(p, x)(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-7)

    # gradient of a scalar contraction flows to every hyperparameter
    def scalar(p_):
        return v @ moi.kron_matvec(p_, x, method="xla")(v)

    g = jax.grad(scalar)(p)
    assert np.isfinite(float(g.noise)) and abs(float(g.noise)) > 0
    assert np.all(np.isfinite(np.asarray(g.w)))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def _dense_precond(pre, b, n):
    """Dense P = B ⊗ (W lam Wᵀ) + Qb diag(noise) Qbᵀ ⊗ I, output-major."""
    wlw = np.asarray(pre.w) * np.asarray(pre.lam) @ np.asarray(pre.w).T
    qb = np.asarray(pre.qb)
    noise_t = qb @ np.diag(np.asarray(pre.noise)) @ qb.T
    return np.kron(b, wlw) + np.kron(noise_t, np.eye(n))


def test_kron_preconditioner_is_exact_inverse():
    p = _params(noise=0.1)
    x, _ = _data(n=20)
    n, t = 20, 3
    pre = moi.kron_preconditioner(p, x, rank=20, nugget=0.0)
    dense_p = _dense_precond(pre, np.asarray(mo.coregion_matrix(p)), n)
    v = np.random.default_rng(4).normal(size=(n * t, 3))
    got = np.asarray(pre.apply(jnp.asarray(dense_p @ v)))
    np.testing.assert_allclose(got, v, rtol=1e-4, atol=1e-5)
    # logdet matches the dense slogdet
    want_ld = np.linalg.slogdet(dense_p)[1]
    np.testing.assert_allclose(float(pre.logdet), want_ld, rtol=1e-5)


def test_kron_preconditioner_splits_white_from_base_kernel():
    # a White term in the BASE kernel must move to the per-rotated-column
    # noise floor (λb·σ_w² + σ²), not eat the pivoted-Cholesky rank budget
    p = _params(noise=0.1)
    p = mo.IcmParams(kernel=gpx.se(1.3, 0.9) + gpx.white(0.3), w=p.w,
                     kappa=p.kappa, noise=p.noise)
    x, _ = _data(n=18)
    n, t = 18, 3
    pre = moi.kron_preconditioner(p, x, rank=18, nugget=0.0)
    # full rank on the smooth part: P equals K exactly, so apply must
    # invert the true operator B ⊗ (K_se + σ_w² I) + σ² I
    kfull = np.asarray(mo.gram_full(p, x, nugget=0.0)) + 1e-8 * np.eye(n * t)
    v = np.random.default_rng(5).normal(size=(n * t, 2))
    got = np.asarray(pre.apply(jnp.asarray(kfull @ v)))
    np.testing.assert_allclose(got, v, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(pre.logdet),
                               np.linalg.slogdet(kfull)[1], rtol=1e-5)
    with pytest.raises(ValueError, match="pure White"):
        p_white = mo.IcmParams(kernel=gpx.white(0.3), w=p.w, kappa=p.kappa,
                               noise=p.noise)
        moi.kron_preconditioner(p_white, x, rank=4)


def test_kron_preconditioner_sample_covariance():
    p = _params(noise=0.1)
    x, _ = _data(n=12)
    pre = moi.kron_preconditioner(p, x, rank=12, nugget=0.0)
    z = pre.sample(jax.random.PRNGKey(0), 4000)
    emp = np.asarray(z) @ np.asarray(z).T / z.shape[1]
    dense_p = _dense_precond(pre, np.asarray(mo.coregion_matrix(p)), 12)
    assert np.max(np.abs(emp - dense_p)) < 0.25 * np.max(np.abs(dense_p))


def test_preconditioner_rejects_lmc_and_per_output_noise():
    x, _ = _data(n=12)
    with pytest.raises(ValueError, match="ICM-only"):
        moi.kron_preconditioner(_lmc_params(), x, rank=4)
    p = _params()
    p = mo.IcmParams(kernel=p.kernel, w=p.w, kappa=p.kappa,
                     noise=jnp.asarray([0.1, 0.1, 0.1]))
    with pytest.raises(ValueError, match="shared"):
        moi.kron_preconditioner(p, x, rank=4)


@pytest.mark.parametrize("precond_rank", [0, 16])
def test_iterative_logml_matches_dense(precond_rank):
    p = _params(noise=0.1)
    x, y = _coherent_data(p, n=32)
    res = moi.logml_value_and_grad_iterative(
        p, x, y, jax.random.PRNGKey(0), n_probes=64, lanczos_iters=32,
        cg_tol=1e-8, precond_rank=precond_rank,
    )
    assert bool(res.cg_converged)
    want = float(mo.log_marginal_likelihood(p, x, y, method="dense"))
    np.testing.assert_allclose(float(res.value), want, rtol=0.05, atol=2.0)


def test_iterative_logml_grads_match_dense_autodiff():
    ptrue = _params(noise=0.1)
    x, y = _coherent_data(ptrue, n=32)
    # evaluate at params OFFSET from the generating truth: at the truth the
    # gradient is ~0 by construction and the Hutchinson trace noise swamps
    # it; offset, every component is large and the relative error is the
    # estimator's true accuracy
    p = mo.IcmParams(kernel=gpx.se(0.8, 0.5), w=ptrue.w * 1.4,
                     kappa=ptrue.kappa * 2.0, noise=jnp.asarray(0.4))
    res = moi.logml_value_and_grad_iterative(
        p, x, y, jax.random.PRNGKey(1), n_probes=128, lanczos_iters=32,
        cg_tol=1e-8,
    )
    want = jax.grad(
        lambda p_: mo.log_marginal_likelihood(p_, x, y, method="dense")
    )(p)
    for g, wgrad in zip(jax.tree_util.tree_leaves(res.grads),
                        jax.tree_util.tree_leaves(want)):
        g, wgrad = np.asarray(g), np.asarray(wgrad)
        assert g.shape == wgrad.shape
        # stochastic trace estimate: loose elementwise tolerance
        np.testing.assert_allclose(g, wgrad, rtol=0.25,
                                   atol=0.1 * max(1.0, np.abs(wgrad).max()))


def test_iterative_logml_lmc():
    p = _lmc_params()
    x, y = _coherent_data(p, n=24)
    res = moi.logml_value_and_grad_iterative(
        p, x, y, jax.random.PRNGKey(2), n_probes=64, cg_tol=1e-8,
    )
    want = float(mo.log_marginal_likelihood(p, x, y))
    np.testing.assert_allclose(float(res.value), want, rtol=0.05, atol=2.0)
    leaves = jax.tree_util.tree_leaves(res.grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


@pytest.mark.parametrize("precond_rank", [0, 16])
def test_fit_iterative_matches_dense(precond_rank):
    p = _params(noise=0.1)
    x, y = _coherent_data(p, n=32)
    xs = jnp.linspace(-3.5, 3.5, 11)[:, None]
    it = moi.fit_iterative(p, x, y, xs, cg_tol=1e-9,
                           precond_rank=precond_rank, variance_block=4)
    dense = mo.fit(p, x, y, xs, method="dense")
    assert bool(it.cg_converged)
    np.testing.assert_allclose(np.asarray(it.mean), np.asarray(dense.mean),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(it.variance),
                               np.asarray(dense.variance), atol=1e-4)


def test_fit_iterative_variance_none_and_lmc():
    p = _lmc_params()
    x, y = _coherent_data(p, n=24)
    xs = jnp.linspace(-3.0, 3.0, 7)[:, None]
    it = moi.fit_iterative(p, x, y, xs, cg_tol=1e-9, variance="none")
    dense = mo.fit(p, x, y, xs)
    np.testing.assert_allclose(np.asarray(it.mean), np.asarray(dense.mean),
                               atol=1e-5)
    assert it.variance.size == 0


def test_iterative_logml_mesh_matches_local():
    mesh = jax.make_mesh(
        (8,), ("data",), axis_types=(jax.sharding.AxisType.Auto,)
    )
    p = _params(noise=0.1)
    x, y = _coherent_data(p, n=32)
    loc = moi.logml_value_and_grad_iterative(
        p, x, y, jax.random.PRNGKey(0), n_probes=16, cg_tol=1e-8,
    )
    dst = moi.logml_value_and_grad_iterative(
        p, x, y, jax.random.PRNGKey(0), n_probes=16, cg_tol=1e-8, mesh=mesh,
    )
    np.testing.assert_allclose(float(dst.value), float(loc.value), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(dst.grads),
                    jax.tree_util.tree_leaves(loc.grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-7)


def test_optimize_iterative_improves_logml():
    ptrue = _params(noise=0.1)
    x, y = _coherent_data(ptrue, n=32)
    # start offset from the truth; a short Adam run on the stochastic
    # objective must raise the TRUE (dense) logML
    p0 = mo.IcmParams(kernel=gpx.se(0.6, 0.4), w=ptrue.w * 1.5,
                      kappa=ptrue.kappa * 2.0, noise=jnp.asarray(0.5))
    before = float(mo.log_marginal_likelihood(p0, x, y, method="dense"))
    res = mo.optimize(
        p0, x, y, method="iterative", optimizer="adam", steps=60,
        learning_rate=0.08, key=jax.random.PRNGKey(0), n_probes=16,
        cg_tol=1e-7,
    )
    after = float(mo.log_marginal_likelihood(res.params, x, y,
                                             method="dense"))
    assert after > before + 1.0
    assert np.isfinite(float(res.value))


def test_optimize_iterative_rejects_lbfgs_and_mask():
    p = _params()
    x, y = _data(n=12)
    with pytest.raises(ValueError, match="adam"):
        mo.optimize(p, x, y, method="iterative", optimizer="lbfgs")
    with pytest.raises(ValueError, match="mask"):
        mo.optimize(p, x, y, method="iterative", optimizer="adam",
                    mask=np.ones((12, 3), bool))
