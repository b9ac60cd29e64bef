"""ICM multi-output GP: Kronecker fast path vs dense ground truth.

The dense (NT) construction is the oracle: every Kronecker-path quantity
(logML, posterior mean/variance, draw covariance) must match it; the T=1
case must reduce to the single-output model exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpx
from gpx.models import gp, multioutput as mo


def _params(t=3, rank=2, noise=0.05):
    w = jnp.asarray(np.random.default_rng(7).normal(size=(t, rank)) * 0.6)
    return mo.IcmParams(
        kernel=gpx.se(1.3, 0.9),
        w=w,
        kappa=jnp.asarray(np.full(t, 0.3)),
        noise=jnp.asarray(noise),
    )


def _data(n=24, t=3, d=1, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-3.0, 3.0, size=(n, d)))
    y = jnp.asarray(rng.normal(size=(n, t)))
    return x, y


def test_gram_full_is_spd_and_kron_ordered():
    p = _params()
    x, _ = _data()
    kfull = mo.gram_full(p, x, nugget=1e-8)
    n = x.shape[0]
    np.testing.assert_allclose(kfull, kfull.T, rtol=0, atol=1e-12)
    assert np.linalg.eigvalsh(np.asarray(kfull)).min() > 0
    # block (i, j) must be B[i, j] * Kxx (+ noise on i == j diagals)
    b = mo.coregion_matrix(p)
    kxx = p.kernel.gram(x)
    blk = kfull[:n, n : 2 * n]
    np.testing.assert_allclose(blk, b[0, 1] * kxx, rtol=1e-12)


def test_logml_kron_matches_dense():
    p = _params()
    x, y = _data()
    lk = mo.log_marginal_likelihood(p, x, y, method="kron")
    ld = mo.log_marginal_likelihood(p, x, y, method="dense")
    np.testing.assert_allclose(float(lk), float(ld), rtol=1e-9)


def test_logml_t1_reduces_to_single_output():
    # T=1: B = w^2 + kappa is a scalar amplitude; fold it into the SE h and
    # the noise into a White component — must equal the single-output logML
    w0, kap, noise = 0.8, 0.3, 0.05
    p = mo.IcmParams(
        kernel=gpx.se(1.3, 0.9),
        w=jnp.asarray([[w0]]),
        kappa=jnp.asarray([kap]),
        noise=jnp.asarray(noise),
    )
    x, y = _data(t=1)
    b = w0 * w0 + kap
    single = gpx.Parameters(
        mean=gpx.zero(), kernel=gpx.se(1.3 * b, 0.9) + gpx.white(noise)
    )
    got = mo.log_marginal_likelihood(p, x, y, nugget=1e-8)
    want = gp.log_marginal_likelihood(single, x, y[:, 0], nugget=1e-8)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-8)


def test_logml_rejects_kron_with_per_output_noise():
    p = _params()
    p = mo.IcmParams(kernel=p.kernel, w=p.w, kappa=p.kappa,
                     noise=jnp.asarray([0.05, 0.1, 0.2]))
    x, y = _data()
    with pytest.raises(ValueError, match="shared"):
        mo.log_marginal_likelihood(p, x, y, method="kron")
    # auto routes to dense and works
    assert np.isfinite(float(mo.log_marginal_likelihood(p, x, y)))


def test_fit_kron_matches_dense():
    p = _params()
    x, y = _data()
    xs = jnp.linspace(-3.0, 3.0, 9)[:, None]
    sk = mo.fit(p, x, y, xs, method="kron", nugget=1e-8)
    sd = mo.fit(p, x, y, xs, method="dense", nugget=1e-8)
    np.testing.assert_allclose(sk.mean, sd.mean, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(sk.variance, sd.variance, rtol=1e-6,
                               atol=1e-9)
    assert sk.mean.shape == (9, 3)
    assert (np.asarray(sk.variance) > 0).all()


def test_fit_interpolates_and_couples_outputs():
    # strong coupling: observing output 0 must move output 1's posterior
    t = 2
    p = mo.IcmParams(
        kernel=gpx.se(1.0, 1.0),
        w=jnp.asarray([[1.0], [0.95]]),
        kappa=jnp.asarray([1e-3, 1e-3]),
        noise=jnp.asarray(1e-4),
    )
    x = jnp.linspace(-2.0, 2.0, 12)[:, None]
    f = jnp.sin(1.7 * x[:, 0])
    y = jnp.stack([f, 0.95 * f], axis=1)
    s = mo.fit(p, x, y, x, nugget=1e-8)
    np.testing.assert_allclose(s.mean[:, 0], f, atol=5e-3)
    np.testing.assert_allclose(s.mean[:, 1], 0.95 * f, atol=5e-3)
    # posterior variance at training points far below prior (1 + 1e-3)
    assert float(s.variance.max()) < 0.1


def test_draw_covariance_matches_kronecker():
    # empirical second moment of many draws ~ B ⊗ K + D ⊗ I
    p = _params(t=2, rank=1, noise=0.02)
    x, _ = _data(n=6, t=2)
    m = 40_000
    keys = jax.random.split(jax.random.PRNGKey(3), m)
    draws = jax.vmap(lambda k: mo.draw(k, p, x, nugget=1e-8))(keys)
    v = np.asarray(draws).transpose(0, 2, 1).reshape(m, -1)  # output-major
    emp = v.T @ v / m
    want = np.asarray(mo.gram_full(p, x, nugget=1e-8))
    np.testing.assert_allclose(emp, want, atol=6e-2)


def test_logml_gradients_finite_and_match_fd():
    p = _params()
    x, y = _data()

    def f(p_):
        return mo.log_marginal_likelihood(p_, x, y, method="kron")

    grads = jax.grad(f)(p)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    # finite-difference check on the noise parameter (x64 CPU lane)
    eps = 1e-6
    p_hi = mo.IcmParams(kernel=p.kernel, w=p.w, kappa=p.kappa,
                        noise=p.noise + eps)
    p_lo = mo.IcmParams(kernel=p.kernel, w=p.w, kappa=p.kappa,
                        noise=p.noise - eps)
    fd = (float(f(p_hi)) - float(f(p_lo))) / (2 * eps)
    np.testing.assert_allclose(float(grads.noise), fd, rtol=1e-4)


def test_sample_mh_recovers_coupling():
    # simulate strongly coupled outputs; posterior over the coupling W must
    # concentrate away from zero and the chain must be healthy
    truth = mo.IcmParams(
        kernel=gpx.se(1.0, 1.2),
        w=jnp.asarray([[1.0], [0.9]]),
        kappa=jnp.asarray([0.05, 0.05]),
        noise=jnp.asarray(0.05),
    )
    x = jnp.linspace(-3.0, 3.0, 40)[:, None]
    y = mo.draw(jax.random.PRNGKey(0), truth, x)

    template = mo.icm(gpx.se(1.5, 1.0), n_outputs=2, rank=1,
                      kappa=0.2, noise=0.1)

    def log_prior(p):
        from gpx.distributions import Gamma, Normal

        g = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(2.0))
        nw = Normal(loc=jnp.asarray(0.0), scale=jnp.asarray(2.0))
        return (
            g.logpdf(p.kernel.h) + g.logpdf(p.kernel.sigma)
            + jnp.sum(nw.logpdf(p.w)) + jnp.sum(g.logpdf(p.kappa))
            + g.logpdf(p.noise)
        )

    post = mo.sample_mh(
        jax.random.PRNGKey(1), x, y, template, log_prior,
        n_samples=400, burn_in=200, n_chains=2, proposal_scale=0.08,
    )
    assert post.flat.shape[0] == 2
    assert np.isfinite(np.asarray(post.flat)).all()
    assert (np.asarray(post.accept_rate) > 0.05).all()
    names = post.names
    w0 = np.asarray(post.flat)[..., names.index("w_0")]
    w1 = np.asarray(post.flat)[..., names.index("w_1")]
    # coupling is identified up to a joint sign flip
    corr = np.sign(np.median(w0)) * np.sign(np.median(w1))
    assert corr > 0
    assert abs(np.median(np.abs(w0))) > 0.3


def test_optimize_improves_and_recovers_noise():
    truth = mo.IcmParams(
        kernel=gpx.se(1.0, 1.2),
        w=jnp.asarray([[1.0], [0.85]]),
        kappa=jnp.asarray([0.05, 0.05]),
        noise=jnp.asarray(0.05),
    )
    x = jnp.linspace(-3.0, 3.0, 50)[:, None]
    y = mo.draw(jax.random.PRNGKey(4), truth, x)
    template = mo.icm(gpx.se(1.5, 1.0), n_outputs=2, rank=1,
                      kappa=0.2, noise=0.3)
    res = mo.optimize(template, x, y, steps=60)
    # objective improved over the starting point and ended finite
    first = float(res.values[0])
    assert np.isfinite(float(res.value))
    assert float(res.value) > first
    # noise is the best-identified parameter; factor-2.5 at N=50
    fitted = float(res.params.noise)
    assert 0.02 < fitted < 0.125, fitted


def test_mask_all_true_matches_unmasked():
    p = _params()
    x, y = _data()
    full = np.ones(y.shape, dtype=bool)
    got = mo.log_marginal_likelihood(p, x, y, method="dense", mask=full)
    want = mo.log_marginal_likelihood(p, x, y, method="dense")
    np.testing.assert_allclose(float(got), float(want), rtol=1e-12)
    sm = mo.fit(p, x, y, x[:5], mask=full, nugget=1e-8)
    sd = mo.fit(p, x, y, x[:5], method="dense", nugget=1e-8)
    np.testing.assert_allclose(sm.mean, sd.mean, rtol=1e-10)
    np.testing.assert_allclose(sm.variance, sd.variance, rtol=1e-10)


def test_mask_logml_matches_manual_subblock():
    # oracle: build the observed sub-system by hand from gram_full
    p = _params(t=2, rank=1)
    x, y = _data(n=10, t=2)
    mask = np.ones((10, 2), dtype=bool)
    mask[6:, 1] = False               # sensor 1 down for the last 4 points
    got = mo.log_marginal_likelihood(p, x, y, mask=mask, nugget=1e-8)
    kfull = np.asarray(mo.gram_full(p, x, nugget=1e-8))
    v = np.asarray(y).T.reshape(-1)
    ix = np.flatnonzero(mask.T.reshape(-1))
    ko = kfull[np.ix_(ix, ix)]
    vo = v[ix]
    sign, logdet = np.linalg.slogdet(ko)
    want = -0.5 * (vo @ np.linalg.solve(ko, vo) + logdet
                   + ix.size * np.log(2 * np.pi))
    np.testing.assert_allclose(float(got), want, rtol=1e-9)
    # NaN placeholders in the masked-out entries must not leak
    y_nan = np.asarray(y).copy()
    y_nan[6:, 1] = np.nan
    got_nan = mo.log_marginal_likelihood(p, x, jnp.asarray(y_nan),
                                         mask=mask, nugget=1e-8)
    np.testing.assert_allclose(float(got_nan), want, rtol=1e-9)


def test_mask_fit_imputes_downed_sensor_from_neighbours():
    # strong coupling: with sensor 1 down over a window, its posterior there
    # must track sensor 0's signal and beat the prior uncertainty
    p = mo.IcmParams(
        kernel=gpx.se(1.0, 1.0),
        w=jnp.asarray([[1.0], [0.9]]),
        kappa=jnp.asarray([1e-3, 1e-3]),
        noise=jnp.asarray(1e-4),
    )
    x = jnp.linspace(-2.0, 2.0, 16)[:, None]
    f = jnp.sin(1.6 * x[:, 0])
    y = jnp.stack([f, 0.9 * f], axis=1)
    mask = np.ones((16, 2), dtype=bool)
    mask[8:, 1] = False
    s = mo.fit(p, x, y, x[8:], mask=mask, nugget=1e-8)
    # sensor 1 reconstructed from sensor 0 through B
    np.testing.assert_allclose(s.mean[:, 1], 0.9 * f[8:], atol=0.05)
    # and more uncertain than the observed sensor 0
    assert float(s.variance[:, 1].min()) > float(s.variance[:, 0].max())


def _lmc_params(t=2):
    return mo.LmcParams(
        terms=(
            mo.LmcTerm(kernel=gpx.se(1.0, 0.4),
                       w=jnp.asarray([[0.9], [0.7]]),
                       kappa=jnp.asarray([0.05, 0.05])),
            mo.LmcTerm(kernel=gpx.se(0.8, 3.0),
                       w=jnp.asarray([[0.5], [-0.8]]),
                       kappa=jnp.asarray([0.02, 0.02])),
        ),
        noise=jnp.asarray(0.04),
    )


def test_lmc_gram_full_is_sum_of_kroneckers():
    p = _lmc_params()
    x, _ = _data(n=8, t=2)
    got = np.asarray(mo.gram_full(p, x, nugget=1e-8))
    want = sum(
        np.kron(np.asarray(mo.coregion_matrix(tm)),
                np.asarray(tm.kernel.gram(x)))
        for tm in p.terms
    )
    want += np.diag(np.repeat([0.04, 0.04], 8)) + 1e-8 * np.eye(16)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    assert np.linalg.eigvalsh(got).min() > 0


def test_lmc_single_term_matches_icm():
    # Q=1 LMC must equal the ICM with the same kernel/W/kappa/noise
    icm_p = _params(t=2, rank=1)
    lmc_p = mo.LmcParams(
        terms=(mo.LmcTerm(kernel=icm_p.kernel, w=icm_p.w,
                          kappa=icm_p.kappa),),
        noise=icm_p.noise,
    )
    x, y = _data(n=12, t=2)
    got = mo.log_marginal_likelihood(lmc_p, x, y, nugget=1e-8)
    want = mo.log_marginal_likelihood(icm_p, x, y, nugget=1e-8,
                                      method="dense")
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)
    xs = x[:4]
    sl = mo.fit(lmc_p, x, y, xs, nugget=1e-8)
    si = mo.fit(icm_p, x, y, xs, nugget=1e-8, method="dense")
    np.testing.assert_allclose(sl.mean, si.mean, rtol=1e-9)
    np.testing.assert_allclose(sl.variance, si.variance, rtol=1e-9)


def test_lmc_rejects_kron():
    p = _lmc_params()
    x, y = _data(n=8, t=2)
    with pytest.raises(ValueError, match="ICM-only"):
        mo.log_marginal_likelihood(p, x, y, method="kron")
    with pytest.raises(ValueError, match="ICM-only"):
        mo.fit(p, x, y, x[:2], method="kron")


def test_lmc_draw_covariance():
    p = _lmc_params()
    x, _ = _data(n=5, t=2)
    m = 40_000
    keys = jax.random.split(jax.random.PRNGKey(9), m)
    draws = jax.vmap(lambda k: mo.draw(k, p, x, nugget=1e-8))(keys)
    v = np.asarray(draws).transpose(0, 2, 1).reshape(m, -1)
    emp = v.T @ v / m
    want = np.asarray(mo.gram_full(p, x, nugget=1e-8))
    np.testing.assert_allclose(emp, want, atol=6e-2)


def test_lmc_separates_fast_and_slow_components():
    # output 0 = fast + slow, output 1 = fast - slow (opposite slow
    # loading): an LMC with the right two kernels must forecast both, and
    # beat a single-kernel ICM on logML
    rng = np.random.default_rng(11)
    x = jnp.linspace(0.0, 8.0, 80)[:, None]
    slow = jnp.sin(0.7 * x[:, 0])
    fast = 0.5 * jnp.sin(5.0 * x[:, 0])
    y = jnp.stack([slow + fast, -slow + fast], axis=1)
    y = y + 0.02 * jnp.asarray(rng.normal(size=y.shape))

    template = mo.lmc([gpx.se(0.5, 0.4), gpx.se(0.5, 3.0)], n_outputs=2,
                      kappa=0.05, noise=0.05)
    res = mo.optimize(template, x, y, steps=80)
    assert np.isfinite(float(res.value))

    icm_t = mo.icm(gpx.se(0.5, 1.0), n_outputs=2, rank=1, kappa=0.05,
                   noise=0.05)
    res_icm = mo.optimize(icm_t, x, y, steps=80)
    assert float(res.value) > float(res_icm.value) + 10.0

    # the slow term's loadings must come out with opposite signs
    slows = [tm for tm in res.params.terms
             if float(tm.kernel.sigma) > 1.0]
    assert slows, [float(tm.kernel.sigma) for tm in res.params.terms]
    w = np.asarray(slows[0].w)[:, 0]
    assert w[0] * w[1] < 0, w


def test_lmc_mask_composes():
    p = _lmc_params()
    x, y = _data(n=10, t=2)
    mask = np.ones((10, 2), dtype=bool)
    mask[7:, 0] = False
    val = mo.log_marginal_likelihood(p, x, y, mask=mask, nugget=1e-8)
    assert np.isfinite(float(val))
    s = mo.fit(p, x, y, x[7:], mask=mask, nugget=1e-8)
    assert np.isfinite(np.asarray(s.mean)).all()
    assert (np.asarray(s.variance) > 0).all()


def test_posterior_draw_moments_match_fit():
    # tiny problem, many draws: empirical mean/marginal variance of the
    # joint posterior draws must match fit's exact marginals
    p = _params(t=2, rank=1, noise=0.1)
    x, y = _data(n=16, t=2)
    xs = jnp.linspace(-3.5, 3.5, 5)[:, None]
    draws = mo.posterior_draw(jax.random.PRNGKey(0), p, x, y, xs,
                              shape=(6000,))
    assert draws.shape == (6000, 5, 2)
    s = mo.fit(p, x, y, xs)
    np.testing.assert_allclose(np.asarray(draws.mean(0)),
                               np.asarray(s.mean), atol=0.05)
    np.testing.assert_allclose(np.asarray(draws.var(0)),
                               np.asarray(s.variance), rtol=0.15, atol=0.01)


def test_posterior_draw_joint_covariance_exact():
    # the full (MT) empirical covariance must match the dense posterior
    # covariance computed independently with numpy
    p = _params(t=2, rank=1, noise=0.1)
    x, y = _data(n=12, t=2)
    xs = jnp.linspace(-2.0, 2.0, 3)[:, None]
    n, t, m = 12, 2, 3
    kfull = np.asarray(mo.gram_full(p, x, nugget=gp.PREDICT_NUGGET))
    terms = mo._terms(p)
    cross = sum(
        np.einsum("ji,nm->jnim", np.asarray(bq), np.asarray(kern.gram(x, xs)))
        for kern, bq in terms
    ).reshape(t * n, t * m)
    kss = sum(
        np.einsum("ij,su->isju", np.asarray(bq), np.asarray(kern.gram(xs)))
        for kern, bq in terms
    ).reshape(t * m, t * m)
    kss += np.diag(np.repeat(np.asarray(mo._noise_vec(p)), m))
    want_cov = kss - cross.T @ np.linalg.solve(kfull, cross)

    draws = mo.posterior_draw(jax.random.PRNGKey(1), p, x, y, xs,
                              shape=(20000,))
    flat = np.moveaxis(np.asarray(draws), -1, -2).reshape(-1, t * m)
    emp = np.cov(flat.T)
    assert np.max(np.abs(emp - want_cov)) < 0.1 * max(np.abs(want_cov).max(),
                                                      1e-3)


def test_posterior_draw_mask_and_lmc():
    p = gpx.models.multioutput.lmc(
        [gpx.se(1.0, 0.5), gpx.se(0.6, 2.0)], 2, rank=1, noise=0.08
    )
    x, y = _data(n=14, t=2)
    mask = np.ones((14, 2), dtype=bool)
    mask[8:, 1] = False
    d = mo.posterior_draw(jax.random.PRNGKey(2), p, x, y, x[8:],
                          shape=(4,), mask=mask)
    assert d.shape == (4, 6, 2)
    assert bool(jnp.isfinite(d).all())
    # masked imputation centers on the masked fit's mean
    many = mo.posterior_draw(jax.random.PRNGKey(3), p, x, y, x[8:],
                             shape=(4000,), mask=mask)
    s = mo.fit(p, x, y, x[8:], mask=mask)
    np.testing.assert_allclose(np.asarray(many.mean(0)), np.asarray(s.mean),
                               atol=0.08)
