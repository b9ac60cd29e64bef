"""GP classification: Laplace fit mode conditions, prediction accuracy on
separable toys — including the predict path the reference never implemented
(Classify.scala:150-152)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpx import se
from gpx.models import classify


def test_softmax_and_encode():
    f = jnp.array([[1.0, 0.0], [0.0, 2.0]])
    pi = classify.softmax_probs(f)
    np.testing.assert_allclose(np.asarray(pi).sum(0), 1.0, rtol=1e-12)
    oh = classify.encode_labels(jnp.array([0, 1, 1]), 2)
    np.testing.assert_array_equal(np.asarray(oh), [[1, 0, 0], [0, 1, 1]])


def test_softmax_log_likelihood_matches_direct(rng):
    f = jnp.asarray(rng.normal(size=(3, 10)))
    y = jnp.asarray(rng.integers(0, 3, size=10))
    oh = classify.encode_labels(y, 3).astype(f.dtype)
    got = float(classify.softmax_log_likelihood(f, oh))
    want = sum(
        float(jax.nn.log_softmax(f[:, i])[int(y[i])]) for i in range(10)
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)


def _two_class_toy(rng, n_per=15):
    x0 = rng.normal(size=(n_per, 1)) - 2.0
    x1 = rng.normal(size=(n_per, 1)) + 2.0
    x = np.concatenate([x0, x1])
    y = np.concatenate([np.zeros(n_per, int), np.ones(n_per, int)])
    return jnp.asarray(x), jnp.asarray(y)


def test_fit_mode_conditions(rng):
    x, y = _two_class_toy(rng)
    kern = se(2.0, 2.0)
    fitres = classify.fit(x, kern, y, 2)
    assert int(fitres.n_iters) < 50
    assert np.isfinite(float(fitres.log_marginal))
    # at the softmax-Laplace mode: f = K (y_onehot - pi)
    resid = np.asarray(fitres.y_onehot - fitres.pi)
    f_check = np.einsum("cij,cj->ci", np.asarray(fitres.k), resid)
    np.testing.assert_allclose(np.asarray(fitres.f), f_check, atol=1e-4)
    # mode separates the classes
    pred_class = np.asarray(fitres.pi).argmax(0)
    assert (pred_class == np.asarray(y)).mean() > 0.9


def test_predict_separable(rng):
    x, y = _two_class_toy(rng, n_per=20)
    kern = se(2.0, 2.0)
    fitres = classify.fit(x, kern, y, 2)
    xs = jnp.array([[-3.0], [-2.0], [2.0], [3.0]])
    probs = classify.predict(jax.random.PRNGKey(0), fitres, x, kern, xs)
    probs = np.asarray(probs)
    assert probs.shape == (4, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-6)
    assert (probs[:2, 0] > 0.7).all()   # left points -> class 0
    assert (probs[2:, 1] > 0.7).all()   # right points -> class 1
    # far from data the latent variance grows -> probabilities less extreme
    far = classify.predict(
        jax.random.PRNGKey(1), fitres, x, kern, jnp.array([[30.0]])
    )
    assert abs(float(far[0, 0]) - 0.5) < 0.2


def test_three_class_2d(rng):
    centers = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    xs, ys = [], []
    for c, ctr in enumerate(centers):
        xs.append(rng.normal(size=(12, 2)) * 0.7 + ctr)
        ys.append(np.full(12, c))
    x = jnp.asarray(np.concatenate(xs))
    y = jnp.asarray(np.concatenate(ys))
    kern = se(2.0, 2.0)
    fitres = classify.fit(x, kern, y, 3)
    probs = classify.predict(
        jax.random.PRNGKey(2), fitres, x, kern, jnp.asarray(centers)
    )
    assert np.asarray(probs).argmax(-1).tolist() == [0, 1, 2]


def test_latent_predict_matches_direct_laplace(rng):
    # Regression (ADVICE r1): the cross-class predictive covariance must be
    # Sigma_cd = b_c^T (sum E)^{-1} b_d + delta_cd (kss - b_c^T k*_c), i.e.
    # the (sum E)^{-1} solve applied PER class. Brute-force check against a
    # direct dense inversion of the Laplace posterior over the full (C*N)
    # latent vector: Sigma* = diag(kss) - Q^T (I + W K)^{-1} W Q.
    c, n, m = 3, 12, 4
    x = jnp.asarray(rng.normal(size=(n, 2)))
    xs = jnp.asarray(rng.normal(size=(m, 2)))
    y = jnp.asarray(rng.integers(0, c, size=n))
    kerns = [se(1.5, 1.2), se(0.8, 2.0), se(2.0, 0.9)]
    fitres = classify.fit(x, kerns, y, c)
    mu, sigma = classify.latent_predict(fitres, x, kerns, xs)

    k_full = np.zeros((c * n, c * n))
    for ci in range(c):
        k_full[ci * n:(ci + 1) * n, ci * n:(ci + 1) * n] = np.asarray(
            fitres.k[ci]
        )
    pi = np.asarray(fitres.pi)                       # (C, N)
    d = np.diag(pi.reshape(-1))
    pimat = np.zeros((c * n, n))                     # stacked diag(pi_c)
    for ci in range(c):
        pimat[ci * n:(ci + 1) * n] = np.diag(pi[ci])
    w = d - pimat @ pimat.T                          # softmax Hessian
    minv = np.linalg.solve(np.eye(c * n) + w @ k_full, w)  # (K + W^-1)^-1

    from gpx.ops.gram import gram as gram_fn

    kxs = np.stack([np.asarray(gram_fn(kern, x, xs)) for kern in kerns])
    kss = np.stack([np.asarray(kern.diag(xs, dtype=fitres.f.dtype))
                    for kern in kerns])
    for mi in range(m):
        q = np.zeros((c * n, c))
        for ci in range(c):
            q[ci * n:(ci + 1) * n, ci] = kxs[ci, :, mi]
        sigma_direct = np.diag(kss[:, mi]) - q.T @ minv @ q
        np.testing.assert_allclose(
            np.asarray(sigma[mi]), sigma_direct, atol=1e-6
        )
        mu_direct = np.einsum(
            "cn,cn->c", np.asarray(fitres.y_onehot - fitres.pi), kxs[:, :, mi]
        )
        np.testing.assert_allclose(np.asarray(mu[:, mi]), mu_direct, atol=1e-8)


def test_per_class_kernels(rng):
    x, y = _two_class_toy(rng)
    fitres = classify.fit(x, [se(2.0, 2.0), se(1.0, 3.0)], y, 2)
    assert np.isfinite(float(fitres.log_marginal))
    assert fitres.k.shape == (2, 30, 30)
    assert not np.allclose(np.asarray(fitres.k[0]), np.asarray(fitres.k[1]))
