"""Diagnostics (ACF/ESS/R̂), plots render, CSV/checkpoint round trips."""

import jax
import jax.numpy as jnp
import numpy as np

from gpx import Parameters, se, white, zero
from gpx import diagnostics as diag
from gpx import io, plots
from gpx.models import gp


def test_acf_white_noise_near_zero(rng):
    x = rng.normal(size=5000)
    rho = diag.acf(x, 20)
    assert rho[0] == 1.0
    assert np.abs(rho[1:]).max() < 0.08


def test_acf_ar1_matches_theory(rng):
    # AR(1) with phi: acf(lag) ~ phi^lag
    phi = 0.8
    n = 20000
    x = np.zeros(n)
    eps = rng.normal(size=n)
    for i in range(1, n):
        x[i] = phi * x[i - 1] + eps[i]
    rho = diag.acf(x, 5)
    np.testing.assert_allclose(rho[1:], phi ** np.arange(1, 6), atol=0.05)


def test_ess_iid_and_correlated(rng):
    iid = rng.normal(size=4000)
    assert diag.ess(iid) > 2500
    phi = 0.9
    x = np.zeros(4000)
    for i in range(1, 4000):
        x[i] = phi * x[i - 1] + rng.normal()
    # theory: ess ~ n (1-phi)/(1+phi) ~ 210
    assert diag.ess(x) < 1000


def test_split_rhat(rng):
    good = rng.normal(size=(4, 2000))
    assert abs(diag.split_rhat(good) - 1.0) < 0.02
    bad = rng.normal(size=(4, 2000)) + np.arange(4)[:, None] * 3.0
    assert diag.split_rhat(bad) > 1.5


def test_summary_table(rng):
    flat = rng.normal(size=(2, 500, 3))
    rows = diag.summary(flat, ["a", "b", "c"])
    assert set(rows) == {"a", "b", "c"}
    assert abs(rows["a"]["mean"]) < 0.2
    txt = diag.format_summary(rows)
    assert "rhat" in txt and "a" in txt


def test_plots_render(tmp_path, rng):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = gp.sample_points(k1, -10.0, 10.0, 60)
    p = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    y = gp.draw(k2, p, x)
    xs = jnp.linspace(-10, 10, 200)
    summary = gp.fit(p, x, y, xs)

    assert plots.savefig(plots.scatter_plot(x, y), tmp_path / "scatter.png").exists()
    assert plots.savefig(plots.gp_plot(summary, obs=(x, y)), tmp_path / "gp.png").exists()
    curves = rng.normal(size=(5, 200))
    assert plots.savefig(plots.pp_plot(xs, curves), tmp_path / "pp.png").exists()
    flat = rng.normal(size=(2, 300, 3))
    assert plots.savefig(
        plots.diagnostic_plots(flat, ["h", "sigma", "sigma_y"]), tmp_path / "diag.png"
    ).exists()
    assert plots.savefig(plots.autocorrelation_plot(flat[0, :, 0]), tmp_path / "acf.png").exists()


def test_csv_round_trip(tmp_path, rng):
    flat = rng.normal(size=(3, 100, 4))
    names = ["h", "sigma", "sigma_y", "beta_0"]
    paths = io.write_chains_csv(tmp_path / "chain.csv", flat, names)
    assert [p.name for p in paths] == ["chain_0.csv", "chain_1.csv", "chain_2.csv"]
    back, names2 = io.read_chain_csv(paths[1])
    assert names2 == names
    np.testing.assert_allclose(back, flat[1], rtol=1e-12)
    thinned, _ = io.read_chain_csv(paths[1], burn_in=20, thin=4)
    np.testing.assert_allclose(thinned, flat[1][20::4], rtol=1e-12)


def test_checkpoint_round_trip(tmp_path):
    p = Parameters(mean=zero(), kernel=se(3.0, 5.5) + white(0.5))
    state = {"params": p, "key": jax.random.PRNGKey(7), "eps": jnp.asarray(0.1)}
    path = io.save_checkpoint(tmp_path / "ckpt.pkl", state)
    restored = io.load_checkpoint(path)
    assert jax.tree_util.tree_structure(restored) == jax.tree_util.tree_structure(state)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
