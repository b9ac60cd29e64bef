"""Aux subsystems (SURVEY.md §5): safe Cholesky escalation, determinism
(golden-value with fixed PRNG keys — the on-device analog of race
detection), config system, profiling harness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpx import Parameters, se, white, zero
from gpx.infer import sample_mh
from gpx.models import gp
from gpx.ops.safe_chol import chol_ok, safe_cholesky
from gpx.utils import config as cfg
from gpx.utils.profiling import StageTimer, timeit

from .util import symmetric_pos_def


def test_safe_cholesky_psd_uses_base(rng):
    m = jnp.asarray(symmetric_pos_def(rng, 30, 100.0))
    result = safe_cholesky(m)
    assert not bool(result.failed)
    assert float(result.nugget_used) == 0.0
    np.testing.assert_allclose(
        np.asarray(result.chol @ result.chol.T), np.asarray(m), rtol=1e-8
    )


def test_safe_cholesky_escalates_on_singular(rng):
    # rank-deficient: ones outer product
    v = jnp.ones(20)
    m = jnp.outer(v, v)
    result = safe_cholesky(m)
    assert not bool(result.failed)
    assert float(result.nugget_used) > 0.0
    assert bool(chol_ok(result.chol))


def test_safe_cholesky_reports_failure():
    m = -jnp.eye(10)  # negative definite: no nugget on the ladder fixes it
    result = safe_cholesky(m, max_escalations=2)
    assert bool(result.failed)


def test_safe_logml_rejects_degenerate_params(rng):
    # zero-lengthscale-free but duplicate-location degenerate Gram: without
    # the white term the Gram is singular at duplicated points
    x = jnp.zeros((12, 1))  # all-duplicate locations -> rank-1 SE Gram
    p = Parameters(mean=zero(), kernel=se(2.0, 3.0))
    y = jnp.asarray(rng.normal(size=12))
    val = gp.log_marginal_likelihood(p, x, y, nugget=0.0, safe=True)
    assert not bool(jnp.isnan(val))  # either finite (escalated) or -inf


def test_tangent_grams_match_jacobian(rng):
    from gpx.ops.gram import gram, tangent_grams

    x = jnp.asarray(rng.uniform(-3, 3, size=(10, 1)))
    kern = se(2.0, 3.0) + white(0.4)
    tangents = tangent_grams(kern, x)
    leaves_t = jax.tree_util.tree_leaves(tangents)
    # finite-difference check on each hyperparameter
    import dataclasses as _dc

    leaves, treedef = jax.tree_util.tree_flatten(kern)
    eps = 1e-6
    for i, t in enumerate(leaves_t):
        lp = [l + (eps if j == i else 0.0) for j, l in enumerate(leaves)]
        lm = [l - (eps if j == i else 0.0) for j, l in enumerate(leaves)]
        kp = gram(jax.tree_util.tree_unflatten(treedef, lp), x)
        km = gram(jax.tree_util.tree_unflatten(treedef, lm), x)
        fd = (np.asarray(kp) - np.asarray(km)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(t), fd, atol=1e-6)


def test_contour_plot(tmp_path, rng):
    from gpx import plots

    x = rng.uniform(0, 5, size=(40, 2))
    v = np.sin(x[:, 0]) + x[:, 1]
    assert plots.savefig(plots.contour_plot(x, v), tmp_path / "c.png").exists()
    import pytest

    with pytest.raises(ValueError):
        plots.contour_plot(x[:, :1], v)


def test_sampler_determinism(rng):
    # fixed keys -> bitwise identical chains across runs (golden-value
    # determinism, SURVEY.md §5 race-detection analog)
    x = jnp.asarray(rng.uniform(-5, 5, size=(20, 1)))
    p = Parameters(mean=zero(), kernel=se(2.0, 3.0) + white(0.4))
    y = gp.draw(jax.random.PRNGKey(1), p, x)

    def run():
        from gpx.distributions import Gamma

        def prior(pp):
            g = Gamma(concentration=jnp.asarray(2.0), rate=jnp.asarray(0.5))
            a, b = pp.kernel.kernels
            return g.logpdf(a.h) + g.logpdf(a.sigma) + g.logpdf(b.sigma)

        return sample_mh(
            jax.random.PRNGKey(2), x, y, p, prior, n_samples=50, n_chains=2
        )

    r1, r2 = run(), run()
    np.testing.assert_array_equal(np.asarray(r1.flat), np.asarray(r2.flat))


def test_config_cli_and_json(tmp_path):
    @cfg.config
    class ExpConfig:
        n_iters: int = 1000
        proposal_scale: float = 0.1
        name: str = "simulated"
        use_pallas: bool = False

    c = ExpConfig()
    c2 = cfg.from_cli(c, ["--n-iters", "500", "--use-pallas", "true",
                          "--proposal-scale", "0.2"])
    assert c2.n_iters == 500 and c2.use_pallas is True
    assert abs(c2.proposal_scale - 0.2) < 1e-12
    path = cfg.save(c2, tmp_path / "cfg.json")
    c3 = cfg.load(ExpConfig, path)
    assert c3 == c2

    import pytest

    with pytest.raises(SystemExit):
        cfg.from_cli(c, ["--nope", "1"])


def test_profiling_harness():
    timer = StageTimer()
    with timer.stage("a"):
        pass
    with timer.stage("a"):
        pass
    report = timer.report()
    assert "a" in report and "mean ms" in report

    mean_s, result = timeit(jax.jit(lambda v: v * 2), jnp.ones(8), reps=3)
    assert mean_s >= 0 and float(result[0]) == 2.0


def test_aot_cached_compile_multi_device(tmp_path, rng):
    """Round-3: cached_compile persists mesh programs that span EVERY
    local device (a deserialized executable binds to all local devices, so
    that is exactly when the rebind is correct — measured incl. shard_map
    collectives); programs narrower than the process topology still bypass
    the store while returning a working compiled function."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from gpx.parallel import make_mesh
    from gpx.utils.aot import cached_compile

    x = jnp.asarray(rng.normal(size=(64, 64)))

    def f(a):
        return jnp.sin(a) @ a.T

    c1 = cached_compile(f, x, cache_dir=tmp_path)
    out1 = c1(x)
    assert list(tmp_path.glob("*.pkl")) == []     # 1-dev program: no store
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(jnp.sin(x) @ x.T), rtol=1e-12
    )

    mesh = make_mesh(data=8)

    @partial(jax.shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
    def g(a):
        return jax.lax.psum(jnp.sum(a * a), "data")

    want = float(jnp.sum(x[:, 0] * x[:, 0]))
    c2 = cached_compile(g, x[:, 0], cache_dir=tmp_path)
    assert len(list(tmp_path.glob("*.pkl"))) == 1  # mesh program: stored
    np.testing.assert_allclose(float(c2(x[:, 0])), want, rtol=1e-6)
    c3 = cached_compile(g, x[:, 0], cache_dir=tmp_path)  # hit path
    np.testing.assert_allclose(float(c3(x[:, 0])), want, rtol=1e-6)
