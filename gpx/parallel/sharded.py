"""Sharded GP operations: 2-D sharded Gram, data-sharded logML, test-point
sharded prediction, and chains sharded across chips.

Design (SURVEY.md §2.4 mapping table): sharding is expressed with
``PartitionSpec`` annotations under ``jit`` — XLA GSPMD inserts the ICI
collectives (``all_gather`` for the Cholesky panel, ``psum`` for reductions);
nothing here hand-writes an NCCL analog. The embarrassingly parallel axes
(chains; test points in prediction) use ``shard_map`` so each chip runs its
block with zero communication.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, random
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpx.models import gp
from gpx.ops.distance import as_locations
from gpx.params import Parameters


def sharded_gram(kernel, x, mesh: Mesh, *, nugget: float = 0.0,
                 axes=("i", "j")):
    """Symmetric Gram with the output 2-D sharded over ``axes`` of ``mesh``
    — K never lives whole on one chip. The row/column blocks of locations are
    all-gathered (cheap: O(N D) vs O(N^2) for K)."""
    x = as_locations(x)

    @partial(jax.jit, out_shardings=NamedSharding(mesh, P(*axes)))
    def build(x):
        return kernel.gram(x, nugget=nugget, method="xla")

    return build(x)


def sharded_logml(params: Parameters, x, y, mesh: Mesh, *,
                  nugget: float = gp.LOGML_NUGGET, data_axis: str = "data"):
    """logML with the Gram build sharded over the data axis. The Cholesky
    itself is not partitionable by GSPMD (it gathers K), so this shards the
    O(N^2) construction and keeps the O(N^3) factorization chip-local —
    the distributed blocked Cholesky is the planned upgrade (SURVEY.md §7
    hard parts)."""
    x = as_locations(x)

    @jax.jit
    def f(params, x, y):
        kxx = params.kernel.gram(x, nugget=nugget, method="xla")
        kxx = jax.lax.with_sharding_constraint(
            kxx, NamedSharding(mesh, P(data_axis, None))
        )
        from gpx.ops.chol import cholesky, forward_solve

        l = cholesky(kxx)
        resid = y - params.mean(x)
        u = forward_solve(l, resid)
        n = x.shape[0]
        return (
            -0.5 * u @ u
            - jnp.sum(jnp.log(jnp.diagonal(l)))
            - 0.5 * n * jnp.log(2.0 * jnp.pi)
        )

    return f(params, x, y)


def sharded_predict(params: Parameters, x, y, xs, mesh: Mesh, *,
                    nugget: float = gp.PREDICT_NUGGET, axis: str = "data"):
    """GPML Alg 2.1 with test points sharded across chips: each chip builds
    its (N, M/n_dev) cross-covariance block, runs the batched trsm on its
    columns, and emits its slice of (mean, var) — zero inter-chip traffic
    after the broadcast of L (the scalable axis for the N>=16k dense-grid
    config, BASELINE.json config 5)."""
    from gpx.ops.chol import cholesky, forward_solve

    x = as_locations(x)
    xs = as_locations(xs)
    n_shards = mesh.shape[axis]
    m = xs.shape[0]
    if m % n_shards:
        raise ValueError(f"test points ({m}) must divide over mesh axis ({n_shards})")

    kxx = params.kernel.gram(x, nugget=nugget, method="xla")
    l = cholesky(kxx)
    v = forward_solve(l, y - params.mean(x))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    def block(l, v, xs_blk):
        from gpx.models.gp import _chunked_forward_solve

        kxs = params.kernel.gram(x, xs_blk, method="xla")
        a = _chunked_forward_solve(l, kxs)  # bounds XLA's wide-trsm temps
        mean = params.mean(xs_blk) + a.T @ v
        kss = params.kernel.diag(xs_blk, dtype=mean.dtype)
        var = jnp.maximum(kss - jnp.sum(a * a, axis=0), 0.0)
        return mean, var

    mean, var = jax.jit(block)(l, v, xs)
    return gp.PosteriorSummary(x=xs, mean=mean, variance=var)


def sample_chains_sharded(step, init_state, key, n_samples: int,
                          n_chains: int, mesh: Mesh, *, chains_axis: str = "chains",
                          burn_in: int = 0, thin: int = 1,
                          collect=lambda s: s):
    """vmapped chains sharded across chips: ``n_chains`` must divide over the
    mesh's chains axis; each chip scans its chains independently (the
    scaled-out version of the reference's 2 JVM threads)."""
    from gpx.infer import base

    n_shards = mesh.shape[chains_axis]
    if n_chains % n_shards:
        raise ValueError(f"n_chains ({n_chains}) must divide {n_shards} shards")

    init_states = jax.tree_util.tree_map(
        lambda l: jnp.broadcast_to(jnp.asarray(l), (n_chains, *jnp.shape(l))),
        init_state,
    )
    keys = random.split(key, n_chains)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(chains_axis), P(chains_axis)),
        out_specs=P(chains_axis),
    )
    def run(keys_blk, inits_blk):
        return jax.vmap(
            lambda k, s: base.sample(
                step, s, k, n_samples, burn_in=burn_in, thin=thin, collect=collect
            )
        )(keys_blk, inits_blk)

    return jax.jit(run)(keys, init_states)


def sample_mh_2d(
    key,
    x,
    y,
    template: Parameters,
    log_prior,
    n_samples: int,
    mesh: Mesh,
    *,
    chains_axis: str = "chains",
    data_axis: str = "data",
    proposal_scale: float = 0.15,
    burn_in: int = 0,
    thin: int = 1,
    nugget: float = gp.LOGML_NUGGET,
    init_jitter: float = 0.1,
    panel: int = 128,
    n_chains: int | None = None,
):
    """MH hyperparameter sampling on a 2-D ``(chains, data)`` mesh: chains
    spread over ``chains_axis`` while EVERY logML evaluation inside every
    chain runs the distributed panel Cholesky over ``data_axis`` — no chip
    ever holds the full Gram (ROADMAP item 6; scales SURVEY §2.4's mapping
    of SimulatedGp.scala:163-165's threaded chains to a mesh whose other
    axis also shards the O(N^2)/O(N^3) work).

    ``n_chains`` defaults to one chain per mesh row and may be any multiple
    of ``mesh.shape[chains_axis]``: each row runs its ``k`` chains vmapped
    (batched Grams/factorizations — better MXU utilization than ``k``
    sequential sweeps), so e.g. a 2x4 mesh can run 8+ chains. Returns the
    same ``PosteriorSamples`` packaging as ``gpx.infer.mcmc.sample_mh``.
    """
    from gpx.infer import base, mh
    from gpx.infer.mcmc import _disperse, _package
    from gpx.parallel.dist_chol import logml_body

    x = as_locations(x)
    n = x.shape[0]
    rows = mesh.shape[chains_axis]
    n_chains = rows if n_chains is None else n_chains
    if n_chains % rows:
        raise ValueError(
            f"n_chains ({n_chains}) must be a multiple of the chains axis "
            f"({rows})"
        )
    d_data = mesh.shape[data_axis]
    if n % d_data or (n // d_data) % panel:
        raise ValueError(
            f"N={n} must split into {d_data} row shards of panel-multiple "
            f"size (panel={panel})"
        )

    bij_tree = template.bijectors()
    logpost0, flat0, unravel = mh.make_unconstrained_log_posterior(
        lambda c: jnp.asarray(0.0), template
    )
    k_init, k_run = random.split(key)
    inits = _disperse(k_init, flat0, n_chains, init_jitter)
    keys = random.split(k_run, n_chains)

    from gpx import params as gparams

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(chains_axis, None), P(chains_axis, None),
                  P(data_axis, None), P()),
        out_specs=P(chains_axis),
    )
    def run(keys_blk, inits_blk, x_loc, y_rep):
        def log_posterior(flat):
            u = unravel(flat)
            c = gparams.constrain(bij_tree, u)
            ll = logml_body(
                c, x_loc, y_rep, axis=data_axis, n=n, nugget=nugget,
                panel=panel,
            )
            return (
                ll + log_prior(c) + gparams.log_det_jacobian(bij_tree, u)
            )

        step = mh.kernel(log_posterior, mh.gaussian_random_walk(proposal_scale))

        def one_chain(k, f0):
            st = mh.init(f0, log_posterior)
            # constant-initialized state components (accept counter) are
            # 'unvarying' over the chains axis in shard_map's manual-axes
            # typing, but the scan body makes them varying — cast up front
            def _vary(leaf):
                if chains_axis in getattr(jax.typeof(leaf), "vma", ()):
                    return leaf
                return lax.pcast(leaf, (chains_axis,), to="varying")

            st = jax.tree_util.tree_map(_vary, st)
            res = base.sample(
                step, st, k, n_samples, burn_in=burn_in, thin=thin,
                collect=lambda s: s.position,
            )
            return res.samples, res.accept_rate

        # the row's k chains run vmapped: the batched collectives keep an
        # identical schedule on every device of the data row, and the
        # Gram/Cholesky work arrives batched at the MXU
        return jax.vmap(one_chain)(keys_blk, inits_blk)

    samples, accept = jax.jit(run)(keys, inits, x, y)
    return _package(template, bij_tree, unravel, samples, accept, {})
