"""Distributed blocked Cholesky + logML over a device mesh.

The reference caps at a few thousand points because the whole Gram matrix
and its LAPACK factorization live on one CPU (SURVEY.md §5 long-context
analog). Here K is *row-block sharded* across the mesh and factorized with a
right-looking panel algorithm written in shard_map:

per column panel (width ``panel``):
  1. ``all_gather`` the panel column block over the mesh (O(N·panel) floats
     on ICI — the only communication);
  2. every chip redundantly factors the (panel, panel) diagonal block and
     trsm's the sub-panel (O(N·panel²) redundant MACs — ~5% of total work
     for panel << N);
  3. each chip applies the rank-``panel`` trailing update to its own rows —
     the O(N³) bulk, perfectly data-parallel on the MXU.

On top of the sharded factor: distributed half-log-determinant (local diag
sum + ``psum``) and a panel-sequential distributed forward solve whose only
communication is one ``psum`` of ``panel`` floats per panel — giving an
exact logML where no chip ever materializes the full K or L
(SURVEY.md §2.4 "distributed blocked Cholesky over ICI mesh").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec as P


def distributed_cholesky(k, mesh: Mesh, *, axis: str = "data",
                         panel: int = 128):
    """Lower Cholesky factor of SPD ``k``, computed with ``k`` row-sharded
    over ``mesh[axis]``. Returns the row-sharded lower-triangular factor.

    Requires ``N % n_devices == 0`` and ``(N / n_devices) % panel == 0``
    (panels must not straddle shard boundaries).
    """
    n = k.shape[-1]
    d = mesh.shape[axis]
    rows_per = n // d
    if n % d or rows_per % panel:
        raise ValueError(
            f"N={n} must split into {d} row shards of panel-multiple size "
            f"(panel={panel})"
        )
    n_panels = n // panel

    @partial(
        jax.shard_map, mesh=mesh, in_specs=P(axis, None), out_specs=P(axis, None)
    )
    def factorize(k_loc):
        my = lax.axis_index(axis)
        row0 = my * rows_per
        a = k_loc
        for p in range(n_panels):
            s, e = p * panel, (p + 1) * panel
            # 1. gather the current panel column block (already updated by
            #    all previous panels' trailing updates)
            full_col = lax.all_gather(a[:, s:e], axis, tiled=True)  # (N, panel)
            # 2. redundant small factorization on every chip
            l_pp = jnp.linalg.cholesky(full_col[s:e])
            below = full_col[e:]                                    # (N-e, panel)
            l_below = solve_triangular(l_pp, below.T, lower=True).T
            l_col = jnp.concatenate(
                [
                    jnp.zeros((s, panel), a.dtype),
                    l_pp,
                    l_below,
                ],
                axis=0,
            )                                                        # (N, panel)
            l_col_loc = lax.dynamic_slice_in_dim(l_col, row0, rows_per, 0)
            a = a.at[:, s:e].set(l_col_loc)
            # 3. local trailing update of owned rows (rows above the panel
            #    only touch the dead upper triangle, masked at the end)
            if e < n:
                a = a.at[:, e:].add(
                    -jnp.matmul(
                        l_col_loc, l_below.T, preferred_element_type=a.dtype
                    )
                )
        rows_g = row0 + lax.broadcasted_iota(jnp.int32, (rows_per, 1), 0)
        cols = lax.broadcasted_iota(jnp.int32, (1, n), 1)
        return jnp.where(cols > rows_g, jnp.zeros_like(a), a)

    return factorize(k)


def distributed_half_logdet(l_sharded, mesh: Mesh, *, axis: str = "data"):
    """``sum log diag(L)`` with L row-sharded: local gather + psum."""
    n = l_sharded.shape[-1]
    d = mesh.shape[axis]
    rows_per = n // d

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis, None), out_specs=P())
    def half_logdet(l_loc):
        my = lax.axis_index(axis)
        row0 = my * rows_per
        idx = row0 + jnp.arange(rows_per)
        diag = jnp.take_along_axis(l_loc, idx[:, None], axis=1)[:, 0]
        return lax.psum(jnp.sum(jnp.log(diag)), axis)

    return half_logdet(l_sharded)


def distributed_forward_solve(l_sharded, b, mesh: Mesh, *, axis: str = "data",
                              panel: int = 128):
    """Solve ``L u = b`` with L row-sharded (replicated vector ``b``):
    panel-sequential substitution, one ``psum`` of ``panel`` floats per
    panel. Returns the replicated solution."""
    n = l_sharded.shape[-1]
    d = mesh.shape[axis]
    rows_per = n // d
    if rows_per % panel:
        raise ValueError("panel must divide the per-device row count")
    n_panels = n // panel
    panels_per_dev = rows_per // panel

    @partial(
        jax.shard_map, mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P()
    )
    def solve(l_loc, b_rep):
        my = lax.axis_index(axis)
        row0 = my * rows_per
        # residual z for OWNED rows; u assembled replicated panel by panel
        z_loc = lax.dynamic_slice_in_dim(b_rep, row0, rows_per, 0)
        u = jnp.zeros((n,), l_loc.dtype)
        for p in range(n_panels):
            s = p * panel
            owner = p // panels_per_dev
            local_off = (p % panels_per_dev) * panel
            # every chip solves its candidate block (garbage off-owner)
            l_pp = lax.dynamic_slice(
                l_loc, (local_off, s), (panel, panel)
            )
            z_p = lax.dynamic_slice_in_dim(z_loc, local_off, panel, 0)
            cand = solve_triangular(l_pp, z_p, lower=True)
            u_p = lax.psum(
                jnp.where(my == owner, cand, jnp.zeros_like(cand)), axis
            )
            u = lax.dynamic_update_slice_in_dim(u, u_p, s, 0)
            # update local residuals for the solved panel's columns
            cols = lax.dynamic_slice(l_loc, (0, s), (rows_per, panel))
            z_loc = z_loc - cols @ u_p
        return u

    return solve(l_sharded, b)


def distributed_logml(params, x, y, mesh: Mesh, *, axis: str = "data",
                      nugget: float = 1e-3, panel: int = 128):
    """Exact GP marginal log-likelihood with the Gram build, Cholesky, and
    solves all sharded over the mesh — the fully distributed version of
    GaussianProcess.loglikelihood (GaussianProcess.scala:109-127)."""
    from gpx.ops.distance import as_locations
    from gpx.parallel.sharded import sharded_gram

    x = as_locations(x)
    n = x.shape[0]
    k = sharded_gram(params.kernel, x, mesh, nugget=nugget, axes=(axis, None))
    l = distributed_cholesky(k, mesh, axis=axis, panel=panel)
    resid = y - params.mean(x)
    u = distributed_forward_solve(l, resid, mesh, axis=axis, panel=panel)
    half_logdet = distributed_half_logdet(l, mesh, axis=axis)
    return -0.5 * u @ u - half_logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)
