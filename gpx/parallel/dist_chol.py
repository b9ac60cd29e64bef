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

import functools
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec as P


def _zeros_vma(shape, ref, minus=()):
    """Zeros of ``shape`` carrying ``ref``'s varying-manual-axes annotation
    (optionally minus the axes in ``minus``) — fori_loop/scan carries under
    ``shard_map`` must enter the loop with the vma set they acquire inside
    it: device-varying data flows in through ``axis_index`` selects and the
    sharded operands, while a ``psum`` over an axis removes it."""
    z = jnp.zeros(shape, ref.dtype)
    vma = tuple(jax.typeof(ref).vma - set(minus))
    return lax.pcast(z, vma, to="varying") if vma else z


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

    body = partial(chol_body, axis=axis, n=n, panel=panel)
    return jax.shard_map(
        body, mesh=mesh, in_specs=P(axis, None), out_specs=P(axis, None)
    )(k)


def chol_body(k_loc, *, axis: str, n: int, panel: int = 128,
              stages: int = 8):
    """Per-device body of :func:`distributed_cholesky` — callable inside
    ANY ``shard_map`` whose mesh has ``axis`` (e.g. nested under a chains
    axis, gpx.parallel.sharded.sample_mh_2d).

    Panels run in a ``lax.fori_loop`` (static trip count -> scan under the
    hood, so reverse-mode AD through the factorization still works) grouped
    into at most ``stages`` statically-shaped stages: XLA needs static
    shapes inside the loop, so the trailing update of stage ``g`` spans the
    fixed column slab ``[g*n/stages, n)`` with already-finished columns
    masked to zero. Compile time is O(stages) regardless of ``n/panel``
    (the round-2 version unrolled every panel in Python: 128 unrolled
    bodies at the production N=16k/panel=128 point blew up compile), at
    the cost of a ~(1 + 1/stages)/2 factor of extra masked update MACs."""
    rows_per = k_loc.shape[0]
    n_panels = n // panel
    my = lax.axis_index(axis)
    row0 = my * rows_per
    g_count = min(stages, n_panels)
    while n_panels % g_count:
        g_count -= 1
    pps = n_panels // g_count                      # panels per stage
    rows = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    a = k_loc
    for g in range(g_count):
        cs = g * pps * panel                       # static slab start
        w = n - cs                                 # static slab width

        def stage_body(q, a, *, g=g, cs=cs, w=w):
            p = g * pps + q
            s = p * panel
            e = s + panel
            # 1. gather the current panel column block (already updated
            #    by all previous panels' trailing updates)
            col_loc = lax.dynamic_slice(a, (0, s), (rows_per, panel))
            full_col = lax.all_gather(col_loc, axis, tiled=True)  # (N, panel)
            # 2. redundant small factorization on every chip; the trsm
            #    runs over all N rows (static shape) — rows outside
            #    [e, N) are masked off below
            diag = lax.dynamic_slice(full_col, (s, 0), (panel, panel))
            l_pp = jnp.linalg.cholesky(diag)
            sol = solve_triangular(l_pp, full_col.T, lower=True).T
            l_below = jnp.where(rows >= e, sol, 0.0)              # (N, panel)
            l_col = lax.dynamic_update_slice(l_below, l_pp, (s, 0))
            l_col_loc = lax.dynamic_slice_in_dim(l_col, row0, rows_per, 0)
            a = lax.dynamic_update_slice(a, l_col_loc, (0, s))
            # 3. local trailing update of owned rows over the stage's
            #    static column slab; l_below's zeroed rows < e make the
            #    already-finished columns of the slab a no-op (rows above
            #    the panel only touch the dead upper triangle, masked at
            #    the end)
            below_slab = lax.slice_in_dim(l_below, cs, n, axis=0)  # (w, panel)
            # HIGHEST: the trailing update is a matrix-matrix product; the
            # TPU's single-pass bf16 default (5.8e-4 rel) would compound
            # across the panel chain (tests run on CPU, where the default
            # is faithful — this only bites on real chips)
            upd = jnp.matmul(
                l_col_loc, below_slab.T, preferred_element_type=a.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            slab = lax.dynamic_slice(a, (0, cs), (rows_per, w))
            return lax.dynamic_update_slice(a, slab - upd, (0, cs))

        a = lax.fori_loop(0, pps, stage_body, a, unroll=False)
    rows_g = row0 + lax.broadcasted_iota(jnp.int32, (rows_per, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return jnp.where(cols > rows_g, jnp.zeros_like(a), a)


def distributed_half_logdet(l_sharded, mesh: Mesh, *, axis: str = "data"):
    """``sum log diag(L)`` with L row-sharded: local gather + psum."""
    body = partial(half_logdet_body, axis=axis)
    return jax.shard_map(
        body, mesh=mesh, in_specs=P(axis, None), out_specs=P()
    )(l_sharded)


def half_logdet_body(l_loc, *, axis: str):
    """Per-device body of :func:`distributed_half_logdet`."""
    rows_per = l_loc.shape[0]
    my = lax.axis_index(axis)
    row0 = my * rows_per
    idx = row0 + jnp.arange(rows_per)
    diag = jnp.take_along_axis(l_loc, idx[:, None], axis=1)[:, 0]
    return lax.psum(jnp.sum(jnp.log(diag)), axis)


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
    body = partial(forward_solve_body, axis=axis, n=n, panel=panel)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P()
    )(l_sharded, b)


def forward_solve_body(l_loc, b_rep, *, axis: str, n: int, panel: int = 128):
    """Per-device body of :func:`distributed_forward_solve`."""
    rows_per = l_loc.shape[0]
    n_panels = n // panel
    panels_per_dev = rows_per // panel
    my = lax.axis_index(axis)
    row0 = my * rows_per
    # residual z for OWNED rows; u assembled replicated panel by panel.
    # lax.fori_loop (static trip count -> reverse-differentiable): compile
    # time is O(1) in n_panels instead of the round-2 Python unroll.
    z0 = (lax.dynamic_slice_in_dim(b_rep, row0, rows_per, 0)
          + _zeros_vma((rows_per,), l_loc))
    eye = jnp.eye(panel, dtype=l_loc.dtype)

    def body(p, carry):
        z_loc, u = carry
        s = p * panel
        owner = p // panels_per_dev
        local_off = (p % panels_per_dev) * panel
        # every chip solves its candidate block; off-owner blocks can be
        # singular (zeroed upper triangle), and although the result is
        # masked out below, inf/NaN primals would poison reverse-mode AD
        # through solve_triangular — substitute the identity off-owner
        l_pp = lax.dynamic_slice(
            l_loc, (local_off, s), (panel, panel)
        )
        l_pp = jnp.where(my == owner, l_pp, eye)
        z_p = lax.dynamic_slice_in_dim(z_loc, local_off, panel, 0)
        cand = solve_triangular(l_pp, z_p, lower=True)
        u_p = lax.psum(
            jnp.where(my == owner, cand, jnp.zeros_like(cand)), axis
        )
        u = lax.dynamic_update_slice_in_dim(u, u_p, s, 0)
        # update local residuals for the solved panel's columns
        cols = lax.dynamic_slice(l_loc, (0, s), (rows_per, panel))
        return z_loc - cols @ u_p, u

    _, u = lax.fori_loop(
        0, n_panels, body, (z0, _zeros_vma((n,), l_loc, minus=(axis,)))
    )
    return u


def logml_body(params, x_loc, y_rep, *, axis: str, n: int,
               nugget: float = 1e-3, panel: int = 128):
    """Exact GP logML computed entirely inside a ``shard_map`` body with
    the data row-sharded over ``axis`` — the composable form of
    :func:`distributed_logml` (GaussianProcess.loglikelihood,
    GaussianProcess.scala:109-127). Gram rows are built locally from the
    all-gathered locations (O(N D) comms), then the panel Cholesky /
    solve / logdet bodies run over the same axis. Usable under an outer
    chains axis (gpx.parallel.sharded.sample_mh_2d)."""
    rows_per = x_loc.shape[0]
    my = lax.axis_index(axis)
    row0 = my * rows_per
    x_full = lax.all_gather(x_loc, axis, tiled=True)          # (N, D)
    k_loc = params.kernel.gram(x_loc, x_full, method="xla")   # (rows, N)
    rows_g = row0 + lax.broadcasted_iota(jnp.int32, (rows_per, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    k_loc = jnp.where(cols == rows_g, k_loc + nugget, k_loc)
    l_loc = chol_body(k_loc, axis=axis, n=n, panel=panel)
    resid = y_rep - params.mean(x_full)
    u = forward_solve_body(l_loc, resid, axis=axis, n=n, panel=panel)
    half_logdet = half_logdet_body(l_loc, axis=axis)
    return -0.5 * u @ u - half_logdet - 0.5 * n * jnp.log(2.0 * jnp.pi)


def distributed_back_solve(l_sharded, b, mesh: Mesh, *, axis: str = "data",
                           panel: int = 128):
    """Solve ``L^T a = b`` with L row-sharded (replicated ``b``), reverse
    panel sweep. Per panel: one ``psum`` of the solved ``panel`` block plus
    one ``psum`` of the owner's length-``n`` residual update (the owner's
    row block of L is exactly the column block of ``L^T`` it needs — no
    matrix data ever moves). Returns the replicated solution.

    Completes the triangular-solve pair (the ``Mcmc.backSolve`` capability,
    Mcmc.scala:35-58, at mesh scale) so ``alpha = K^{-1} r`` runs fully
    distributed."""
    n = l_sharded.shape[-1]
    d = mesh.shape[axis]
    rows_per = n // d
    if rows_per % panel:
        raise ValueError("panel must divide the per-device row count")
    n_panels = n // panel
    panels_per_dev = rows_per // panel
    col_idx = jnp.arange(n)

    @partial(
        jax.shard_map, mesh=mesh, in_specs=(P(axis, None), P()), out_specs=P()
    )
    def solve(l_loc, b_rep):
        my = lax.axis_index(axis)
        eye = jnp.eye(panel, dtype=l_loc.dtype)

        def body(i, carry):
            z, a = carry
            p = n_panels - 1 - i                   # reverse panel sweep
            s = p * panel
            owner = p // panels_per_dev
            local_off = (p % panels_per_dev) * panel
            # identity off-owner: see distributed_forward_solve (AD safety)
            l_pp = lax.dynamic_slice(l_loc, (local_off, s), (panel, panel))
            l_pp = jnp.where(my == owner, l_pp, eye)
            z_p = lax.dynamic_slice_in_dim(z, s, panel, 0)
            cand = solve_triangular(l_pp.T, z_p, lower=False)
            a_p = lax.psum(
                jnp.where(my == owner, cand, jnp.zeros_like(cand)), axis
            )
            a = lax.dynamic_update_slice_in_dim(a, a_p, s, 0)
            # z_j -= sum_{i in panel} L[i, j] a_i for j < s: the owner's
            # local rows of panel p against all earlier columns
            rows_block = lax.dynamic_slice(l_loc, (local_off, 0), (panel, n))
            upd = rows_block.T @ a_p
            upd = lax.psum(
                jnp.where(my == owner, upd, jnp.zeros_like(upd)), axis
            )
            return z - jnp.where(col_idx < s, upd, 0.0), a

        _, a = lax.fori_loop(
            0, n_panels, body,
            (b_rep + _zeros_vma((n,), l_loc, minus=(axis,)),
             _zeros_vma((n,), l_loc, minus=(axis,))),
        )
        return a

    return solve(l_sharded, b)


def distributed_forward_solve_cols(l_sharded, b_sharded, mesh: Mesh, *,
                                   axis: str = "data", panel: int = 128):
    """Solve ``L A = B`` with both L and the (n, m) RHS row-sharded; the
    solution comes back row-sharded too (no chip ever holds a full (n, m)
    array). Per panel: one ``psum`` of the solved ``(panel, m)`` block —
    total ICI traffic n*m floats for the whole solve."""
    n = l_sharded.shape[-1]
    m = b_sharded.shape[-1]
    d = mesh.shape[axis]
    rows_per = n // d
    if rows_per % panel:
        raise ValueError("panel must divide the per-device row count")
    n_panels = n // panel
    panels_per_dev = rows_per // panel

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)), out_specs=P(axis, None),
    )
    def solve(l_loc, b_loc):
        my = lax.axis_index(axis)
        eye = jnp.eye(panel, dtype=l_loc.dtype)

        def body(p, carry):
            z_loc, a_loc = carry
            s = p * panel
            owner = p // panels_per_dev
            local_off = (p % panels_per_dev) * panel
            # identity off-owner: see distributed_forward_solve (AD safety)
            l_pp = lax.dynamic_slice(l_loc, (local_off, s), (panel, panel))
            l_pp = jnp.where(my == owner, l_pp, eye)
            z_p = lax.dynamic_slice(z_loc, (local_off, 0), (panel, m))
            cand = solve_triangular(l_pp, z_p, lower=True)
            u_p = lax.psum(
                jnp.where(my == owner, cand, jnp.zeros_like(cand)), axis
            )
            a_new = lax.dynamic_update_slice(a_loc, u_p, (local_off, 0))
            a_loc = jnp.where(my == owner, a_new, a_loc)
            cols = lax.dynamic_slice(l_loc, (0, s), (rows_per, panel))
            # HIGHEST: multi-RHS u_p makes this a matrix-matrix product
            # (the single-RHS solve above is a faithful matvec)
            return z_loc - jnp.matmul(
                cols, u_p, precision=jax.lax.Precision.HIGHEST
            ), a_loc

        a0 = _zeros_vma((rows_per, m), l_loc)
        z0 = b_loc + _zeros_vma((rows_per, m), l_loc)
        _, a_loc = lax.fori_loop(0, n_panels, body, (z0, a0))
        return a_loc

    return solve(l_sharded, b_sharded)


def sharded_cross_gram(kernel, x, xs, mesh: Mesh, *, axis: str = "data"):
    """Cross-covariance ``K(x, xs)`` row-sharded over the training axis —
    the distributed ``buildDistCov`` (KernelFunction.scala:94-109, whose
    row-0 bug SURVEY.md §7 documents)."""
    from gpx.ops.distance import as_locations

    x = as_locations(x)
    xs = as_locations(xs)
    d = mesh.shape[axis]
    rows_per = x.shape[0] // d

    @partial(
        jax.shard_map, mesh=mesh, in_specs=(P(axis, None), P(None, None)),
        out_specs=P(axis, None),
    )
    def build(x_blk, xs_rep):
        return kernel.gram(x_blk, xs_rep, method="xla")

    return build(x, xs)


def distributed_predict(params, x, y, xs, mesh: Mesh, *, axis: str = "data",
                        nugget: float = 1e-6, panel: int = 128):
    """GP posterior at ``xs`` with every O(N^2) object row-sharded: Gram,
    factor, cross-covariance and the trsm'd ``A = L^{-1} K(x, xs)`` — no
    chip holds an (N, N) or full (N, M) array, replacing sharded_predict's
    full-L broadcast (gpx/parallel/sharded.py) at memory scale. Rebuilds
    Predict.fit (Predict.scala:57-94) as: distributed Cholesky ->
    distributed alpha (forward + backward vector solves) -> mean via psum'd
    partial products -> variance via the row-sharded column solve."""
    from gpx.models import gp
    from gpx.ops.distance import as_locations
    from gpx.parallel.sharded import sharded_gram

    x = as_locations(x)
    xs = as_locations(xs)
    n = x.shape[0]
    d = mesh.shape[axis]
    rows_per = n // d

    k = sharded_gram(params.kernel, x, mesh, nugget=nugget, axes=(axis, None))
    l = distributed_cholesky(k, mesh, axis=axis, panel=panel)
    u = distributed_forward_solve(
        l, y - params.mean(x), mesh, axis=axis, panel=panel
    )
    alpha = distributed_back_solve(l, u, mesh, axis=axis, panel=panel)

    kxs = sharded_cross_gram(params.kernel, x, xs, mesh, axis=axis)
    a = distributed_forward_solve_cols(l, kxs, mesh, axis=axis, panel=panel)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P()), out_specs=(P(), P()),
    )
    def moments(kxs_loc, a_loc, alpha_rep):
        my = lax.axis_index(axis)
        alpha_loc = lax.dynamic_slice_in_dim(
            alpha_rep, my * rows_per, rows_per, 0
        )
        mean_part = lax.psum(kxs_loc.T @ alpha_loc, axis)
        var_red = lax.psum(jnp.sum(a_loc * a_loc, axis=0), axis)
        return mean_part, var_red

    mean_part, var_red = moments(kxs, a, alpha)
    mean = params.mean(xs) + mean_part
    kss = params.kernel.diag(xs, dtype=mean.dtype)
    var = jnp.maximum(kss - var_red, 0.0)
    return gp.PosteriorSummary(x=xs, mean=mean, variance=var)


def distributed_logml_value_and_grad(params, x, y, mesh: Mesh, *,
                                     axis: str = "data", nugget: float = 1e-3,
                                     panel: int = 128):
    """Value AND hyperparameter gradient of the distributed logML — the
    north-star quantity (SURVEY.md §3.3) with K and L row-sharded end to
    end. Autodiff through the sharded factorization: the VJP of each
    panel's ``all_gather`` is a reduce-scatter and of each ``psum`` a
    broadcast, so the backward pass rides ICI exactly like the forward
    (no gather of K anywhere). Runs under ``jit``: eager shard_map
    transposition trips a sharding-override assertion in jax 0.9. The
    jitted function is cached per (mesh, axis, nugget, panel) so repeated
    calls (optimizer/sampler loops) hit jit's trace cache instead of
    recompiling a fresh lambda every time (review finding; compiles cost
    30-120 s in this environment).

    When the mesh spans every local device, the compiled executable is
    additionally persisted via the on-disk AOT cache
    (gpx.utils.aot.cached_compile), so a NEW process with the same
    topology skips the multi-minute distributed compile entirely —
    disable with ``GPX_AOT_CACHE=0``. TPU-family backends only: the XLA
    *CPU* runtime loses fused-function symbols when deserializing these
    shard_map programs (measured round 3: "Buffer Definition Event:
    Function ... not found" at invocation, cross-process too), so on CPU
    the whole layer is bypassed unless ``GPX_AOT_CACHE_DIST=1`` forces it
    (the test lane forces it to cover the persist/key logic; the reload
    path is chip-verified — see gpx/utils/aot.py)."""
    fn = _dlvg_jitted(mesh, axis, float(nugget), int(panel))
    cpu_ok = os.environ.get("GPX_AOT_CACHE_DIST") == "1"
    if (os.environ.get("GPX_AOT_CACHE", "1") != "0"
            and (jax.default_backend() != "cpu" or cpu_ok)
            and set(mesh.devices.flat) == set(jax.local_devices())):
        key = (mesh.shape_tuple, mesh.axis_names, axis, float(nugget),
               int(panel), jax.tree_util.tree_structure((params, x, y)),
               tuple((v.shape, str(v.dtype))
                     for v in jax.tree_util.tree_leaves((params, x, y))))
        cached = _DLVG_EXECUTABLES.get(key)
        if cached is None:
            try:
                from gpx.utils.aot import cached_compile

                cached = cached_compile(fn, params, x, y)
            except Exception:
                cached = False           # lowering/serialization quirk:
            while len(_DLVG_EXECUTABLES) >= 16:   # bounded, like _dlvg_jitted:
                _DLVG_EXECUTABLES.pop(            # executables pin device
                    next(iter(_DLVG_EXECUTABLES)))  # programs for the process
            _DLVG_EXECUTABLES[key] = cached  # remember, don't retry per call
        if cached is not False:
            return cached(params, x, y)
    return fn(params, x, y)


_DLVG_EXECUTABLES: dict = {}


@functools.lru_cache(maxsize=16)
def _dlvg_jitted(mesh, axis, nugget, panel):
    # bounded: keyed by Mesh, so an unbounded cache would pin every mesh a
    # long-lived driver ever constructs (plus its compiled program) for the
    # process lifetime; 16 covers any realistic set of live meshes
    return jax.jit(
        jax.value_and_grad(
            lambda p, x, y: distributed_logml(
                p, x, y, mesh, axis=axis, nugget=nugget, panel=panel
            )
        )
    )


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
