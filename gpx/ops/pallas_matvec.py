"""Matrix-free Gram matvec: ``K(x, x) @ V`` without materializing K.

The dense paths cap at N~16k on one chip because K is O(N^2) HBM (1 GB at
16k, 17 GB at 65k). This kernel streams (bt, bt) Gram tiles through VMEM —
recomputing squared distances and the kernel algebra per tile, multiplying
into the RHS block on the MXU, and accumulating per row block — so memory is
O(N (D + R)) and the iterative path (CG solves + stochastic Lanczos
quadrature, gpx.models.gp_iterative) scales to N >= 100k. This is the
"blocked/streamed Gram tiles so K never fully materializes" design of
SURVEY.md §2.4/§5 (long-context analog).

Supports batched right-hand sides (CG probes + Lanczos vectors amortize the
tile recompute across columns).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpx.ops.distance import as_locations
from gpx.ops.pallas_gram import _tile_sq_dist

_BT = 1024


def _matvec_kernel(*refs, treedef, d, bt, nb, nugget, n_params,
                   exact=False):
    x_i, x_j, v_j = refs[0], refs[1], refs[2]
    param_refs = refs[3 : 3 + n_params]
    out_ref = refs[3 + n_params]
    acc = refs[4 + n_params]

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    rows = i * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, bt), 0)
    cols = j * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, bt), 1)
    diag = rows == cols
    r2 = jnp.maximum(_tile_sq_dist(x_i[:], x_j[:], d, exact), 0.0)
    r2 = jnp.where(diag, 0.0, r2)

    kernel = jax.tree_util.tree_unflatten(
        treedef, [ref[0, 0] for ref in param_refs]
    )
    k_tile = kernel.evaluate_r2(r2)
    if nugget:
        k_tile = jnp.where(diag, k_tile + jnp.float32(nugget), k_tile)

    # HIGHEST precision: the MXU's default single-pass bf16 multiply loses
    # ~3 decimal digits, which breaks CG (the operator must act like a
    # symmetric f32 matrix); measured error 0.6 vs 2e-4 at N=8192
    acc[:] += jnp.dot(
        k_tile,
        v_j[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(j == nb - 1)
    def _write():
        out_ref[:] = acc[:]


def gram_matvec(kernel, x, v, *, nugget: float = 0.0, bt: int = _BT,
                interpret: bool = False):
    """``(K(x, x) + nugget I) @ v`` with K streamed tile-by-tile.

    ``v``: (N,) or (N, R). N must be a multiple of ``bt`` for the Pallas
    path; otherwise (and off-TPU) an XLA row-blocked fallback runs.
    """
    from gpx.kernels import has_white, unwrap_ard

    x = as_locations(x)
    # ARD rides the Pallas tile path as its isotropic base on scaled coords
    kernel, x, _ = unwrap_ard(kernel, x)
    # translation-invariant centering for f32 distance accuracy
    # (see gpx.ops.distance.sq_distances)
    x = x - jax.lax.stop_gradient(jnp.mean(x, axis=0, keepdims=True))
    n, d = x.shape
    squeeze = v.ndim == 1
    v2 = v[:, None] if squeeze else v
    r = v2.shape[1]

    use_pallas = (
        (jax.default_backend() == "tpu" or interpret)
        and kernel.is_stationary
        and kernel.pallas_safe
        and n % bt == 0
        and r <= 512
    )
    if not use_pallas:
        out = _gram_matvec_xla(kernel, x, v2, nugget)
        return out[:, 0] if squeeze else out

    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    smem_params = [jnp.asarray(p, jnp.float32).reshape(1, 1) for p in leaves]
    nb = n // bt
    body = functools.partial(
        _matvec_kernel, treedef=treedef, d=d, bt=bt, nb=nb,
        nugget=float(nugget), n_params=len(leaves),
        # White at D > 8: exact tile distances so duplicated points keep
        # r2 == 0 — the operator must match the dense gram's semantics
        # (gpx.ops.pallas_gram round-4 fix)
        exact=d > 8 and has_white(kernel),
    )
    out = pl.pallas_call(
        body,
        grid=(nb, nb),
        in_specs=[
            pl.BlockSpec((bt, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, r), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
            for _ in smem_params
        ],
        out_specs=pl.BlockSpec((bt, r), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, r), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, r), jnp.float32)],
        # wide RHS batches push the (bt, bt) k_tile + (bt, r) buffers past
        # the 16 MB default scoped-VMEM cap (measured at r = 256)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(x, jnp.float32),
        jnp.asarray(v2, jnp.float32),
        *smem_params,
    )
    out = out.astype(v2.dtype)
    return out[:, 0] if squeeze else out


def _cross_kernel(*refs, treedef, d, bt, nb2, n_params, exact=False):
    x_i, x_j, v_j = refs[0], refs[1], refs[2]
    param_refs = refs[3 : 3 + n_params]
    out_ref = refs[3 + n_params]
    acc = refs[4 + n_params]

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    r2 = jnp.maximum(_tile_sq_dist(x_i[:], x_j[:], d, exact), 0.0)
    kernel = jax.tree_util.tree_unflatten(
        treedef, [ref[0, 0] for ref in param_refs]
    )
    k_tile = kernel.evaluate_r2(r2)
    acc[:] += jnp.dot(
        k_tile,
        v_j[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(j == nb2 - 1)
    def _write():
        out_ref[:] = acc[:]


def cross_matvec(kernel, x1, x2, v, *, bt: int = _BT,
                 interpret: bool = False):
    """``K(x1, x2) @ v`` with the cross-covariance streamed tile-by-tile —
    the prediction-path analog of :func:`gram_matvec` (``Kxs^T alpha`` at
    O(N1 (D + R)) memory; rebuilds Predict.buildDistVec + the mean
    contraction of Predict.scala:89-91 without materializing K(x*, x)).

    ``v``: (N2,) or (N2, R). Falls back to the XLA row-blocked path when
    shapes don't tile or off-TPU. No nugget/White-diagonal terms: between
    distinct location sets the diagonal is not special (duplicate points
    across sets still get White's r == 0 contribution via exact zeros for
    D <= 8, as in the dense cross gram)."""
    from gpx.kernels import unwrap_ard

    x1 = as_locations(x1)
    x2 = as_locations(x2)
    kernel, x1, x2 = unwrap_ard(kernel, x1, x2)
    center = jax.lax.stop_gradient(jnp.mean(x2, axis=0, keepdims=True))
    x1 = x1 - center
    x2 = x2 - center
    n1, d = x1.shape
    n2 = x2.shape[0]
    squeeze = v.ndim == 1
    v2 = v[:, None] if squeeze else v
    r = v2.shape[1]

    use_pallas = (
        (jax.default_backend() == "tpu" or interpret)
        and kernel.is_stationary
        and kernel.pallas_safe
        and n1 % bt == 0
        and n2 % bt == 0
        and r <= 512
    )
    if not use_pallas:
        out = _cross_matvec_xla(kernel, x1, x2, v2)
        return out[:, 0] if squeeze else out

    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    smem_params = [jnp.asarray(p, jnp.float32).reshape(1, 1) for p in leaves]
    nb1, nb2 = n1 // bt, n2 // bt
    from gpx.kernels import has_white

    body = functools.partial(
        _cross_kernel, treedef=treedef, d=d, bt=bt, nb2=nb2,
        n_params=len(leaves),
        # duplicate points ACROSS sets must keep White's r2 == 0 at D > 8
        exact=d > 8 and has_white(kernel),
    )
    out = pl.pallas_call(
        body,
        grid=(nb1, nb2),
        in_specs=[
            pl.BlockSpec((bt, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, r), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
            for _ in smem_params
        ],
        out_specs=pl.BlockSpec((bt, r), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n1, r), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        jnp.asarray(x1, jnp.float32),
        jnp.asarray(x2, jnp.float32),
        jnp.asarray(v2, jnp.float32),
        *smem_params,
    )
    out = out.astype(v2.dtype)
    return out[:, 0] if squeeze else out


def _cross_matvec_xla(kernel, x1, x2, v2, block: int = 2048):
    """Row-blocked XLA fallback for :func:`cross_matvec` (checkpointed, so
    the VJP recomputes cross-Gram tiles instead of storing them)."""
    from gpx.kernels import has_white
    from gpx.ops.distance import sq_distances

    n1 = x1.shape[0]
    pad = (-n1) % block
    xp = jnp.pad(x1, ((0, pad), (0, 0)))
    rows = xp.reshape(-1, block, x1.shape[1])
    exact = x1.shape[1] > 8 and has_white(kernel)

    @jax.checkpoint
    def row_block(kernel, xb):
        r2 = jnp.maximum(sq_distances(xb, x2, exact=exact), 0.0)
        # HIGHEST: matrix RHS — see _gram_matvec_xla
        return jnp.matmul(kernel.evaluate_xx(xb, x2, r2), v2,
                          precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(lambda xb: row_block(kernel, xb), rows)
    return out.reshape(-1, v2.shape[1])[:n1]


def _gram_matvec_xla(kernel, x, v2, nugget, block: int = 2048):
    """Row-blocked fallback: O(block * N) peak memory. Differentiable w.r.t.
    the kernel hyperparameters: each row block is ``jax.checkpoint``-ed so
    the VJP *recomputes* its Gram tile instead of storing it — without the
    remat, ``lax.map``'s saved residuals are O(N^2) and OOM at N=65k."""
    from gpx.kernels import has_white
    from gpx.ops.distance import sq_distances

    n = x.shape[0]
    pad = (-n) % block
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    rows = xp.reshape(-1, block, x.shape[1])
    exact = x.shape[1] > 8 and has_white(kernel)

    @jax.checkpoint
    def row_block(kernel, i, xb):
        r2 = sq_distances(xb, x, exact=exact)
        # restore exact-zero diagonal for White within this row block
        g_rows = i * block + jnp.arange(block)
        cols = jnp.arange(n)
        diag = g_rows[:, None] == cols[None, :]
        r2 = jnp.where(diag, 0.0, r2)
        kb = kernel.evaluate_xx(xb, x, r2)
        if nugget:
            kb = jnp.where(diag, kb + nugget, kb)
        # HIGHEST: with a multi-column RHS this is a matrix-matrix product,
        # and the chip's single-pass bf16 default loses ~3 digits — the
        # same CG-breaking loss the Pallas kernel guards against at :57.
        # (Caught on-chip at N=512, which misses the Pallas n % bt == 0
        # gate: the fallback operator read 3.4e-3 off the f64 oracle.)
        return jnp.matmul(kb, v2, precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(
        lambda args: row_block(kernel, *args), (jnp.arange(rows.shape[0]), rows)
    )
    return out.reshape(-1, v2.shape[1])[:n]
