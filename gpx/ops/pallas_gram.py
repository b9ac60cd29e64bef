"""Fused Pallas TPU kernel: pairwise squared distance + kernel algebra + nugget.

This is the TPU-native replacement for the reference's hot Gram path — an
O(N^2) scalar JVM loop building a distance matrix
(GaussianProcess.distanceMatrix, GaussianProcess.scala:50-61) followed by a
per-entry kernel map (KernelFunction.buildCov, KernelFunction.scala:84-89).
Here each (bm, bn) tile of K is produced in one VMEM-resident pass: the
squared distances never round-trip to HBM, the kernel sum/product algebra is
applied in-register, and the diagonal nugget is fused in.

Works for any :class:`gpx.kernels.Kernel` pytree: the kernel's scalar
hyperparameters are streamed in as SMEM scalars and the kernel object is
rebuilt inside the kernel body via ``tree_unflatten``, so ``evaluate_r2``
traces its (pure jnp) math straight into the Pallas program — including
through ``Sum``/``Product`` combinators.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpx.ops.distance import as_locations

# Tile sizes: multiples of the f32 (8, 128) VMEM tile; 256x256 f32 tiles keep
# r2 + K + a few kernel-algebra temporaries well under the ~16 MB VMEM budget.
_BM = 256
_BN = 256


def _tile_sq_dist(x1b, x2b, d: int, exact: bool = False):
    """Squared distances between row blocks. For the small D of spatial GPs
    (1-2, Location.scala:5-13) a broadcast-subtract on the VPU beats an MXU
    contraction over a length-D axis; for wide inputs use the MXU identity.
    ``exact`` forces the subtract form at any D — set when the kernel has a
    White term, whose ``r2 == 0`` test must fire at duplicated points (the
    MXU identity can round coincident points to tiny nonzero values)."""
    if exact or d <= 8:
        r2 = jnp.zeros((x1b.shape[0], x2b.shape[0]), dtype=jnp.float32)
        for k in range(d):
            diff = x1b[:, k][:, None] - x2b[:, k][None, :]
            r2 = r2 + diff * diff
        return r2
    n1 = jnp.sum(x1b * x1b, axis=-1)
    n2 = jnp.sum(x2b * x2b, axis=-1)
    dot = jax.lax.dot_general(
        x1b,
        x2b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return n1[:, None] + n2[None, :] - 2.0 * dot


def _gram_kernel(*refs, treedef, d, symmetric, nugget, bm, bn, exact=False):
    x1_ref, x2_ref = refs[0], refs[1]
    param_refs = refs[2:-1]
    out_ref = refs[-1]

    i = pl.program_id(0)
    j = pl.program_id(1)

    x1b = x1_ref[:].astype(jnp.float32)
    x2b = x2_ref[:].astype(jnp.float32)
    r2 = jnp.maximum(_tile_sq_dist(x1b, x2b, d, exact), 0.0)

    if symmetric:
        rows = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        cols = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        diag = rows == cols
        # exact zero on the diagonal so White's ``r2 == 0`` test fires
        # (KernelFunction.scala:33-35)
        r2 = jnp.where(diag, 0.0, r2)

    kernel = jax.tree_util.tree_unflatten(
        treedef, [ref[0, 0] for ref in param_refs]
    )
    k = kernel.evaluate_r2(r2)
    if symmetric and nugget:
        k = jnp.where(diag, k + jnp.float32(nugget), k)
    out_ref[:] = k


def pallas_gram(
    kernel,
    x,
    x2=None,
    *,
    nugget: float = 0.0,
    interpret: bool = False,
):
    """Fused Gram matrix. Matches ``gram(..., method="xla")`` to fp32
    round-off; computed in fp32 (the TPU-native precision for this path).

    Differentiable: the forward pass is the Pallas kernel; the backward pass
    (needed because ``jax.grad`` of the marginal likelihood flows through the
    Gram) is the VJP of the fused XLA expression — see ``_pg_bwd``.
    """
    x = as_locations(x)
    symmetric = x2 is None
    x2a = x if symmetric else as_locations(x2)
    # translation-invariant centering for f32 distance accuracy
    # (see gpx.ops.distance.sq_distances)
    center = jax.lax.stop_gradient(jnp.mean(x, axis=0, keepdims=True))
    x = x - center
    x2a = x if symmetric else x2a - center
    return _pg(kernel, x, x2a, symmetric, float(nugget), bool(interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _pg(kernel, x, x2a, symmetric: bool, nugget: float, interpret: bool):
    n1, d = x.shape
    n2 = x2a.shape[0]

    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    smem_params = [jnp.asarray(p, jnp.float32).reshape(1, 1) for p in leaves]

    bm, bn = min(_BM, _round_up(n1, 8)), min(_BN, _round_up(n2, 128))
    grid = (pl.cdiv(n1, bm), pl.cdiv(n2, bn))

    from gpx.kernels import has_white

    body = functools.partial(
        _gram_kernel,
        treedef=treedef,
        d=d,
        symmetric=symmetric,
        nugget=float(nugget),
        bm=bm,
        bn=bn,
        # White at D > 8: exact (subtract-form) tile distances so duplicated
        # points keep r2 == 0 (see _tile_sq_dist)
        exact=d > 8 and has_white(kernel),
    )

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
            for _ in smem_params
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(x, jnp.float32), jnp.asarray(x2a, jnp.float32), *smem_params)
    return out


def _pg_reference(kernel, x, x2a, symmetric: bool, nugget: float):
    """The fused XLA expression the Pallas kernel implements — used for the
    backward pass (its VJP is exactly d(gram)/d(params, x))."""
    from gpx.kernels import has_white
    from gpx.ops.distance import sq_distances

    r2 = sq_distances(x, None if symmetric else x2a,
                      exact=x.shape[-1] > 8 and has_white(kernel))
    k = kernel.evaluate_r2(r2)
    if symmetric and nugget:
        k = k + nugget * jnp.eye(k.shape[-1], dtype=k.dtype)
    return k


def _pg_fwd(kernel, x, x2a, symmetric, nugget, interpret):
    out = _pg(kernel, x, x2a, symmetric, nugget, interpret)
    return out, (kernel, x, x2a)


def _pg_bwd(symmetric, nugget, interpret, residuals, g):
    kernel, x, x2a = residuals
    primal, vjp = jax.vjp(
        lambda k_, x_, x2_: _pg_reference(k_, x_, x2_, symmetric, nugget),
        kernel,
        x,
        x2a,
    )
    return vjp(g.astype(primal.dtype))


_pg.defvjp(_pg_fwd, _pg_bwd)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m
