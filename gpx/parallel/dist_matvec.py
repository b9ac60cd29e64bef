"""Distributed streamed Gram matvec: the matrix-free path across chips.

The single-chip iterative engine (gpx.models.gp_iterative, SURVEY.md §5
long-context analog) bounds N by one chip's O(N^2) matvec FLOPs. Here the
ROW RANGE of ``K = k(x, x) + diag`` is sharded over a mesh axis: each
device computes its row block of ``K @ v`` with the streamed cross-gram
kernel (K never materializes anywhere), and one ``all_gather`` of the
O(N)-sized result per matvec is the only communication — vanishing next
to the O(N^2 / n_devices) per-device compute. ``x`` (N x D) and ``v``
(N x R) stay replicated: at N = 1M, D = 8 that is 32 MB — nothing next
to the 4 TB the dense K would need.

The factory returned here is a drop-in ``matvec`` for cg_solve / lanczos /
slq_logdet / the Hutchinson gradient contractions (they all take matvec
closures), which is exactly how gp_iterative's ``mesh=`` mode consumes it.

Differentiability: the White/nugget diagonal is split out with
``gpx.kernels.split_noise`` (so D > 8 inputs cannot lose the White term to
inexact zero distances, and hyperparameter gradients flow through the
noise variance), and ``method="xla"`` forces the row-blocked XLA kernel —
differentiable w.r.t. kernel hyperparameters, which the Pallas forward is
not — for the gradient contraction path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gpx.kernels import split_noise
from gpx.ops.distance import as_locations, sq_distances


def distributed_gram_matvec(kernel, x, mesh: Mesh, *, axis: str = "data",
                            nugget: float = 0.0, method: str = "auto"):
    """Return ``mv(v) = (k(x, x) + (noise + nugget) I) @ v`` with the row
    range sharded over ``mesh[axis]``; ``v`` is (N,) or (N, R), replicated
    in and out. ``method="xla"`` forces the differentiable row-blocked
    path (use for contractions that ``jax.grad`` through the matvec)."""
    from gpx.kernels import unwrap_ard

    x = as_locations(x)
    # ARD = isotropic base on scaled coords (keeps the Pallas row kernels)
    kernel, x, _ = unwrap_ard(kernel, x)
    n = x.shape[0]
    d = mesh.shape[axis]
    if n % d:
        raise ValueError(f"N={n} must split over the {d}-device '{axis}' axis")
    rows_per = n // d
    smooth, noise_var = split_noise(kernel)
    diag = noise_var + nugget

    def _chunked_rows(x_loc, x_rep, v_rep, block=2048):
        # row-blocked streamed product WITHOUT lax.map: inside a Manual
        # (shard_map) context nested under lax.scan, lax.map's output
        # broadcast trips jax 0.9's sharding canonicalization ("Context
        # mesh (Manual) should match ... (Auto) passed to
        # broadcast_in_dim") — a static python loop of checkpointed
        # chunks compiles identically and sidesteps it; memory stays
        # O(block * N) per device and gradients w.r.t. kernel
        # hyperparameters recompute each chunk (same remat policy as
        # gpx.ops.pallas_matvec._gram_matvec_xla)
        center = lax.stop_gradient(jnp.mean(x_rep, axis=0, keepdims=True))
        xl = x_loc - center
        xr = x_rep - center

        @jax.checkpoint
        def chunk(kern, xb):
            r2 = jnp.maximum(sq_distances(xb, xr), 0.0)
            # HIGHEST: matrix RHS — same CG-operator faithfulness
            # requirement as gpx.ops.pallas_matvec._gram_matvec_xla
            return jnp.matmul(kern.evaluate_xx(xb, xr, r2), v_rep,
                              precision=jax.lax.Precision.HIGHEST)

        n_loc = x_loc.shape[0]
        outs = [chunk(smooth, xl[s:s + block])
                for s in range(0, n_loc, block)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)

    def _rows(x_loc, x_rep, v_rep):
        my = lax.axis_index(axis)
        v_loc = lax.dynamic_slice_in_dim(v_rep, my * rows_per, rows_per, 0)
        if smooth is None:
            return diag * v_loc
        if method != "xla" and jax.default_backend() == "tpu":
            from gpx.ops.pallas_matvec import cross_matvec

            y_loc = cross_matvec(smooth, x_loc, x_rep, v_rep)
        else:
            y_loc = _chunked_rows(x_loc, x_rep, v_rep)
        return y_loc + diag * v_loc

    # output stays ROW-SHARDED (out_specs P(axis)): downstream vector math
    # runs under GSPMD auto-partitioning, and the next matvec's shard_map
    # entry (in_specs P() on v) inserts the all_gather exactly where the
    # replication is consumed — same comms, and the vma checker can verify
    # it (an explicit in-body all_gather reads as still-varying to it)
    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(), P()), out_specs=P(axis, None),
    )
    def body(x_loc, x_rep, v_rep):
        return _rows(x_loc, x_rep, v_rep)

    def mv(v):
        squeeze = v.ndim == 1
        v2 = v[:, None] if squeeze else v
        out = body(x, x, v2)
        return out[:, 0] if squeeze else out

    return mv
