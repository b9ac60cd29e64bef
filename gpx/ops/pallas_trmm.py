"""Triangular matrix-multiply Pallas kernels (trmm) with active-tile
scheduling.

The blocked triangular inversion (gpx.ops.chol.tri_inverse_lower) spends its
FLOPs in ``B @ L`` / ``L @ B`` products where ``L`` is lower-triangular —
XLA multiplies them densely, wasting ~2x MACs and the matching DMA on the
zero triangle. These kernels walk a 1-D grid of scalar-prefetched (i, j, k)
tiles covering only the nonzero contraction range (the same schedule trick
as gpx.ops.pallas_logml_grad), at HIGHEST MXU precision.

Modes:
* ``right_lower``: ``C = B @ L``  -> C_ij = sum_{k >= j} B_ik L_kj
* ``left_lower`` : ``C = L @ B``  -> C_ij = sum_{k <= i} L_ik B_kj
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BT = 512


def _body(*refs, mode, bt, nb):
    ii_ref, jj_ref, kk_ref = refs[:3]
    a_ref, b_ref = refs[3], refs[4]
    out_ref = refs[5]
    acc = refs[6]

    s = pl.program_id(0)
    i = ii_ref[s]
    j = jj_ref[s]
    k = kk_ref[s]

    first_k = j if mode == "right_lower" else 0
    last_k = (nb - 1) if mode == "right_lower" else i

    @pl.when(k == first_k)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # manual bf16x3 split product: ~f32-faithful at 3 MXU passes (Mosaic
    # exposes only DEFAULT=1-pass-lossy and HIGHEST=6-pass; the 6-pass cost
    # cancels the active-tile MAC savings — measured)
    acc[:] += _dot_bf16x3(a_ref[:], b_ref[:])

    @pl.when(k == last_k)
    def _write():
        out_ref[:] = acc[:]


def _dot_bf16x3(a, b, dn=(((1,), (0,)), ((), ()))):
    a1 = a.astype(jnp.bfloat16)
    a2 = (a - a1.astype(jnp.float32)).astype(jnp.bfloat16)
    b1 = b.astype(jnp.bfloat16)
    b2 = (b - b1.astype(jnp.float32)).astype(jnp.bfloat16)
    f32 = jnp.float32
    return (
        jax.lax.dot_general(a1, b1, dn, preferred_element_type=f32)
        + jax.lax.dot_general(a1, b2, dn, preferred_element_type=f32)
        + jax.lax.dot_general(a2, b1, dn, preferred_element_type=f32)
    )


def _schedule(nb: int, mode: str):
    ii, jj, kk = [], [], []
    for i in range(nb):
        for j in range(nb):
            ks = range(j, nb) if mode == "right_lower" else range(0, i + 1)
            for k in ks:
                ii.append(i)
                jj.append(j)
                kk.append(k)
    return (
        jnp.asarray(np.asarray(ii, np.int32)),
        jnp.asarray(np.asarray(jj, np.int32)),
        jnp.asarray(np.asarray(kk, np.int32)),
    )


def trmm(b, l, *, mode: str, bt: int = _BT, interpret: bool = False):
    """``b @ l`` (mode="right_lower") or ``l @ b`` (mode="left_lower") with
    ``l`` lower-triangular. Square f32 operands, n divisible by ``bt``."""
    if mode not in ("right_lower", "left_lower"):
        raise ValueError(f"unknown trmm mode: {mode}")
    n = b.shape[-1]
    if b.shape != (n, n) or l.shape != (n, n) or n % bt:
        raise ValueError(f"trmm needs square (n, n) operands with {bt} | n")
    nb = n // bt
    ii, jj, kk = _schedule(nb, mode)
    n_active = ii.shape[0]

    # operand order inside the kernel is (A, B) for A @ B
    first = b if mode == "right_lower" else l
    second = l if mode == "right_lower" else b

    body = functools.partial(_body, mode=mode, bt=bt, nb=nb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_active,),
        in_specs=[
            pl.BlockSpec((bt, bt), lambda s, ii, jj, kk: (ii[s], kk[s]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bt), lambda s, ii, jj, kk: (kk[s], jj[s]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, bt), lambda s, ii, jj, kk: (ii[s], jj[s]),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((bt, bt), jnp.float32)],
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=interpret,
    )(ii, jj, kk, jnp.asarray(first, jnp.float32), jnp.asarray(second, jnp.float32))
