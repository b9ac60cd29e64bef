"""Triangular matrix-multiply Pallas kernels (trmm) with active-tile
scheduling.

The blocked triangular inversion (gpx.ops.chol.tri_inverse_lower) spends its
FLOPs in ``B @ L`` / ``L @ B`` products where ``L`` is lower-triangular —
XLA multiplies them densely, wasting ~2x MACs and the matching DMA on the
zero triangle. These kernels walk a 1-D grid of scalar-prefetched (i, j, k)
tiles covering only the nonzero contraction range (the same schedule trick
as gpx.ops.pallas_logml_grad), at bf16x3 split precision (~1.5e-5, 3 MXU
passes — see ``_dot_bf16x3``).

Modes:
* ``right_lower``  : ``C = B @ L``   -> C_ij = sum_{k >= j} B_ik L_kj
* ``left_lower``   : ``C = L @ B``   -> C_ij = sum_{k <= i} L_ik B_kj
* ``right_lower_t``: ``C = B @ L^T`` -> C_ij = sum_{k <= j} B_ik L_jk

``syrk_lower`` computes ``A - B @ B^T`` on the lower-triangle tiles only
(upper tiles of the output are NOT written — callers must consume the lower
triangle only). Together these are the O(N^3) building blocks of the
blocked Cholesky-and-inverse recursion (gpx.ops.pallas_chol.chol_inv), the
TPU rebuild of LAPACK dpotrf/dtrtri (GaussianProcess.scala:123,
Predict.scala:69, Mcmc.scala:55).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BT = 512


def _body(*refs, mode, bt, nb, neg, fast=False):
    offs_ref, ii_ref, jj_ref, kk_ref = refs[:4]
    a_ref, b_ref = refs[4], refs[5]
    out_ref = refs[6]
    acc = refs[7]

    s = pl.program_id(0)
    i = ii_ref[s]
    j = jj_ref[s]
    k = kk_ref[s]

    if mode == "right_lower":
        first_k, last_k = j, nb - 1
        dn = (((1,), (0,)), ((), ()))
    elif mode == "left_lower":
        first_k, last_k = 0, i
        dn = (((1,), (0,)), ((), ()))
    else:  # right_lower_t: contract B's dim 1 with L's dim 1
        first_k, last_k = 0, j
        dn = (((1,), (1,)), ((), ()))

    @pl.when(k == first_k)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # manual bf16x3 split product: ~f32-faithful at 3 MXU passes (Mosaic
    # exposes only DEFAULT=1-pass-lossy and HIGHEST=6-pass; the 6-pass cost
    # cancels the active-tile MAC savings — measured). fast=True drops to
    # the 2-pass split (~2^-9 rel) — the fast-factorization leg.
    acc[:] += (_dot_bf16x2 if fast else _dot_bf16x3)(
        a_ref[:], b_ref[:], dn=dn
    )

    @pl.when(k == last_k)
    def _write():
        out_ref[:] = -acc[:] if neg else acc[:]


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


def _dot_bf16x2(a, b, dn=(((1,), (0,)), ((), ()))):
    """2-pass split: keeps ``a``'s full f32 mantissa but rounds ``b`` to
    bf16 — ~2^-9 relative per dot (vs ~1.5e-5 for the 3-pass split) at 2/3
    the MXU passes. The opt-in *fast gradient* mode (sampler warmup, where
    1e-3-grade gradients steer fine) runs the W-contraction through this."""
    a1 = a.astype(jnp.bfloat16)
    a2 = (a - a1.astype(jnp.float32)).astype(jnp.bfloat16)
    b1 = b.astype(jnp.bfloat16)
    f32 = jnp.float32
    return (
        jax.lax.dot_general(a1, b1, dn, preferred_element_type=f32)
        + jax.lax.dot_general(a2, b1, dn, preferred_element_type=f32)
    )


def _schedule(nb: int, mode: str, rows: int, cols: int):
    """Active (i, j, k) tile triples: ``rows x cols`` output tiles, each
    contracting only over L's nonzero range (``nb`` = L's block count)."""
    ii, jj, kk = [], [], []
    for i in range(rows):
        for j in range(cols):
            if mode == "right_lower":
                ks = range(j, nb)
            elif mode == "left_lower":
                ks = range(0, i + 1)
            else:  # right_lower_t
                ks = range(0, j + 1)
            for k in ks:
                ii.append(i)
                jj.append(j)
                kk.append(k)
    return (
        jnp.asarray(np.asarray(ii, np.int32)),
        jnp.asarray(np.asarray(jj, np.int32)),
        jnp.asarray(np.asarray(kk, np.int32)),
    )


def trmm(b, l, *, mode: str, bt: int = _BT, interpret: bool = False,
         n: int | None = None, m: int | None = None,
         b_off=(0, 0), l_off=(0, 0), neg: bool = False,
         fast: bool = False):
    """``b @ l`` (mode="right_lower"), ``l @ b`` (mode="left_lower") or
    ``b @ l.T`` (mode="right_lower_t") with ``l`` lower-triangular and
    ``(n, n)``. ``b`` is ``(m, n)`` in the right modes (``m`` defaults to
    ``n``) — or ``(n, m)`` in ``left_lower`` mode (the prediction-path trsm
    replacement: ``L^{-1} @ Kxs``). All dims divisible by ``bt``. Only the
    lower triangle of ``l`` is ever read. Rectangular right-mode operands
    carry the uneven (non-power-of-2) Schur panels of
    gpx.ops.pallas_chol.chol_inv.

    ``b_off``/``l_off`` (element offsets, multiples of ``bt``) read the
    operands as sub-blocks *embedded in larger buffers* — the Cholesky
    recursion (gpx.ops.pallas_chol.chol_inv) passes the full-size matrices
    and offsets instead of slicing, which would cost an HBM copy per level.
    Offsets ride the scalar-prefetch channel, so call sites with different
    offsets share one compiled program. ``neg=True`` writes ``-C`` (fuses
    the sign flip of the ``M21 = -M22 (L21 M11)`` step)."""
    if mode not in ("right_lower", "left_lower", "right_lower_t"):
        raise ValueError(f"unknown trmm mode: {mode}")
    n = l.shape[-1] if n is None else n
    if m is None:
        m = b.shape[-1] if mode == "left_lower" else n
    for name, (oi, oj) in (("b_off", b_off), ("l_off", l_off)):
        if oi % bt or oj % bt:
            raise ValueError(f"{name} must be multiples of bt={bt}: {(oi, oj)}")
    b_shape = (n, m) if mode == "left_lower" else (m, n)
    if (l.shape[0] < l_off[0] + n or l.shape[1] < l_off[1] + n
            or b.shape[0] < b_off[0] + b_shape[0]
            or b.shape[1] < b_off[1] + b_shape[1] or n % bt or m % bt):
        raise ValueError(
            f"trmm {mode}: l {l.shape} at {l_off} / b {b.shape} at {b_off}"
            f" cannot hold b {b_shape} with {bt} | dims"
        )
    nb = n // bt
    if mode == "left_lower":
        rows, cols = nb, m // bt
    else:
        rows, cols = m // bt, nb
    ii, jj, kk = _schedule(nb, mode, rows, cols)
    n_active = ii.shape[0]

    # operand order inside the kernel is (A, B) for A @ B (or A @ B^T)
    if mode == "left_lower":
        first, second = l, b
        first_off, second_off = l_off, b_off
    else:
        first, second = b, l
        first_off, second_off = b_off, l_off
    if mode == "right_lower_t":
        second_map = lambda s, offs, ii, jj, kk: (jj[s] + offs[2], kk[s] + offs[3])
    else:
        second_map = lambda s, offs, ii, jj, kk: (kk[s] + offs[2], jj[s] + offs[3])
    offs = jnp.asarray(
        np.asarray([first_off[0] // bt, first_off[1] // bt,
                    second_off[0] // bt, second_off[1] // bt], np.int32)
    )

    body = functools.partial(_body, mode=mode, bt=bt, nb=nb, neg=neg,
                             fast=fast)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_active,),
        in_specs=[
            pl.BlockSpec((bt, bt),
                         lambda s, offs, ii, jj, kk: (ii[s] + offs[0],
                                                      kk[s] + offs[1]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bt), second_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, bt), lambda s, offs, ii, jj, kk: (ii[s], jj[s]),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((bt, bt), jnp.float32)],
    )
    out_shape = (n, m) if mode == "left_lower" else (m, n)
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        # double-buffered (bt, bt) f32 pipeline buffers exceed the 16 MB
        # default scoped-VMEM cap at bt = 1024 (measured compile OOM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(offs, ii, jj, kk, jnp.asarray(first, jnp.float32),
      jnp.asarray(second, jnp.float32))


def _syrk_body(offs_ref, ii_ref, jj_ref, kk_ref, a_ref, bi_ref, bj_ref,
               out_ref, acc, *, kb):
    s = pl.program_id(0)
    k = kk_ref[s]

    @pl.when(k == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    # always the full bf16x3 split: every syrk output feeds a later factor
    # step of the Cholesky recursion, and a loosened Schur update is the
    # measured-to-NaN configuration (see _chol_inv_value's fast note)
    acc[:] += _dot_bf16x3(bi_ref[:], bj_ref[:], dn=(((1,), (1,)), ((), ())))

    @pl.when(k == kb - 1)
    def _write():
        out_ref[:] = a_ref[:] - acc[:]


def syrk_lower(a, b, *, bt: int = _BT, interpret: bool = False,
               n: int | None = None, a_off=(0, 0), k: int | None = None):
    """``A - B @ B^T`` on the lower-triangle tiles only (bf16x3).

    Upper-triangle tiles of the result are never visited and contain
    garbage — callers must read the lower triangle only (the Cholesky
    recursion in gpx.ops.pallas_chol does; its in-place variant masks the
    deposit). A zero-filling upper-tile variant was measured SLOWER on chip
    (86-91 vs 83.5 ms inside chol_inv at N=16k: the per-step flag guard
    around the accumulate hurts the Mosaic pipeline more than one masked
    XLA pass costs) — don't retry. ``A`` is only read on its lower tiles.
    ``a_off`` reads the A block embedded in a larger buffer (see
    :func:`trmm`); ``b`` is always a free-standing ``(n, k)`` value
    (``k`` = contraction width, default ``b.shape[-1]`` — rectangular for
    the uneven Schur panels of gpx.ops.pallas_chol.chol_inv)."""
    n = b.shape[0] if n is None else n
    k = b.shape[-1] if k is None else k
    if a_off[0] % bt or a_off[1] % bt:
        raise ValueError(f"a_off must be multiples of bt={bt}: {a_off}")
    if (b.shape != (n, k) or a.shape[0] < a_off[0] + n
            or a.shape[1] < a_off[1] + n or n % bt or k % bt):
        raise ValueError(
            f"syrk_lower: a {a.shape} at {a_off} / b {b.shape} cannot hold"
            f" ({n}, {k}) with {bt} | dims"
        )
    nb, kb = n // bt, k // bt
    ii, jj, kk = [], [], []
    for i in range(nb):
        for j in range(i + 1):
            for kx in range(kb):
                ii.append(i)
                jj.append(j)
                kk.append(kx)
    ii = jnp.asarray(np.asarray(ii, np.int32))
    jj = jnp.asarray(np.asarray(jj, np.int32))
    kk = jnp.asarray(np.asarray(kk, np.int32))
    offs = jnp.asarray(
        np.asarray([a_off[0] // bt, a_off[1] // bt], np.int32)
    )

    body = functools.partial(_syrk_body, kb=kb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(int(ii.shape[0]),),
        in_specs=[
            # A block index is constant over the k sweep -> fetched once
            pl.BlockSpec((bt, bt),
                         lambda s, offs, ii, jj, kk: (ii[s] + offs[0],
                                                      jj[s] + offs[1]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bt),
                         lambda s, offs, ii, jj, kk: (ii[s], kk[s]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bt),
                         lambda s, offs, ii, jj, kk: (jj[s], kk[s]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, bt), lambda s, offs, ii, jj, kk: (ii[s], jj[s]),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((bt, bt), jnp.float32)],
    )
    b = jnp.asarray(b, jnp.float32)
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        # double-buffered (bt, bt) f32 pipeline buffers exceed the 16 MB
        # default scoped-VMEM cap at bt = 1024 (measured compile OOM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(offs, ii, jj, kk, jnp.asarray(a, jnp.float32), b, b)
