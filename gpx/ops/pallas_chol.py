"""Blocked Cholesky factorization + triangular inverse for TPU.

The TPU rebuild of LAPACK ``dpotrf``/``dtrtri`` reached from the reference
at GaussianProcess.loglikelihood (GaussianProcess.scala:123), Predict.fit
(Predict.scala:69) and the gradient path (GaussianProcess.scala:184):
``chol_inv(K) -> (L, L^{-1})`` — the pair the analytic logML gradient
consumes (gpx.models.gp, gpx.ops.pallas_logml_grad).

Design: an XLA-level Schur-complement recursion whose O(N^3) work runs in
the active-tile Pallas kernels of gpx.ops.pallas_trmm (bf16x3 split
precision, automatic BlockSpec pipelining):

    chol_inv(A):                       # A = [[A11, .], [A21, A22]]
      L11, M11 = chol_inv(A11)
      L21 = A21 @ M11^T                #   trmm right_lower_t
      S   = A22 - L21 @ L21^T          #   syrk_lower (lower tiles only)
      L22, M22 = chol_inv(S)
      M21 = -M22 @ (L21 @ M11)         #   trmm right_lower + left_lower

with a single-program Pallas base case (default 2048^2) that factors and
inverts a VMEM-resident tile: static blocked recursion down to a 128-wide
unblocked VPU Cholesky, 128-wide inverses by nilpotent doubling (7 MXU
squarings instead of 128 sequential substitution steps).

Why this shape (measured, round 2): a monolithic manual-DMA Pallas program
walking a scheduled step list sustained only ~99 TF of single-pass MXU rate
(sequential per-step DMA waits) — 174 ms for (L, M) at N=16k, i.e. slower
than XLA chol + blocked tri-inverse (163 ms). The automatic-pipeline
kernels sustain ~175 TF on the same chip (gpx.ops.pallas_logml_grad), so
hoisting the recursion to XLA and keeping Pallas for the flat tile sweeps
wins despite the per-level concatenate copies (~N^2 HBM traffic per level).

Numerics: bf16x3 products are f32-faithful to ~1.5e-5 per dot; the factor
error grows as eps_eff * cond(K). Downstream consumers compensate exactly:
alpha gets one iterative-refinement step, and the logdet uses the
first-order correction ``logdet K = -2 sum log diag(M) + (tr(M^T M K) - N)
+ O(||E||^2)`` computed by the fused gradient kernel
(gpx.ops.pallas_logml_grad with_correction), so the *value* is insensitive
to the factorization precision to second order.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpx.ops.pallas_trmm import _dot_bf16x2, _dot_bf16x3, syrk_lower, trmm

_BT = 512        # trmm/syrk tile
_BASE_TILE = 2048  # single-program Pallas base case
_BASE = 128      # unblocked VPU Cholesky width inside the base case

# value-layout default: "panel" (flat right-looking sweep) vs "recursion"
# (binary Schur recursion) — chosen by the in-situ chip A/B (PERF.md r4);
# GPX_CHOL_LAYOUT overrides for A/B runs (bench.py with each layout)
DEFAULT_LAYOUT = os.environ.get("GPX_CHOL_LAYOUT", "recursion")


def _dot_h(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _chol_base(a, b: int):
    """Unblocked in-register Cholesky of a (b, b) f32 tile (lower).

    Mosaic has no value-level dynamic_slice, so the pivot column is
    extracted/written with masked full-tile VPU ops (b^2 work per step —
    cheap at b = 128). Only the lower triangle of ``a`` is consumed; the
    output has exact zeros above the diagonal."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    rcol = rows[:, :1]

    def body(t, a):
        piv = jnp.sum(jnp.where((rows == t) & (cols == t), a, 0.0))
        d = jax.lax.rsqrt(piv)
        col = jnp.sum(jnp.where(cols == t, a, 0.0), axis=1, keepdims=True) * d
        colm = jnp.where(rcol > t, col, 0.0)                  # strictly below
        outer = colm * colm.reshape(1, b)                     # VPU outer
        a = a - jnp.where((rows > t) & (cols > t), outer, 0.0)
        newcol = jnp.where(rcol >= t, col, 0.0)               # zero above diag
        return jnp.where(cols == t, newcol, a)                # write column t

    return lax.fori_loop(0, b, body, a)


def _tri_inv_base(l, b: int):
    """Inverse of a (b, b) lower-triangular tile by nilpotent doubling:
    ``L = D(I + N)`` with N strictly lower => ``(I + N)^{-1} =
    prod_k (I + (-N)^{2^k})`` — log2(b) MXU squarings instead of b
    sequential substitution steps."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    diag = jnp.sum(jnp.where(rows == cols, l, 0.0), axis=1)   # (b,)
    dinv = 1.0 / diag
    s = jnp.where(rows > cols, -(dinv[:, None] * l), 0.0)     # -N
    r = jnp.where(rows == cols, 1.0, 0.0) + s
    t = s
    n_doublings = max(int(np.log2(b)) - 1, 0)                 # 2^(k+1) >= b
    for _ in range(n_doublings):
        t = _dot_h(t, t)
        r = r + _dot_h(r, t)
    return r * dinv[None, :]


def _chol_inv_value(a, t: int, fast: bool = False):
    """(L, L^{-1}) of a (t, t) SPD f32 value by static blocked recursion.

    Recursion-level products use the bf16x3 split (3 MXU passes,
    ~1.5e-5); the 128-wide leaves run at HIGHEST f32 precision. Only the
    lower triangle of ``a`` is consumed.

    ``fast`` drops ONLY this level's own inverse-assembly product
    (``M21 = -M22 (L21 M11)``) to the 2-pass bf16x2 split and is NOT
    propagated to children: this recursion computes L *through* M
    (``L21 = A21 M11^T``), so any loosened M block that a later factor
    step consumes corrupts the Schur chain — both a full-2-pass variant
    AND an all-levels-M21-2-pass "hybrid" were MEASURED to NaN at N=16k
    on a cond~1e5 Gram (leaf pivots go negative;
    benchmarks/fast_factor_ab.py, round 3 — do not retry). Only the
    outermost M21 is final-output-only and safe."""
    if t <= _BASE:
        l = _chol_base(a, t)
        return l, _tri_inv_base(l, t)
    dot_m = _dot_bf16x2 if fast else _dot_bf16x3
    h = t // 2
    a11, a21, a22 = a[:h, :h], a[h:, :h], a[h:, h:]
    l11, m11 = _chol_inv_value(a11, h)
    l21 = _dot_bf16x3(a21, m11, dn=(((1,), (1,)), ((), ())))     # a21 @ m11^T
    s = a22 - _dot_bf16x3(l21, l21, dn=(((1,), (1,)), ((), ())))
    l22, m22 = _chol_inv_value(s, h)
    m21 = -dot_m(m22, dot_m(l21, m11))
    z = jnp.zeros((h, h), a.dtype)
    l = jnp.concatenate(
        [jnp.concatenate([l11, z], 1), jnp.concatenate([l21, l22], 1)], 0
    )
    m = jnp.concatenate(
        [jnp.concatenate([m11, z], 1), jnp.concatenate([m21, m22], 1)], 0
    )
    return l, m


def _tile_body(a_ref, l_ref, m_ref, *, t, fast=False):
    l, m = _chol_inv_value(a_ref[:], t, fast)
    l_ref[:] = l
    m_ref[:] = m


def chol_inv_tile(a, *, interpret: bool = False, fast: bool = False):
    """(L, L^{-1}) of one VMEM-resident SPD tile (single Pallas program)."""
    t = a.shape[-1]
    if a.shape != (t, t) or (t & (t - 1)):
        raise ValueError(f"chol_inv_tile needs a (t, t) power-of-2 tile: {a.shape}")
    return pl.pallas_call(
        functools.partial(_tile_body, t=t, fast=fast),
        out_shape=(
            jax.ShapeDtypeStruct((t, t), jnp.float32),
            jax.ShapeDtypeStruct((t, t), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(jnp.asarray(a, jnp.float32))


def _tile_body_off(offs_ref, a_ref, l_ref, m_ref, *, t):
    l, m = _chol_inv_value(a_ref[:], t)
    l_ref[:] = l
    m_ref[:] = m


def chol_inv_tile_off(src, off: int, t: int, *, interpret: bool = False):
    """Base case reading the ``(t, t)`` diagonal block at ``(off, off)`` of
    a larger buffer (no slice copy; the offset rides scalar prefetch so all
    base tiles share one compiled program per source shape)."""
    offs = jnp.asarray(np.asarray([off // t], np.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((t, t), lambda s, offs: (offs[0], offs[0]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t, t), lambda s, offs: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, t), lambda s, offs: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        functools.partial(_tile_body_off, t=t),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((t, t), jnp.float32),
            jax.ShapeDtypeStruct((t, t), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(offs, src)


def _rec(src, off: int, t: int, l, m, *, base: int, bt: int, interpret: bool,
         fast: bool = False):
    """Factor the ``(t, t)`` sub-problem whose data sits at ``(off, off)``
    of ``src``, writing every L/M block into the full-size buffers at the
    same offsets. ``src`` is the original ``a`` for the leading-diagonal
    chain and the big ``l`` buffer for Schur children (whose data the
    parent's syrk deposited there); both are ``(n, n)``, so every kernel
    call at a given sub-size shares one compiled program. Non-power-of-2
    ``t`` splits unevenly at the largest power of 2 (see :func:`_split`).
    ``fast`` loosens only THIS level's M21 assembly (the outermost call's
    final-output-only block) and is never propagated to children — see
    :func:`_chol_inv_value`'s NaN note."""
    from jax import lax

    if t <= base and (t & (t - 1)) == 0:
        lt, mt = chol_inv_tile_off(src, off, t, interpret=interpret)
        l = lax.dynamic_update_slice(l, lt, (off, off))
        m = lax.dynamic_update_slice(m, mt, (off, off))
        return l, m
    h = _split(t)
    r = t - h
    kw = dict(bt=bt, interpret=interpret)
    l, m = _rec(src, off, h, l, m, base=base, bt=bt, interpret=interpret)
    # L21 = A21 @ M11^T — A21 read in place from src, M11 in place from m
    l21 = trmm(src, m, mode="right_lower_t", n=h, m=r,
               b_off=(off + h, off), l_off=(off, off), **kw)
    l = lax.dynamic_update_slice(l, l21, (off + h, off))
    # S = A22 - L21 @ L21^T, deposited into l's (off+h, off+h) region: the
    # Schur child reads it from there and overwrites it block-by-block
    # exactly after last use (classic in-place factorization order)
    s = syrk_lower(src, l21, n=r, a_off=(off + h, off + h), **kw)
    l = lax.dynamic_update_slice(l, s, (off + h, off + h))
    l, m = _rec(l, off + h, r, l, m, base=base, bt=bt, interpret=interpret)
    # M21 = -M22 @ (L21 @ M11): sign fused into the first trmm
    t1 = trmm(l21, m, mode="right_lower", n=h, m=r, l_off=(off, off),
              neg=True, fast=fast, **kw)
    m21 = trmm(t1, m, mode="left_lower", n=r, m=h,
               l_off=(off + h, off + h), fast=fast, **kw)
    m = lax.dynamic_update_slice(m, m21, (off + h, off))
    return l, m


def _split(n: int) -> int:
    """Leading-panel size for the Schur split: half for power-of-2 ``n``,
    otherwise the largest power of 2 below ``n`` (so the leading child is
    always a power of 2 and the trailing child — ``n - h``, a multiple of
    the tile size whenever ``n`` is — recurses the same way; leaves of the
    whole recursion are exactly the binary decomposition of ``n``)."""
    return n // 2 if (n & (n - 1)) == 0 else 1 << (n.bit_length() - 1)


def _rec_value(a, *, base: int, bt: int, interpret: bool,
               fast: bool = False, spine: bool = False):
    """Value-based recursion: per-level slice extraction + ``concatenate``
    assembly. XLA flattens the nested concatenates into single writes, so
    this is the FASTEST variant at runtime (measured A/B at N=16k on chip:
    79.2 ms vs 83.5 in-place) — but the concat-heavy graph compiles ~6x
    slower (224 s vs 37 s).

    Any ``n`` divisible by ``bt`` is handled: non-power-of-2 sizes split
    unevenly at the largest power of 2 (rectangular trmm/syrk panels), so
    e.g. N = 20480 factors as a 16384 child plus a 4096 Schur child.

    ``spine=True`` (the stochastic-hybrid factorization, round 4) skips
    the M21 assembly on the TRAILING SPINE — this level and recursively
    its Schur child. Those are exactly the M blocks no later factor step
    consumes (every *leading* child's full inverse is needed for
    ``L21 = A21 M11^T``, so only the trailing chain is skippable): it
    saves ~N^3/7 of the MACs (~37%% of the tri-inverse half). The skipped
    blocks are left ZERO; ``L`` and every other M block are bit-identical
    to the full recursion. Solves then go through
    :func:`spine_solve_lower` / :func:`spine_solve_lower_t` instead of
    dense ``M`` matvecs."""
    n = a.shape[-1]
    if n <= base and (n & (n - 1)) == 0:
        return chol_inv_tile(a, interpret=interpret, fast=fast)
    h = _split(n)
    r = n - h
    a11, a21, a22 = a[:h, :h], a[h:, :h], a[h:, h:]
    # children NEVER inherit fast: their M blocks feed this level's factor
    # products (L21 = A21 M11^T) — see _chol_inv_value's NaN note; only
    # this level's own M21 assembly (final-output-only) may loosen
    rec = functools.partial(_rec_value, base=base, bt=bt, interpret=interpret)
    l11, m11 = rec(a11)
    l21 = trmm(a21, m11, mode="right_lower_t", bt=bt, interpret=interpret,
               m=r)
    s = syrk_lower(a22, l21, bt=bt, interpret=interpret)
    l22, m22 = rec(s, spine=spine)
    if spine:
        m21 = jnp.zeros((r, h), jnp.float32)
    else:
        t1 = trmm(l21, m11, mode="right_lower", bt=bt, interpret=interpret,
                  neg=True, fast=fast, m=r)
        m21 = trmm(t1, m22, mode="left_lower", bt=bt, interpret=interpret,
                   fast=fast)
    z = jnp.zeros((h, r), jnp.float32)
    l = jnp.concatenate(
        [jnp.concatenate([l11, z], 1), jnp.concatenate([l21, l22], 1)], 0
    )
    m = jnp.concatenate(
        [jnp.concatenate([m11, z], 1), jnp.concatenate([m21, m22], 1)], 0
    )
    return l, m


def _leaf_sizes(n: int, base: int) -> list[int]:
    """Leaf sequence of the panel sweep: greedy ``base`` panels, then the
    binary decomposition of the remainder in descending order — exactly
    the leaf set (sizes AND offsets) of the :func:`_split` recursion, so
    the panel factorization and the recursive inverse assembly agree on
    where the leaf inverses live."""
    sizes = []
    while n >= base:
        sizes.append(base)
        n -= base
    while n:
        p = 1 << (n.bit_length() - 1)
        sizes.append(p)
        n -= p
    return sizes


def _m_assemble(l, leaves, off: int, t: int, *, base: int, bt: int,
                interpret: bool, fast: bool = False, spine: bool = False):
    """Recursive inverse assembly over a fully-factored ``l``: the exact
    M21 trmm structure of :func:`_rec_value`, reading leaf inverses from
    ``leaves`` (offset -> M block) and L21 panels from ``l`` at trmm
    offsets (no slice copies). ``fast``/``spine`` semantics are identical
    to :func:`_rec_value` (outermost-only / trailing-spine-only)."""
    if t <= base and (t & (t - 1)) == 0:
        return leaves[off]
    h = _split(t)
    r = t - h
    kw = dict(bt=bt, interpret=interpret)
    m11 = _m_assemble(l, leaves, off, h, base=base, **kw)
    m22 = _m_assemble(l, leaves, off + h, r, base=base, **kw, spine=spine)
    if spine:
        m21 = jnp.zeros((r, h), jnp.float32)
    else:
        t1 = trmm(l, m11, mode="right_lower", b_off=(off + h, off), n=h,
                  m=r, neg=True, fast=fast, **kw)
        m21 = trmm(t1, m22, mode="left_lower", fast=fast, **kw)
    z = jnp.zeros((h, r), jnp.float32)
    return jnp.concatenate(
        [jnp.concatenate([m11, z], 1), jnp.concatenate([m21, m22], 1)], 0
    )


def _panel_value(a, *, base: int, bt: int, interpret: bool,
                 fast: bool = False, spine: bool = False):
    """Flat right-looking panel factorization + recursive inverse assembly
    (round-4 A/B winner, benchmarks/panel_lookahead_ab.py: 84.4 vs
    98.9 ms/call for the binary recursion at N=16k on chip — the flat
    sweep hands XLA/Mosaic uniform rank-``base`` syrk/trmm steps instead
    of the recursion's log-depth mix of sweep sizes).

    The factorization is the classic right-looking order — per leaf:
    ``(Lkk, Mkk) = chol_inv_tile(diag)``, ``Lk = A[k+1:,k] @ Mkk^T``
    (trmm), ``trail -= Lk Lk^T`` (syrk_lower) — over the
    :func:`_leaf_sizes` panel sequence, so any N divisible by ``bt``
    rides through (the tail panels are the binary decomposition of
    ``N mod base``). The inverse is then assembled by the same
    binary-split M21 trmms as :func:`_rec_value`. Same MAC count as the
    recursion; only the Schur-update ASSOCIATION differs (one rank-base
    update per panel instead of nested rank-h updates), so results agree
    with the recursion to bf16x3 rounding (~7e-4 absolute on the
    cond~1e5 16k Gram)."""
    n = a.shape[-1]
    kw = dict(bt=bt, interpret=interpret)
    leaves = {}
    cols = []
    off = 0
    trail = a
    for b in _leaf_sizes(n, base):
        lkk, mkk = chol_inv_tile(trail[:b, :b], interpret=interpret)
        leaves[off] = mkk
        r = trail.shape[0] - b
        parts = [] if not off else [jnp.zeros((off, b), jnp.float32)]
        parts.append(lkk)
        if r:
            lk = trmm(trail[b:, :b], mkk, mode="right_lower_t", n=b, m=r,
                      **kw)
            trail = syrk_lower(trail[b:, b:], lk, **kw)
            parts.append(lk)
        cols.append(jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0])
        off += b
    l = jnp.concatenate(cols, 1) if len(cols) > 1 else cols[0]
    m = _m_assemble(l, leaves, 0, n, base=base, fast=fast, spine=spine, **kw)
    return l, m


def chol_inv(a, *, base: int = _BASE_TILE, bt: int = _BT,
             interpret: bool = False, fast_compile: bool = False,
             fast: bool = False, spine: bool = False,
             layout: str | None = None):
    """``(L, L^{-1})`` of an SPD f32 matrix, lower triangular.

    ``n`` must be a multiple of the sweep tile ``bt`` (or a power of two
    below ``base``): non-power-of-2 sizes recurse through uneven Schur
    splits at the largest power of 2, whose panel products run as
    rectangular trmm/syrk sweeps — so N = 20480 or 12800 ride the same
    kernels as N = 16384 (the leaf set is the binary decomposition of
    ``n``). Both outputs have exact zeros above the diagonal; only the
    lower triangle of ``a`` is read.

    ``fast=True`` runs ONLY the outermost level's M21 assembly (~25% of
    all MACs — the one block no factor step consumes) at the 2-pass
    bf16x2 split: L keeps full bf16x3 accuracy, M's bottom-left block
    loosens to ~2^-9. Anything deeper NaNs (see _chol_inv_value). Pairs
    with the fast-gradient contraction for sampler warmup
    (gp.logml_value_and_grad(fast_gradients=True)).

    ``spine=True`` SKIPS the trailing-spine M21 assemblies entirely
    (~N^3/7 MACs) and leaves those blocks zero: the factorization for the
    stochastic-hybrid gradient path, where solves run through
    :func:`spine_solve_lower` / :func:`spine_solve_lower_t` and the trace
    term is probe-estimated instead of needing the dense inverse.

    Three layouts (measured A/Bs on chip at N=16k, rounds 3-4 — PERF.md):

    * ``layout="recursion"`` (value recursion, per-level concatenate
      assembly): XLA flattens the nested concatenates into single writes,
      so the VERDICT-r2 hypothesis that they cost ~N^2 HBM per level was
      WRONG; don't re-attempt to "optimize them away".
    * ``layout="panel"`` (flat right-looking panel factorization +
      recursive inverse assembly, round 4): standalone 83.9 vs the
      recursion's 98.1 ms/call — see :func:`_panel_value` and the in-situ
      A/B in PERF.md for which is the default.
    * ``fast_compile=True`` (in-place: kernels read operands at scalar-
      prefetched tile offsets from the full-size buffers; blocks land once
      via dynamic_update_slice; Schur complements staged inside ``l``):
      fastest compile (~37 s vs ~224 s round-3) — for interactive/
      unjitted-cache use where this platform's missing persistent compile
      cache makes the compile dominate.

    ``layout=None`` takes the module default ``DEFAULT_LAYOUT``
    (overridable via the ``GPX_CHOL_LAYOUT`` env var for A/B runs).
    """
    n = a.shape[-1]
    pow2 = n > 0 and (n & (n - 1)) == 0
    if a.shape != (n, n) or n == 0 or (not pow2 and n % bt):
        raise ValueError(
            f"chol_inv needs (n, n) with n a power of 2 or a multiple of"
            f" bt={bt}: {a.shape}"
        )
    if base & (base - 1) or bt & (bt - 1) or base < bt:
        raise ValueError(f"base ({base}) / bt ({bt}) must be powers of 2, base >= bt")
    if spine and (fast or fast_compile):
        raise ValueError(
            "spine=True skips the trailing M21 chain entirely — fast "
            "(which loosens only that chain) has no effect, and the "
            "fast_compile layout does not implement it"
        )
    a = jnp.asarray(a, jnp.float32)
    if n <= base and pow2:
        return chol_inv_tile(a, interpret=interpret, fast=fast)
    if layout is None:
        layout = DEFAULT_LAYOUT
    if layout not in ("panel", "recursion"):
        raise ValueError(f"unknown chol_inv layout: {layout!r}")
    if not fast_compile:
        value = _panel_value if layout == "panel" else _rec_value
        return value(a, base=base, bt=bt, interpret=interpret,
                     fast=fast, spine=spine)
    l = jnp.zeros((n, n), jnp.float32)
    m = jnp.zeros((n, n), jnp.float32)
    l, m = _rec(a, 0, n, l, m, base=base, bt=bt, interpret=interpret,
                fast=fast)
    # the staged Schur deposits leave garbage on l's block-level upper
    # triangle (syrk_lower's unvisited upper tiles); one masked pass clears
    # it (m never receives off-triangle writes). A zero-filling syrk variant
    # measured SLOWER (see syrk_lower's docstring) — keep the mask.
    return jnp.tril(l), m


def _hmm(a, b):
    """Matrix product at HIGHEST precision: the spine solves are matrix-
    matrix products on the probe RHS blocks, where this chip's single-pass
    bf16 default would cost ~3 digits (CLAUDE.md); at s <= 128 columns the
    6-pass cost is microseconds."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def spine_solve_lower(l, m, b, *, base: int = _BASE_TILE):
    """``L^{-1} @ b`` from a ``chol_inv(..., spine=True)`` factorization.

    ``b``: (n,) or (n, s). Uses the full leading-child inverse blocks as
    dense products and forward-substitutes down the trailing spine (whose
    M21 blocks were skipped): per level, ``u1 = M11 b1`` then
    ``u2 = spine(b2 - L21 u1)`` — log-depth latency, same MACs as the
    dense-M matvec route."""
    n = l.shape[-1]
    if n <= base and (n & (n - 1)) == 0:
        return _hmm(m, b)
    h = _split(n)
    u1 = _hmm(m[:h, :h], b[:h])
    r2 = b[h:] - _hmm(l[h:, :h], u1)
    u2 = spine_solve_lower(l[h:, h:], m[h:, h:], r2, base=base)
    return jnp.concatenate([u1, u2], axis=0)


def spine_solve_lower_t(l, m, b, *, base: int = _BASE_TILE):
    """``L^{-T} @ b`` from a spine factorization (see
    :func:`spine_solve_lower`): backward-substitutes up the spine —
    ``x2 = spine_t(b2)`` then ``x1 = M11^T (b1 - L21^T x2)``."""
    n = l.shape[-1]
    if n <= base and (n & (n - 1)) == 0:
        return _hmm(m.T, b)
    h = _split(n)
    x2 = spine_solve_lower_t(l[h:, h:], m[h:, h:], b[h:], base=base)
    x1 = _hmm(m[:h, :h].T, b[:h] - _hmm(l[h:, :h].T, x2))
    return jnp.concatenate([x1, x2], axis=0)
