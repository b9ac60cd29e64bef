"""Covariance kernels as JAX pytrees.

Re-designs the reference kernel layer for TPU:

* The Scala side evaluates kernels entry-by-entry on a JVM-built distance
  matrix (``core/src/main/scala/gp/KernelFunction.scala:8-55`` applied over
  ``GaussianProcess.distanceMatrix``, an O(N^2) scalar loop at
  ``GaussianProcess.scala:50-61``). Here a kernel is a pytree whose
  ``evaluate_r2`` maps a whole *squared*-distance array at once, so Gram
  construction is one fused XLA/Pallas pass on the MXU/VPU
  (see :mod:`gpx.ops.gram` and :mod:`gpx.ops.pallas_gram`).
* Hyperparameters are pytree leaves, so ``jax.grad`` of the marginal
  likelihood flows through kernels directly — replacing the hand-derived
  (and buggy, KernelParameters.scala:276-277) gradient tables.
* ``Sum`` reproduces the reference combinator (KernelFunction.scala:47-55);
  ``Product`` implements the combinator the reference left as a TODO
  (KernelFunction.scala:40-41).

Kernel parameter ADT parity (KernelParameters.scala:21-67):
``SquaredExp(h, sigma)`` -> :class:`SquaredExponential`,
``Matern(sigma, nu, l)`` -> :class:`Matern`, ``White(sigma)`` -> :class:`White`.

Matérn note: the reference's Matérn is mathematically wrong — it calls the
modified Bessel function of the *first* kind ``i0`` regardless of ``nu``
(KernelFunction.scala:22-28). We implement the correct Matérn with exact
closed forms for every half-integer ``nu`` (1/2, 3/2, 5/2, ...); parity
target is the math, not the reference (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gpx import bijectors as bij
from gpx.utils.pytree import pytree_dataclass


def _safe_dist(r2):
    """``sqrt(r2)`` with a finite gradient at ``r2 == 0``.

    ``d(sqrt)/d(r2)`` diverges at 0, so a plain ``sqrt(maximum(r2, 0))``
    produces ``0 * inf = NaN`` cotangents whenever a pairwise squared
    distance is exactly zero — e.g. gradients w.r.t. inducing-point
    locations initialised on training points (``svgp.train`` with
    ``train_inducing=True``). The double-``where`` evaluates the sqrt on a
    safe input and pins both value and gradient to 0 at coincident points
    (for ``nu < 1`` the kernel is genuinely non-differentiable there; 0 is
    the standard subgradient choice, as in GPflow/GPyTorch)."""
    zero = r2 <= 0.0
    r2_safe = jnp.where(zero, jnp.ones_like(r2), r2)
    return jnp.where(zero, jnp.zeros_like(r2), jnp.sqrt(r2_safe))


class Kernel:
    """Base mixin for covariance kernels.

    Subclasses implement ``evaluate_r2(r2)``: the kernel value as a function
    of *squared* Euclidean distance (squared distance is what the MXU-friendly
    ``|x|^2 + |y|^2 - 2 x.y`` Gram pass produces natively; kernels needing the
    plain distance take one ``sqrt``).
    """

    # -- evaluation ---------------------------------------------------------
    def evaluate_r2(self, r2):
        raise NotImplementedError

    def evaluate_xx(self, x1, x2, r2):
        """Kernel value given the raw locations AND their squared distances.
        Stationary kernels (the default) ignore the locations; non-stationary
        kernels (Linear) override this. ``x1: (N, D)``, ``x2: (M, D)``,
        ``r2: (N, M)``."""
        return self.evaluate_r2(r2)

    @property
    def is_stationary(self) -> bool:
        """True when the kernel depends on locations only through distance —
        the requirement for the fused Pallas paths."""
        return True

    @property
    def pallas_safe(self) -> bool:
        """True when ``evaluate_r2`` (and its ``jax.grad``) can run INSIDE a
        Mosaic kernel body. General-nu Matérn is excluded: its Bessel K_nu
        is a 25-iteration series/continued-fraction loop whose reverse-mode
        residual stack is O(iters * bt^2) per tile — far over VMEM on chip
        (review finding; interpret mode hides it). Such kernels use the XLA
        fallbacks instead."""
        return True

    def evaluate(self, d):
        """Kernel value at (non-squared) distance ``d`` — the reference's
        ``Double => Double`` covFn view (KernelFunction.scala:47-55)."""
        d = jnp.asarray(d)
        return self.evaluate_r2(d * d)

    def variance(self, n: int, dtype=None):
        """Kernel value at distance zero, broadcast to ``(n,)`` — the
        ``kyy = covFn(dist(xs, xs))`` term of Predict.scala:78. Only valid
        for stationary kernels; use :meth:`diag` generally."""
        z = jnp.zeros((n,), dtype=dtype or jnp.result_type(float))
        return self.evaluate_r2(z)

    def diag(self, x, dtype=None):
        """``k(x_i, x_i)`` per point — the general form of :meth:`variance`."""
        from gpx.ops.distance import as_locations

        x = as_locations(x)
        if self.is_stationary:
            return self.variance(x.shape[0], dtype=dtype or x.dtype)
        r2 = jnp.zeros((x.shape[0],), dtype=dtype or x.dtype)
        return jax.vmap(
            lambda xi: self.evaluate_xx(xi[None, :], xi[None, :],
                                        jnp.zeros((1, 1), r2.dtype))[0, 0]
        )(x)

    # -- gram construction (delegates to gpx.ops) --------------------------
    def gram(self, x, x2=None, *, nugget: float = 0.0, method: str = "auto"):
        from gpx.ops.gram import gram

        return gram(self, x, x2, nugget=nugget, method=method)

    # -- algebra ------------------------------------------------------------
    def __add__(self, other):
        a = self.kernels if isinstance(self, Sum) else (self,)
        b = other.kernels if isinstance(other, Sum) else (other,)
        return Sum(a + b)

    def __mul__(self, other):
        a = self.kernels if isinstance(self, Product) else (self,)
        b = other.kernels if isinstance(other, Product) else (other,)
        return Product(a + b)

    # -- transforms ---------------------------------------------------------
    def bijectors(self):
        """A same-structure pytree with a :class:`gpx.bijectors.Bijector` in
        every leaf slot (zips against ``self`` under ``tree_map``)."""
        raise NotImplementedError


@pytree_dataclass
class SquaredExponential(Kernel):
    """``k(d) = h * exp(-d^2 / sigma^2)`` — KernelFunction.scala:13-15.

    ``h`` is the signal variance, ``sigma`` the length-scale (the reference's
    convention: no factor of 2 in the denominator).
    """

    h: jnp.ndarray
    sigma: jnp.ndarray

    def evaluate_r2(self, r2):
        return self.h * jnp.exp(-r2 / (self.sigma * self.sigma))

    def bijectors(self):
        return SquaredExponential(h=bij.positive, sigma=bij.positive)


@pytree_dataclass(meta_fields=("nu",))
class Matern(Kernel):
    """Matérn kernel for any ``nu > 0``.

    Half-integer ``nu = p + 1/2`` uses the exact closed form
    ``k(d) = sigma * exp(-s) * (p! / (2p)!) * sum_i C(p,i) (p+i)!/p! (2s)^(p-i)``
    with ``s = sqrt(2 nu) d / l``; general ``nu`` evaluates the full
    ``sigma * 2^{1-nu}/Gamma(nu) * s^nu K_nu(s)`` via the JAX-native Bessel
    ``K_nu`` (gpx.ops.besselk, <= 1e-12 vs scipy in f64). This supersedes the
    reference, whose Matérn math is wrong — it calls the modified Bessel
    function of the *first* kind ``i0`` regardless of order
    (KernelFunction.scala:22-28). ``sigma`` is the amplitude multiplier to
    match the reference's parameterization; ``nu`` is static (part of model
    structure), unlike the reference where it sits in the flat parameter
    vector but whose constrain/unconstrain then throw
    (KernelParameters.scala:254,263) — making it un-inferable there anyway.
    """

    sigma: jnp.ndarray
    l: jnp.ndarray
    nu: float = 1.5

    def __post_init__(self):
        if self.nu <= 0:
            raise ValueError(f"Matern needs nu > 0; got nu={self.nu}")

    @property
    def _half_integer_p(self):
        p = self.nu - 0.5
        return int(round(p)) if abs(p - round(p)) < 1e-12 else None

    def evaluate_r2(self, r2):
        d = _safe_dist(r2)
        s = (math.sqrt(2.0 * self.nu) / self.l) * d
        p = self._half_integer_p
        if p is not None:
            # poly = (p!/(2p)!) * sum_{i=0}^{p} (p+i)!/(i!(p-i)!) (2s)^{p-i}
            scale = math.factorial(p) / math.factorial(2 * p)
            poly = 0.0
            for i in range(p + 1):
                coeff = math.factorial(p + i) / (
                    math.factorial(i) * math.factorial(p - i)
                )
                poly = poly + coeff * (2.0 * s) ** (p - i)
            return self.sigma * scale * poly * jnp.exp(-s)
        from gpx.ops.besselk import kv

        # guard s = 0 (k -> sigma there) with the double-where trick so the
        # s^nu * K_nu(s) branch can't NaN the value or the gradient
        zero = r2 <= 0.0
        s_safe = jnp.where(zero, jnp.ones_like(s), s)
        const = 2.0 ** (1.0 - self.nu) / math.gamma(self.nu)
        val = const * s_safe**self.nu * kv(self.nu, s_safe)
        return self.sigma * jnp.where(zero, jnp.ones_like(val), val)

    @property
    def pallas_safe(self) -> bool:
        return self._half_integer_p is not None

    def bijectors(self):
        return Matern(sigma=bij.positive, l=bij.positive, nu=self.nu)


@pytree_dataclass
class White(Kernel):
    """White-noise kernel: ``sigma`` where distance is exactly zero, else 0
    (KernelFunction.scala:33-35). As in the reference, this triggers for
    *any* zero distance — i.e. also for duplicated training locations, not
    only the Gram diagonal; see SURVEY.md §7 quirks."""

    sigma: jnp.ndarray

    def evaluate_r2(self, r2):
        return jnp.where(r2 == 0.0, self.sigma, jnp.zeros_like(r2))

    def bijectors(self):
        return White(sigma=bij.positive)


@pytree_dataclass
class RationalQuadratic(Kernel):
    """``k(d) = h * (1 + d^2 / (2 alpha l^2))^(-alpha)`` — a scale mixture of
    SE kernels. Beyond the reference's kernel set (its TODO at
    KernelFunction.scala:40-41 asks for more combinators/kernels)."""

    h: jnp.ndarray
    alpha: jnp.ndarray
    l: jnp.ndarray

    def evaluate_r2(self, r2):
        return self.h * (1.0 + r2 / (2.0 * self.alpha * self.l**2)) ** (-self.alpha)

    def bijectors(self):
        return RationalQuadratic(h=bij.positive, alpha=bij.positive, l=bij.positive)


@pytree_dataclass
class Periodic(Kernel):
    """MacKay periodic kernel ``k(d) = h * exp(-2 sin^2(pi d / p) / l^2)``.
    Beyond the reference's kernel set."""

    h: jnp.ndarray
    period: jnp.ndarray
    l: jnp.ndarray

    def evaluate_r2(self, r2):
        d = _safe_dist(r2)
        s = jnp.sin(jnp.pi * d / self.period)
        return self.h * jnp.exp(-2.0 * (s * s) / (self.l * self.l))

    def bijectors(self):
        return Periodic(h=bij.positive, period=bij.positive, l=bij.positive)


@pytree_dataclass
class Linear(Kernel):
    """Dot-product kernel ``k(x, x') = v * (x . x') + c`` — non-stationary
    (Bayesian linear regression as a GP); beyond the reference's stationary
    set. Uses the ``evaluate_xx`` interface; excluded from the Pallas
    distance-tile paths by ``is_stationary``."""

    v: jnp.ndarray
    c: jnp.ndarray

    @property
    def is_stationary(self) -> bool:
        return False

    def evaluate_r2(self, r2):
        raise TypeError("Linear is non-stationary: no distance-only form")

    def evaluate_xx(self, x1, x2, r2):
        # HIGHEST: a bf16-default Gram (5.8e-4 rel on TPU) risks losing
        # positive-definiteness before the Cholesky; D is small so the
        # 6-pass contraction is cheap
        return self.v * jnp.matmul(
            x1, x2.T, precision=jax.lax.Precision.HIGHEST
        ) + self.c

    def bijectors(self):
        return Linear(v=bij.positive, c=bij.positive)


@pytree_dataclass
class Ard(Kernel):
    """Automatic relevance determination: any distance-based kernel with
    per-dimension lengthscales — ``k(x, x') = base(||(x - x') / ell||)``.
    Beyond the reference's isotropic set (its locations are 1-D/2-D
    points with one shared scale, KernelFunction.scala:13-25); standard in
    GPflow/GPyTorch, and what type-II MLE uses to prune irrelevant input
    dimensions (ell_d → large ⇒ dimension d drops out).

    Uses the ``evaluate_xx`` interface (the weighted distance needs the
    coordinates, not the shared isotropic ``r2``), so it runs the XLA Gram
    paths, composes in Sum/Product, and its streamed matvec leg is the
    row-blocked differentiable kernel. The base kernel's own lengthscale
    is redundant under Ard — fix it at 1 by convention (it still composes
    correctly if you don't; the product ``sigma·ell_d`` is just
    unidentified). D > 8 inputs with a White term in the base are safe:
    the distance build detects White and forces the exact broadcast-diff
    form, so coincident points keep ``r2 == 0`` exactly (round-4 fix of
    the r3 docstring-only footgun)."""

    base: Kernel
    ell: jnp.ndarray     # (D,) per-dimension lengthscales

    @property
    def is_stationary(self) -> bool:
        return False     # anisotropic: needs coordinates, not isotropic r2

    def evaluate_r2(self, r2):
        raise TypeError("Ard re-weights coordinates: no isotropic-r2 form")

    def evaluate_xx(self, x1, x2, r2):
        from gpx.ops.distance import sq_distances

        s = 1.0 / self.ell
        # exact distances whenever the base has a White term (duplicate
        # points must keep r2 == 0 exactly at any D); symmetric call sites
        # pass the same array twice: route through the one-argument form,
        # which additionally zeroes the diagonal exactly
        exact = x1.shape[-1] > 8 and has_white(self.base)
        r2w = (sq_distances(x1 * s, exact=exact) if x1 is x2
               else sq_distances(x1 * s, x2 * s, exact=exact))
        return self.base.evaluate_r2(jnp.maximum(r2w, 0.0))

    def bijectors(self):
        return Ard(base=self.base.bijectors(), ell=bij.positive)


@pytree_dataclass
class Sum(Kernel):
    """Sum combinator — reference semantics (KernelFunction.scala:47-55)."""

    kernels: tuple

    def evaluate_r2(self, r2):
        out = self.kernels[0].evaluate_r2(r2)
        for k in self.kernels[1:]:
            out = out + k.evaluate_r2(r2)
        return out

    def evaluate_xx(self, x1, x2, r2):
        out = self.kernels[0].evaluate_xx(x1, x2, r2)
        for k in self.kernels[1:]:
            out = out + k.evaluate_xx(x1, x2, r2)
        return out

    @property
    def is_stationary(self) -> bool:
        return all(k.is_stationary for k in self.kernels)

    @property
    def pallas_safe(self) -> bool:
        return all(k.pallas_safe for k in self.kernels)

    def bijectors(self):
        return Sum(tuple(k.bijectors() for k in self.kernels))


@pytree_dataclass
class Product(Kernel):
    """Product combinator — the reference's noted TODO
    (KernelFunction.scala:40-41), implemented here."""

    kernels: tuple

    def evaluate_r2(self, r2):
        out = self.kernels[0].evaluate_r2(r2)
        for k in self.kernels[1:]:
            out = out * k.evaluate_r2(r2)
        return out

    def evaluate_xx(self, x1, x2, r2):
        out = self.kernels[0].evaluate_xx(x1, x2, r2)
        for k in self.kernels[1:]:
            out = out * k.evaluate_xx(x1, x2, r2)
        return out

    @property
    def is_stationary(self) -> bool:
        return all(k.is_stationary for k in self.kernels)

    @property
    def pallas_safe(self) -> bool:
        return all(k.pallas_safe for k in self.kernels)

    def bijectors(self):
        return Product(tuple(k.bijectors() for k in self.kernels))


def has_white(kernel) -> bool:
    """Whether the kernel tree contains a :class:`White` term anywhere.

    The Gram builders use this to force exact (broadcast-subtract) squared
    distances at D > 8: the norms+matmul identity can round duplicated
    locations away from exactly 0, silently dropping White's contribution
    at coincident points (reference semantics fire on *any* zero distance,
    KernelFunction.scala:33-35)."""
    if isinstance(kernel, White):
        return True
    if isinstance(kernel, (Sum, Product)):
        return any(has_white(k) for k in kernel.kernels)
    if isinstance(kernel, Ard):
        return has_white(kernel.base)
    return False


def unwrap_ard(kernel, x, x2=None):
    """Peel top-level :class:`Ard` wrappers by scaling the coordinates:
    ``K_ard(x, x') = K_base(x/ell, x'/ell)`` exactly. Gram/matvec entry
    points call this first so an ARD-wrapped stationary kernel rides the
    fused Pallas distance-tile paths (which gate on ``is_stationary``)
    instead of falling back to the dense XLA route — the scaling is one
    O(N·D) multiply. Returns ``(kernel, x, x2)`` unchanged when the top
    level is not Ard."""
    while isinstance(kernel, Ard):
        s = 1.0 / kernel.ell
        x = x * s
        if x2 is not None:
            x2 = x2 * s
        kernel = kernel.base
    return kernel, x, x2


def split_noise(kernel):
    """Split a kernel into ``(smooth_part, noise_variance)`` where the noise
    is the sum of top-level White terms — the additive diagonal that
    iterative solvers should treat as the noise floor (preconditioning,
    spectral bounds). Returns ``(None, sigma)`` for a pure-White kernel;
    White inside a Product cannot be split and stays in the smooth part."""
    if isinstance(kernel, White):
        return None, kernel.sigma
    if isinstance(kernel, Sum):
        smooth = []
        noise = jnp.asarray(0.0)
        for k in kernel.kernels:
            s, nz = split_noise(k)
            noise = noise + nz
            if s is not None:
                smooth.append(s)
        if not smooth:
            return None, noise
        out = smooth[0] if len(smooth) == 1 else Sum(tuple(smooth))
        return out, noise
    return kernel, jnp.asarray(0.0)


# -- reference smart constructors (KernelParameters.scala:69-83) -------------

def se(h, sigma) -> SquaredExponential:
    return SquaredExponential(h=jnp.asarray(h), sigma=jnp.asarray(sigma))


def matern(sigma, nu, l) -> Matern:
    return Matern(sigma=jnp.asarray(sigma), l=jnp.asarray(l), nu=float(nu))


def white(sigma) -> White:
    return White(sigma=jnp.asarray(sigma))


def linear(v, c=0.0) -> Linear:
    return Linear(v=jnp.asarray(v), c=jnp.asarray(c))


def ard(base: Kernel, ell) -> Ard:
    """Wrap ``base`` with per-dimension lengthscales ``ell`` (length D)."""
    return Ard(base=base, ell=jnp.asarray(ell))


def rational_quadratic(h, alpha, l) -> RationalQuadratic:
    return RationalQuadratic(
        h=jnp.asarray(h), alpha=jnp.asarray(alpha), l=jnp.asarray(l)
    )


def periodic(h, period, l) -> Periodic:
    return Periodic(h=jnp.asarray(h), period=jnp.asarray(period), l=jnp.asarray(l))
