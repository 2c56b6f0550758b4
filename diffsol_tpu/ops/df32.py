"""Double-float (two-f32 compensated) arithmetic for Pallas TPU kernels.

Mosaic (the Pallas TPU compiler) has no f64: the fused whole-solve stepper
(:mod:`diffsol_tpu.ops.pallas_stepper`) therefore carries every state
quantity as an UNEVALUATED SUM of two f32s, ``x = hi + lo`` with
``|lo| <= ulp(hi)/2`` -- the classic double-float representation (Dekker
1971; Knuth TAOCP 4.2.2; the df64 arithmetic of GPU computing before
hardware f64).  Relative accuracy ~2^-48 (vs f64's 2^-53): four orders of
magnitude below the tightest stiff-solver tolerances in the reference's
benchmark suite, and far beyond plain f32 (2^-24), whose whole-solve mode
is documented to diverge on Robertson past t~1e8 (docs/design.md round-3
measurements).

All operations are branch-free elementwise f32 VPU code: `two_sum` is
Knuth's 6-flop branchless error-free addition, `two_prod` uses Dekker
splitting (no FMA primitive is exposed through jnp/XLA).  The compiler
must not reassociate floating-point math for these identities to hold;
XLA and Mosaic both preserve FP semantics by default.

Values are :class:`DF` NamedTuples of equal-shaped f32 arrays, valid as
jax pytrees (so they ride `lax.while_loop` carries inside kernels).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for f32 (24-bit mantissa)


class DF(NamedTuple):
    hi: jax.Array
    lo: jax.Array


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def two_sum(a, b):
    """Error-free a + b = s + e (Knuth, branch-free, 6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Error-free a + b = s + e, REQUIRES |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Dekker split: a = hi + lo with 12-bit halves."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + e via Dekker splitting (no FMA)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# --------------------------------------------------------------------------
# DF constructors / conversions
# --------------------------------------------------------------------------


def from_f32(x) -> DF:
    x = _f32(x)
    return DF(x, jnp.zeros_like(x))


def from_f64(x) -> DF:
    """Host-side split of an f64 array into (hi, lo) f32 pair."""
    x = jnp.asarray(x, jnp.float64)
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return DF(hi, lo)


def to_f64(x: DF):
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def const(v, like=None) -> DF:
    """DF constant from a python float, split exactly at trace time."""
    import numpy as np

    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    if like is None:
        return DF(jnp.asarray(hi), jnp.asarray(lo))
    return DF(jnp.full_like(like, hi), jnp.full_like(like, lo))


def zeros_like(x: DF) -> DF:
    return DF(jnp.zeros_like(x.hi), jnp.zeros_like(x.hi))


# --------------------------------------------------------------------------
# arithmetic (all ~IEEE double-float accuracy, branch-free)
# --------------------------------------------------------------------------


def add(x: DF, y: DF) -> DF:
    """Accurate dd-add (20 flops): exact under cancellation, which Newton
    deltas and difference updates hit constantly."""
    s1, s2 = two_sum(x.hi, y.hi)
    t1, t2 = two_sum(x.lo, y.lo)
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return DF(*quick_two_sum(s1, s2))


def neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def sub(x: DF, y: DF) -> DF:
    return add(x, neg(y))


def mul(x: DF, y: DF) -> DF:
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return DF(*quick_two_sum(p, e))


def mul_f32(x: DF, c) -> DF:
    """x * c with c an exact f32 (e.g. integer constants, signs)."""
    c = _f32(c)
    p, e = two_prod(x.hi, c)
    e = e + x.lo * c
    return DF(*quick_two_sum(p, e))


def div(x: DF, y: DF) -> DF:
    """Long division, three quotient terms (full dd accuracy)."""
    q1 = x.hi / y.hi
    r = sub(x, mul_f32(y, q1))
    q2 = r.hi / y.hi
    r = sub(r, mul_f32(y, q2))
    q3 = r.hi / y.hi
    s, e = quick_two_sum(q1, q2)
    return add(DF(s, e), DF(q3, jnp.zeros_like(q3)))


def recip(y: DF) -> DF:
    return div(from_f32(jnp.ones_like(y.hi)), y)


def abs_(x: DF) -> DF:
    flip = x.hi < 0.0
    return DF(jnp.where(flip, -x.hi, x.hi), jnp.where(flip, -x.lo, x.lo))


def where(mask, x: DF, y: DF) -> DF:
    return DF(jnp.where(mask, x.hi, y.hi), jnp.where(mask, x.lo, y.lo))


def fma(a: DF, b: DF, c: DF) -> DF:
    """a*b + c at dd accuracy (the D-transform workhorse)."""
    return add(mul(a, b), c)


# comparisons (exact on the dd order)
def lt(x: DF, y: DF):
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo < y.lo))


def le(x: DF, y: DF):
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo <= y.lo))


def gt(x: DF, y: DF):
    return lt(y, x)


def ge(x: DF, y: DF):
    return le(y, x)


def maximum(x: DF, y: DF) -> DF:
    return where(ge(x, y), x, y)


def minimum(x: DF, y: DF) -> DF:
    return where(le(x, y), x, y)


# --------------------------------------------------------------------------
# plain-f32 algebra with the same interface (the f32-tier kernel reuses the
# exact same stepper code parameterized over the scalar algebra)
# --------------------------------------------------------------------------


class F32Algebra:
    """Scalar algebra over plain f32 arrays (for the f32 kernel tier)."""

    @staticmethod
    def from_f64(x):
        return jnp.asarray(x, jnp.float32)

    @staticmethod
    def to_f64(x):
        return x.astype(jnp.float64)

    @staticmethod
    def const(v, like=None):
        return jnp.full_like(like, v) if like is not None else _f32(v)

    from_f32 = staticmethod(_f32)
    add = staticmethod(lambda x, y: x + y)
    sub = staticmethod(lambda x, y: x - y)
    mul = staticmethod(lambda x, y: x * y)
    mul_f32 = staticmethod(lambda x, c: x * _f32(c))
    div = staticmethod(lambda x, y: x / y)
    neg = staticmethod(lambda x: -x)
    abs_ = staticmethod(jnp.abs)
    where = staticmethod(jnp.where)
    fma = staticmethod(lambda a, b, c: a * b + c)
    lt = staticmethod(lambda x, y: x < y)
    le = staticmethod(lambda x, y: x <= y)
    gt = staticmethod(lambda x, y: x > y)
    ge = staticmethod(lambda x, y: x >= y)
    maximum = staticmethod(jnp.maximum)
    minimum = staticmethod(jnp.minimum)

    @staticmethod
    def hi(x):
        return x

    @staticmethod
    def zeros_like(x):
        return jnp.zeros_like(x)


class DFAlgebra:
    """Scalar algebra over DF pairs (the f64-tier kernel)."""

    DF = DF
    from_f64 = staticmethod(from_f64)
    to_f64 = staticmethod(to_f64)
    const = staticmethod(const)
    from_f32 = staticmethod(from_f32)
    add = staticmethod(add)
    sub = staticmethod(sub)
    mul = staticmethod(mul)
    mul_f32 = staticmethod(mul_f32)
    div = staticmethod(div)
    neg = staticmethod(neg)
    abs_ = staticmethod(abs_)
    where = staticmethod(where)
    fma = staticmethod(fma)
    lt = staticmethod(lt)
    le = staticmethod(le)
    gt = staticmethod(gt)
    ge = staticmethod(ge)
    maximum = staticmethod(maximum)
    minimum = staticmethod(minimum)

    @staticmethod
    def hi(x: DF):
        return x.hi

    @staticmethod
    def zeros_like(x: DF):
        return zeros_like(x)
