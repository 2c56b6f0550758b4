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
# FAST variants (the precision="fast" kernel tier): the QD library's
# "sloppy" double-double operations.  The fused whole-solve kernel is
# VPU-THROUGHPUT bound (docs/design.md round-5 census: dd-adds are ~60%
# of the step's vector flops), so the 20->11-flop add and the
# 120->33-flop division buy wall-clock almost 1:1.  Accuracy: identical
# ABSOLUTE error bound to the accurate ops (~2^-47 of the operand
# magnitudes); under deep cancellation the RELATIVE error of the (tiny)
# result can reach the lost-lo level instead of staying error-free.  In
# the BDF kernel every cancellation-prone quantity (Newton delta, error
# estimate, difference-matrix tails) feeds a TOLERANCE-scaled test, so
# the practical floor is ~1e-9-relative trajectories at rtol=1e-4 --
# measured on the robertson t=4e10 fixture in
# tests/test_pallas_stepper.py::test_pallas_stepper_fast_interpret.
# --------------------------------------------------------------------------


def add_sloppy(x: DF, y: DF) -> DF:
    """Sloppy dd-add (11 flops): error-free two_sum on the hi words; the
    lo words join the error term in plain f32 (QD's default add)."""
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return DF(*quick_two_sum(s, e))


def sub_sloppy(x: DF, y: DF) -> DF:
    return add_sloppy(x, neg(y))


def div_fast(x: DF, y: DF) -> DF:
    """Two-term long division (~33 flops, ~2^-45 relative)."""
    q1 = x.hi / y.hi
    r = sub_sloppy(x, mul_f32(y, q1))
    q2 = r.hi / y.hi
    return DF(*quick_two_sum(q1, q2))


def recip_fast(y: DF) -> DF:
    return div_fast(from_f32(jnp.ones_like(y.hi)), y)


class FastOps:
    """Module-like namespace mirroring the df32 function surface with the
    sloppy add/sub and the two-term division swapped in.  The fused
    kernels take this (or the df32 module itself) as their scalar-ops
    vtable, so ``precision="fast"`` is one namespace switch."""

    DF = DF
    add = staticmethod(add_sloppy)
    sub = staticmethod(sub_sloppy)
    div = staticmethod(div_fast)
    recip = staticmethod(recip_fast)
    # identical to the accurate tier
    mul = staticmethod(mul)
    mul_f32 = staticmethod(mul_f32)
    neg = staticmethod(neg)
    abs_ = staticmethod(abs_)
    where = staticmethod(where)
    zeros_like = staticmethod(zeros_like)
    const = staticmethod(const)
    from_f32 = staticmethod(from_f32)
    lt = staticmethod(lt)
    le = staticmethod(le)
    gt = staticmethod(gt)
    ge = staticmethod(ge)
    maximum = staticmethod(maximum)
    minimum = staticmethod(minimum)

    @staticmethod
    def fma(a: DF, b: DF, c: DF) -> DF:
        return add_sloppy(mul(a, b), c)


# --------------------------------------------------------------------------
# transcendentals (argument reduction + polynomial kernels, Mosaic-safe)
#
# These unlock the fused whole-solve Pallas tiers for exp/log/trig
# right-hand sides -- the reference's hot loop is model-agnostic
# (reference crates/diffsol/src/ode_solver/bdf.rs:1277-1465; its DiffSL
# bridge feeds exp/sinh/tanh-heavy models like benches/pybamm_dfn.diffsl).
# Only Mosaic-supported f32 elementwise ops are used: exp/log/sqrt on the
# hi part seed the initial guesses, i32 bit manipulation builds exact
# powers of two, and everything else is df arithmetic.
#
# Accuracy notes (documented, measured in tests/test_df32.py):
# * exp/expm1/log/sqrt/tanh/sinh/cosh: ~2^-47 relative.
# * sin/cos: the pi/2 argument reduction is done in df, so the ABSOLUTE
#   error grows like |x| * 2^-48 (fine for ODE right-hand sides with
#   moderate arguments; this is the classic Cody-Waite tradeoff at two
#   splits).
# * Representation floor (all of df32, not just these): once a result's
#   lo word reaches the f32-subnormal range it is flushed (TPU is FTZ),
#   so relative accuracy degrades below |result| ~ 1e-24 (lost lo <=
#   min-normal 1.2e-38 absolute, i.e. rel err <= 1.2e-38/|result|),
#   bottoming out at the plain-f32 2^-24 below ~4e-31 -- the same range
#   limit the XLA path's norm clamps acknowledge (ops/controller.py).
#   For exp that means full accuracy on x in (-55, 88.7], 1e-9-class
#   down to x ~ -69.
# --------------------------------------------------------------------------

_LN2_64 = 0.6931471805599453094172321214581766
_LOG2E_32 = 1.4426950408889634  # rounded to f32 below
_PIO2_64 = 1.5707963267948966192313216916397514


def _cody_waite(v64: float, bits: int = 12, parts: int = 3):
    """Split v into `parts` f32 words of <= `bits` mantissa bits plus one
    full-precision f32 tail.  Products of the truncated words with an
    integer |k| < 2^(24-bits) are EXACT in f32, so the reduction
    x - k*v computes without the df-mul rounding that would otherwise
    survive the cancellation (~2^-24 * ulp(k*v) absolute)."""
    import numpy as np_

    words = []
    rem = np_.float64(v64)
    for _ in range(parts):
        m, e = np_.frexp(rem)
        c = float(np_.ldexp(np_.trunc(np_.ldexp(m, bits)), int(e) - bits))
        words.append(np_.float32(c))
        rem = rem - np_.float64(np_.float32(c))
    words.append(np_.float32(rem))
    return words


_LN2_CW = _cody_waite(_LN2_64)
_PIO2_CW = _cody_waite(_PIO2_64)


def _reduce_exact(x: DF, kf, words):
    """x - kf * sum(words) with the truncated-word products exact
    (requires |kf| < 2^12 -- guaranteed by the callers' ranges)."""
    r = x
    for w in words[:-1]:
        r = sub(r, DF(kf * w, jnp.zeros_like(kf)))
    # the tail word's product rounds, but at ~2^-37 * |k*v| it is far
    # below the df target
    return sub(r, DF(kf * words[-1], jnp.zeros_like(kf)))


def _round_to_i32(x):
    """round-half-away-from-zero to i32 (truncating f32->i32 convert)."""
    half = jnp.where(x >= 0.0, jnp.float32(0.5), jnp.float32(-0.5))
    return (x + half).astype(jnp.int32)


def _two_pow(k):
    """Exact 2^k as f32 from i32 k via exponent-bit construction
    (clamped to the normal range [-126, 127]; callers fix up the
    overflow/underflow ends from the unreduced argument)."""
    biased = jnp.clip(k + 127, 1, 254)
    return jax.lax.bitcast_convert_type(
        (biased << 23).astype(jnp.int32), jnp.float32
    )


def _exp_reduced(x: DF):
    """(s, k, p2) with exp(x) = 2^k * (1 + s), |reduced r| <= ln2/2.

    Series on r/256 (5 terms suffice at |r/256| <= 1.4e-3) then 8
    expm1-squarings s <- s*(s+2) -- the QD/dd-real recipe."""
    kf_raw = x.hi * jnp.float32(_LOG2E_32)
    k = _round_to_i32(kf_raw)
    kf = k.astype(jnp.float32)
    r = _reduce_exact(x, kf, _LN2_CW)
    # exact scaling by 2^-8
    r = DF(r.hi * jnp.float32(2.0**-8), r.lo * jnp.float32(2.0**-8))
    # s = r*(1 + r*(1/2 + r*(1/6 + r*(1/24 + r/120)))), Horner
    s = mul_f32(r, 1.0 / 120.0)
    for c in (1.0 / 24.0, 1.0 / 6.0, 0.5, 1.0):
        s = mul(r, add(const(c, like=x.hi), s))
    for _ in range(8):  # expm1 squaring: s <- s^2 + 2s
        s = add(mul(s, s), mul_f32(s, 2.0))
    return s, k, _two_pow(k)


# f32 exp overflows just above 88.72, underflows (to subnormal) below ~-87.3
_EXP_HI = 88.0
_EXP_LO = -87.0


def exp(x: DF) -> DF:
    s, _k, p2 = _exp_reduced(x)
    one_plus = add(const(1.0, like=x.hi), s)
    out = DF(one_plus.hi * p2, one_plus.lo * p2)  # exact pow-2 scale
    inf = jnp.full_like(x.hi, jnp.inf)
    out = where(x.hi > _EXP_HI, DF(inf, jnp.zeros_like(x.hi)), out)
    return where(x.hi < _EXP_LO, zeros_like(x), out)


def expm1(x: DF) -> DF:
    """exp(x) - 1, accurate near 0 (2^k*s + (2^k - 1), both error-free)."""
    s, _k, p2 = _exp_reduced(x)
    p2m1 = DF(*two_sum(p2, jnp.float32(-1.0)))
    out = add(DF(s.hi * p2, s.lo * p2), p2m1)
    inf = jnp.full_like(x.hi, jnp.inf)
    out = where(x.hi > _EXP_HI, DF(inf, jnp.zeros_like(x.hi)), out)
    neg1 = const(-1.0, like=x.hi)
    return where(x.hi < _EXP_LO, neg1, out)


def log(x: DF) -> DF:
    """log(m) + q*ln2 with x = m * 2^q, m in [1, 2): the mantissa log is
    one df Newton refinement of the f32 seed (y1 = y0 + m*e^-y0 - 1,
    doubling 24 bits to ~48), the exponent part recombines through the
    exact Cody-Waite words so the near-1 cancellation (x just below a
    power of two) stays error-free."""
    xb = jax.lax.bitcast_convert_type(x.hi, jnp.int32)
    q = ((xb >> 23) & 0xFF) - 127
    p2 = _two_pow(-q)  # exact
    m = DF(x.hi * p2, x.lo * p2)
    a0 = jnp.log(m.hi)
    e = exp(DF(-a0, jnp.zeros_like(a0)))
    t = mul(m, e)
    logm = add(DF(a0, jnp.zeros_like(a0)), sub(t, const(1.0, like=x.hi)))
    out = _reduce_exact(logm, -q.astype(jnp.float32), _LN2_CW)
    # non-positive inputs keep the f32 semantics (log(0) = -inf, NaN else)
    bad = jnp.log(x.hi)
    return where(x.hi > 0.0, out, DF(bad, jnp.zeros_like(bad)))


def log1p(x: DF) -> DF:
    """Alternating series on |x| < 1/32 (11 terms: next term rel
    ~(1/32)^11 < 2^-55); log(1+x) outside, where |log1p| >= 0.03 keeps
    the log refinement's ~2^-47 ABSOLUTE error below ~2.5e-13 relative."""
    small = jnp.abs(x.hi) < (1.0 / 32.0)
    s = mul_f32(x, -1.0 / 12.0)
    for k in range(11, 0, -1):
        c = (1.0 if k % 2 == 1 else -1.0) / k
        s = mul(x, add(const(c, like=x.hi), s))
    big = log(add(const(1.0, like=x.hi), x))
    # keep the log branch NaN-free where the series is selected (x ~ -1
    # never lands in the series window)
    return where(small, s, big)


def sqrt(x: DF) -> DF:
    """sqrt(m) * 2^j with x = m * 2^(2j), m in [1, 4): the f32 seed +
    one df Newton step run at unit scale (no subnormal residuals), the
    power-of-two rescale is exact.  Exact 0, NaN for negatives."""
    xb = jax.lax.bitcast_convert_type(x.hi, jnp.int32)
    q = ((xb >> 23) & 0xFF) - 127
    j = q >> 1  # arithmetic shift: floor division for negatives
    m = DF(x.hi * _two_pow(-2 * j), x.lo * _two_pow(-2 * j))
    s0 = jnp.sqrt(m.hi)
    safe = jnp.where(s0 > 0.0, s0, jnp.float32(1.0))
    sdf = DF(safe, jnp.zeros_like(safe))
    e = div(sub(m, mul(sdf, sdf)), mul_f32(sdf, 2.0))
    s = add(sdf, e)
    out = DF(s.hi * _two_pow(j), s.lo * _two_pow(j))
    bad = jnp.sqrt(x.hi)  # 0, NaN, inf semantics from f32
    return where((x.hi > 0.0) & jnp.isfinite(x.hi), out,
                 DF(bad, jnp.zeros_like(bad)))


def rsqrt(x: DF) -> DF:
    return recip(sqrt(x))


def _poly_z(z: DF, coeffs, like):
    """Horner in z for a coefficient list (highest order first)."""
    acc = const(coeffs[0], like=like)
    for c in coeffs[1:]:
        acc = add(mul(z, acc), const(c, like=like))
    return acc


# Taylor coefficients on |r| <= pi/4 (+ reduction slop), highest first
_SIN_C = [
    -1.0 / 1307674368000.0, 1.0 / 6227020800.0, -1.0 / 39916800.0,
    1.0 / 362880.0, -1.0 / 5040.0, 1.0 / 120.0, -1.0 / 6.0, 1.0,
]
_COS_C = [
    1.0 / 20922789888000.0, -1.0 / 87178291200.0, 1.0 / 479001600.0,
    -1.0 / 3628800.0, 1.0 / 40320.0, -1.0 / 720.0, 1.0 / 24.0, -0.5, 1.0,
]


def sincos(x: DF):
    """(sin x, cos x) via mod-pi/2 reduction + Taylor with quadrant
    selection.  The Cody-Waite reduction is exact for |x| < ~6e3 (|j| <
    2^12); beyond that the truncated-word products start rounding."""
    inv_pio2 = jnp.float32(0.63661977236758134308)
    j = _round_to_i32(x.hi * inv_pio2)
    jf = j.astype(jnp.float32)
    r = _reduce_exact(x, jf, _PIO2_CW)
    z = mul(r, r)
    sin_t = mul(r, _poly_z(z, _SIN_C, x.hi))
    cos_t = _poly_z(z, _COS_C, x.hi)
    q = j & 3  # two's-complement & keeps negatives correct (-1 & 3 = 3)
    sin_o = where(q == 0, sin_t,
                  where(q == 1, cos_t,
                        where(q == 2, neg(sin_t), neg(cos_t))))
    cos_o = where(q == 0, cos_t,
                  where(q == 1, neg(sin_t),
                        where(q == 2, neg(cos_t), sin_t)))
    return sin_o, cos_o


def sin(x: DF) -> DF:
    return sincos(x)[0]


def cos(x: DF) -> DF:
    return sincos(x)[1]


def tan(x: DF) -> DF:
    s, c = sincos(x)
    return div(s, c)


def sinh(x: DF) -> DF:
    """(expm1(x) - expm1(-x))/2: cancellation-free near 0."""
    return mul_f32(sub(expm1(x), expm1(neg(x))), 0.5)


def cosh(x: DF) -> DF:
    e = exp(abs_(x))  # cosh is even; |x| keeps 1/e from overflowing first
    out = mul_f32(add(e, recip(e)), 0.5)
    inf = jnp.full_like(x.hi, jnp.inf)
    return where(jnp.abs(x.hi) > _EXP_HI, DF(inf, jnp.zeros_like(x.hi)), out)


def tanh(x: DF) -> DF:
    """expm1(2x) / (expm1(2x) + 2), saturated past |x| > 22."""
    u = expm1(mul_f32(x, 2.0))
    t = div(u, add(u, const(2.0, like=x.hi)))
    sat = jnp.abs(x.hi) > 22.0
    sign_one = DF(jnp.where(x.hi >= 0.0, 1.0, -1.0).astype(jnp.float32),
                  jnp.zeros_like(x.hi))
    return where(sat, sign_one, t)


def pow_(x: DF, y: DF) -> DF:
    """x**y = exp(y log x) for x > 0 (NaN otherwise, like lax.pow on
    non-integer exponents)."""
    return exp(mul(y, log(x)))


def logistic(x: DF) -> DF:
    one = const(1.0, like=x.hi)
    return recip(add(one, exp(neg(x))))


def square(x: DF) -> DF:
    return mul(x, x)


def sign(x: DF) -> DF:
    s = jnp.where(x.hi > 0.0, 1.0, jnp.where(x.hi < 0.0, -1.0, 0.0))
    return DF(s.astype(jnp.float32), jnp.zeros_like(x.hi))


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

    # transcendentals: native f32 where Mosaic lowers them directly;
    # expm1-composed forms for the hyperbolics (graceful near 0, and they
    # avoid relying on less-common Mosaic lowerings)
    exp = staticmethod(jnp.exp)
    expm1 = staticmethod(lambda x: jnp.expm1(x))
    log = staticmethod(jnp.log)
    log1p = staticmethod(lambda x: jnp.log1p(x))
    sqrt = staticmethod(jnp.sqrt)
    rsqrt = staticmethod(lambda x: 1.0 / jnp.sqrt(x))
    sin = staticmethod(jnp.sin)
    cos = staticmethod(jnp.cos)
    tan = staticmethod(lambda x: jnp.sin(x) / jnp.cos(x))
    sinh = staticmethod(lambda x: 0.5 * (jnp.expm1(x) - jnp.expm1(-x)))
    cosh = staticmethod(lambda x: 0.5 * (jnp.exp(x) + jnp.exp(-x)))
    tanh = staticmethod(jnp.tanh)
    pow_ = staticmethod(lambda x, y: jnp.exp(y * jnp.log(x)))
    logistic = staticmethod(lambda x: 1.0 / (1.0 + jnp.exp(-x)))
    square = staticmethod(lambda x: x * x)
    sign = staticmethod(
        lambda x: jnp.where(x > 0.0, 1.0, jnp.where(x < 0.0, -1.0, 0.0))
        .astype(jnp.float32)
    )


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

    exp = staticmethod(exp)
    expm1 = staticmethod(expm1)
    log = staticmethod(log)
    log1p = staticmethod(log1p)
    sqrt = staticmethod(sqrt)
    rsqrt = staticmethod(rsqrt)
    sin = staticmethod(sin)
    cos = staticmethod(cos)
    tan = staticmethod(tan)
    sinh = staticmethod(sinh)
    cosh = staticmethod(cosh)
    tanh = staticmethod(tanh)
    pow_ = staticmethod(pow_)
    logistic = staticmethod(logistic)
    square = staticmethod(square)
    sign = staticmethod(sign)


class FastDFAlgebra(DFAlgebra):
    """DFAlgebra with the sloppy add/sub and two-term division -- the
    jaxpr-interpreter algebra of the ``precision="fast"`` kernel tier
    (rhs/root/reset evaluation; transcendental kernels keep the accurate
    internals, only the exposed add/sub/div cheapen)."""

    add = staticmethod(add_sloppy)
    sub = staticmethod(sub_sloppy)
    div = staticmethod(div_fast)

    @staticmethod
    def fma(a: DF, b: DF, c: DF) -> DF:
        return add_sloppy(mul(a, b), c)


class F32Algebra:
    """Plain-f32 scalar algebra for the jaxpr interpreters (the MIXED
    precision kernel tier): values are raw f32 lane arrays, every op is
    one VPU instruction instead of a ~10-25-flop error-free transform.
    Used where f32 noise (~6e-8 relative) sits orders below the solver
    tolerance it feeds -- e.g. Jacobian probes for the Newton matrix
    (inexact-Newton theory: J accuracy only gates the convergence RATE;
    reference nonlinear_solver/newton.rs iterates on stale J anyway)."""

    @staticmethod
    def const(v, like=None):
        import numpy as np

        hi = np.float32(v)
        if like is None:
            return jnp.asarray(hi)
        return jnp.full_like(like, hi)

    from_f32 = staticmethod(lambda x: _f32(x))
    add = staticmethod(jnp.add)
    sub = staticmethod(jnp.subtract)
    mul = staticmethod(jnp.multiply)
    div = staticmethod(jnp.divide)
    neg = staticmethod(jnp.negative)
    abs_ = staticmethod(jnp.abs)
    where = staticmethod(jnp.where)

    @staticmethod
    def fma(a, b, c):
        return a * b + c

    lt = staticmethod(jnp.less)
    le = staticmethod(jnp.less_equal)
    gt = staticmethod(jnp.greater)
    ge = staticmethod(jnp.greater_equal)
    maximum = staticmethod(jnp.maximum)
    minimum = staticmethod(jnp.minimum)

    @staticmethod
    def hi(x):
        return x

    zeros_like = staticmethod(jnp.zeros_like)
    exp = staticmethod(jnp.exp)
    expm1 = staticmethod(jnp.expm1)
    log = staticmethod(jnp.log)
    log1p = staticmethod(jnp.log1p)
    sqrt = staticmethod(jnp.sqrt)

    @staticmethod
    def rsqrt(x):
        return jax.lax.rsqrt(x)

    sin = staticmethod(jnp.sin)
    cos = staticmethod(jnp.cos)
    tan = staticmethod(jnp.tan)
    sinh = staticmethod(jnp.sinh)
    cosh = staticmethod(jnp.cosh)
    tanh = staticmethod(jnp.tanh)

    @staticmethod
    def pow_(x, y):
        # Mosaic-safe: positive-base pow via exp/log (matches the df
        # tier's domain; robertson-class rhs powers are on positives)
        return jnp.exp(y * jnp.log(x))

    @staticmethod
    def logistic(x):
        return jax.nn.sigmoid(x)

    square = staticmethod(jnp.square)
    sign = staticmethod(jnp.sign)
