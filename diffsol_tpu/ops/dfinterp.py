"""Jaxpr interpreter over the double-float scalar algebra.

The fused Pallas stepper (:mod:`diffsol_tpu.ops.pallas_stepper`) needs the
user's ``rhs(t, y, p)`` evaluated in two-f32 double-float arithmetic inside
the kernel -- but users write plain jnp code.  Rather than asking for a
hand-written df variant, this module TRACES the rhs once
(``jax.make_jaxpr`` on f32 avals) and re-evaluates the jaxpr with every
f32 scalar replaced by an algebra value (a :class:`diffsol_tpu.ops.df32.DF`
pair of (lanes,)-shaped f32 arrays).  Shapes in the jaxpr are tiny and
static (n <= 8 states), so arrays are represented as flat python lists of
algebra scalars -- everything unrolls at trace time into straight-line
branch-free VPU code, exactly what Mosaic wants.

Jacobians come from the same interpreter run under a forward-mode
DUAL-NUMBER algebra (value, tangent) layered over df32: n seed evaluations
give the n columns of df/dy at full double-float accuracy (an f32-accurate
Jacobian is NOT enough: with cond(M - cJ) ~ 1e7+ on stiff problems the
Newton update loses all contraction -- docs/design.md round-3 f32-LU
divergence measurement).

Supported primitives: arithmetic, comparisons + ``select_n``, the static
shape-plumbing set, and the TRANSCENDENTAL family (exp/expm1/log/log1p/
sqrt/rsqrt/sin/cos/tan/sinh/cosh/tanh/pow/logistic) via the df32
argument-reduction kernels (:mod:`diffsol_tpu.ops.df32`) -- this makes the
fused tier model-agnostic in the same sense as the reference's hot loop
(reference crates/diffsol/src/ode_solver/bdf.rs:1277-1465 is generic over
the equations; its DiffSL bridge feeds exp/sinh/tanh-heavy models like
benches/pybamm_dfn.diffsl).  A primitive outside the covered set raises
``UnsupportedForPallas`` -- callers fall back to the XLA lockstep path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.extend import core as jcore


class UnsupportedForPallas(Exception):
    """rhs uses a primitive the df32 kernel interpreter does not support."""


class SArr:
    """Tiny static-shaped array of algebra scalars (row-major flat list)."""

    __slots__ = ("shape", "flat")

    def __init__(self, shape, flat):
        self.shape = tuple(shape)
        self.flat = list(flat)

    @property
    def size(self):
        return int(np.prod(self.shape, dtype=np.int64)) if self.shape else 1

    def __repr__(self):
        return f"SArr(shape={self.shape}, n={len(self.flat)})"


def _strides(shape):
    s = [1] * len(shape)
    for i in range(len(shape) - 2, -1, -1):
        s[i] = s[i + 1] * shape[i + 1]
    return s


def _index(arr: SArr, idx):
    st = _strides(arr.shape)
    return arr.flat[sum(i * s for i, s in zip(idx, st))]


def _broadcast_pair(a: SArr, b: SArr):
    """Numpy-style broadcast of two SArrs; yields (out_shape, pairs)."""
    out_shape = np.broadcast_shapes(a.shape, b.shape)
    pairs = []
    for idx in np.ndindex(*out_shape) if out_shape else [()]:
        ia = tuple(
            0 if a.shape[k - (len(out_shape) - len(a.shape))] == 1 else idx[k]
            for k in range(len(out_shape) - len(a.shape), len(out_shape))
        )
        ib = tuple(
            0 if b.shape[k - (len(out_shape) - len(b.shape))] == 1 else idx[k]
            for k in range(len(out_shape) - len(b.shape), len(out_shape))
        )
        pairs.append((_index(a, ia), _index(b, ib)))
    return out_shape, pairs


def _elemwise2(alg_op, a: SArr, b: SArr) -> SArr:
    shape, pairs = _broadcast_pair(a, b)
    return SArr(shape, [alg_op(x, y) for x, y in pairs])


def _elemwise1(alg_op, a: SArr) -> SArr:
    return SArr(a.shape, [alg_op(x) for x in a.flat])


def _elemwise3(alg_op, a: SArr, b: SArr, c: SArr) -> SArr:
    out_shape = np.broadcast_shapes(a.shape, b.shape, c.shape)
    flat = []
    for idx in np.ndindex(*out_shape) if out_shape else [()]:
        def pick(arr):
            ia = tuple(
                0 if arr.shape[k - (len(out_shape) - len(arr.shape))] == 1
                else idx[k]
                for k in range(len(out_shape) - len(arr.shape), len(out_shape))
            )
            return _index(arr, ia)
        flat.append(alg_op(pick(a), pick(b), pick(c)))
    return SArr(out_shape, flat)


# unary transcendental / elementwise primitives dispatched by algebra
# attribute name; an algebra without the attribute raises
# UnsupportedForPallas (so a minimal algebra degrades gracefully)
_UNARY_ALG = {
    "exp": "exp", "expm1": "expm1", "log": "log", "log1p": "log1p",
    "sqrt": "sqrt", "rsqrt": "rsqrt", "sin": "sin", "cos": "cos",
    "tan": "tan", "sinh": "sinh", "cosh": "cosh", "tanh": "tanh",
    "logistic": "logistic", "square": "square", "sign": "sign",
}

# comparison primitives -> algebra predicate (results are RAW bool arrays
# carried in SArr slots; only logical ops / select_n may consume them)
_CMP_ALG = {"lt": "lt", "le": "le", "gt": "gt", "ge": "ge"}


def make_interpreter(alg, lanes_like):
    """Return ``run(jaxpr, consts, args) -> list[SArr]`` over algebra
    ``alg``; python/numpy literals become algebra constants broadcast to
    the lane shape of ``lanes_like`` (an f32 (lanes,) array)."""

    def lift_const(v):
        # literal scalar or tiny array -> SArr of algebra constants
        a = np.asarray(v)
        if a.ndim == 0:
            return SArr((), [alg.const(float(a), like=lanes_like)])
        return SArr(
            a.shape, [alg.const(float(x), like=lanes_like) for x in a.ravel()]
        )

    def read(env, var):
        if isinstance(var, jcore.Literal):
            return lift_const(var.val)
        return env[var]

    def run(closed_jaxpr, args):
        jaxpr = closed_jaxpr.jaxpr
        env = {}
        for var, cval in zip(jaxpr.constvars, closed_jaxpr.consts):
            env[var] = lift_const(np.asarray(cval))
        assert len(jaxpr.invars) == len(args)
        for var, val in zip(jaxpr.invars, args):
            env[var] = val
        for eqn in jaxpr.eqns:
            prim = eqn.primitive.name
            ins = [read(env, v) for v in eqn.invars]
            params = eqn.params
            if prim == "add":
                out = _elemwise2(alg.add, *ins)
            elif prim == "sub":
                out = _elemwise2(alg.sub, *ins)
            elif prim == "mul":
                out = _elemwise2(alg.mul, *ins)
            elif prim == "div":
                out = _elemwise2(alg.div, *ins)
            elif prim == "neg":
                out = _elemwise1(alg.neg, ins[0])
            elif prim == "abs":
                out = _elemwise1(alg.abs_, ins[0])
            elif prim == "max":
                out = _elemwise2(alg.maximum, *ins)
            elif prim == "min":
                out = _elemwise2(alg.minimum, *ins)
            elif prim in _UNARY_ALG:
                fn = getattr(alg, _UNARY_ALG[prim], None)
                if fn is None:
                    raise UnsupportedForPallas(
                        f"primitive {prim!r} not implemented by this "
                        "kernel algebra"
                    )
                out = _elemwise1(fn, ins[0])
            elif prim == "pow":
                fn = getattr(alg, "pow_", None)
                if fn is None:
                    raise UnsupportedForPallas(
                        "pow not implemented by this kernel algebra"
                    )
                out = _elemwise2(fn, *ins)
            elif prim in _CMP_ALG:
                out = _elemwise2(getattr(alg, _CMP_ALG[prim]), *ins)
            elif prim == "eq":
                out = _elemwise2(lambda x, y: alg.le(x, y) & alg.ge(x, y),
                                 *ins)
            elif prim == "ne":
                out = _elemwise2(
                    lambda x, y: ~(alg.le(x, y) & alg.ge(x, y)), *ins
                )
            elif prim in ("and", "or", "not", "xor"):
                # operands are raw bool arrays from the comparisons above
                if prim == "not":
                    out = _elemwise1(lambda x: ~x, ins[0])
                else:
                    fn = {"and": lambda a, b: a & b,
                          "or": lambda a, b: a | b,
                          "xor": lambda a, b: a ^ b}[prim]
                    out = _elemwise2(fn, *ins)
            elif prim == "select_n":
                if len(ins) != 3:
                    raise UnsupportedForPallas("select_n with >2 cases")
                # lax.select_n(pred, on_false, on_true)
                out = _elemwise3(
                    lambda p, a, b: alg.where(p, b, a), *ins
                )
            elif prim == "integer_pow":
                k = int(params["y"])
                if k < 0:
                    def ipow(x, k=k):
                        return alg.div(
                            alg.const(1.0, like=lanes_like), _powi(alg, x, -k)
                        )
                else:
                    def ipow(x, k=k):
                        return _powi(alg, x, k)
                out = _elemwise1(ipow, ins[0])
            elif prim == "squeeze":
                dims = params["dimensions"]
                shape = tuple(
                    d for i, d in enumerate(ins[0].shape) if i not in dims
                )
                out = SArr(shape, ins[0].flat)
            elif prim == "reshape":
                out = SArr(params["new_sizes"], ins[0].flat)
            elif prim == "slice":
                start = params["start_indices"]
                limit = params["limit_indices"]
                strides = params["strides"] or (1,) * len(start)
                src = ins[0]
                out_shape = tuple(
                    (l - s + st - 1) // st
                    for s, l, st in zip(start, limit, strides)
                )
                flat = [
                    _index(
                        src,
                        tuple(
                            s + i * st
                            for s, i, st in zip(start, idx, strides)
                        ),
                    )
                    for idx in np.ndindex(*out_shape)
                ]
                out = SArr(out_shape, flat)
            elif prim == "broadcast_in_dim":
                shape = params["shape"]
                bdims = params["broadcast_dimensions"]
                src = ins[0]
                flat = []
                for idx in np.ndindex(*shape) if shape else [()]:
                    src_idx = tuple(
                        idx[bd] if src.shape[k] != 1 else 0
                        for k, bd in enumerate(bdims)
                    )
                    flat.append(_index(src, src_idx))
                out = SArr(shape, flat)
            elif prim == "concatenate":
                dim = params["dimension"]
                shape = list(ins[0].shape)
                shape[dim] = sum(a.shape[dim] for a in ins)
                flat = []
                for idx in np.ndindex(*shape):
                    off = idx[dim]
                    for a in ins:
                        if off < a.shape[dim]:
                            src_idx = list(idx)
                            src_idx[dim] = off
                            flat.append(_index(a, tuple(src_idx)))
                            break
                        off -= a.shape[dim]
                out = SArr(tuple(shape), flat)
            elif prim == "transpose":
                perm = params["permutation"]
                src = ins[0]
                shape = tuple(src.shape[p] for p in perm)
                flat = [
                    _index(
                        src,
                        tuple(idx[perm.index(k)] for k in range(len(perm))),
                    )
                    for idx in np.ndindex(*shape)
                ]
                out = SArr(shape, flat)
            elif prim == "reduce_sum":
                axes = params["axes"]
                src = ins[0]
                shape = tuple(
                    d for i, d in enumerate(src.shape) if i not in axes
                )
                acc = {}
                for idx in np.ndindex(*src.shape):
                    key = tuple(
                        d for i, d in enumerate(idx) if i not in axes
                    )
                    v = _index(src, idx)
                    acc[key] = v if key not in acc else alg.add(acc[key], v)
                out = SArr(
                    shape, [acc[k] for k in (np.ndindex(*shape) if shape else [()])]
                )
            elif prim in ("convert_element_type", "copy", "stop_gradient"):
                out = ins[0]
            elif prim in ("pjit", "jit", "closed_call", "custom_jvp_call",
                          "custom_vjp_call"):
                # inline nested calls (jnp helpers like jnp.diag trace to a
                # pjit-wrapped subjaxpr) by recursing into the inner jaxpr
                inner = params.get("jaxpr") or params.get("call_jaxpr")
                outs = run(inner, ins)
                for var, val in zip(eqn.outvars, outs):
                    env[var] = val
                continue
            else:
                raise UnsupportedForPallas(
                    f"primitive {prim!r} in rhs; not covered by the df32 "
                    "kernel interpreter"
                )
            if len(eqn.outvars) != 1:
                raise UnsupportedForPallas(f"multi-output primitive {prim!r}")
            env[eqn.outvars[0]] = out
        return [read(env, v) for v in jaxpr.outvars]

    return run


def _powi(alg, x, k: int):
    if k == 0:
        return alg.const(1.0, like=alg.hi(x))
    acc = x
    for _ in range(k - 1):
        acc = alg.mul(acc, x)
    return acc


class DualAlgebra:
    """Forward-mode dual numbers (value, tangent) over a base algebra.

    Evaluating the rhs with seed tangents e_i yields Jacobian column i at
    the base algebra's full accuracy (jax.jvp cannot differentiate through
    the df32 representation; the arithmetic rules here are the standard
    forward-mode ones)."""

    def __init__(self, base):
        self.base = base

    def const(self, v, like=None):
        b = self.base
        return (b.const(v, like=like), b.const(0.0, like=like))

    def add(self, x, y):
        b = self.base
        return (b.add(x[0], y[0]), b.add(x[1], y[1]))

    def sub(self, x, y):
        b = self.base
        return (b.sub(x[0], y[0]), b.sub(x[1], y[1]))

    def mul(self, x, y):
        b = self.base
        return (
            b.mul(x[0], y[0]),
            b.add(b.mul(x[0], y[1]), b.mul(x[1], y[0])),
        )

    def div(self, x, y):
        b = self.base
        q = b.div(x[0], y[0])
        # (t_x - q * t_y) / y
        return (q, b.div(b.sub(x[1], b.mul(q, y[1])), y[0]))

    def neg(self, x):
        b = self.base
        return (b.neg(x[0]), b.neg(x[1]))

    def abs_(self, x):
        b = self.base
        flip = b.lt(x[0], b.const(0.0, like=b.hi(x[0])))
        return (b.where(flip, b.neg(x[0]), x[0]),
                b.where(flip, b.neg(x[1]), x[1]))

    def maximum(self, x, y):
        b = self.base
        take_x = b.ge(x[0], y[0])
        return (b.where(take_x, x[0], y[0]), b.where(take_x, x[1], y[1]))

    def minimum(self, x, y):
        b = self.base
        take_x = b.le(x[0], y[0])
        return (b.where(take_x, x[0], y[0]), b.where(take_x, x[1], y[1]))

    def hi(self, x):
        return self.base.hi(x[0])

    # comparisons act on the value part (tangents of the order predicates
    # are zero a.e., the standard forward-mode convention)
    def lt(self, x, y):
        return self.base.lt(x[0], y[0])

    def le(self, x, y):
        return self.base.le(x[0], y[0])

    def gt(self, x, y):
        return self.base.gt(x[0], y[0])

    def ge(self, x, y):
        return self.base.ge(x[0], y[0])

    def where(self, mask, x, y):
        b = self.base
        return (b.where(mask, x[0], y[0]), b.where(mask, x[1], y[1]))

    def zeros_like(self, x):
        z = self.base.zeros_like(x[0])
        return (z, z)

    def mul_f32(self, x, c):
        b = self.base
        return (b.mul_f32(x[0], c), b.mul_f32(x[1], c))

    def _one(self, x):
        return self.base.const(1.0, like=self.base.hi(x))

    # ---- transcendental chain rules over the base algebra ----
    def exp(self, x):
        b = self.base
        e = b.exp(x[0])
        return (e, b.mul(e, x[1]))

    def expm1(self, x):
        b = self.base
        e = b.expm1(x[0])
        return (e, b.mul(b.add(e, self._one(x[0])), x[1]))

    def log(self, x):
        b = self.base
        return (b.log(x[0]), b.div(x[1], x[0]))

    def log1p(self, x):
        b = self.base
        return (b.log1p(x[0]), b.div(x[1], b.add(x[0], self._one(x[0]))))

    def sqrt(self, x):
        b = self.base
        s = b.sqrt(x[0])
        return (s, b.div(x[1], b.mul_f32(s, 2.0)))

    def rsqrt(self, x):
        one = (self._one(x[0]), self.base.zeros_like(x[0]))
        return self.div(one, self.sqrt(x))

    def sin(self, x):
        b = self.base
        return (b.sin(x[0]), b.mul(b.cos(x[0]), x[1]))

    def cos(self, x):
        b = self.base
        return (b.cos(x[0]), b.neg(b.mul(b.sin(x[0]), x[1])))

    def tan(self, x):
        return self.div(self.sin(x), self.cos(x))

    def sinh(self, x):
        b = self.base
        return (b.sinh(x[0]), b.mul(b.cosh(x[0]), x[1]))

    def cosh(self, x):
        b = self.base
        return (b.cosh(x[0]), b.mul(b.sinh(x[0]), x[1]))

    def tanh(self, x):
        b = self.base
        th = b.tanh(x[0])
        one = self._one(x[0])
        return (th, b.mul(b.sub(one, b.mul(th, th)), x[1]))

    def pow_(self, x, y):
        return self.exp(self.mul(y, self.log(x)))

    def logistic(self, x):
        b = self.base
        s = b.logistic(x[0])
        one = self._one(x[0])
        return (s, b.mul(b.mul(s, b.sub(one, s)), x[1]))

    def square(self, x):
        return self.mul(x, x)

    def sign(self, x):
        b = self.base
        return (b.sign(x[0]), b.zeros_like(x[0]))
