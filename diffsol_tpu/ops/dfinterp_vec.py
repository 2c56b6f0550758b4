"""Vectorized jaxpr interpreter over the double-float algebra.

The small-n fused stepper's interpreter (:mod:`diffsol_tpu.ops.dfinterp`)
unrolls every array element into its own algebra scalar -- perfect for
n <= 8 states, but at n ~ 100+ (the heat1d/MOL class) the unrolled
program explodes.  This module re-evaluates the traced rhs with each
f32 array replaced by ONE algebra value whose hi/lo parts carry the
array's logical shape plus a trailing lane axis ``(…, B)`` -- so a
heat-stencil rhs stays a handful of whole-array VPU ops per evaluation
regardless of n.  It is the medium-n analog used by the banded fused
stepper (:mod:`diffsol_tpu.ops.pallas_stepper_band`).

Representation: :class:`VArr` pairs a logical jaxpr shape with either an
algebra value (hi/lo f32 arrays shaped ``logical + (B,)``) or, for
predicates, a raw bool array of the same shape.  Because the lane axis
is trailing on BOTH operands, numpy-style broadcasting of the logical
shapes is exactly jnp broadcasting of the stored arrays.

Supported primitives: elementwise arithmetic, comparisons + ``select_n``
(jnp.where), the static shape-plumbing set (slice / concatenate /
broadcast / reshape / transpose / pad / iota / reduce_sum) -- the MOL
stencil vocabulary -- and the transcendental family (exp/log/sin/...)
via the df32 argument-reduction kernels, same coverage as the scalar
interpreter.  Anything else raises
:class:`~diffsol_tpu.ops.dfinterp.UnsupportedForPallas`; callers fall
back to the XLA lockstep path.

Jacobians use the same dual-number layering as the scalar interpreter
(:class:`~diffsol_tpu.ops.dfinterp.DualAlgebra` works unchanged -- all
df32 ops are shape-agnostic); banded structure comes from
``ml + mu + 1`` cyclically-colored probe evaluations, mirroring
ops/banded.make_banded_jac (reference jacobian coloring role,
crates/diffsol/src/jacobian/mod.rs:118-260).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax.extend import core as jcore

from .dfinterp import _CMP_ALG, _UNARY_ALG, UnsupportedForPallas


class VArr:
    """A jaxpr array value: logical shape + stored algebra value (trailing
    lane axis) or raw bool array (predicates)."""

    __slots__ = ("shape", "val", "is_bool")

    def __init__(self, shape, val, is_bool=False):
        self.shape = tuple(shape)
        self.val = val
        self.is_bool = is_bool

    def __repr__(self):
        return f"VArr(shape={self.shape}, bool={self.is_bool})"


def _np_hi_lo(arr):
    a64 = np.asarray(arr, np.float64)
    hi = a64.astype(np.float32)
    lo = (a64 - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def lift_np(alg, arr, lanes_like):
    """Lift a numpy constant to an algebra value shaped arr.shape + (B,).

    Scalars (ndim 0) inline as jaxpr literals via ``jnp.full`` so the
    result is safe inside Pallas kernels; ARRAY constants materialize jnp
    constants, which Pallas kernels may not capture -- kernel callers pass
    a ``lift_array`` hook to :func:`make_vec_interpreter` instead (the
    hook reads the constant from a kernel input)."""
    from . import df32

    B = lanes_like.shape
    arr = np.asarray(arr)
    if arr.dtype == bool:
        if arr.ndim == 0:
            return VArr((), jnp.full(B, bool(arr)), is_bool=True)
        return VArr(arr.shape, jnp.broadcast_to(
            jnp.asarray(arr)[..., None], arr.shape + B), is_bool=True)
    hi, lo = _np_hi_lo(arr)
    tgt = arr.shape + B
    # duck-typed: DF algebras build DF pairs, f32 algebras a single array,
    # dual algebras a (value, zero-tangent) pair over their base
    name = getattr(alg, "__name__", type(alg).__name__)
    if arr.ndim == 0:
        # literal scalars: jnp.full with a numpy scalar stays a literal
        if name == "DFAlgebra":
            val = df32.DF(jnp.full(tgt, hi), jnp.full(tgt, lo))
        elif name == "F32Algebra":
            val = jnp.full(tgt, hi)
        elif name == "DualAlgebra":
            base_val = lift_np(alg.base, arr, lanes_like).val
            val = (base_val, alg.base.zeros_like(base_val))
        else:
            raise TypeError(f"unknown algebra {alg!r}")
        return VArr((), val)
    if name == "DFAlgebra":
        val = df32.DF(jnp.broadcast_to(jnp.asarray(hi)[..., None], tgt),
                      jnp.broadcast_to(jnp.asarray(lo)[..., None], tgt))
    elif name == "F32Algebra":
        val = jnp.broadcast_to(jnp.asarray(hi)[..., None], tgt)
    elif name == "DualAlgebra":
        base_val = lift_np(alg.base, arr, lanes_like).val
        zero = alg.base.zeros_like(base_val)
        val = (base_val, zero)
    else:
        raise TypeError(f"unknown algebra {alg!r}")
    return VArr(arr.shape, val)


def _vhi(alg, v):
    return v if isinstance(v, jnp.ndarray) else alg.hi(v)


def _bcast_logical(x: VArr, shape):
    """Broadcast a VArr's stored value to logical `shape` (+ lanes)."""
    if x.shape == tuple(shape):
        return x
    # jnp broadcasting with trailing lane axis preserved
    def b(a):
        B = a.shape[-1:]
        return jnp.broadcast_to(a, tuple(shape) + B)
    if x.is_bool:
        return VArr(shape, b(x.val), is_bool=True)
    val = _map_arrays(x.val, b)
    return VArr(shape, val)


def _map_arrays(val, fn):
    """Apply fn to every jnp array leaf of an algebra value (DF NamedTuple,
    dual (value, tangent) tuples, or a bare array)."""
    from .df32 import DF

    if isinstance(val, DF):
        return DF(fn(val.hi), fn(val.lo))
    if isinstance(val, tuple):
        return tuple(_map_arrays(v, fn) for v in val)
    return fn(val)


def make_vec_interpreter(alg, lanes_like, lift_array=None):
    """Return ``run(closed_jaxpr, args: list[VArr]) -> list[VArr]``.

    ``lanes_like``: an f32 (B,)-shaped template array (trailing lane axis
    for every stored value).  ``lift_array`` (optional): hook called for
    ARRAY (ndim >= 1) constants -- inside Pallas kernels it must read the
    constant from a kernel input and return the algebra value (trailing
    axis of size 1 or B); scalars always inline as literals."""

    def lift_const(v):
        a = np.asarray(v)
        if lift_array is not None and a.ndim >= 1 and a.dtype != bool:
            return lift_array(alg, a)
        return lift_np(alg, a, lanes_like)

    def read(env, var):
        if isinstance(var, jcore.Literal):
            return lift_const(var.val)
        return env[var]

    def ew2(op, a: VArr, b: VArr) -> VArr:
        shape = np.broadcast_shapes(a.shape, b.shape)
        return VArr(shape, op(a.val, b.val))

    def ew1(op, a: VArr) -> VArr:
        return VArr(a.shape, op(a.val))

    def cmp2(op, a: VArr, b: VArr) -> VArr:
        shape = np.broadcast_shapes(a.shape, b.shape)
        return VArr(shape, op(a.val, b.val), is_bool=True)

    def _take(a: VArr, fn, shape) -> VArr:
        """Apply an index/shape transform fn to every stored array leaf."""
        if a.is_bool:
            return VArr(shape, fn(a.val), is_bool=True)
        return VArr(shape, _map_arrays(a.val, fn), is_bool=False)

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
                out = ew2(alg.add, *ins)
            elif prim == "sub":
                out = ew2(alg.sub, *ins)
            elif prim == "mul":
                out = ew2(alg.mul, *ins)
            elif prim == "div":
                out = ew2(alg.div, *ins)
            elif prim == "neg":
                out = ew1(alg.neg, ins[0])
            elif prim == "abs":
                out = ew1(alg.abs_, ins[0])
            elif prim == "max":
                out = ew2(alg.maximum, *ins)
            elif prim == "min":
                out = ew2(alg.minimum, *ins)
            elif prim in _UNARY_ALG:
                fn = getattr(alg, _UNARY_ALG[prim], None)
                if fn is None:
                    raise UnsupportedForPallas(
                        f"primitive {prim!r} not implemented by this "
                        "kernel algebra"
                    )
                out = ew1(fn, ins[0])
            elif prim == "pow":
                fn = getattr(alg, "pow_", None)
                if fn is None:
                    raise UnsupportedForPallas(
                        "pow not implemented by this kernel algebra"
                    )
                out = ew2(fn, *ins)
            elif prim == "lt":
                out = cmp2(alg.lt, *ins)
            elif prim == "le":
                out = cmp2(alg.le, *ins)
            elif prim == "gt":
                out = cmp2(alg.gt, *ins)
            elif prim == "ge":
                out = cmp2(alg.ge, *ins)
            elif prim == "eq":
                out = cmp2(lambda x, y: alg.le(x, y) & alg.ge(x, y), *ins)
            elif prim == "ne":
                out = cmp2(lambda x, y: ~(alg.le(x, y) & alg.ge(x, y)), *ins)
            elif prim in ("and", "or", "not", "xor"):
                if not all(i.is_bool for i in ins):
                    raise UnsupportedForPallas(f"bitwise {prim!r} on floats")
                shape = np.broadcast_shapes(*[i.shape for i in ins])
                fn = {"and": lambda a, b: a & b, "or": lambda a, b: a | b,
                      "xor": lambda a, b: a ^ b, "not": None}[prim]
                raw = (~ins[0].val) if prim == "not" else fn(
                    ins[0].val, ins[1].val)
                out = VArr(shape, raw, is_bool=True)
            elif prim == "select_n":
                pred, *cases = ins
                if len(cases) != 2:
                    raise UnsupportedForPallas("select_n with >2 cases")
                if not pred.is_bool:
                    raise UnsupportedForPallas("integer select_n")
                shape = np.broadcast_shapes(
                    pred.shape, cases[0].shape, cases[1].shape)
                # broadcast predicate to stored shape of the result
                p = _bcast_logical(pred, shape).val
                c0 = _bcast_logical(cases[0], shape).val
                c1 = _bcast_logical(cases[1], shape).val
                out = VArr(shape, alg.where(p, c1, c0))
            elif prim == "integer_pow":
                k = int(params["y"])
                def ipow(x, k=abs(k)):
                    acc = x
                    for _ in range(k - 1):
                        acc = alg.mul(acc, x)
                    return acc
                if k == 0:
                    out = lift_const(np.ones(ins[0].shape))
                elif k < 0:
                    one = lift_np(alg, np.ones(ins[0].shape), lanes_like)
                    out = VArr(ins[0].shape, alg.div(one.val, ipow(ins[0].val)))
                else:
                    out = VArr(ins[0].shape, ipow(ins[0].val))
            elif prim == "squeeze":
                dims = params["dimensions"]
                shape = tuple(d for i, d in enumerate(ins[0].shape)
                              if i not in dims)
                out = _take(ins[0],
                            lambda a: a.reshape(shape + a.shape[-1:]), shape)
            elif prim == "reshape":
                shape = tuple(params["new_sizes"])
                out = _take(ins[0],
                            lambda a: a.reshape(shape + a.shape[-1:]), shape)
            elif prim == "slice":
                start = params["start_indices"]
                limit = params["limit_indices"]
                strides = params["strides"] or (1,) * len(start)
                idx = tuple(slice(s, l, st)
                            for s, l, st in zip(start, limit, strides))
                shape = tuple((l - s + st - 1) // st
                              for s, l, st in zip(start, limit, strides))
                out = _take(ins[0], lambda a: a[idx], shape)
            elif prim == "broadcast_in_dim":
                shape = tuple(params["shape"])
                bdims = params["broadcast_dimensions"]
                src = ins[0]
                def bc(a):
                    # insert size-1 axes so src dims land on bdims
                    full = [1] * len(shape)
                    for k, bd in enumerate(bdims):
                        full[bd] = src.shape[k]
                    a = a.reshape(tuple(full) + a.shape[-1:])
                    return jnp.broadcast_to(a, shape + a.shape[-1:])
                out = _take(src, bc, shape)
            elif prim == "concatenate":
                dim = params["dimension"]
                shape = list(ins[0].shape)
                shape[dim] = sum(a.shape[dim] for a in ins)
                if any(i.is_bool != ins[0].is_bool for i in ins):
                    raise UnsupportedForPallas("mixed-dtype concatenate")
                if ins[0].is_bool:
                    out = VArr(shape, jnp.concatenate(
                        [i.val for i in ins], axis=dim), is_bool=True)
                else:
                    # concatenate each array leaf position-wise
                    leaves = [_flatten_leaves(i.val) for i in ins]
                    cat = [jnp.concatenate(parts, axis=dim)
                           for parts in zip(*leaves)]
                    out = VArr(shape, _rebuild_like(ins[0].val, iter(cat)))
            elif prim == "transpose":
                perm = tuple(params["permutation"])
                shape = tuple(ins[0].shape[p] for p in perm)
                nd = len(ins[0].shape)
                out = _take(ins[0],
                            lambda a: a.transpose(perm + (nd,)), shape)
            elif prim == "rev":
                dims = params["dimensions"]
                nd_ = len(ins[0].shape)
                idx = tuple(
                    slice(None, None, -1) if i in dims else slice(None)
                    for i in range(nd_)
                )
                out = _take(ins[0], lambda a: a[idx], ins[0].shape)
            elif prim == "dot_general":
                # small static contractions only (e.g. the foodweb
                # interaction einsum "ij,xyj->xyi" with 2 species): the
                # contraction is UNROLLED into elementwise mul/add -- the
                # kernel tier has no MXU df32 matmul, and the stencil
                # models that reach it contract over <= 8 terms
                (lc, rc), (lb, rb) = params["dimension_numbers"]
                lhs, rhs = ins[0], ins[1]
                if lb or rb or len(lc) != 1 or len(rc) != 1:
                    raise UnsupportedForPallas(
                        "dot_general with batch or multi-dim contraction "
                        "in rhs"
                    )
                kdim = lhs.shape[lc[0]]
                if kdim > 8:
                    raise UnsupportedForPallas(
                        f"dot_general contraction size {kdim} > 8 in rhs"
                    )

                def _index_axis(a, axis, k):
                    idx = tuple(
                        k if i == axis else slice(None)
                        for i in range(len(a.shape))
                    )
                    shp = tuple(
                        d for i, d in enumerate(a.shape) if i != axis
                    )
                    return _take(a, lambda x: x[idx], shp)

                lf = tuple(
                    d for i, d in enumerate(lhs.shape) if i != lc[0]
                )
                rf = tuple(
                    d for i, d in enumerate(rhs.shape) if i != rc[0]
                )
                acc = None
                for k in range(kdim):
                    lk = _index_axis(lhs, lc[0], k)
                    rk = _index_axis(rhs, rc[0], k)
                    ls = lf + (1,) * len(rf)
                    rs = (1,) * len(lf) + rf
                    lkb = _take(
                        lk, lambda a, ls=ls: a.reshape(ls + a.shape[-1:]),
                        ls,
                    )
                    rkb = _take(
                        rk, lambda a, rs=rs: a.reshape(rs + a.shape[-1:]),
                        rs,
                    )
                    term = ew2(alg.mul, lkb, rkb)
                    acc = term if acc is None else ew2(alg.add, acc, term)
                out = acc
            elif prim == "pad":
                lo_, hi_, inner = zip(*params["padding_config"])
                if any(i != 0 for i in inner):
                    raise UnsupportedForPallas("interior pad")
                pv = ins[1]
                if pv.shape != ():
                    raise UnsupportedForPallas("non-scalar pad value")
                cfg = tuple((l, h) for l, h in zip(lo_, hi_)) + ((0, 0),)
                shape = tuple(d + l + h
                              for d, l, h in zip(ins[0].shape, lo_, hi_))
                def padz(a):
                    return jnp.pad(a, cfg)
                out = _take(ins[0], padz, shape)
                if not ins[0].is_bool:
                    # overwrite the padded region with pv; core mask built
                    # from broadcasted_iota (Pallas kernels may not capture
                    # array constants)
                    import jax as _jax

                    maskj = jnp.full(shape + (1,), True)
                    for ax, (l, d) in enumerate(zip(lo_, ins[0].shape)):
                        io = _jax.lax.broadcasted_iota(
                            jnp.int32, shape + (1,), ax)
                        maskj = maskj & (io >= l) & (io < l + d)
                    pvb = _bcast_logical(pv, shape).val
                    out = VArr(shape, alg.where(
                        maskj, out.val, pvb))
            elif prim == "reduce_sum":
                axes = params["axes"]
                src = ins[0]
                shape = tuple(d for i, d in enumerate(src.shape)
                              if i not in axes)
                # fold sequentially (df-accurate); unrolled over the static
                # reduced extent
                val = src.val
                for ax in sorted(axes, reverse=True):
                    n_ax = src.shape[ax]
                    parts = [
                        _map_arrays(val, lambda a, i=i, ax=ax:
                                    jnp.take(a, i, axis=ax))
                        for i in range(n_ax)
                    ]
                    acc = parts[0]
                    for p in parts[1:]:
                        acc = alg.add(acc, p)
                    val = acc
                out = VArr(shape, val)
            elif prim == "reduce_max" or prim == "reduce_min":
                axes = params["axes"]
                src = ins[0]
                shape = tuple(d for i, d in enumerate(src.shape)
                              if i not in axes)
                op = alg.maximum if prim == "reduce_max" else alg.minimum
                val = src.val
                for ax in sorted(axes, reverse=True):
                    n_ax = src.shape[ax]
                    parts = [
                        _map_arrays(val, lambda a, i=i, ax=ax:
                                    jnp.take(a, i, axis=ax))
                        for i in range(n_ax)
                    ]
                    acc = parts[0]
                    for p in parts[1:]:
                        acc = op(acc, p)
                    val = acc
                out = VArr(shape, val)
            elif prim == "iota":
                # synthesized in place from broadcasted_iota (kernel-safe;
                # f32-exact for extents < 2^24, so lo = 0)
                import jax as _jax

                shape = tuple(params["shape"])
                dim = params["dimension"]
                # Mosaic's tpu.iota is integer-only: generate i32, convert.
                # Full lane width: width-1 (…, 1) intermediates flowing
                # through slice/concat chains crash Mosaic's layout pass
                # (bring-up bisection, round 4)
                io = _jax.lax.broadcasted_iota(
                    jnp.int32, shape + lanes_like.shape, dim
                ).astype(jnp.float32)
                name = getattr(alg, "__name__", type(alg).__name__)
                from .df32 import DF as _DF

                if name == "DFAlgebra":
                    val = _DF(io, jnp.zeros_like(io))
                elif name == "F32Algebra":
                    val = io
                elif name == "DualAlgebra":
                    bname = getattr(alg.base, "__name__",
                                    type(alg.base).__name__)
                    bval = (_DF(io, jnp.zeros_like(io))
                            if bname == "DFAlgebra" else io)
                    val = (bval, alg.base.zeros_like(bval))
                else:
                    raise TypeError(f"unknown algebra {alg!r}")
                out = VArr(shape, val)
            elif prim in ("convert_element_type", "copy", "stop_gradient"):
                out = ins[0]
            elif prim in ("pjit", "jit", "closed_call", "custom_jvp_call",
                          "custom_vjp_call"):
                inner = params.get("jaxpr") or params.get("call_jaxpr")
                outs = run(inner, ins)
                for var, val in zip(eqn.outvars, outs):
                    env[var] = val
                continue
            else:
                raise UnsupportedForPallas(
                    f"primitive {prim!r} in rhs; the vectorized df32 kernel "
                    "tier supports arithmetic/transcendental stencil "
                    "right-hand sides (shape ops, reductions, rev, small "
                    "dot_general)"
                )
            if len(eqn.outvars) != 1:
                raise UnsupportedForPallas(f"multi-output primitive {prim!r}")
            env[eqn.outvars[0]] = out
        return [read(env, v) for v in jaxpr.outvars]

    return run


def _flatten_leaves(val):
    from .df32 import DF

    if isinstance(val, DF):
        return [val.hi, val.lo]
    if isinstance(val, tuple):
        out = []
        for v in val:
            out.extend(_flatten_leaves(v))
        return out
    return [val]


def _rebuild_like(proto, it):
    from .df32 import DF

    if isinstance(proto, DF):
        hi = next(it)
        lo = next(it)
        return DF(hi, lo)
    if isinstance(proto, tuple):
        return tuple(_rebuild_like(p, it) for p in proto)
    return next(it)
