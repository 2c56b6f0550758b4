"""Fused whole-solve Pallas BDF stepper for small-n lockstep ensembles.

THE structural answer to the kernel-count bound measured in round 3
(docs/design.md fusion census): the XLA lockstep BDF step compiles to ~165
fusions whose launch overhead (~220-335 us/step at B=10k) dominates the
3-state Robertson ensemble regardless of batch size.  This module compiles
the ENTIRE adaptive solve -- prediction, fresh-Jacobian Newton, error test,
PI controller, R(factor)U difference rescaling, NDF order selection and
dense-output interpolation -- into ONE Pallas kernel per member tile: the
solver state lives in VMEM/vector registers for the whole solve, and the
hot loop never touches HBM or the XLA dispatcher.

Numerics: Mosaic has no f64, so every state quantity is double-float
(two-f32 pairs, :mod:`diffsol_tpu.ops.df32`; ~2^-48 accuracy) -- plain f32
whole-solves are documented to diverge on Robertson past t~1e8.  The
user's rhs is re-evaluated in df arithmetic by the jaxpr interpreter
(:mod:`diffsol_tpu.ops.dfinterp`); Jacobians come from the same
interpreter under a forward-mode dual-number algebra, at full df accuracy
(an f32 Jacobian loses all Newton contraction at cond ~ 1e7).  Heuristics
(WRMS norms, convergence rates, the PI controller) run in f32, exactly as
the XLA path already does (ops/newton.py, ops/controller.py).

Scope (checked at build time; callers fall back to the XLA lockstep path):
identity or DIAGONAL mass (semi-explicit DAEs with consistent initial
conditions -- probed at build; the robertson DAE class), no root/reset,
no quadrature output, no sensitivities, n <= 8 states,
polynomial/rational rhs.  This covers the reference's
robertson / robertson_ode / exponential-decay benchmark class (reference
crates/diffsol/src/ode_solver/bdf.rs:1277-1465 hot loop; the CUDA analog
batches the same loop over the nbatch context).

Execution: one kernel invocation per TILE member lanes, members sharing
one adaptive step sequence per tile ("tiled lockstep": strictly fewer or
equal steps per member than whole-batch lockstep, since the error-norm max
runs over fewer members).  The axon remote-compile tunnel crashes on any
gridded pallas_call (probed round 4), so tiles are separate ungridded
invocations inside one jit program -- launch count is per SOLVE, not per
step.

Method notes vs solvers/bdf.py (same NDF tables, same controller): with
``jac_reuse=True`` (default) the kernel runs the reference's
stale-Jacobian update policy (bdf.rs:467-505 + jacobian_update.rs, the
same thresholds as solvers/bdf.py): refresh J on the first attempt, after
a Newton failure, or periodically; refactor the LU additionally when c
drifts past the threshold -- the J eval + LU are ~half the kernel's
per-step vector work and most accepted equal steps skip both.  The Newton
eta memory carries across attempts exactly as in ops/newton.py
(20^1.25 reset on refresh, 100^1.25 on step-size change).
``jac_reuse=False`` refreshes J + LU every attempt (fresh-J contraction,
~1.4x more vector work).  Step sequences differ slightly from the XLA
path either way; trajectory accuracy is tested against it and against
the reference's CVODE solution table.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers.bdf import MAX_ORDER, ND, _ALPHA, _ERROR_CONST2, _GAMMA
from . import df32
from .df32 import DF, DFAlgebra
from .dfinterp import DualAlgebra, SArr, UnsupportedForPallas, make_interpreter

i32 = jnp.int32
f32 = jnp.float32

# status codes local to the kernel (host maps <0 to errors.*)
_OK = 0
_FAIL_STEP_TOO_SMALL = -1
_FAIL_MAX_STEPS = -2
_FAIL_NEWTON = -3
_FAIL_ERRTEST = -4

# static precomputed U = R(1)R(1)-style factor of the step-size transform
# (solvers/bdf.py _compute_ru): u[i][j] = prod_{m=1..i} (m - 1 - j) / m
_U64 = np.ones((ND, ND))
for _i in range(1, ND):
    for _j in range(ND):
        _U64[_i, _j] = _U64[_i - 1, _j] * (_i - 1.0 - _j) / _i


def _df_const(v) -> DF:
    # numpy scalars (not jnp arrays): they inline as jaxpr literals, so DF
    # constants built at make-time don't become captured kernel constants
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return DF(hi, lo)


def _f32_table(vals, idx):
    """Select vals[idx] (f32 scalar) from a static table, unrolled."""
    out = jnp.asarray(np.float32(vals[0]))
    for k in range(1, len(vals)):
        out = jnp.where(idx == k, np.float32(vals[k]), out)
    return out


def _df_table(vals, idx) -> DF:
    his = [np.float32(v) for v in vals]
    los = [np.float32(np.float64(v) - np.float64(h)) for v, h in zip(vals, his)]
    return DF(_f32_table(his, idx), _f32_table(los, idx))


def _lu_factor_df(A, n):
    """Masked-select partial-pivot LU of an n x n DF matrix (rows/cols as
    nested lists of DF lane vectors) -- the df port of
    ops/smalllu.lu_factor_batch_last (no gathers: pivoting is lane-masked
    selects, the TPU-native formulation)."""
    lu = [[A[r][c] for c in range(n)] for r in range(n)]
    zero_i = jnp.zeros_like(lu[0][0].hi, i32)
    perm = [zero_i + r for r in range(n)]
    for k in range(n - 1):
        # pivot row among k..n-1, per lane
        pk = zero_i + k
        bm = df32.abs_(lu[k][k]).hi
        for r in range(k + 1, n):
            m = df32.abs_(lu[r][k]).hi
            take = m > bm
            pk = jnp.where(take, r, pk)
            bm = jnp.maximum(m, bm)
        # swap rows k <-> pk with masked selects
        new_rows = [row[:] for row in lu]
        for c in range(n):
            sel = lu[k][c]
            for r in range(k, n):
                sel = df32.where(pk == r, lu[r][c], sel)
            new_rows[k][c] = sel
        for r in range(k + 1, n):
            for c in range(n):
                new_rows[r][c] = df32.where(pk == r, lu[k][c], lu[r][c])
        lu = new_rows
        pnew = perm[:]
        sel = perm[k]
        for r in range(k, n):
            sel = jnp.where(pk == r, perm[r], sel)
        pnew[k] = sel
        for r in range(k + 1, n):
            pnew[r] = jnp.where(pk == r, perm[k], perm[r])
        perm = pnew
        inv_p = df32.recip(lu[k][k])
        for r in range(k + 1, n):
            l = df32.mul(lu[r][k], inv_p)
            lu[r][k] = l
            for c in range(k + 1, n):
                lu[r][c] = df32.sub(lu[r][c], df32.mul(l, lu[k][c]))
    return lu, perm


def _lu_solve_df(lu, perm, b, n):
    """Solve with :func:`_lu_factor_df` output; b a list of n DF rows."""
    xs = []
    for r in range(n):
        sel = b[0]
        for j in range(n):
            sel = df32.where(perm[r] == j, b[j], sel)
        xs.append(sel)
    for r in range(1, n):
        acc = xs[r]
        for j in range(r):
            acc = df32.sub(acc, df32.mul(lu[r][j], xs[j]))
        xs[r] = acc
    out = [None] * n
    for r in range(n - 1, -1, -1):
        acc = xs[r]
        for j in range(r + 1, n):
            acc = df32.sub(acc, df32.mul(lu[r][j], out[j]))
        out[r] = df32.div(acc, lu[r][r])
    return out


def _pow_f32(x, y):
    """x**y for positive x via exp/log (Mosaic-safe, f32 heuristics only)."""
    return jnp.exp(y * jnp.log(x))


def _pi_raw_f32(err, prev_err, ki_num, kp_num, eff_order):
    """f32 port of ops/controller.pi_controller_raw (squared-norm inputs)."""
    order_f = eff_order.astype(f32)
    ki = np.float32(ki_num) / order_f
    kp = np.float32(kp_num) / order_f
    have_prev = ~jnp.isnan(prev_err)
    use_pi = (kp_num != 0.0) & have_prev
    tiny = np.float32(1e-30)
    err_safe = jnp.clip(err, tiny, 1.0 / tiny)
    prev_safe = jnp.clip(jnp.where(have_prev, prev_err, 1.0), tiny, 1.0 / tiny)
    i_only = _pow_f32(err_safe, -ki)
    pi_both = _pow_f32(err_safe, -(ki + kp)) * _pow_f32(prev_safe, kp)
    return jnp.where(use_pi, pi_both, i_only)


def _compute_ru_df(order, factor_df: DF):
    """DF port of solvers/bdf._compute_ru: RU = R(factor) @ U with identity
    outside rows/cols <= order.  All entries are per-tile DF scalars."""
    # r[i][j] = prod_{m=1..i} (m - 1 - factor*j) / m
    r = [[None] * ND for _ in range(ND)]
    for j in range(ND):
        r[0][j] = _df_const(1.0)
    for i_ in range(1, ND):
        inv_m = _df_const(1.0 / i_)
        for j in range(ND):
            term = df32.mul_f32(
                df32.sub(_df_const(i_ - 1.0), df32.mul_f32(factor_df, float(j))),
                1.0,
            )
            term = df32.mul(term, inv_m)
            r[i_][j] = df32.mul(r[i_ - 1][j], term)
    u = [[_df_const(_U64[i_, j]) for j in range(ND)] for i_ in range(ND)]
    ru = [[None] * ND for _ in range(ND)]
    for i_ in range(ND):
        for j in range(ND):
            # U is exactly upper-triangular (u[k][j] = 0 for k > j, the
            # m = j+1 factor vanishes): skip the zero terms at trace time
            acc = None
            for k in range(ND):
                if float(_U64[k, j]) == 0.0:
                    continue
                term = df32.mul(r[i_][k], u[k][j])
                acc = term if acc is None else df32.add(acc, term)
            ru[i_][j] = acc
    # identity outside the active block
    eye = lambda a, b: _df_const(1.0 if a == b else 0.0)
    out = [[None] * ND for _ in range(ND)]
    for i_ in range(ND):
        for j in range(ND):
            valid = (i_ <= order) & (j <= order)
            out[i_][j] = df32.where(valid, ru[i_][j], eye(i_, j))
    return out


def _apply_ru_df(ru, D, n):
    """D'[j][s] = sum_i ru[i][j] * D[i][s] (the RU^T difference transform)."""
    out = []
    for j in range(ND):
        row = []
        for s in range(n):
            acc = df32.mul(ru[0][j], D[0][s])
            for i_ in range(1, ND):
                acc = df32.add(acc, df32.mul(ru[i_][j], D[i_][s]))
            row.append(acc)
        out.append(tuple(row))
    return tuple(out)


def _masked_row_sum(D, order, n, lo=0, hi=MAX_ORDER, weights=None):
    """sum_{i=lo..order (<=hi)} w_i * D[i] per state, DF."""
    rows = []
    for s in range(n):
        acc = None
        for i_ in range(lo, hi + 1):
            v = D[i_][s]
            if weights is not None:
                v = df32.mul(weights[i_], v)
            v = df32.where(i_ <= order, v, df32.zeros_like(v))
            acc = v if acc is None else df32.add(acc, v)
        rows.append(acc)
    return rows


def _select_row(D, col, n):
    """D[col] with col a traced i32 scalar (unrolled selects)."""
    rows = []
    for s in range(n):
        sel = D[0][s]
        for i_ in range(1, ND):
            sel = df32.where(col == i_, D[i_][s], sel)
        rows.append(sel)
    return rows


def make_pallas_bdf_solve(
    problem,
    t_eval,
    nbatch: int,
    tile: Optional[int] = None,
    max_steps: int = 100_000,
    max_newton_iter: int = 10,
    max_newton_fails: int = 50,
    max_error_test_fails: int = 40,
    min_timestep: float = 1e-32,
    interpret: bool = False,
    jac_reuse: bool = True,
):
    """Build ``solve(params_b (B, np) f64) -> (ys (neval, n, B) f64,
    status (ntiles,) i32, steps (ntiles,) i32)`` running the whole adaptive
    BDF solve in fused Pallas kernels (one ungridded invocation per member
    tile; per-tile lockstep semantics).

    Raises :class:`UnsupportedForPallas` when the problem is outside the
    kernel's scope -- callers fall back to the XLA lockstep path.
    """
    import sys

    # tracing the fused kernel to a jaxpr recurses through tens of
    # thousands of equations (the whole adaptive solve is one program);
    # CPython's default 1000-frame limit RecursionErrors inside
    # _trace_kernel_to_jaxpr
    if sys.getrecursionlimit() < 100_000:
        sys.setrecursionlimit(100_000)
    eqn = problem.eqn
    has_mass = eqn.mass is not None
    if has_mass and eqn.mass_diag_fn is None:
        raise UnsupportedForPallas(
            "non-diagonal mass not supported in kernel tier"
        )
    if eqn.root is not None or eqn.reset is not None:
        raise UnsupportedForPallas("root/reset events not supported in kernel tier")
    if problem.integrate_out:
        raise UnsupportedForPallas("quadrature output not supported in kernel tier")
    n = eqn.nstates
    nparams = eqn.nparams
    if n > 8:
        raise UnsupportedForPallas(f"n={n} > 8 states")

    t_eval64 = np.asarray(jax.device_get(jnp.asarray(t_eval)), np.float64).reshape(-1)
    neval = len(t_eval64)
    t0_64 = float(np.asarray(jax.device_get(problem.t0)))
    rtol = float(np.asarray(jax.device_get(problem.rtol)))
    atol64 = np.asarray(jax.device_get(problem.atol), np.float64).reshape(-1)
    if atol64.shape[0] == 1:
        atol64 = np.repeat(atol64, n)
    atol_f32 = [np.float32(a) for a in atol64]
    rtol_f32 = np.float32(rtol)

    # trace rhs / init once on f32 avals; the interpreter re-evaluates them
    # in df (values) and dual-df (Jacobian columns) arithmetic in-kernel.
    # x64 OFF so no i64/f64 constants leak into the replayed jaxprs
    # (Mosaic has no 64-bit types and loops forever lowering i64->i32).
    with jax.enable_x64(False):
        t_aval = jnp.zeros((), f32)
        y_aval = jnp.zeros((n,), f32)
        p_aval = jnp.zeros((nparams,), f32)
        rhs_jaxpr = jax.make_jaxpr(eqn.rhs)(t_aval, y_aval, p_aval)
        init_jaxpr = jax.make_jaxpr(eqn.init)(t_aval, p_aval)
        mass_jaxpr = (
            jax.make_jaxpr(eqn.mass_diag_fn)(t_aval, p_aval)
            if has_mass else None
        )

    mass_const_diag = None
    if has_mass:
        # the kernel starts stepping directly from init (no consistent-IC
        # Newton): require the initial conditions to already satisfy the
        # algebraic constraints (true for the reference's diag-mass test
        # models: robertson DAE [1,0,0], heat2d Dirichlet data, ...)
        t0j = jnp.asarray(t0_64)
        p0j = jnp.asarray(problem.params)
        md0 = np.asarray(jax.device_get(eqn.mass_diag_fn(t0j, p0j)))
        y0c = jnp.asarray(jax.device_get(eqn.init(t0j, p0j)))
        f0c = np.asarray(jax.device_get(eqn.rhs(t0j, y0c, p0j)))
        alg = md0 == 0.0
        scale = 1.0 + float(np.max(np.abs(f0c), initial=0.0))
        if np.any(np.abs(f0c[alg]) > 1e-6 * scale):
            raise UnsupportedForPallas(
                "kernel tier needs consistent DAE initial conditions "
                f"(|g(y0)| up to {np.max(np.abs(f0c[alg])):.2e})"
            )
        # constant-diag fast path (the common case): a t/p-independent
        # diagonal embeds as trace-time constants -- no jaxpr replay, no
        # lane selects, and the algebraic-row mask is STATIC
        md_t = np.asarray(jax.device_get(
            eqn.mass_diag_fn(t0j + 1.0, p0j)
        ))
        md_p = np.asarray(jax.device_get(
            eqn.mass_diag_fn(t0j, p0j * (1.0 + 1e-3) + 1e-3)
        ))
        if (
            np.all(np.isfinite(md_t)) and np.all(np.isfinite(md_p))
            and np.allclose(md_t, md0) and np.allclose(md_p, md0)
        ):
            mass_const_diag = md0

    if tile is None:
        tile = min(max(256, nbatch), 4096)
    tile = min(tile, nbatch)
    # lane-align: Mosaic vectors want multiples of the (8, 128) vreg tile;
    # padding members is cheap (the pad lanes re-solve the last member).
    # Interpret mode (tests) has no layout constraint -- keep tiles exact
    # so tiny-B tests stay fast.
    if not interpret:
        tile = -(-tile // 1024) * 1024
    ntiles = -(-nbatch // tile)
    pad_b = ntiles * tile

    alpha64 = [float(v) for v in _ALPHA]
    gamma64 = [float(v) for v in _GAMMA]
    ec2_32 = [np.float32(v) for v in _ERROR_CONST2]
    # defaults from SolverConfig/OdeSolverOptions (problem.rs:98-152)
    opts = problem.options
    nl_tol = float(opts.nonlinear_solver_tolerance)
    ki_num = float(opts.pi_control_integral)
    kp_num = float(opts.pi_control_proportional)
    min_shrink = 0.1
    max_growth = 2.1
    dead_lo, dead_hi = 0.9, 1.1  # minimum_timestep_growth/maximum_timestep_shrink

    def kernel(p_ref, ys_hi_ref, ys_lo_ref, info_ref):
        A = DFAlgebra
        lanes = p_ref[0, :] * 0.0  # (tile,) f32 zeros: lane-shape template
        run_df = make_interpreter(A, lanes)
        dual = DualAlgebra(A)
        run_dual = make_interpreter(dual, lanes)

        p_rows = [DF(p_ref[r, :], p_ref[nparams + r, :]) for r in range(nparams)]

        def rhs_rows(t_sc: DF, y_rows):
            tb = DF(jnp.broadcast_to(t_sc.hi, lanes.shape),
                    jnp.broadcast_to(t_sc.lo, lanes.shape))
            out = run_df(
                rhs_jaxpr,
                [SArr((), [tb]), SArr((n,), list(y_rows)), SArr((nparams,), p_rows)],
            )[0]
            return list(out.flat)

        def jac_cols(t_sc: DF, y_rows):
            """J[:, c] columns via dual-number probes (df accuracy)."""
            tb = DF(jnp.broadcast_to(t_sc.hi, lanes.shape),
                    jnp.broadcast_to(t_sc.lo, lanes.shape))
            zero = df32.zeros_like(y_rows[0])
            one = df32.const(1.0, like=lanes)
            t_dual = (tb, df32.zeros_like(tb))
            p_dual = [(pr, df32.zeros_like(pr)) for pr in p_rows]
            cols = []
            for c in range(n):
                y_dual = [
                    (y_rows[r], one if r == c else zero) for r in range(n)
                ]
                out = run_dual(
                    rhs_jaxpr,
                    [SArr((), [t_dual]), SArr((n,), y_dual),
                     SArr((nparams,), p_dual)],
                )[0]
                cols.append([v[1] for v in out.flat])  # tangents = J e_c
            # J[r][c]
            return [[cols[c][r] for c in range(n)] for r in range(n)]

        def mass_rows(t_sc: DF):
            """Diagonal mass values m(t, p) as n DF rows (scalar DF
            constants on the constant-diag fast path)."""
            if mass_const_diag is not None:
                return [_df_const(float(v)) for v in mass_const_diag]
            tb = DF(jnp.broadcast_to(t_sc.hi, lanes.shape),
                    jnp.broadcast_to(t_sc.lo, lanes.shape))
            out = run_df(
                mass_jaxpr, [SArr((), [tb]), SArr((nparams,), p_rows)]
            )[0]
            return list(out.flat)

        # ---- initial state -------------------------------------------------
        t0_df = _df_const(t0_64)
        t0b = DF(jnp.broadcast_to(t0_df.hi, lanes.shape),
                 jnp.broadcast_to(t0_df.lo, lanes.shape))
        y0 = list(
            run_df(init_jaxpr, [SArr((), [t0b]), SArr((nparams,), p_rows)])[0].flat
        )
        dy0 = rhs_rows(t0_df, y0)
        if has_mass:
            # dy0 = f/m on differential rows, 0 on algebraic rows (the
            # build-time probe guarantees consistent y0; the first step's
            # Newton enforces the constraints thereafter)
            if mass_const_diag is not None:  # static mask, no lane selects
                dy0 = [
                    df32.zeros_like(dy0[r])
                    if float(mass_const_diag[r]) == 0.0
                    else (
                        dy0[r] if float(mass_const_diag[r]) == 1.0
                        else df32.div(
                            dy0[r], _df_const(float(mass_const_diag[r]))
                        )
                    )
                    for r in range(n)
                ]
            else:
                m0 = mass_rows(t0_df)
                dy0 = [
                    df32.where(
                        m0[r].hi != 0.0,
                        df32.div(
                            dy0[r],
                            df32.where(m0[r].hi != 0.0, m0[r],
                                       df32.const(1.0, like=lanes)),
                        ),
                        df32.zeros_like(dy0[r]),
                    )
                    for r in range(n)
                ]

        # initial step size (solvers/state.py initial_step_size, f32
        # heuristic; the probe rhs eval runs in df)
        def wrms32(x_rows, y_rows):
            acc = None
            for r in range(n):
                scale = jnp.abs(y_rows[r].hi) * rtol_f32 + atol_f32[r]
                q = x_rows[r].hi / scale
                sq = q * q
                acc = sq if acc is None else acc + sq
            return jnp.sqrt(jnp.max(acc / np.float32(n)))

        d0 = wrms32(y0, y0)
        d1 = wrms32(dy0, y0)
        h0_32 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), np.float32(1e-6),
                          np.float32(0.01) * (d0 / d1))
        h0_df = DF(h0_32, jnp.zeros_like(h0_32))
        y1 = [df32.add(y0[r], df32.mul_f32(dy0[r], h0_32)) for r in range(n)]
        f1 = rhs_rows(df32.add(t0_df, h0_df), y1)
        d2 = wrms32(
            [df32.sub(f1[r], dy0[r]) for r in range(n)], y0
        ) / jnp.abs(h0_32)
        max_d = jnp.maximum(d1, d2)
        h1 = jnp.where(
            max_d < 1e-15,
            jnp.maximum(h0_32 * 1e-3, np.float32(1e-6)),
            _pow_f32(np.float32(0.01) / max_d, np.float32(0.5)),
        )
        h_init = jnp.minimum(np.float32(100.0) * h0_32, h1)
        h_df0 = DF(h_init, jnp.zeros_like(h_init))

        zrow = df32.zeros_like(y0[0])
        D0 = [tuple(df32.zeros_like(zrow) for _ in range(n)) for _ in range(ND)]
        D0[0] = tuple(y0)
        D0[1] = tuple(df32.mul(h_df0, dy0[r]) for r in range(n))
        D0 = tuple(D0)

        nan32 = jnp.asarray(np.float32(np.nan))

        carry0 = dict(
            k=jnp.asarray(0, i32),            # attempts
            steps=jnp.asarray(0, i32),        # accepted
            status=jnp.asarray(_OK, i32),
            next_eval=jnp.asarray(0, i32),
            t=t0_df,
            h=h_df0,
            order=jnp.asarray(1, i32),
            n_equal=jnp.asarray(0, i32),
            prev_err=nan32,                   # squared
            conv_fail=jnp.asarray(0, i32),    # this step
            newton_fails=jnp.asarray(0, i32),  # total
            err_fails=jnp.asarray(0, i32),    # this step
            h_changed=jnp.asarray(0, i32),    # this step
            D=D0,
        )
        if jac_reuse:
            zdf = df32.zeros_like(zrow)
            carry0.update(
                J=tuple(tuple(zdf for _ in range(n)) for _ in range(n)),
                lu=tuple(tuple(zdf for _ in range(n)) for _ in range(n)),
                perm=tuple(jnp.zeros_like(zrow.hi, i32) for _ in range(n)),
                c_last=jnp.asarray(0.0, f32),  # LU's c; 0 = none
                ssj=jnp.asarray(0, i32),       # attempts since refactor
                ssrj=jnp.asarray(0, i32),      # attempts since J refresh
                eta_mem=jnp.asarray(np.float32(20.0**1.25)),
            )

        def cond(c):
            return (
                (c["status"] == _OK) & (c["k"] < max_steps)
                & (c["next_eval"] < neval)
            )

        def body(c):
            (k, steps, status, next_eval, t, h, order, n_equal, prev_err,
             conv_fail, newton_fails, err_fails, h_changed, D) = (
                c["k"], c["steps"], c["status"], c["next_eval"], c["t"],
                c["h"], c["order"], c["n_equal"], c["prev_err"],
                c["conv_fail"], c["newton_fails"], c["err_fails"],
                c["h_changed"], c["D"],
            )
            if jac_reuse:
                (J_c, lu_c, perm_c, c_last, ssj, ssrj, eta_mem) = (
                    c["J"], c["lu"], c["perm"], c["c_last"], c["ssj"],
                    c["ssrj"], c["eta_mem"],
                )

            alpha_k = _df_table(alpha64, order)
            cval = df32.mul(h, alpha_k)
            t_pred = df32.add(t, h)

            # predict + psi from the difference matrix
            y_pred = _masked_row_sum(D, order, n)
            gamma_w = [_df_const(g) for g in gamma64] + [
                _df_const(0.0)
            ] * (ND - len(gamma64))
            psi_raw = _masked_row_sum(D, order, n, lo=1, weights=gamma_w)
            psi = [df32.mul(pr, alpha_k) for pr in psi_raw]

            md_pred = mass_rows(t_pred) if has_mass else None

            def build_amat(Jm):
                # M - c J (diag M; identity without mass)
                def diag(r):
                    if has_mass:
                        return md_pred[r]
                    return df32.const(1.0, like=lanes)

                return [
                    [
                        df32.sub(
                            diag(r) if r == cc
                            else df32.const(0.0, like=lanes),
                            df32.mul(cval, Jm[r][cc]),
                        )
                        for cc in range(n)
                    ]
                    for r in range(n)
                ]

            if not jac_reuse:
                # fresh Jacobian + LU of (I - c J) at every attempt
                J = jac_cols(t_pred, y_pred)
                lu, perm = _lu_factor_df(build_amat(J), n)
                eta0 = jnp.asarray(np.float32(20.0**1.25))
            else:
                # stale-Jacobian update policy (reference bdf.rs:467-505 +
                # jacobian_update.rs, same thresholds as solvers/bdf.py):
                # refresh J on the first-ever attempt, after a Newton
                # failure, or periodically; refactor the LU additionally
                # when c drifted past the threshold.  The J eval + LU are
                # ~half the kernel's per-step vector work, and most
                # accepted equal steps skip BOTH.
                c32 = cval.hi
                rel = jnp.abs(c32 / jnp.where(c_last == 0.0, c32, c_last)
                              - 1.0)
                first_ever = k == 0
                refresh_j = (
                    first_ever | (conv_fail > 0)
                    | (ssrj >= int(opts.update_rhs_jacobian_after_steps))
                )
                refactor = (
                    refresh_j
                    | (rel > np.float32(opts.threshold_to_update_jacobian))
                    | (ssj >= int(opts.update_jacobian_after_steps))
                )

                J = jax.lax.cond(
                    refresh_j,
                    lambda _: tuple(
                        tuple(row) for row in jac_cols(t_pred, y_pred)
                    ),
                    lambda _: J_c,
                    None,
                )

                def do_refactor(_):
                    lu_n, perm_n = _lu_factor_df(build_amat(J), n)
                    return (tuple(tuple(r) for r in lu_n), tuple(perm_n))

                lu, perm = jax.lax.cond(
                    refactor, do_refactor, lambda _: (lu_c, perm_c), None
                )
                c_last_n = jnp.where(refactor, c32, c_last)
                ssj_n = jnp.where(refactor, 0, ssj + 1).astype(i32)
                ssrj_n = jnp.where(refresh_j, 0, ssrj + 1).astype(i32)
                # eta memory: 20^1.25 on refresh/refactor, 100^1.25 on a
                # step-size change without one (ops/newton.py resets)
                eta0 = jnp.where(
                    refactor,
                    np.float32(20.0**1.25),
                    jnp.where(h_changed == 1, np.float32(100.0**1.25),
                              eta_mem),
                )

            # ---- Newton on F(x) = M (x - y_pred + psi) - c f(x) ----------
            # (solvers/bdf.py _residual; M = diag fast path or identity)
            def nres(x_rows):
                fx = rhs_rows(t_pred, x_rows)
                out_rows = []
                for r in range(n):
                    tmp = df32.add(
                        df32.sub(x_rows[r], y_pred[r]), psi[r]
                    )
                    if has_mass:
                        tmp = df32.mul(md_pred[r], tmp)
                    out_rows.append(
                        df32.sub(tmp, df32.mul(cval, fx[r]))
                    )
                return out_rows

            eps32 = np.float32(np.finfo(np.float32).eps)

            def n_cond(nc):
                return (nc[3] == 0) & (nc[2] < max_newton_iter)

            def n_body(nc):
                x, first_nrm, niter, nstat, _eta_run = nc
                delta = _lu_solve_df(lu, perm, nres(list(x)), n)
                x = tuple(df32.sub(x[r], delta[r]) for r in range(n))
                nrm = wrms32(delta, y_pred)
                niter = niter + 1
                is_first = niter == 1
                kk = jnp.maximum(niter - 1, 1).astype(f32)
                rate = _pow_f32(
                    jnp.maximum(nrm / jnp.maximum(first_nrm, np.float32(0.0)),
                                np.float32(1e-30)),
                    1.0 / kk,
                )
                rate = jnp.where(jnp.isfinite(rate), rate, np.float32(np.inf))
                diverged_rate = rate > 0.9
                proj = (
                    _pow_f32(rate,
                             jnp.maximum(max_newton_iter - niter, 0).astype(f32))
                    / (1.0 - rate) * nrm
                )
                eta_new = jnp.where(
                    is_first,
                    _pow_f32(jnp.maximum(eta0, 1e4 * eps32),
                             np.float32(0.8)),
                    rate / (1.0 - rate),
                )
                diverged = (~is_first) & (diverged_rate | (proj > nl_tol))
                converged = (eta_new * nrm < nl_tol) & ~diverged
                nstat = jnp.where(
                    diverged, 2, jnp.where(converged, 1, 0)
                ).astype(i32)
                first_nrm = jnp.where(is_first, nrm, first_nrm)
                return (x, first_nrm, niter, nstat, eta_new)

            x_fin, _fn, niter, nstat, eta_fin = jax.lax.while_loop(
                n_cond, n_body,
                (tuple(y_pred), jnp.asarray(0.0, f32), jnp.asarray(0, i32),
                 jnp.asarray(0, i32), eta0),
            )
            solve_ok = nstat == 1
            d_rows = [df32.sub(x_fin[r], y_pred[r]) for r in range(n)]

            # ---- error test ---------------------------------------------
            sq_acc = None
            for r in range(n):
                scale = jnp.abs(y_pred[r].hi) * rtol_f32 + atol_f32[r]
                q = d_rows[r].hi / scale
                sq = q * q
                sq_acc = sq if sq_acc is None else sq_acc + sq
            sq_d = jnp.max(sq_acc / np.float32(n))
            err = sq_d * _f32_table(ec2_32, order - 1)
            accepted = solve_ok & (err <= 1.0)

            m = np.float32(max_newton_iter)
            safety = 0.9 * (2.0 * m + 1.0) / (2.0 * m + niter.astype(f32))

            first = (~solve_ok) & (conv_fail == 0)
            second = (~solve_ok) & (conv_fail == 1)
            err_fail = solve_ok & ~accepted
            newton_fails = newton_fails + (~solve_ok).astype(i32)
            raw = _pi_raw_f32(err, prev_err, ki_num, kp_num, order + 1)
            rej_factor = jnp.maximum(safety * raw, np.float32(min_shrink))
            factor32 = jnp.where(err_fail, rej_factor, np.float32(0.3))
            do_rescale = err_fail | second

            # ---- accepted-step finalization ------------------------------
            # difference update: D'[i] = suffix_sum + d for i <= order;
            # D[order+1] = d; D[order+2] = d - D_old[order+1]
            d_old_op1 = _select_row(D, order + 1, n)
            new_rows = [None] * ND
            acc = [df32.zeros_like(zrow) for _ in range(n)]
            for i_ in range(ND - 1, -1, -1):
                for s in range(n):
                    inc = df32.where(
                        i_ <= order, D[i_][s], df32.zeros_like(zrow)
                    )
                    acc[s] = df32.add(acc[s], inc)
                row = []
                for s in range(n):
                    below = df32.add(acc[s], d_rows[s])
                    v = df32.where(i_ <= order, below, D[i_][s])
                    v = df32.where(i_ == order + 1, d_rows[s], v)
                    v = df32.where(
                        i_ == order + 2,
                        df32.sub(d_rows[s], d_old_op1[s]),
                        v,
                    )
                    row.append(v)
                new_rows[i_] = tuple(row)
            D_acc = tuple(new_rows)
            t_new = t_pred
            y_new = D_acc[0]

            # ---- order selection (every order+1 equal steps) -------------
            # a step-size change during the attempts resets the equal-step
            # counter to 1 (bdf.rs:508-519 via solvers/bdf.py)
            n_equal_acc = jnp.where(
                (h_changed == 1) | do_rescale, 1, n_equal + 1
            )
            do_sel = accepted & (n_equal_acc > order)

            def pred_err(col, const_idx):
                rowv = _select_row(D_acc, col, n)
                acc2 = None
                for r in range(n):
                    scale = jnp.abs(y_new[r].hi) * rtol_f32 + atol_f32[r]
                    q = rowv[r].hi / scale
                    sq = q * q
                    acc2 = sq if acc2 is None else acc2 + sq
                return jnp.max(acc2 / np.float32(n)) * _f32_table(
                    ec2_32, const_idx
                )

            em = jnp.where(order > 1, pred_err(order, jnp.maximum(order - 1, 0)),
                           np.float32(np.inf))
            ep = jnp.where(order < MAX_ORDER,
                           pred_err(order + 2, jnp.minimum(order + 1, MAX_ORDER)),
                           np.float32(np.inf))
            f_m = _pi_raw_f32(em, err, ki_num, kp_num, order)
            f_0 = _pi_raw_f32(err, err, ki_num, kp_num, order + 1)
            f_p = _pi_raw_f32(ep, err, ki_num, kp_num, order + 2)
            best = jnp.where((f_m >= f_0) & (f_m >= f_p), 0,
                             jnp.where(f_0 >= f_p, 1, 2)).astype(i32)
            best_f = jnp.where(best == 0, f_m, jnp.where(best == 1, f_0, f_p))
            sel_factor = jnp.clip(safety * best_f, np.float32(min_shrink),
                                  np.float32(max_growth))
            do_change = do_sel & (
                (sel_factor >= np.float32(dead_hi))
                | (sel_factor <= np.float32(dead_lo))
                | (best != 1)
            )
            new_order = jnp.clip(order + best - 1, 1, MAX_ORDER).astype(i32)
            order_acc = jnp.where(do_change, new_order, order).astype(i32)
            n_equal_new = jnp.where(do_change, 0, n_equal_acc).astype(i32)

            # ---- ONE shared D-rescale cond for both the rejected path
            # (D at `factor32`, current order) and the accepted
            # order-selection path (D_acc at `sel_factor`, new order):
            # keeping a single _compute_ru_df in the program halves the
            # kernel's largest straight-line block
            ru_factor = jnp.where(accepted, sel_factor, factor32)
            ru_order = jnp.where(accepted, new_order, order).astype(i32)
            do_ru = jnp.where(accepted, do_change, do_rescale)
            D_base = tuple(
                tuple(
                    df32.where(accepted, D_acc[i_][s], D[i_][s])
                    for s in range(n)
                )
                for i_ in range(ND)
            )

            def apply_resc(Din):
                ru = _compute_ru_df(
                    ru_order, DF(ru_factor, jnp.zeros_like(ru_factor))
                )
                return _apply_ru_df(ru, Din, n)

            D_out = jax.lax.cond(do_ru, apply_resc, lambda d: d, D_base)
            h_mult = jnp.where(do_ru, ru_factor, np.float32(1.0))
            h_out = df32.mul(h, DF(h_mult, jnp.zeros_like(h_mult)))

            # ---- dense-output interpolation writes -----------------------
            # nested while over the (dynamic, usually 0 or 1) eval points
            # crossed by this accepted step: ONE interpolation evaluation
            # per written point + a dynamic-start store, instead of
            # unrolling neval copies of the polynomial into the step body
            def w_cond(ne):
                te = _df_table(t_eval64, ne)
                return accepted & (ne < neval) & df32.le(te, t_new)

            def w_body(ne):
                te = _df_table(t_eval64, ne)
                # interpolation polynomial of the ACCEPTED step: D_acc at
                # (t_new, h, order) (solvers/bdf._interp_from_diff)
                yv = [D_acc[0][s] for s in range(n)]
                tf = _df_const(1.0)
                for i_ in range(MAX_ORDER):
                    # tf *= (te - (t_new - h*i)) / (h*(1+i))
                    num = df32.sub(
                        te, df32.sub(t_new, df32.mul_f32(h, float(i_)))
                    )
                    den = df32.mul_f32(h, float(1 + i_))
                    tf_new = df32.mul(tf, df32.div(num, den))
                    use = i_ < order
                    for s in range(n):
                        contrib = df32.where(
                            use,
                            df32.mul(
                                DF(jnp.broadcast_to(tf_new.hi, lanes.shape),
                                   jnp.broadcast_to(tf_new.lo, lanes.shape)),
                                D_acc[i_ + 1][s],
                            ),
                            df32.zeros_like(zrow),
                        )
                        yv[s] = df32.add(yv[s], contrib)
                    tf = df32.where(use, tf_new, tf)
                for s in range(n):
                    row = ne * n + s
                    ys_hi_ref[pl.dslice(row, 1), :] = yv[s].hi[None, :]
                    ys_lo_ref[pl.dslice(row, 1), :] = yv[s].lo[None, :]
                return ne + 1

            next_eval_new = jax.lax.while_loop(w_cond, w_body, next_eval)

            # ---- select between accepted / rejected paths ----------------
            Dn = D_out
            tn = df32.where(accepted, t_new, t)
            hn = h_out
            order_n = jnp.where(accepted, order_acc, order).astype(i32)
            # the equal-step counter only advances on ACCEPTED steps; a
            # rejection that rescaled h flags h_changed so the eventual
            # accept restarts the count at 1 (solvers/bdf.py:842-844)
            n_equal_ret = jnp.where(accepted, n_equal_new, n_equal).astype(i32)
            h_changed_n = jnp.where(
                accepted, 0, jnp.where(do_rescale, 1, h_changed)
            ).astype(i32)
            # a rejected attempt invalidates the PI controller's previous
            # error memory (solvers/bdf.py attempt_body prev_err -> nan)
            prev_err_n = jnp.where(accepted, err, nan32)
            conv_fail_n = jnp.where(
                accepted, 0, jnp.where(solve_ok, conv_fail, 1)
            ).astype(i32)
            err_fails_n = jnp.where(
                accepted, 0, err_fails + err_fail.astype(i32)
            ).astype(i32)

            status_n = status
            status_n = jnp.where(
                err_fail & (err_fails_n >= max_error_test_fails),
                _FAIL_ERRTEST, status_n,
            )
            status_n = jnp.where(
                (~solve_ok) & (newton_fails > max_newton_fails),
                _FAIL_NEWTON, status_n,
            )
            status_n = jnp.where(
                do_rescale & (jnp.abs(hn.hi) < min_timestep),
                _FAIL_STEP_TOO_SMALL, status_n,
            )
            status_n = jnp.where(
                (k + 1 >= max_steps) & (next_eval_new < neval)
                & (status_n == _OK),
                _FAIL_MAX_STEPS, status_n,
            ).astype(i32)

            out = dict(
                k=k + 1, steps=steps + accepted.astype(i32),
                status=status_n, next_eval=next_eval_new,
                t=tn, h=hn, order=order_n, n_equal=n_equal_ret,
                prev_err=prev_err_n, conv_fail=conv_fail_n,
                newton_fails=newton_fails, err_fails=err_fails_n,
                h_changed=h_changed_n, D=Dn,
            )
            if jac_reuse:
                out.update(J=J, lu=lu, perm=perm, c_last=c_last_n,
                           ssj=ssj_n, ssrj=ssrj_n, eta_mem=eta_fin)
            return out

        out = jax.lax.while_loop(cond, body, carry0)
        k_fin, steps_fin, status_fin = out["k"], out["steps"], out["status"]
        next_eval_fin = out["next_eval"]
        status_fin = jnp.where(
            (status_fin == _OK) & (next_eval_fin < neval),
            _FAIL_MAX_STEPS, status_fin,
        )
        info_ref[0, :] = jnp.full((tile,), status_fin, i32)
        info_ref[1, :] = jnp.full((tile,), steps_fin, i32)
        info_ref[2, :] = jnp.full((tile,), k_fin, i32)

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((neval * n, tile), f32),
            jax.ShapeDtypeStruct((neval * n, tile), f32),
            jax.ShapeDtypeStruct((3, tile), i32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )

    def solve(params_b):
        """params_b (B, nparams) f64 -> (ys (neval, n, B) f64,
        status (ntiles,), steps (ntiles,))."""
        params_b = jnp.asarray(params_b, jnp.float64)
        if pad_b != nbatch:
            pad = jnp.broadcast_to(params_b[-1:], (pad_b - nbatch, nparams))
            params_b = jnp.concatenate([params_b, pad], axis=0)
        pt = params_b.T  # (np, B)
        hi = pt.astype(f32)
        lo = (pt - hi.astype(jnp.float64)).astype(f32)
        packed = jnp.concatenate([hi, lo], axis=0)  # (2 np, B)
        ys_parts, st_parts, steps_parts = [], [], []
        for ti in range(ntiles):
            sl = packed[:, ti * tile : (ti + 1) * tile]
            # trace the kernel with x64 OFF: the kernel is pure f32/i32 by
            # design, but under ambient x64 python-int literals enter ops
            # like jnp.where as i64 scalars, and Mosaic's convert_helper
            # recurses forever lowering the resulting i64->i32 casts
            with jax.enable_x64(False):
                yh, yl, info = call(sl)
            ys_parts.append(yh.astype(jnp.float64) + yl.astype(jnp.float64))
            st_parts.append(info[0, 0])
            steps_parts.append(info[1, 0])
        ys = jnp.concatenate(ys_parts, axis=1)[:, :nbatch]
        ys = ys.reshape(neval, n, nbatch)
        status = jnp.stack(st_parts)
        # loud failure: poison every member of a failed tile
        bad = jnp.repeat(status < 0, tile)[:nbatch]
        ys = jnp.where(bad[None, None, :], jnp.nan, ys)
        return ys, status, jnp.stack(steps_parts)

    return solve
