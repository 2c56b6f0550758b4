"""Fused whole-solve Pallas BDF stepper for BANDED medium-n lockstep ensembles.

The small-n fused stepper (:mod:`diffsol_tpu.ops.pallas_stepper`) unrolls
every state into its own lane vector -- right for n <= 8, impossible for
the method-of-lines PDE class (heat1d n ~ 128, heat2d n ~ mgrid^2) whose
Jacobians are BANDED.  This kernel is the medium-n sibling: the same
adaptive NDF machinery (prediction, stale-Jacobian Newton, error test, PI
controller, R(factor)U rescaling, order selection, dense output), but

* state quantities are whole ``(n, B)`` double-float arrays (two-f32
  pairs) and the difference matrix is ``(ND, n, B)`` -- the user's rhs is
  re-evaluated through the VECTORIZED jaxpr interpreter
  (:mod:`diffsol_tpu.ops.dfinterp_vec`), a handful of whole-array VPU ops
  per evaluation regardless of n;
* the banded Jacobian comes from ``ml+mu+1`` cyclically-colored
  dual-number probes (the in-kernel analog of ops/banded.make_banded_jac;
  reference coloring role crates/diffsol/src/jacobian/mod.rs:118-260);
* the Newton matrix ``M - c J`` is factored by a NO-PIVOT banded LU in
  double-float arithmetic with the band resident in VMEM scratch --
  column-leading ``(n+mu, nb, B)`` layout so the sequential column loop
  indexes the cheap untiled leading axis (the layout lesson of
  ops/pallas_banded.py), valid for the diagonally-dominant matrices
  implicit steppers build from parabolic MOL operators (same no-pivot
  trade as LAPACK's fast banded paths; reference sparse-LU role
  crates/diffsol-la/src/linear_solver/suitesparse/klu.rs:1-245).

Everything else -- df32 numerics rationale, f32 heuristics, per-tile
lockstep semantics, the stale-Jacobian update policy thresholds -- is
shared with (and documented in) pallas_stepper.py.

Scope (checked at build; callers fall back to the XLA lockstep path):
identity or CONSTANT-DIAGONAL mass with consistent initial conditions,
no root/reset events, no quadrature, banded rhs Jacobian (the problem
must be routed to the banded tier or ml/mu passed explicitly), rhs/init
in the vectorized interpreter's primitive set.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solvers.bdf import MAX_ORDER, ND, _ALPHA, _ERROR_CONST2, _GAMMA
from . import df32
from .df32 import DF, DFAlgebra
from .dfinterp import DualAlgebra, UnsupportedForPallas
from .dfinterp_vec import VArr, make_vec_interpreter
from .pallas_stepper import (
    _OK,
    _FAIL_STEP_TOO_SMALL,
    _FAIL_MAX_STEPS,
    _FAIL_NEWTON,
    _FAIL_ERRTEST,
    _FAIL_LU_GROWTH,
    _df_const,
    _df_table,
    _f32_table,
    _pi_raw_f32,
    _pow_f32,
    _compute_ru_df,
)

i32 = jnp.int32
f32 = jnp.float32

# temporary bring-up bisection switch (see scripts/tpu_band_stepper_probe.py)
import os as _os
_DEBUG_STAGE = int(_os.environ.get("DIFFSOL_BAND_DEBUG", "0"))


def _np_df(arr):
    """Split an f64 numpy array into trace-time DF constant parts."""
    a = np.asarray(arr, np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _bcast_scalar(sc: DF, like_hi) -> DF:
    """Broadcast a DF scalar to an array shape."""
    return DF(jnp.broadcast_to(sc.hi, like_hi.shape),
              jnp.broadcast_to(sc.lo, like_hi.shape))


def make_pallas_band_bdf_solve(
    problem,
    t_eval,
    nbatch: int,
    ml: Optional[int] = None,
    mu: Optional[int] = None,
    tile: Optional[int] = None,
    max_steps: int = 100_000,
    max_newton_iter: int = 10,
    max_newton_fails: int = 50,
    max_error_test_fails: int = 40,
    min_timestep: float = 1e-32,
    interpret: bool = False,
    vmem_budget_bytes: int = 10 * 2**20,
):
    """Build ``solve(params_b (B, np) f64) -> (ys (neval, n, B) f64,
    status (ntiles,) i32, steps (ntiles,) i32)`` running the whole
    adaptive banded BDF solve in fused Pallas kernels (one ungridded
    invocation per member tile; per-tile lockstep semantics).

    Raises :class:`UnsupportedForPallas` when the problem is outside the
    kernel's scope.
    """
    import sys

    if sys.getrecursionlimit() < 100_000:
        sys.setrecursionlimit(100_000)

    eqn = problem.eqn
    if eqn.root is not None or eqn.reset is not None:
        raise UnsupportedForPallas("root/reset events not supported in kernel tier")
    if problem.integrate_out:
        raise UnsupportedForPallas("quadrature output not supported in kernel tier")
    n = eqn.nstates
    nparams = eqn.nparams
    if ml is None or mu is None:
        spec = problem.linear_solver
        name = getattr(spec, "name", "")
        if isinstance(name, str) and name.startswith("banded") and spec.meta:
            ml, mu = int(spec.meta[0]), int(spec.meta[1])
        else:
            raise UnsupportedForPallas(
                "banded kernel tier needs a banded-routed problem or "
                "explicit ml/mu"
            )
    nb = ml + mu + 1
    nc = nb  # cyclic coloring width
    ncols = n + mu
    npadx = n + max(ml, mu, 1)

    t_eval64 = np.asarray(jax.device_get(jnp.asarray(t_eval)), np.float64).reshape(-1)
    neval = len(t_eval64)
    t0_64 = float(np.asarray(jax.device_get(problem.t0)))
    rtol = float(np.asarray(jax.device_get(problem.rtol)))
    atol64 = np.asarray(jax.device_get(problem.atol), np.float64).reshape(-1)
    if atol64.shape[0] == 1:
        atol64 = np.repeat(atol64, n)
    atol_col = atol64.astype(np.float32)[:, None]  # (n, 1) f32 constant
    rtol_f32 = np.float32(rtol)

    # trace rhs / init on f64 avals so literal constants (grid spacings,
    # stencil coefficients) are lifted into DF pairs EXACTLY -- the
    # interpreter replaces every constant/op itself, so no 64-bit type
    # reaches Mosaic (unlike the small-n stepper, which must trace at f32
    # because kernel-side jnp scalar promotion is in play there)
    with jax.enable_x64(True):
        t_aval = jnp.zeros((), jnp.float64)
        y_aval = jnp.zeros((n,), jnp.float64)
        p_aval = jnp.zeros((nparams,), jnp.float64)
        rhs_jaxpr = jax.make_jaxpr(eqn.rhs)(t_aval, y_aval, p_aval)
    # NOTE: the initial state (y0, dy0, h0) is computed OUTSIDE the kernel
    # in full f64 XLA (see solve()) and passed in as an input: it is
    # per-solve setup cost, it frees eqn.init from the kernel
    # interpreter's primitive scope, and -- decisively -- the
    # interpreter-evaluated init chain feeding the dual-probe Jacobian
    # crashes Mosaic's layout pass (`Check failed: limits[i] <= dim(i)`,
    # round-4 bring-up bisection, scripts/tpu_band_stepper_probe.py)

    # ---- mass handling: identity or constant diagonal (probed) ----------
    has_mass = eqn.mass is not None
    mass_const_diag = None
    needs_ic_solve = False
    if has_mass:
        if eqn.mass_diag_fn is None:
            raise UnsupportedForPallas(
                "non-diagonal mass not supported in kernel tier"
            )
        t0j = jnp.asarray(t0_64)
        p0j = jnp.asarray(problem.params)
        md0 = np.asarray(jax.device_get(eqn.mass_diag_fn(t0j, p0j)))
        md_t = np.asarray(jax.device_get(eqn.mass_diag_fn(t0j + 1.0, p0j)))
        md_p = np.asarray(jax.device_get(
            eqn.mass_diag_fn(t0j, p0j * (1.0 + 1e-3) + 1e-3)
        ))
        if not (np.all(np.isfinite(md_t)) and np.all(np.isfinite(md_p))
                and np.allclose(md_t, md0) and np.allclose(md_p, md0)):
            raise UnsupportedForPallas(
                "banded kernel tier supports constant-diagonal mass only"
            )
        # consistent-IC probe: when eqn.init is inconsistent (the foodweb
        # class -- reference foodweb.rs runs IDA calc_ic), the host-side
        # f64 init runs the library's Brown/Hindmarsh/Petzold consistent-IC
        # solve per member before the kernel starts stepping
        y0c = jnp.asarray(jax.device_get(eqn.init(t0j, p0j)))
        f0c = np.asarray(jax.device_get(eqn.rhs(t0j, y0c, p0j)))
        alg_rows = md0 == 0.0
        scale = 1.0 + float(np.max(np.abs(f0c), initial=0.0))
        needs_ic_solve = bool(np.any(np.abs(f0c[alg_rows]) > 1e-6 * scale))
        mass_const_diag = md0

    # ---- tile sizing by VMEM budget --------------------------------------
    # persistent in-kernel footprint per lane (bytes):
    #   D (ND, n) df              : ND * n * 8
    #   J band value (n, nb) df   : n * nb * 8
    #   fband scratch             : ncols * nb * 8
    #   x scratch                 : npadx * 8
    #   ys outputs                : neval * n * 8
    #   live temporaries (y_pred, psi, x, deltas, rhs eval ~ 8 rows)
    # D and J live ~3x (carry double-buffering + update temporaries);
    # straight-line body temporaries ~24 (n,) df rows (measured: n=128
    # tile=256 needs 16.4M -> per-lane ~66KB)
    per_lane = (3 * ND * n + 3 * n * nb + 2 * ncols * nb + 2 * npadx
                + neval * n + 24 * n) * 8
    if tile is None:
        tile = max(128, min(4096, int(vmem_budget_bytes // max(per_lane, 1))))
    if interpret:
        tile = min(tile, nbatch)  # no layout constraint; keep tiny tests fast
    else:
        tile = min(tile, max(nbatch, 128))
        tile = max(128, (tile // 128) * 128)
    ntiles = -(-nbatch // tile)
    pad_b = ntiles * tile

    alpha64 = [float(v) for v in _ALPHA]
    gamma64 = [float(v) for v in _GAMMA]
    ec2_32 = [np.float32(v) for v in _ERROR_CONST2]
    opts = problem.options
    nl_tol = float(opts.nonlinear_solver_tolerance)
    ki_num = float(opts.pi_control_integral)
    kp_num = float(opts.pi_control_proportional)
    min_shrink = 0.1
    max_growth = 2.1
    dead_lo, dead_hi = 0.9, 1.1

    # ---- array-constant registry ----------------------------------------
    # Pallas kernels may not capture jnp array constants: every ndim>=1
    # constant -- the rhs/init jaxprs' literals and consts (stencil
    # coefficient tables, grids), atol, the mass diagonal, the Jacobian
    # color masks, the band-diagonal one-hot -- is registered here and
    # passed as a kernel INPUT, packed as a (2,) + shape + (1,) f32
    # hi/lo pair.  The vec interpreter's lift_array hook reads them back.
    from jax.extend import core as jcore

    const_arrays: list = []
    const_index: dict = {}

    def _register(a):
        a64 = np.asarray(a, np.float64)
        k = (a64.shape, a64.tobytes())
        if k not in const_index:
            const_index[k] = len(const_arrays)
            const_arrays.append(a64)
        return const_index[k]

    def _collect(closed):
        jx = closed.jaxpr
        for cval in closed.consts:
            cv = np.asarray(cval)
            if cv.ndim >= 1 and cv.dtype != bool:
                _register(cv)
        for eqn_ in jx.eqns:
            for v in eqn_.invars:
                if isinstance(v, jcore.Literal):
                    av = np.asarray(v.val)
                    if av.ndim >= 1 and av.dtype != bool:
                        _register(av)
            inner = eqn_.params.get("jaxpr") or eqn_.params.get("call_jaxpr")
            if inner is not None and hasattr(inner, "jaxpr"):
                _collect(inner)

    _collect(rhs_jaxpr)
    atol_idx = _register(atol64)
    mass_idx = (_register(mass_const_diag)
                if mass_const_diag is not None else None)
    color_idx = [
        _register(((np.arange(n) % nc) == c).astype(np.float64))
        for c in range(nc)
    ]
    onehot_mu = np.zeros(nb)
    onehot_mu[mu] = 1.0
    onehot_idx = _register(onehot_mu)

    nconst = len(const_arrays)
    const_inputs = []
    for a64 in const_arrays:
        hi, lo = _np_df(a64)
        const_inputs.append(
            jnp.asarray(np.stack([hi, lo])[..., None]))  # (2,)+S+(1,)

    def kernel(p_ref, init_ref, *rest):
        const_refs = rest[:nconst]
        ys_hi_ref, ys_lo_ref, info_ref = rest[nconst: nconst + 3]
        f_hi_ref, f_lo_ref, x_hi_ref, x_lo_ref = rest[nconst + 3:]
        lanes = p_ref[0, :] * 0.0  # (B,) f32 zeros template
        B = tile
        const_vals = [r[...] for r in const_refs]

        def get_df(idx) -> DF:
            v = const_vals[idx]
            return DF(v[0], v[1])  # shape S + (1,)

        def lift_array(alg_in, arr):
            a64 = np.asarray(arr, np.float64)
            k = (a64.shape, a64.tobytes())
            idx = const_index.get(k)
            if idx is None:
                raise UnsupportedForPallas(
                    f"unregistered array constant of shape {a64.shape} "
                    "reached the kernel interpreter"
                )
            narrow = get_df(idx)
            # broadcast to full lane width: width-1 (…, 1) interpreter
            # intermediates crash Mosaic's layout pass (round-4 bisection)
            tgt = a64.shape + (B,)
            base = DF(jnp.broadcast_to(narrow.hi, tgt),
                      jnp.broadcast_to(narrow.lo, tgt))
            name_ = getattr(alg_in, "__name__", type(alg_in).__name__)
            if name_ == "DFAlgebra":
                val = base
            elif name_ == "F32Algebra":
                val = base.hi
            elif name_ == "DualAlgebra":
                bname = getattr(alg_in.base, "__name__",
                                type(alg_in.base).__name__)
                bval = base if bname == "DFAlgebra" else base.hi
                val = (bval, alg_in.base.zeros_like(bval))
            else:
                raise TypeError(f"unknown algebra {alg_in!r}")
            return VArr(a64.shape, val)

        run_df = make_vec_interpreter(DFAlgebra, lanes,
                                      lift_array=lift_array)
        dual = DualAlgebra(DFAlgebra)
        run_dual = make_vec_interpreter(dual, lanes,
                                        lift_array=lift_array)
        atol_in = get_df(atol_idx).hi  # (n, 1) f32
        md_in = get_df(mass_idx) if mass_idx is not None else None

        p_val = DF(p_ref[:nparams, :], p_ref[nparams:, :])  # (np, B)
        p_v = VArr((nparams,), p_val)

        def rhs_arr(t_sc: DF, y: DF) -> DF:
            """(n, B) df rhs evaluation."""
            tb = DF(jnp.broadcast_to(t_sc.hi, (B,)),
                    jnp.broadcast_to(t_sc.lo, (B,)))
            out = run_df(rhs_jaxpr, [VArr((), tb), VArr((n,), y), p_v])[0]
            return out.val

        def jac_band(t_sc: DF, y: DF) -> DF:
            """Banded J as a column-leading (n, nb, B) df array via nc
            cyclically-colored dual probes: band[j, d] = J[j+d-mu, j]
            = tangent_{j mod nc}[j + d - mu]."""
            tb = DF(jnp.broadcast_to(t_sc.hi, (B,)),
                    jnp.broadcast_to(t_sc.lo, (B,)))
            t_dual = VArr((), (tb, df32.zeros_like(tb)))
            p_dual = VArr((nparams,), (p_val, df32.zeros_like(p_val)))
            tans = []
            for c in range(nc):
                seed_hi = jnp.broadcast_to(
                    get_df(color_idx[c]).hi, (n, B))
                seed = DF(seed_hi, jnp.zeros_like(seed_hi))
                y_dual = VArr((n,), (y, seed))
                o = run_dual(rhs_jaxpr, [t_dual, y_dual, p_dual])[0]
                tans.append(o.val[1])  # DF (n, B)
            zrow = DF(jnp.zeros((n, B), f32), jnp.zeros((n, B), f32))

            def shift_rows(a: DF, s: int) -> DF:
                # out[j] = a[j + s], zero out of range
                if s == 0:
                    return a
                def sh(x):
                    if s > 0:
                        return jnp.concatenate(
                            [x[s:], jnp.zeros((s, B), f32)], axis=0)
                    return jnp.concatenate(
                        [jnp.zeros((-s, B), f32), x[:n + s]], axis=0)
                return DF(sh(a.hi), sh(a.lo))

            bands = []
            for d in range(nb):
                acc = zrow
                for c in range(nc):
                    m = get_df(color_idx[c]).hi  # (n, 1)
                    sh = shift_rows(tans[c], d - mu)
                    acc = df32.add(acc, DF(sh.hi * m, sh.lo * m))
                bands.append(acc)
            # stack -> (n, nb, B)
            return DF(jnp.stack([b.hi for b in bands], axis=1),
                      jnp.stack([b.lo for b in bands], axis=1))

        def assemble_and_factor(J: DF, cval: DF):
            """Write A = M - c J (column-leading band) into the fband
            scratch refs and factor in place (no-pivot banded LU).

            Returns the element growth factor rho = max|LU elements| /
            max|A| (Wilkinson's pivot-growth measure).  A no-pivot LU is
            only stable on (near-)diagonally-dominant bands; a mildly
            non-dominant system can otherwise factor "successfully" with
            silently degraded accuracy.  The caller fails the solve
            loudly when rho blows up (round-4 weak #5; the XLA band tier
            fails via the Newton ladder, tests/test_banded.py
            no_pivot_band_fails_loudly)."""
            cb = _bcast_scalar(cval, J.hi)
            A = df32.neg(df32.mul(cb, J))
            # main diagonal: + mass diag (or identity), added through the
            # one-hot band-row mask input (no in-kernel value scatter)
            oh = get_df(onehot_idx).hi.reshape(1, nb, 1)
            if md_in is not None:
                dg = DF(md_in.hi[:, None, :] * oh,
                        md_in.lo[:, None, :] * oh)  # (n, nb, 1)
            else:
                dg = DF(jnp.broadcast_to(oh, (1, nb, 1)),
                        jnp.zeros((1, nb, 1), f32))
            A = df32.add(A, dg)
            a0 = jnp.maximum(jnp.max(jnp.abs(A.hi)), np.float32(1e-30))
            f_hi_ref[0:n, :, :] = A.hi
            f_lo_ref[0:n, :, :] = A.lo
            if mu > 0:
                # pad columns: unit diagonal so update windows never run
                # off the end (re-initialized every refactor); built from
                # the one-hot input (no scatter on Mosaic)
                pad_hi = jnp.broadcast_to(
                    oh, (mu, nb, B)).astype(f32)
                f_hi_ref[n:, :, :] = pad_hi
                f_lo_ref[n:, :, :] = jnp.zeros((mu, nb, B), f32)

            def fcol(k, gmax):
                piv = DF(f_hi_ref[k, mu, :], f_lo_ref[k, mu, :])  # (B,)
                inv = df32.recip(piv)
                if ml > 0:
                    lblk = DF(f_hi_ref[k, mu + 1: mu + 1 + ml, :],
                              f_lo_ref[k, mu + 1: mu + 1 + ml, :])
                    l = df32.mul(lblk, DF(inv.hi[None], inv.lo[None]))
                    f_hi_ref[k, mu + 1: mu + 1 + ml, :] = l.hi
                    f_lo_ref[k, mu + 1: mu + 1 + ml, :] = l.lo
                    for dj in range(1, mu + 1):
                        u = DF(f_hi_ref[k + dj, mu - dj, :],
                               f_lo_ref[k + dj, mu - dj, :])  # (B,)
                        blk = DF(
                            f_hi_ref[k + dj, mu + 1 - dj: mu + 1 + ml - dj, :],
                            f_lo_ref[k + dj, mu + 1 - dj: mu + 1 + ml - dj, :],
                        )
                        upd = df32.sub(
                            blk, df32.mul(l, DF(u.hi[None], u.lo[None])))
                        f_hi_ref[k + dj, mu + 1 - dj: mu + 1 + ml - dj, :] = upd.hi
                        f_lo_ref[k + dj, mu + 1 - dj: mu + 1 + ml - dj, :] = upd.lo
                        # Wilkinson ELEMENT growth only: a large multiplier
                        # on a tiny row is benign (foodweb's row scales span
                        # ~1e8 with growth exactly 1.0); a (near-)zero pivot
                        # surfaces here as inf/nan Schur elements, which the
                        # caller's ~(g <= tol) catches
                        gmax = jnp.maximum(gmax, jnp.max(jnp.abs(upd.hi)))
                return gmax

            gmax = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), fcol, a0)
            return gmax / a0

        def band_solve(b: DF) -> DF:
            """Solve A x = b with the factored band in the fband refs;
            b is (n, B) df.  Returns (n, B) df."""
            x_hi_ref[0:n, 0, :] = b.hi
            x_lo_ref[0:n, 0, :] = b.lo
            x_hi_ref[n:, 0, :] = jnp.zeros((npadx - n, B), f32)
            x_lo_ref[n:, 0, :] = jnp.zeros((npadx - n, B), f32)

            if ml > 0:
                def fwd(k, carry):
                    l = DF(f_hi_ref[k, mu + 1: mu + 1 + ml, :],
                           f_lo_ref[k, mu + 1: mu + 1 + ml, :])  # (ml, B)
                    bk = DF(x_hi_ref[k, 0, :], x_lo_ref[k, 0, :])  # (B,)
                    blk = DF(x_hi_ref[pl.ds(k + 1, ml), 0, :],
                             x_lo_ref[pl.ds(k + 1, ml), 0, :])  # (ml, B)
                    upd = df32.sub(
                        blk, df32.mul(l, DF(bk.hi[None], bk.lo[None])))
                    x_hi_ref[pl.ds(k + 1, ml), 0, :] = upd.hi
                    x_lo_ref[pl.ds(k + 1, ml), 0, :] = upd.lo
                    return carry

                jax.lax.fori_loop(jnp.int32(0), jnp.int32(n - 1), fwd,
                                  jnp.int32(0))
                # the forward sweep may write past row n-1 (k = n-2 updates
                # rows n-1..n-2+ml): zero the pad so the backward sweep's
                # out-of-range u*x terms vanish regardless of pad-band junk
                x_hi_ref[n:, 0, :] = jnp.zeros((npadx - n, B), f32)
                x_lo_ref[n:, 0, :] = jnp.zeros((npadx - n, B), f32)

            def bwd(i, carry):
                k = jnp.int32(n - 1) - i
                diag = DF(f_hi_ref[k, mu, :], f_lo_ref[k, mu, :])
                acc = DF(x_hi_ref[k, 0, :], x_lo_ref[k, 0, :])
                if mu > 0:
                    ublk_hi = f_hi_ref[pl.ds(k + 1, mu), 0:mu, :]
                    ublk_lo = f_lo_ref[pl.ds(k + 1, mu), 0:mu, :]
                    xblk_hi = x_hi_ref[pl.ds(k + 1, mu), 0, :]
                    xblk_lo = x_lo_ref[pl.ds(k + 1, mu), 0, :]
                    for dj in range(1, mu + 1):
                        u = DF(ublk_hi[dj - 1, mu - dj, :],
                               ublk_lo[dj - 1, mu - dj, :])
                        xv = DF(xblk_hi[dj - 1, :], xblk_lo[dj - 1, :])
                        acc = df32.sub(acc, df32.mul(u, xv))
                sol = df32.div(acc, diag)
                x_hi_ref[k, 0, :] = sol.hi
                x_lo_ref[k, 0, :] = sol.lo
                return carry

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), bwd, jnp.int32(0))
            return DF(x_hi_ref[0:n, 0, :], x_lo_ref[0:n, 0, :])

        # ---- initial state (host-computed; rows: y0, h*dy0, h) -----------
        t0_df = _df_const(t0_64)
        N0 = 2 * n + 1
        y0 = DF(init_ref[0:n, :], init_ref[N0: N0 + n, :])
        D1r = DF(init_ref[n: 2 * n, :], init_ref[N0 + n: N0 + 2 * n, :])
        h_df0 = DF(init_ref[2 * n, 0], init_ref[N0 + 2 * n, 0])

        def wrms32(x: DF, y: DF):
            """max-over-lanes of the per-member WRMS (f32 heuristic)."""
            scale = jnp.abs(y.hi) * rtol_f32 + atol_in
            q = x.hi / scale
            return jnp.sqrt(jnp.max(jnp.mean(q * q, axis=0)))

        zmat = DF(jnp.zeros((n, B), f32), jnp.zeros((n, B), f32))
        # stacked construction (.at[].set scatters are not lowerable on
        # Mosaic)
        zpad = jnp.zeros((ND - 2, n, B), f32)
        D0 = DF(jnp.concatenate([y0.hi[None], D1r.hi[None], zpad]),
                jnp.concatenate([y0.lo[None], D1r.lo[None], zpad]))

        nan32 = jnp.asarray(np.float32(np.nan))

        def masked_sum(D: DF, order, lo_i=0, weights=None) -> DF:
            """sum_{i=lo_i..order} w_i * D[i] -> (n, B) df (unrolled)."""
            acc = zmat
            for i_ in range(lo_i, MAX_ORDER + 1):
                row = DF(D.hi[i_], D.lo[i_])
                if weights is not None:
                    row = df32.mul(
                        _bcast_scalar(weights[i_], row.hi), row)
                take = i_ <= order
                acc = df32.add(
                    acc, DF(jnp.where(take, row.hi, 0.0),
                            jnp.where(take, row.lo, 0.0)))
            return acc

        def select_row(D: DF, col) -> DF:
            sel = DF(D.hi[0], D.lo[0])
            for i_ in range(1, ND):
                sel = df32.where(col == i_, DF(D.hi[i_], D.lo[i_]), sel)
            return sel

        def apply_ru(ru, D: DF) -> DF:
            """D'[j] = sum_i ru[i][j] * D[i] (whole-array)."""
            rows_hi, rows_lo = [], []
            for j in range(ND):
                acc = df32.mul(
                    _bcast_scalar(ru[0][j], D.hi[0]), DF(D.hi[0], D.lo[0]))
                for i_ in range(1, ND):
                    acc = df32.add(acc, df32.mul(
                        _bcast_scalar(ru[i_][j], D.hi[0]),
                        DF(D.hi[i_], D.lo[i_])))
                rows_hi.append(acc.hi)
                rows_lo.append(acc.lo)
            return DF(jnp.stack(rows_hi), jnp.stack(rows_lo))

        gamma_w = [_df_const(g) for g in gamma64] + [
            _df_const(0.0)
        ] * (ND - len(gamma64))

        carry0 = (
            jnp.asarray(0, i32),            # k: attempts
            jnp.asarray(0, i32),            # steps accepted
            jnp.asarray(_OK, i32),          # status
            jnp.asarray(0, i32),            # next_eval
            t0_df,                          # t
            h_df0,                          # h
            jnp.asarray(1, i32),            # order
            jnp.asarray(0, i32),            # n_equal
            nan32,                          # prev_err (squared)
            jnp.asarray(0, i32),            # conv_fail
            jnp.asarray(0, i32),            # newton_fails total
            jnp.asarray(0, i32),            # err_fails this step
            jnp.asarray(0, i32),            # h_changed
            D0,                             # difference matrix
            DF(jnp.zeros((n, nb, B), f32),
               jnp.zeros((n, nb, B), f32)),  # J band (value carry)
            jnp.asarray(0.0, f32),          # c_last
            jnp.asarray(0, i32),            # ssj
            jnp.asarray(0, i32),            # ssrj
            jnp.asarray(np.float32(20.0**1.25)),  # eta memory
            jnp.asarray(1.0, f32),          # LU element growth factor
        )

        def cond(c):
            k, _steps, status, next_eval = c[0], c[1], c[2], c[3]
            return (status == _OK) & (k < max_steps) & (next_eval < neval)

        def body(c):
            (k, steps, status, next_eval, t, h, order, n_equal, prev_err,
             conv_fail, newton_fails, err_fails, h_changed, D,
             J_c, c_last, ssj, ssrj, eta_mem, growth_c) = c

            alpha_k = _df_table(alpha64, order)
            cval = df32.mul(h, alpha_k)
            t_pred = df32.add(t, h)

            y_pred = masked_sum(D, order)
            psi_raw = masked_sum(D, order, lo_i=1, weights=gamma_w)
            psi = df32.mul(_bcast_scalar(alpha_k, psi_raw.hi), psi_raw)

            # stale-Jacobian update policy (same thresholds as the
            # small-n kernel; reference bdf.rs:467-505 + jacobian_update.rs)
            c32 = cval.hi
            rel = jnp.abs(c32 / jnp.where(c_last == 0.0, c32, c_last) - 1.0)
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
                lambda _: jac_band(t_pred, y_pred),
                lambda _: J_c,
                None,
            )
            growth_n = jax.lax.cond(
                refactor,
                lambda _: assemble_and_factor(J, cval),
                lambda _: growth_c,
                None,
            )
            # element growth beyond ~1e4 means the no-pivot factorization
            # is numerically meaningless (or NaN: ~(x <= tol) catches it)
            lu_bad = ~(growth_n <= np.float32(1e4))
            c_last_n = jnp.where(refactor, c32, c_last)
            ssj_n = jnp.where(refactor, 0, ssj + 1).astype(i32)
            ssrj_n = jnp.where(refresh_j, 0, ssrj + 1).astype(i32)
            eta0 = jnp.where(
                refactor,
                np.float32(20.0**1.25),
                jnp.where(h_changed == 1, np.float32(100.0**1.25), eta_mem),
            )

            # ---- Newton on F(x) = M (x - y_pred + psi) - c f(x) ----------
            mdc = md_in  # (n, 1) df, broadcasts over lanes

            def nres(x: DF) -> DF:
                fx = rhs_arr(t_pred, x)
                tmp = df32.add(df32.sub(x, y_pred), psi)
                if mdc is not None:
                    tmp = df32.mul(mdc, tmp)
                return df32.sub(
                    tmp, df32.mul(_bcast_scalar(cval, fx.hi), fx))

            eps32 = np.float32(np.finfo(np.float32).eps)

            def n_cond(nc_):
                return (nc_[3] == 0) & (nc_[2] < max_newton_iter)

            def n_body(nc_):
                x, first_nrm, niter, nstat, _eta_run = nc_
                delta = band_solve(nres(x))
                x = df32.sub(x, delta)
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
                    _pow_f32(jnp.maximum(eta0, 1e4 * eps32), np.float32(0.8)),
                    rate / (1.0 - rate),
                )
                diverged = (~is_first) & (diverged_rate | (proj > nl_tol))
                converged = (eta_new * nrm < nl_tol) & ~diverged
                nstat = jnp.where(
                    diverged, 2, jnp.where(converged, 1, 0)).astype(i32)
                first_nrm = jnp.where(is_first, nrm, first_nrm)
                return (x, first_nrm, niter, nstat, eta_new)

            x_fin, _fn, niter, nstat, eta_fin = jax.lax.while_loop(
                n_cond, n_body,
                (y_pred, jnp.asarray(0.0, f32), jnp.asarray(0, i32),
                 jnp.asarray(0, i32), eta0),
            )
            solve_ok = nstat == 1
            d_arr = df32.sub(x_fin, y_pred)

            # ---- error test ---------------------------------------------
            scale = jnp.abs(y_pred.hi) * rtol_f32 + atol_in
            q = d_arr.hi / scale
            sq_d = jnp.max(jnp.mean(q * q, axis=0))
            err = sq_d * _f32_table(ec2_32, order - 1)
            accepted = solve_ok & (err <= 1.0)

            m = np.float32(max_newton_iter)
            safety = 0.9 * (2.0 * m + 1.0) / (2.0 * m + niter.astype(f32))

            second = (~solve_ok) & (conv_fail == 1)
            err_fail = solve_ok & ~accepted
            newton_fails = newton_fails + (~solve_ok).astype(i32)
            raw = _pi_raw_f32(err, prev_err, ki_num, kp_num, order + 1)
            rej_factor = jnp.maximum(safety * raw, np.float32(min_shrink))
            factor32 = jnp.where(err_fail, rej_factor, np.float32(0.3))
            do_rescale = err_fail | second

            # ---- accepted-step difference update -------------------------
            d_old_op1 = select_row(D, order + 1)
            # suffix-accumulate from high rows down (unrolled, whole-array)
            new_hi = [None] * ND
            new_lo = [None] * ND
            acc = zmat
            for i_ in range(ND - 1, -1, -1):
                row = DF(D.hi[i_], D.lo[i_])
                take = i_ <= order
                inc = DF(jnp.where(take, row.hi, 0.0),
                         jnp.where(take, row.lo, 0.0))
                acc = df32.add(acc, inc)
                below = df32.add(acc, d_arr)
                v = df32.where(take, below, row)
                v = df32.where(i_ == order + 1, d_arr, v)
                v = df32.where(i_ == order + 2,
                               df32.sub(d_arr, d_old_op1), v)
                new_hi[i_] = v.hi
                new_lo[i_] = v.lo
            D_acc = DF(jnp.stack(new_hi), jnp.stack(new_lo))
            t_new = t_pred
            y_new = DF(D_acc.hi[0], D_acc.lo[0])

            # ---- order selection -----------------------------------------
            n_equal_acc = jnp.where(
                (h_changed == 1) | do_rescale, 1, n_equal + 1)
            do_sel = accepted & (n_equal_acc > order)

            def pred_err(col, const_idx):
                rowv = select_row(D_acc, col)
                scale2 = jnp.abs(y_new.hi) * rtol_f32 + atol_in
                q2 = rowv.hi / scale2
                return jnp.max(jnp.mean(q2 * q2, axis=0)) * _f32_table(
                    ec2_32, const_idx)

            em = jnp.where(order > 1,
                           pred_err(order, jnp.maximum(order - 1, 0)),
                           np.float32(np.inf))
            ep = jnp.where(order < MAX_ORDER,
                           pred_err(order + 2,
                                    jnp.minimum(order + 1, MAX_ORDER)),
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

            # ---- shared RU rescale (rejected OR order-change paths) ------
            ru_factor = jnp.where(accepted, sel_factor, factor32)
            ru_order = jnp.where(accepted, new_order, order).astype(i32)
            do_ru = jnp.where(accepted, do_change, do_rescale)
            D_base = df32.where(accepted, D_acc, D)

            def apply_resc(Din):
                ru = _compute_ru_df(
                    ru_order, DF(ru_factor, jnp.zeros_like(ru_factor)))
                return apply_ru(ru, Din)

            D_out = jax.lax.cond(do_ru, apply_resc, lambda d: d, D_base)
            h_mult = jnp.where(do_ru, ru_factor, np.float32(1.0))
            h_out = df32.mul(h, DF(h_mult, jnp.zeros_like(h_mult)))

            # ---- dense-output interpolation writes -----------------------
            def w_cond(ne):
                te = _df_table(t_eval64, ne)
                return accepted & (ne < neval) & df32.le(te, t_new)

            def w_body(ne):
                te = _df_table(t_eval64, ne)
                yv = DF(D_acc.hi[0], D_acc.lo[0])
                tf = _df_const(1.0)
                for i_ in range(MAX_ORDER):
                    num = df32.sub(
                        te, df32.sub(t_new, df32.mul_f32(h, float(i_))))
                    den = df32.mul_f32(h, float(1 + i_))
                    tf_new = df32.mul(tf, df32.div(num, den))
                    use = i_ < order
                    row = DF(D_acc.hi[i_ + 1], D_acc.lo[i_ + 1])
                    contrib = df32.mul(_bcast_scalar(tf_new, row.hi), row)
                    yv = df32.add(
                        yv, DF(jnp.where(use, contrib.hi, 0.0),
                               jnp.where(use, contrib.lo, 0.0)))
                    tf = df32.where(use, tf_new, tf)
                ys_hi_ref[pl.ds(ne, 1), :, :] = yv.hi[None]
                ys_lo_ref[pl.ds(ne, 1), :, :] = yv.lo[None]
                return ne + 1

            next_eval_new = jax.lax.while_loop(w_cond, w_body, next_eval)

            # ---- select between accepted / rejected paths ----------------
            tn = df32.where(accepted, t_new, t)
            hn = h_out
            order_n = jnp.where(accepted, order_acc, order).astype(i32)
            n_equal_ret = jnp.where(accepted, n_equal_new, n_equal).astype(i32)
            h_changed_n = jnp.where(
                accepted, 0, jnp.where(do_rescale, 1, h_changed)).astype(i32)
            prev_err_n = jnp.where(accepted, err, nan32)
            conv_fail_n = jnp.where(
                accepted, 0, jnp.where(solve_ok, conv_fail, 1)).astype(i32)
            err_fails_n = jnp.where(
                accepted, 0, err_fails + err_fail.astype(i32)).astype(i32)

            status_n = status
            status_n = jnp.where(
                err_fail & (err_fails_n >= max_error_test_fails),
                _FAIL_ERRTEST, status_n)
            status_n = jnp.where(
                (~solve_ok) & (newton_fails > max_newton_fails),
                _FAIL_NEWTON, status_n)
            status_n = jnp.where(
                do_rescale & (jnp.abs(hn.hi) < min_timestep),
                _FAIL_STEP_TOO_SMALL, status_n)
            status_n = jnp.where(
                (k + 1 >= max_steps) & (next_eval_new < neval)
                & (status_n == _OK),
                _FAIL_MAX_STEPS, status_n).astype(i32)
            status_n = jnp.where(lu_bad, _FAIL_LU_GROWTH, status_n).astype(i32)

            return (
                k + 1, steps + accepted.astype(i32), status_n, next_eval_new,
                tn, hn, order_n, n_equal_ret, prev_err_n,
                conv_fail_n, newton_fails, err_fails_n, h_changed_n, D_out,
                J, c_last_n, ssj_n, ssrj_n, eta_fin, growth_n,
            )

        if _DEBUG_STAGE == 1:  # init only
            ys_hi_ref[0:1, :, :] = y0.hi[None]
            ys_lo_ref[0:1, :, :] = y0.lo[None]
            info_ref[0, :] = jnp.full((tile,), 0, i32)
            info_ref[1, :] = jnp.full((tile,), 0, i32)
            info_ref[2, :] = jnp.full((tile,), 0, i32)
            return
        if _DEBUG_STAGE in (23, 24):  # dual eval only / + one shift
            tb = DF(jnp.broadcast_to(t0_df.hi, (B,)),
                    jnp.broadcast_to(t0_df.lo, (B,)))
            t_dual = VArr((), (tb, df32.zeros_like(tb)))
            p_dual = VArr((nparams,), (p_val, df32.zeros_like(p_val)))
            seed_hi = jnp.broadcast_to(get_df(color_idx[0]).hi, (n, B))
            seed = DF(seed_hi, jnp.zeros_like(seed_hi))
            o = run_dual(rhs_jaxpr, [t_dual, VArr((n,), (y0, seed)), p_dual])[0]
            d = o.val[1]
            if _DEBUG_STAGE == 24:
                sh = jnp.concatenate([d.hi[1:], jnp.zeros((1, B), f32)], axis=0)
                d = DF(sh * get_df(color_idx[0]).hi, d.lo)
            ys_hi_ref[0:1, :, :] = d.hi[None]
            ys_lo_ref[0:1, :, :] = d.lo[None]
            info_ref[0, :] = jnp.full((tile,), 0, i32)
            info_ref[1, :] = jnp.full((tile,), 0, i32)
            info_ref[2, :] = jnp.full((tile,), 0, i32)
            return
        if _DEBUG_STAGE in (2, 21, 22):  # jac / +factor / +solve
            Jd = jac_band(t0_df, y0)
            d = DF(Jd.hi[:, mu, :], Jd.lo[:, mu, :])
            if _DEBUG_STAGE >= 21:
                assemble_and_factor(Jd, h_df0)
                d = DF(f_hi_ref[0:n, mu, :], f_lo_ref[0:n, mu, :])
            if _DEBUG_STAGE >= 22:
                d = band_solve(y0)
            ys_hi_ref[0:1, :, :] = d.hi[None]
            ys_lo_ref[0:1, :, :] = d.lo[None]
            info_ref[0, :] = jnp.full((tile,), 0, i32)
            info_ref[1, :] = jnp.full((tile,), 0, i32)
            info_ref[2, :] = jnp.full((tile,), 0, i32)
            return
        if _DEBUG_STAGE == 3:  # one un-looped step body
            c1 = body(carry0)
            D1 = c1[13]
            ys_hi_ref[0:1, :, :] = D1.hi[0][None]
            ys_lo_ref[0:1, :, :] = D1.lo[0][None]
            info_ref[0, :] = jnp.full((tile,), c1[2], i32)
            info_ref[1, :] = jnp.full((tile,), c1[1], i32)
            info_ref[2, :] = jnp.full((tile,), c1[0], i32)
            return
        out = jax.lax.while_loop(cond, body, carry0)
        k_fin, steps_fin, status_fin = out[0], out[1], out[2]
        next_eval_fin = out[3]
        status_fin = jnp.where(
            (status_fin == _OK) & (next_eval_fin < neval),
            _FAIL_MAX_STEPS, status_fin)
        info_ref[0, :] = jnp.full((tile,), status_fin, i32)
        info_ref[1, :] = jnp.full((tile,), steps_fin, i32)
        info_ref[2, :] = jnp.full((tile,), k_fin, i32)

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((neval, n, tile), f32),
            jax.ShapeDtypeStruct((neval, n, tile), f32),
            jax.ShapeDtypeStruct((3, tile), i32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + nconst),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((ncols, nb, tile), f32),   # fband hi
            pltpu.VMEM((ncols, nb, tile), f32),   # fband lo
            pltpu.VMEM((npadx, 1, tile), f32),    # x hi
            pltpu.VMEM((npadx, 1, tile), f32),    # x lo
        ],
        interpret=interpret,
    )

    t0j64 = np.float64(t0_64)
    atol_v64 = atol64  # (n,) np
    rtol64 = np.float64(rtol)

    def solve(params_b):
        """params_b (B, nparams) f64 -> (ys (neval, n, B) f64,
        status (ntiles,), steps (ntiles,))."""
        params_b = jnp.asarray(params_b, jnp.float64)
        if pad_b != nbatch:
            pad = jnp.broadcast_to(params_b[-1:], (pad_b - nbatch, nparams))
            params_b = jnp.concatenate([params_b, pad], axis=0)
        pt = params_b.T
        hi = pt.astype(f32)
        lo = (pt - hi.astype(jnp.float64)).astype(f32)
        packed = jnp.concatenate([hi, lo], axis=0)  # (2 np, B)

        # ---- initial state in full f64 XLA (setup cost, not hot) --------
        # per-member initial-step heuristic (solvers/state.py
        # initial_step_size); the per-tile lockstep h is the min over the
        # tile's members (conservative)
        with jax.enable_x64(True):
            t0j = jnp.asarray(t0j64)
            y0b = jax.vmap(lambda p_: eqn.init(t0j, p_))(params_b)  # (B, n)
            f0b = jax.vmap(lambda y_, p_: eqn.rhs(t0j, y_, p_))(y0b, params_b)
            if mass_const_diag is not None:
                mdv = jnp.asarray(mass_const_diag)
                dy0b = jnp.where(mdv == 0.0, 0.0,
                                 f0b / jnp.where(mdv == 0.0, 1.0, mdv))
                if needs_ic_solve:
                    # per-member consistent-IC solve (Brown/Hindmarsh/
                    # Petzold, solvers/consistent_ic.py; reference
                    # state.rs:84-162 set_consistent): failed members are
                    # poisoned to NaN so the kernel fails loudly
                    from ..solvers.consistent_ic import make_consistent

                    is_alg = jnp.asarray(mass_const_diag == 0.0)
                    y0b, dy0b, ic_st = jax.vmap(
                        lambda p_, y_, d_: make_consistent(
                            problem, p_, y_, d_, is_alg
                        )
                    )(params_b, y0b, dy0b)
                    y0b = jnp.where((ic_st < 0)[:, None], jnp.nan, y0b)
                    f0b = jax.vmap(
                        lambda y_, p_: eqn.rhs(t0j, y_, p_)
                    )(y0b, params_b)
            else:
                dy0b = f0b
            scale = jnp.abs(y0b) * rtol64 + jnp.asarray(atol_v64)
            d0 = jnp.sqrt(jnp.mean((y0b / scale) ** 2, axis=1))
            d1 = jnp.sqrt(jnp.mean((dy0b / scale) ** 2, axis=1))
            h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * (d0 / d1))
            y1 = y0b + h0[:, None] * dy0b
            f1 = jax.vmap(lambda t_, y_, p_: eqn.rhs(t_, y_, p_))(
                t0j + h0, y1, params_b)
            d2 = jnp.sqrt(jnp.mean(((f1 - f0b) / scale) ** 2, axis=1)) / h0
            max_d = jnp.maximum(d1, d2)
            h1 = jnp.where(max_d < 1e-15, jnp.maximum(h0 * 1e-3, 1e-6),
                           (0.01 / max_d) ** 0.5)
            h_mem = jnp.minimum(100.0 * h0, h1)  # (B,)

        ys_parts, st_parts, steps_parts = [], [], []
        for ti in range(ntiles):
            sl = packed[:, ti * tile: (ti + 1) * tile]
            tsl = slice(ti * tile, (ti + 1) * tile)
            with jax.enable_x64(True):
                h_t = jnp.min(h_mem[tsl])
                rows64 = jnp.concatenate([
                    y0b[tsl].T,                      # (n, tile)
                    (h_t * dy0b[tsl]).T,             # (n, tile)
                    jnp.broadcast_to(h_t, (1, tile)),
                ], axis=0)                           # (2n+1, tile)
                r_hi = rows64.astype(f32)
                r_lo = (rows64 - r_hi.astype(jnp.float64)).astype(f32)
                init_pack = jnp.concatenate([r_hi, r_lo], axis=0)
            with jax.enable_x64(False):
                yh, yl, info = call(sl, init_pack, *const_inputs)
            ys_parts.append(yh.astype(jnp.float64) + yl.astype(jnp.float64))
            st_parts.append(info[0, 0])
            steps_parts.append(info[1, 0])
        ys = jnp.concatenate(ys_parts, axis=2)[:, :, :nbatch]
        status = jnp.stack(st_parts)
        bad = jnp.repeat(status < 0, tile)[:nbatch]
        ys = jnp.where(bad[None, None, :], jnp.nan, ys)
        return ys, status, jnp.stack(steps_parts)

    solve.tile = tile
    solve.ntiles = ntiles
    return solve
