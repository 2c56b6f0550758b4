"""Initial-state construction: y0/dy0, quadrature init, step-size heuristic.

Mirrors the reference state constructors and the initial step-size heuristic
(reference crates/diffsol/src/ode_solver/state.rs:801-867 `set_step_size`,
:1086-1124 `new_without_initialise`).  Consistent initial conditions for
singular-mass DAEs (Brown/Hindmarsh/Petzold 1998; state.rs:84-162 + op/init.rs)
live in :mod:`diffsol_tpu.solvers.consistent_ic`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..norms import norm as wrms_norm


def initial_state(problem, params):
    """Return (y0, dy0, g0, dg0) at t0 (g pieces sized 0 when unused)."""
    t0 = problem.t0
    y = problem.eqn.init(t0, params)
    dy = problem.eqn.rhs(t0, y, params)
    dtype = y.dtype
    if problem.integrate_out and problem.eqn.out is not None:
        dg = problem.eqn.out(t0, y, params)
        g = jnp.zeros_like(dg)
    elif problem.integrate_out:
        # default output is identity on state (state.rs:1098-1104)
        dg = y
        g = jnp.zeros_like(y)
    else:
        g = jnp.zeros((0,), dtype)
        dg = jnp.zeros((0,), dtype)
    return y, dy, g, dg


def initial_step_size(problem, params, y0, dy0, solver_order: int):
    """Starting step size h (state.rs:801-867).

    Algorithm (Hairer-Norsett-Wanner style): d0 = ||y0||, d1 = ||f0|| in the
    tolerance-scaled norm; h0 = 0.01 d0/d1 (or 1e-6 if either is tiny); probe
    an Euler step to estimate d2 = ||f(t0+h0, y0+h0 f0) - f0||/h0; then
    h1 = (0.01/max(d1,d2))^(1/(order+1)) and h = min(100 h0, h1).  The sign
    of ``problem.h0`` selects integration direction.
    """
    atol, rtol = problem.atol, problem.rtol
    nb = problem.lockstep_nbatch
    t0 = problem.t0
    is_neg = problem.h0 < 0.0

    d0 = wrms_norm(y0, y0, atol, rtol, nb)
    d1 = wrms_norm(dy0, y0, atol, rtol, nb)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * (d0 / d1))

    t1 = jnp.where(is_neg, t0 - h0, t0 + h0)
    y1 = jnp.where(is_neg, y0 - h0 * dy0, y0 + h0 * dy0)
    f1 = problem.eqn.rhs(t1, y1, params)
    d2 = wrms_norm(f1 - dy0, y0, atol, rtol, nb) / jnp.abs(h0)

    max_d = jnp.maximum(d1, d2)
    h1_small = jnp.maximum(h0 * 1e-3, 1e-6)
    expo = 1.0 / (1.0 + solver_order)
    h1 = jnp.where(max_d < 1e-15, h1_small, (0.01 / max_d) ** expo)

    h = jnp.minimum(100.0 * h0, h1)
    return jnp.where(is_neg, -h, h)


def _flag_past_tstop(state, tstop):
    """Flag a stop time strictly before the current time (reference
    OdeSolverError::StopTimeBeforeCurrentTime, method.rs set_stop_time):
    sets ``status = STOP_TIME_BEFORE_CURRENT_TIME`` so the solve drivers
    return immediately (inside jit we cannot raise; the Python boundary
    raises from the status code).  A tstop equal to the current time
    (within roundoff) is allowed -- it reports TstopReached on the next
    step, matching staged solves."""
    import jax.numpy as jnp

    from .. import errors

    eps = jnp.finfo(state.t.dtype).eps
    troundoff = 100.0 * eps * (jnp.abs(state.t) + jnp.abs(state.h))
    past = tstop < state.t - troundoff
    status = jnp.where(
        past, errors.STOP_TIME_BEFORE_CURRENT_TIME, state.status
    ).astype(jnp.int32)
    return state.replace(status=status)
