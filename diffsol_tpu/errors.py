"""Status codes and error taxonomy.

The reference framework surfaces numerical failures as typed Rust errors
(``DiffsolError``: StepSizeTooSmall, TooManyErrorTestFailures,
TooManyNonlinearSolverFailures, InitialConditionDidNotConverge; see reference
crates/diffsol/src/error.rs and ode_solver/problem.rs:100-116).  Inside a
jit-compiled ``lax.while_loop`` we cannot raise, so each solver carries an
integer status code in its state; drivers stop stepping on a negative status
and the Python-level API raises the matching exception.  Ensembles follow
the reference's shared-fate lockstep semantics: one member failing fails
(and reports for) the whole batch; per-member failure isolation needs the
independent (vmap) ensemble mode, where each member carries its own status.
"""

from __future__ import annotations

# Stop reasons (>= 0): mirror reference OdeSolverStopReason
# (crates/diffsol/src/ode_solver/mod.rs).
INTERNAL_TIMESTEP = 0
ROOT_FOUND = 1
TSTOP_REACHED = 2

# Error codes (< 0): mirror reference OdeSolverError variants.
STEP_SIZE_TOO_SMALL = -1
TOO_MANY_ERROR_TEST_FAILURES = -2
TOO_MANY_NONLINEAR_SOLVER_FAILURES = -3
SENSITIVITY_SOLVE_FAILED = -4
INITIAL_CONDITION_DID_NOT_CONVERGE = -5
STOP_TIME_BEFORE_CURRENT_TIME = -6
MAX_STEPS_REACHED = -7
# the adjoint forward pass has a static reset-event record; overflowing it
# would silently drop boundary corrections => wrong gradients, so it is a
# hard typed failure (no reference analog: diffsol's Vec grows on host)
EVENT_CAPACITY_EXCEEDED = -8
# lockstep members disagree on a root sign-change pattern (the reference
# PANICS here: vector/cuda.rs:1166-1175 root_finding consistency assert)
ROOT_BATCH_INCONSISTENT = -9

_MESSAGES = {
    STEP_SIZE_TOO_SMALL: "step size became too small",
    TOO_MANY_ERROR_TEST_FAILURES: "too many error test failures",
    TOO_MANY_NONLINEAR_SOLVER_FAILURES: "too many nonlinear solver failures",
    SENSITIVITY_SOLVE_FAILED: "sensitivity solve failed",
    INITIAL_CONDITION_DID_NOT_CONVERGE: "initial condition solve did not converge",
    STOP_TIME_BEFORE_CURRENT_TIME: "stop time is before current time",
    MAX_STEPS_REACHED: "maximum number of steps reached",
    EVENT_CAPACITY_EXCEEDED: (
        "reset-event record overflowed (raise max_events on the "
        "differentiable solve; gradients past the capacity would be wrong)"
    ),
    ROOT_BATCH_INCONSISTENT: (
        "lockstep members disagree on a root crossing; use the "
        "independent (vmap) ensemble mode for event-heterogeneous batches"
    ),
}


class DiffsolError(RuntimeError):
    """Raised at the Python API boundary when a solve fails."""

    def __init__(self, code: int, t: float | None = None):
        self.code = code
        self.t = t
        msg = _MESSAGES.get(code, f"solver error code {code}")
        if t is not None:
            msg = f"{msg} (at t = {t})"
        super().__init__(msg)


def check_status(code: int, t: float | None = None) -> None:
    """Raise DiffsolError if ``code`` (a concrete int) is an error code."""
    if code < 0:
        raise DiffsolError(int(code), t)
