"""Solver statistics observability.

The reference serializes `OdeSolverStatistics` as JSON on solver drop
(reference crates/diffsol/src/ode_solver/mod.rs:28-77 and the
insta-snapshot tests of exact counters); here the counters ride the solver
state as traced int32 scalars and these helpers materialize them.

Counter parity map:
  steps                  <- number_of_steps
  error_test_failures    <- number_of_error_test_failures
  newton_iterations      <- number_of_nonlinear_solver_iterations
  newton_fails           <- number_of_nonlinear_solver_fails
  linear_solver_setups   <- number_of_linear_solver_setups (all causes)
  jacobian_evals         <- number_of_jac_evals
  lu_from_*              <- per-cause LU-setup breakdown (mod.rs:53-70)
  worst_member           <- (extension) lockstep member that dominated the
                            most recent error test; names the culprit under
                            shared-fate failure semantics
"""

from __future__ import annotations

import json


def stats_dict(state_or_solution) -> dict:
    """Extract the statistics counters as a plain dict of ints.

    Accepts a solver state (with a ``.stats`` field) or a Solution
    (``.state.stats``).
    """
    obj = state_or_solution
    if hasattr(obj, "state"):
        obj = obj.state
    stats = obj.stats
    return {k: int(v) for k, v in stats._asdict().items()}


def stats_json(state_or_solution) -> str:
    """Reference-style JSON rendering of the statistics."""
    return json.dumps(stats_dict(state_or_solution))
