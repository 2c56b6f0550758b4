"""Snapshot regression tests on exact solver-statistics counters.

Mirrors the reference's insta-snapshot strategy (reference
crates/diffsol/src/ode_solver/bdf.rs:1740-1757:
`insta::assert_yaml_snapshot!` of step/Newton/LU counts per problem) --
step counts are deterministic under jit, so a numerics or policy regression
shows up as an exact counter change.  Recorded on CPU/f64 (the conftest
platform); update deliberately when solver behavior changes on purpose.
"""

import jax.numpy as jnp
import pytest

import diffsol_tpu as dt
from diffsol_tpu.models import exponential_decay, logistic, robertson
from diffsol_tpu.utils import stats_dict

SNAPSHOTS = {
    "expdecay_bdf": {
        "steps": 35, "error_test_failures": 0, "newton_iterations": 35,
        "newton_fails": 0, "linear_solver_setups": 10, "jacobian_evals": 1,
        "lu_from_checkpoint": 1, "lu_from_first_fail": 0,
        "lu_from_second_fail": 0, "lu_from_error_test": 0,
        "lu_from_step_success": 9, "worst_member": 0, "rhs_evals": 35, "jac_mul_evals": 2, "mass_evals": 0,
    },
    "logistic_bdf": {
        "steps": 91, "error_test_failures": 4, "newton_iterations": 137,
        "newton_fails": 0, "linear_solver_setups": 19, "jacobian_evals": 2,
        "lu_from_checkpoint": 1, "lu_from_first_fail": 0,
        "lu_from_second_fail": 0, "lu_from_error_test": 4,
        "lu_from_step_success": 14, "worst_member": 0, "rhs_evals": 137, "jac_mul_evals": 2, "mass_evals": 0,
    },
    "robertson_dae_bdf": {
        "steps": 197, "error_test_failures": 0, "newton_iterations": 368,
        "newton_fails": 11, "linear_solver_setups": 48, "jacobian_evals": 10,
        "lu_from_checkpoint": 1, "lu_from_first_fail": 9,
        "lu_from_second_fail": 2, "lu_from_error_test": 0,
        "lu_from_step_success": 36, "worst_member": 0, "rhs_evals": 368, "jac_mul_evals": 30, "mass_evals": 48,
    },
    "logistic_trbdf2": {
        "steps": 156, "error_test_failures": 4, "newton_iterations": 618,
        "newton_fails": 0, "linear_solver_setups": 22, "jacobian_evals": 4,
        "lu_from_checkpoint": 1, "lu_from_first_fail": 0,
        "lu_from_second_fail": 0, "lu_from_error_test": 4,
        "lu_from_step_success": 17, "worst_member": 0, "rhs_evals": 618, "jac_mul_evals": 4, "mass_evals": 0,
    },
    "expdecay_tsit45": {
        "steps": 5, "error_test_failures": 0, "newton_iterations": 0,
        "newton_fails": 0, "linear_solver_setups": 0, "jacobian_evals": 0,
        "lu_from_checkpoint": 0, "lu_from_first_fail": 0,
        "lu_from_second_fail": 0, "lu_from_error_test": 0,
        "lu_from_step_success": 0, "worst_member": 0, "rhs_evals": 30, "jac_mul_evals": 0, "mass_evals": 0,
    },
}

CASES = {
    "expdecay_bdf": (lambda: exponential_decay.problem(rtol=1e-6, atol=1e-8), "bdf", 1.0),
    "logistic_bdf": (lambda: logistic.problem(rtol=1e-6, atol=1e-8), "bdf", 10.0),
    "robertson_dae_bdf": (lambda: robertson.problem_dae(), "bdf", 4e5),
    "logistic_trbdf2": (lambda: logistic.problem(rtol=1e-6, atol=1e-8), "tr_bdf2", 10.0),
    "expdecay_tsit45": (lambda: exponential_decay.problem(rtol=1e-6, atol=1e-8), "tsit45", 1.0),
}


@pytest.mark.parametrize("name", sorted(SNAPSHOTS))
def test_counter_snapshot(name):
    make, method, tf = CASES[name]
    s = dt.solver(make(), method)
    sol = dt.solve_dense(s, jnp.asarray([tf * 0.5, tf]), max_steps=20_000)
    assert int(sol.stop_reason) >= 0
    assert stats_dict(sol) == SNAPSHOTS[name]
