"""End-to-end tests for the explicit RK (TSIT45) slice.

Modelled on the reference generic solver harness
(reference crates/diffsol/src/ode_solver/mod.rs:78-1700 `test_ode_solver`,
`test_interpolate`): fixture problems with analytic solutions, solved and
compared at the solver's own tolerances.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import diffsol_tpu as dt
from diffsol_tpu import errors
from diffsol_tpu.models import exponential_decay, logistic


def test_solve_dense_exponential_decay():
    problem = exponential_decay.problem(rtol=1e-6, atol=1e-8)
    solver = dt.ErkSolver(problem)
    t_eval = jnp.linspace(0.0, 1.0, 11)
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    expected = exponential_decay.soln(t_eval, problem.params)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-5, atol=1e-7)


def test_solve_dense_logistic():
    problem = logistic.problem(rtol=1e-6, atol=1e-8)
    solver = dt.ErkSolver(problem)
    t_eval = jnp.linspace(0.0, 10.0, 21)
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    expected = logistic.soln(t_eval, problem.params)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-5, atol=1e-7)


def test_solve_adaptive_records_steps():
    problem = exponential_decay.problem()
    solver = dt.ErkSolver(problem)
    sol = dt.solve(solver, 1.0)
    n = int(sol.n_points)
    assert n > 2
    ts = np.asarray(sol.ts[:n])
    ys = np.asarray(sol.ys[:n])
    assert ts[0] == 0.0
    np.testing.assert_allclose(ts[-1], 1.0, rtol=1e-12)
    expected = np.asarray(exponential_decay.soln(ts, problem.params))
    np.testing.assert_allclose(ys, expected, rtol=1e-5, atol=1e-7)
    # statistics: steps recorded matches rows written (initial row + steps)
    assert int(sol.state.stats.steps) == n - 1


def test_interpolation_accuracy():
    problem = logistic.problem(rtol=1e-8, atol=1e-10)
    solver = dt.ErkSolver(problem)
    # step manually, then interpolate inside the last step
    state = solver.init_state()
    for _ in range(5):
        state = solver.step(state)
    t_mid = 0.5 * (state.t_prev + state.t)
    y_mid = solver.interpolate(state, t_mid)
    expected = logistic.soln(t_mid, problem.params)
    np.testing.assert_allclose(y_mid, expected[0], rtol=1e-7)
    # derivative interpolation vs rhs of analytic solution
    dy_mid = solver.interpolate_dy(state, t_mid)
    np.testing.assert_allclose(
        dy_mid, logistic.rhs(t_mid, expected[0], problem.params), rtol=1e-5
    )


def test_root_finding_stops():
    problem = exponential_decay.problem_with_root(rtol=1e-8, atol=1e-10)
    solver = dt.ErkSolver(problem)
    sol = dt.solve(solver, 20.0)
    assert int(sol.stop_reason) == errors.ROOT_FOUND
    # y0 * exp(-a t) = 0.6 => t = ln(1/0.6)/0.1
    t_expected = float(np.log(1.0 / 0.6) / 0.1)
    np.testing.assert_allclose(float(sol.state.t), t_expected, rtol=1e-6)
    np.testing.assert_allclose(float(sol.state.y[0]), 0.6, rtol=1e-6)
    assert int(sol.root_idx) == 0


def test_reset_continues():
    problem = exponential_decay.problem_with_reset(rtol=1e-8, atol=1e-10)
    solver = dt.ErkSolver(problem)
    sol = dt.solve(solver, 20.0)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    n = int(sol.n_points)
    ys = np.asarray(sol.ys[:n])
    # after each reset y jumps back to 1.0; y must never drop below ~0.6
    assert ys[:, 0].min() > 0.59
    # there were multiple resets in 20 time units (period = ln(1/.6)/.1 ~ 5.1)
    jumps = np.sum(np.diff(ys[:, 0]) > 0.3)
    assert jumps >= 3


def test_error_controls_step_size():
    # crank tolerance and check the error actually drops
    errs = []
    for rtol in (1e-3, 1e-6, 1e-9):
        problem = logistic.problem(rtol=rtol, atol=rtol * 1e-2)
        solver = dt.ErkSolver(problem)
        t_eval = jnp.linspace(0.0, 10.0, 5)
        sol = dt.solve_dense(solver, t_eval)
        expected = logistic.soln(t_eval, problem.params)
        errs.append(float(jnp.max(jnp.abs(sol.ys - expected))))
    assert errs[2] < errs[1] < errs[0]
    assert errs[2] < 1e-8


def test_vmap_ensemble():
    """vmap over params = independent ensemble solving."""
    import jax

    problem = exponential_decay.problem(rtol=1e-6, atol=1e-8)
    solver = dt.ErkSolver(problem)
    t_eval = jnp.linspace(0.0, 1.0, 7)
    a_values = jnp.linspace(0.05, 1.0, 16)
    params = jnp.stack([a_values, jnp.ones_like(a_values)], axis=1)

    def solve_one(p):
        return dt.solve_dense(solver, t_eval, params=p).ys

    ys = jax.vmap(solve_one)(params)
    assert ys.shape == (16, 7, 2)
    for i in range(16):
        expected = exponential_decay.soln(t_eval, params[i])
        np.testing.assert_allclose(ys[i], expected, rtol=2e-5, atol=1e-7)
