"""Singular-mass DAE tests: consistent ICs + BDF/SDIRK integration."""

import jax.numpy as jnp
import numpy as np
import pytest

import diffsol_tpu as dt
from diffsol_tpu import errors
from diffsol_tpu.models import exponential_decay_algebraic, robertson
from diffsol_tpu.solvers.consistent_ic import algebraic_mask, make_consistent
from diffsol_tpu.solvers.state import initial_state


def test_consistent_ic_solve():
    problem = exponential_decay_algebraic.problem()
    mask = algebraic_mask(problem)
    assert mask is not None
    np.testing.assert_array_equal(np.asarray(mask), [False, False, True])
    y, dy, g, dg = initial_state(problem, problem.params)
    # init is inconsistent: y2 = 0 but constraint needs y2 = y1 = 1
    y2, dy2, status = make_consistent(problem, problem.params, y, dy, mask)
    assert int(status) == errors.INTERNAL_TIMESTEP
    np.testing.assert_allclose(float(y2[2]), 1.0, rtol=1e-9)
    # differential derivatives: dy = -a y; algebraic dy set to zero
    np.testing.assert_allclose(np.asarray(dy2[:2]), [-0.1, -0.1], rtol=1e-9)
    assert float(dy2[2]) == 0.0


@pytest.mark.parametrize("make_solver", [
    lambda p: dt.BdfSolver(p),
    lambda p: dt.SdirkSolver(p, tableau=dt.tr_bdf2()),
    lambda p: dt.SdirkSolver(p, tableau=dt.esdirk34()),
])
def test_dae_exponential_decay_algebraic(make_solver):
    problem = exponential_decay_algebraic.problem(rtol=1e-6, atol=1e-8)
    solver = make_solver(problem)
    t_eval = jnp.linspace(0.0, 1.0, 6)
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    expected = exponential_decay_algebraic.soln(t_eval, problem.params)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-5, atol=1e-7)


def test_robertson_dae_bdf():
    """The classic stiff DAE over 10 decades of time (reference
    robertson.rs soln data from IDA)."""
    problem = robertson.problem_dae()
    solver = dt.BdfSolver(problem)
    data = robertson.SOLN
    t_eval = jnp.asarray(data[1:, 0])
    sol = dt.solve_dense(solver, t_eval, max_steps=20_000)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    ys = np.asarray(sol.ys)
    expected = data[1:, 1:]
    # reference-test tolerance: rtol 1e-4 class problem with atol floors
    # (x drops to ~5e-8 ~ atol_x at t=4e10 -- atol-dominated regime)
    np.testing.assert_allclose(ys[:, 0], expected[:, 0], rtol=5e-3, atol=2e-8)
    np.testing.assert_allclose(ys[:, 1], expected[:, 1], rtol=2e-2, atol=1e-12)
    np.testing.assert_allclose(ys[:, 2], expected[:, 2], rtol=5e-3, atol=1e-8)


def test_robertson_ode_bdf():
    problem = robertson.problem_ode()
    solver = dt.BdfSolver(problem)
    data = robertson.SOLN
    t_eval = jnp.asarray(data[1:8, 0])
    sol = dt.solve_dense(solver, t_eval, max_steps=20_000)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    ys = np.asarray(sol.ys)
    expected = data[1:8, 1:]
    np.testing.assert_allclose(ys[:, 0], expected[:, 0], rtol=5e-3, atol=1e-10)
    np.testing.assert_allclose(ys[:, 2], expected[:, 2], rtol=5e-3, atol=1e-8)


def test_robertson_dae_tr_bdf2():
    problem = robertson.problem_dae()
    solver = dt.SdirkSolver(problem, tableau=dt.tr_bdf2())
    data = robertson.SOLN
    t_eval = jnp.asarray(data[1:6, 0])  # to t=4000
    sol = dt.solve_dense(solver, t_eval, max_steps=40_000)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    ys = np.asarray(sol.ys)
    expected = data[1:6, 1:]
    np.testing.assert_allclose(ys[:, 0], expected[:, 0], rtol=5e-3, atol=1e-10)
    np.testing.assert_allclose(ys[:, 2], expected[:, 2], rtol=5e-3, atol=1e-8)
