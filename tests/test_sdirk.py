"""SDIRK (TR-BDF2, ESDIRK34) stepper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffsol_tpu as dt
from diffsol_tpu import errors
from diffsol_tpu.models import exponential_decay, logistic


@pytest.mark.parametrize("tab", [dt.tr_bdf2(), dt.esdirk34()])
def test_sdirk_exponential_decay(tab):
    problem = exponential_decay.problem(rtol=1e-6, atol=1e-8)
    solver = dt.SdirkSolver(problem, tableau=tab)
    t_eval = jnp.linspace(0.0, 1.0, 11)
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    expected = exponential_decay.soln(t_eval, problem.params)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("tab", [dt.tr_bdf2(), dt.esdirk34()])
def test_sdirk_logistic(tab):
    problem = logistic.problem(rtol=1e-6, atol=1e-8)
    solver = dt.SdirkSolver(problem, tableau=tab)
    t_eval = jnp.linspace(0.0, 10.0, 11)
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    expected = logistic.soln(t_eval, problem.params)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-4, atol=1e-6)


def test_sdirk_stiff():
    def rhs(t, y, p):
        return jnp.array([-1000.0 * y[0] + 999.0 * y[1], -y[1]])

    def init(t, p):
        return jnp.array([2.0, 1.0])

    problem = dt.OdeBuilder().rhs(rhs).init(init).p([0.0]).rtol(1e-6).atol(1e-8).build()
    solver = dt.SdirkSolver(problem, tableau=dt.tr_bdf2())
    t_eval = jnp.linspace(0.0, 10.0, 11)
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    t = np.asarray(t_eval)
    expected = np.stack([np.exp(-t) + np.exp(-1000.0 * t), np.exp(-t)], axis=1)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-4, atol=1e-6)
    assert int(sol.state.stats.steps) < 1000


def test_sdirk_root_finding():
    problem = exponential_decay.problem_with_root(rtol=1e-8, atol=1e-10)
    solver = dt.SdirkSolver(problem, tableau=dt.tr_bdf2())
    sol = dt.solve(solver, 20.0)
    assert int(sol.stop_reason) == errors.ROOT_FOUND
    t_expected = float(np.log(1.0 / 0.6) / 0.1)
    np.testing.assert_allclose(float(sol.state.t), t_expected, rtol=1e-6)


def test_sdirk_statistics_sane():
    problem = logistic.problem(rtol=1e-6, atol=1e-8)
    solver = dt.SdirkSolver(problem, tableau=dt.esdirk34())
    sol = dt.solve(solver, 10.0)
    stats = sol.state.stats
    assert int(stats.steps) > 3
    assert int(stats.newton_iterations) >= int(stats.steps)
    assert int(stats.linear_solver_setups) >= 1
