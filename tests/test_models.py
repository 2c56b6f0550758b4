"""Fixture-suite conformance: every model family solves to its analytic or
reference values (reference's generic test harness, ode_solver/mod.rs)."""

import jax.numpy as jnp
import numpy as np
import pytest

import diffsol_tpu as dt
from diffsol_tpu import errors
from diffsol_tpu.models import foodweb, misc


def test_gaussian_decay():
    problem = misc.gaussian_decay_problem(size=10)
    sol = dt.solve_dense(dt.BdfSolver(problem), jnp.linspace(0.0, 9.0, 10))
    expected = misc.gaussian_decay_soln(sol.ts, problem.params)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-4, atol=1e-6)


def test_dydt_y2():
    problem = misc.dydt_y2_problem(size=10)
    t_eval = jnp.linspace(0.0, 20.0, 11)
    sol = dt.solve_dense(dt.BdfSolver(problem), t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    np.testing.assert_allclose(
        sol.ys, misc.dydt_y2_soln(t_eval), rtol=1e-3, atol=1e-6
    )


def test_lorenz_bdf_vs_erk():
    """Chaotic system: BDF and ERK agree over a short horizon at tight tol."""
    problem = misc.lorenz_problem(rtol=1e-9, atol=1e-11)
    t_eval = jnp.linspace(0.0, 5.0, 11)
    ys_bdf = dt.solve_dense(dt.BdfSolver(problem), t_eval, max_steps=200_000).ys
    ys_erk = dt.solve_dense(dt.ErkSolver(problem), t_eval).ys
    np.testing.assert_allclose(np.asarray(ys_bdf), np.asarray(ys_erk), rtol=1e-4, atol=1e-4)


def test_robertson_ode_groups():
    ngroups = 5
    problem = misc.robertson_ode_groups(ngroups=ngroups)
    from diffsol_tpu.models import robertson

    data = robertson.SOLN
    t_eval = jnp.asarray(data[1:7, 0])
    sol = dt.solve_dense(dt.BdfSolver(problem), t_eval, max_steps=20_000)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    ys = np.asarray(sol.ys).reshape(len(t_eval), ngroups, 3)
    for g in range(ngroups):
        np.testing.assert_allclose(ys[:, g, 0], data[1:7, 1], rtol=5e-3)
        # y3 here is 1 - x - y (pure ODE form accumulates z)
        np.testing.assert_allclose(ys[:, g, 2], data[1:7, 3], rtol=5e-3, atol=1e-8)


def test_foodweb_dae():
    """Prey/predator reaction-diffusion DAE vs IDA corner values."""
    nx = 10
    problem = foodweb.make(nx=nx)
    solver = dt.BdfSolver(problem)
    data = foodweb.SOLN
    t_eval = jnp.asarray(data[1:, 0])
    sol = dt.solve_dense(solver, t_eval, max_steps=20_000)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    corners = foodweb.corner_values(sol.ys, nx)
    expected = data[1:, 1:]
    np.testing.assert_allclose(corners, expected, rtol=2e-3)
    # consistent IC actually moved the predator from 1e5
    state0 = solver.init_state()
    c0 = foodweb.corner_values(np.asarray(state0.y)[None, :], nx)[0]
    np.testing.assert_allclose(c0, data[0, 1:], rtol=1e-3)
