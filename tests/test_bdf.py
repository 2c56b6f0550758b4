"""BDF/NDF stepper tests (analytic fixtures + stiff problems)."""

import jax
import jax.numpy as jnp
import numpy as np

import diffsol_tpu as dt
from diffsol_tpu import errors
from diffsol_tpu.models import exponential_decay, logistic
from diffsol_tpu.solvers.bdf import BdfSolver


def test_bdf_exponential_decay():
    problem = exponential_decay.problem(rtol=1e-6, atol=1e-8)
    solver = BdfSolver(problem)
    t_eval = jnp.linspace(0.0, 1.0, 11)
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    expected = exponential_decay.soln(t_eval, problem.params)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-5, atol=1e-7)


def test_bdf_logistic():
    problem = logistic.problem(rtol=1e-6, atol=1e-8)
    solver = BdfSolver(problem)
    t_eval = jnp.linspace(0.0, 10.0, 21)
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    expected = logistic.soln(t_eval, problem.params)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-4, atol=1e-6)


def test_bdf_order_increases():
    problem = logistic.problem(rtol=1e-8, atol=1e-10)
    solver = BdfSolver(problem)
    step = jax.jit(solver.step)
    state = solver.init_state()
    orders = []
    for _ in range(60):
        state = step(state)
        assert int(state.status) >= 0
        orders.append(int(state.order))
    assert max(orders) >= 3  # variable order actually kicks in


def test_bdf_stiff_robertson_like():
    """A stiff linear problem with widely separated eigenvalues: BDF must
    take far fewer steps than the span/fastest-timescale ratio."""

    def rhs(t, y, p):
        # eigenvalues -1 and -1000
        return jnp.array(
            [-1000.0 * y[0] + 999.0 * y[1], -y[1]]
        )

    def init(t, p):
        return jnp.array([2.0, 1.0])

    problem = dt.OdeBuilder().rhs(rhs).init(init).p([0.0]).rtol(1e-6).atol(1e-8).build()
    solver = BdfSolver(problem)
    t_eval = jnp.linspace(0.0, 10.0, 11)
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    t = np.asarray(t_eval)
    # y1 = e^-t; y0 = e^-t + e^-1000t
    expected = np.stack([np.exp(-t) + np.exp(-1000.0 * t), np.exp(-t)], axis=1)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-4, atol=1e-6)
    # stiff efficiency: ~10/1e-3 = 10000 explicit steps would be needed
    assert int(sol.state.stats.steps) < 400


def test_bdf_root_finding():
    problem = exponential_decay.problem_with_root(rtol=1e-8, atol=1e-10)
    solver = BdfSolver(problem)
    sol = dt.solve(solver, 20.0)
    assert int(sol.stop_reason) == errors.ROOT_FOUND
    t_expected = float(np.log(1.0 / 0.6) / 0.1)
    np.testing.assert_allclose(float(sol.state.t), t_expected, rtol=1e-6)
    np.testing.assert_allclose(float(sol.state.y[0]), 0.6, rtol=1e-6)


def test_bdf_reset_continues():
    problem = exponential_decay.problem_with_reset(rtol=1e-8, atol=1e-10)
    solver = BdfSolver(problem)
    sol = dt.solve(solver, 20.0)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    n = int(sol.n_points)
    ys = np.asarray(sol.ys[:n])
    assert ys[:, 0].min() > 0.59
    jumps = np.sum(np.diff(ys[:, 0]) > 0.3)
    assert jumps >= 3


def test_bdf_interpolation():
    problem = logistic.problem(rtol=1e-8, atol=1e-10)
    solver = BdfSolver(problem)
    step = jax.jit(solver.step)
    state = solver.init_state()
    for _ in range(30):
        state = step(state)
    t_mid = float(state.t) - 0.3 * float(state.h)
    y_mid = solver.interpolate(state, t_mid)
    expected = logistic.soln(t_mid, problem.params)
    np.testing.assert_allclose(y_mid, expected[0], rtol=1e-6)


def test_bdf_quadrature():
    """integrate_out with default identity output: g = int y dt."""
    problem = exponential_decay.problem(rtol=1e-8, atol=1e-10, integrate_out=True)
    solver = BdfSolver(problem)
    t_eval = jnp.linspace(0.0, 5.0, 6)
    sol = dt.solve_dense(solver, t_eval)
    a = float(problem.params[0])
    # int_0^t e^{-a s} ds = (1 - e^{-a t})/a
    expected = (1.0 - np.exp(-a * np.asarray(t_eval))) / a
    np.testing.assert_allclose(sol.gs[:, 0], expected, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(sol.gs[:, 1], expected, rtol=1e-5, atol=1e-8)


def test_bdf_vmap_ensemble():
    problem = exponential_decay.problem(rtol=1e-6, atol=1e-8)
    solver = BdfSolver(problem)
    t_eval = jnp.linspace(0.0, 1.0, 7)
    a_values = jnp.linspace(0.05, 1.0, 8)
    params = jnp.stack([a_values, jnp.ones_like(a_values)], axis=1)

    def solve_one(p):
        state = solver.init_state(p)
        return dt.solve_dense(solver, t_eval, params=p, state=state).ys

    ys = jax.vmap(solve_one)(params)
    assert ys.shape == (8, 7, 2)
    for i in range(8):
        expected = exponential_decay.soln(t_eval, params[i])
        np.testing.assert_allclose(ys[i], expected, rtol=2e-5, atol=1e-7)


def test_bdf_direct_out():
    """out() defined without integrate_out: outputs are out(t, y)
    (reference method.rs:982-991)."""
    problem = (
        dt.OdeBuilder()
        .rhs(exponential_decay.rhs)
        .init(exponential_decay.init)
        .out(lambda t, y, p: jnp.array([y[0] + y[1]]))
        .p([0.1, 1.0])
        .rtol(1e-8)
        .atol(1e-10)
        .build()
    )
    solver = BdfSolver(problem)
    t_eval = jnp.linspace(0.0, 1.0, 5)
    sol = dt.solve_dense(solver, t_eval)
    expected = exponential_decay.soln(t_eval, problem.params).sum(axis=1)
    np.testing.assert_allclose(sol.gs[:, 0], expected, rtol=1e-6)


def test_bdf_mixed_precision_lu():
    """dense_f32 tier: f32 LU preconditioner, f64 residuals/error control."""
    problem = (
        dt.OdeBuilder()
        .rhs(lambda t, y, p: jnp.array([-1000.0 * y[0] + 999.0 * y[1], -y[1]]))
        .init(lambda t, p: jnp.array([2.0, 1.0]))
        .p([0.0])
        .rtol(1e-6)
        .atol(1e-8)
        .linear_solver("dense_f32")
        .build()
    )
    solver = BdfSolver(problem)
    t_eval = jnp.linspace(0.0, 10.0, 6)
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    t = np.asarray(t_eval)
    expected = np.stack([np.exp(-t) + np.exp(-1000.0 * t), np.exp(-t)], axis=1)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-4, atol=1e-6)
