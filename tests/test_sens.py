"""Forward sensitivity tests vs analytic derivatives.

exponential decay: y = y0 exp(-a t), p = [a, y0]:
  dy/da = -t y0 exp(-a t), dy/dy0 = exp(-a t)
"""

import jax.numpy as jnp
import numpy as np
import pytest

import diffsol_tpu as dt
from diffsol_tpu.models import exponential_decay, logistic
from diffsol_tpu.sens import solve_dense_fwd_sens


def _expected_sens(t_eval, p):
    a, y0 = float(p[0]), float(p[1])
    t = np.asarray(t_eval)
    e = np.exp(-a * t)
    dda = np.stack([-t * y0 * e, -t * y0 * e], axis=1)
    ddy0 = np.stack([e, e], axis=1)
    return np.stack([dda, ddy0], axis=0)  # (2, neval, 2)


@pytest.mark.parametrize("make_solver", [
    lambda p: dt.BdfSolver(p),
    lambda p: dt.ErkSolver(p),
    lambda p: dt.SdirkSolver(p, tableau=dt.tr_bdf2()),
])
def test_jacfwd_sens_exponential_decay(make_solver):
    problem = exponential_decay.problem(rtol=1e-8, atol=1e-10)
    solver = make_solver(problem)
    t_eval = jnp.linspace(0.0, 1.0, 6)
    ys, sens = solve_dense_fwd_sens(solver, t_eval)
    expected = _expected_sens(t_eval, problem.params)
    np.testing.assert_allclose(np.asarray(sens), expected, rtol=1e-4, atol=1e-7)


def test_jacfwd_sens_vs_finite_differences():
    problem = logistic.problem(rtol=1e-9, atol=1e-11)
    solver = dt.BdfSolver(problem)
    t_eval = jnp.linspace(0.0, 5.0, 4)
    _, sens = solve_dense_fwd_sens(solver, t_eval)
    # finite differences on the analytic solution
    p0 = np.asarray(problem.params)
    eps = 1e-6
    for i in range(3):
        pp = p0.copy()
        pm = p0.copy()
        pp[i] += eps
        pm[i] -= eps
        fd = (
            np.asarray(logistic.soln(t_eval, jnp.asarray(pp)))
            - np.asarray(logistic.soln(t_eval, jnp.asarray(pm)))
        ) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(sens[i]), fd, rtol=1e-3, atol=1e-7
        )


def test_continuous_sens_bdf():
    """Reference-parity path: SensEquations integrated in lockstep with the
    main equation sharing the factorization (BdfSolver(sens=True))."""
    problem = exponential_decay.problem(rtol=1e-6, atol=1e-8)
    problem = problem.replace(sens_rtol=jnp.asarray(1e-6), sens_atol=jnp.full((2,), 1e-8))
    solver = dt.BdfSolver(problem, sens=True)
    t_eval = jnp.linspace(0.0, 1.0, 6)
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) >= 0
    expected = _expected_sens(t_eval, problem.params)
    sens = np.moveaxis(np.asarray(sol.sens), 1, 0)  # (np, neval, n)
    np.testing.assert_allclose(sens, expected, rtol=1e-3, atol=1e-6)


def test_continuous_sens_matches_jacfwd():
    problem = logistic.problem(rtol=1e-8, atol=1e-10)
    problem = problem.replace(
        sens_rtol=jnp.asarray(1e-8), sens_atol=jnp.full((1,), 1e-10)
    )
    solver = dt.BdfSolver(problem, sens=True)
    t_eval = jnp.linspace(0.0, 5.0, 4)
    sol = dt.solve_dense(solver, t_eval)
    sens_cont = np.moveaxis(np.asarray(sol.sens), 1, 0)
    solver2 = dt.BdfSolver(problem)
    _, sens_fwd = solve_dense_fwd_sens(solver2, t_eval)
    np.testing.assert_allclose(sens_cont, np.asarray(sens_fwd), rtol=5e-4, atol=1e-7)
