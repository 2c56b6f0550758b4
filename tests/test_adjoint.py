"""Adjoint (reverse-mode) gradient tests vs analytic derivatives and
forward-mode sensitivities (mirrors reference test_adjoint vs finite
differences, ode_solver/mod.rs:541-578)."""

import jax
import jax.numpy as jnp
import numpy as np

import diffsol_tpu as dt
from diffsol_tpu.adjoint import make_differentiable_solve
from diffsol_tpu.models import exponential_decay, logistic
from diffsol_tpu.sens import solve_dense_fwd_sens


def test_grad_exponential_decay():
    """G = sum of y over all outputs; analytic dG/da, dG/dy0."""
    problem = exponential_decay.problem(rtol=1e-8, atol=1e-10)
    t_eval = jnp.linspace(0.0, 1.0, 6)
    ys_of = make_differentiable_solve(problem, t_eval)

    def loss(p):
        return jnp.sum(ys_of(p))

    g = jax.grad(loss)(problem.params)
    a, y0 = float(problem.params[0]), float(problem.params[1])
    t = np.asarray(t_eval)
    dda = np.sum(2.0 * (-t) * y0 * np.exp(-a * t))  # 2 states
    ddy0 = np.sum(2.0 * np.exp(-a * t))
    np.testing.assert_allclose(np.asarray(g), [dda, ddy0], rtol=1e-5)


def test_grad_matches_jacfwd():
    """Adjoint gradient == forward-sensitivity gradient (logistic)."""
    problem = logistic.problem(rtol=1e-9, atol=1e-11)
    t_eval = jnp.linspace(0.0, 5.0, 5)
    ys_of = make_differentiable_solve(problem, t_eval)
    w = jnp.arange(1.0, 6.0)[:, None]  # weighted cost

    def loss(p):
        return jnp.sum(w * ys_of(p) ** 2)

    g_adj = jax.grad(loss)(problem.params)

    solver = dt.BdfSolver(problem)
    ys, sens = solve_dense_fwd_sens(solver, t_eval)
    # dG/dp_i = sum 2 w y s_i
    g_fwd = jnp.stack([jnp.sum(2.0 * w * ys * sens[i]) for i in range(3)])
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_fwd), rtol=1e-4)


def test_grad_fit_loop_descends():
    """One-parameter fitting sanity: gradient descent reduces the misfit
    (mass-spring-fitting-adjoint example class)."""
    problem = logistic.problem(rtol=1e-8, atol=1e-10)
    t_eval = jnp.linspace(0.0, 5.0, 8)
    target = logistic.soln(t_eval, jnp.asarray([1.3, 1.0, 0.1]))
    ys_of = make_differentiable_solve(problem, t_eval)

    def loss(p):
        return jnp.sum((ys_of(p) - target) ** 2)

    p = jnp.asarray([1.0, 1.0, 0.1])
    l0 = float(loss(p))
    lg = jax.value_and_grad(loss)
    for _ in range(12):
        l, g = lg(p)
        p = p - 0.05 * g
    assert float(l) < 0.2 * l0
    # r should move toward 1.3
    assert abs(float(p[0]) - 1.3) < abs(1.0 - 1.3)


def test_grad_with_mass_matrix():
    """Adjoint through a constant nonsingular mass matrix: M y' = f.

    Scaled exponential decay: diag(2, 4) y' = -a y  =>  y = y0 exp(-a t / m_i).
    """
    m_diag = jnp.array([2.0, 4.0])

    problem = (
        dt.OdeBuilder()
        .rhs(lambda t, y, p: -p[0] * y)
        .init(lambda t, p: jnp.array([p[1], p[1]]))
        .mass(lambda t, p: jnp.diag(m_diag))
        .p([0.3, 1.0])
        .rtol(1e-10)
        .atol(1e-12)
        .build()
    )
    t_eval = jnp.linspace(0.0, 2.0, 5)
    ys_of = make_differentiable_solve(problem, t_eval)

    def loss(p):
        return jnp.sum(ys_of(p))

    g = jax.grad(loss)(problem.params)
    a, y0 = 0.3, 1.0
    t = np.asarray(t_eval)
    m = np.asarray(m_diag)
    # y_i = y0 exp(-a t / m_i)
    dda = sum(np.sum(-(t / m[i]) * y0 * np.exp(-a * t / m[i])) for i in range(2))
    ddy0 = sum(np.sum(np.exp(-a * t / m[i])) for i in range(2))
    np.testing.assert_allclose(np.asarray(g), [dda, ddy0], rtol=1e-5)
