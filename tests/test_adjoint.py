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


# ---------------------------------------------------------------------------
# round 2: adjoint completeness (review items): DAE mass matrices,
# quadrature-output gradients, reset-event corrections
# ---------------------------------------------------------------------------


def test_dae_adjoint_vs_forward_sens():
    """Singular-mass (DAE) adjoint: Robertson DAE gradient vs forward sens
    (reference AdjointMass + apply_delta_g_out_mass_alg,
    adjoint_equations.rs:142-200, adjoint.rs:292-366)."""
    from diffsol_tpu.models import robertson
    from diffsol_tpu.sens import solve_dense_fwd_sens
    from diffsol_tpu.solvers.bdf import BdfSolver

    pr = robertson.problem_dae()
    t_eval = jnp.asarray([0.4, 4.0, 40.0])
    ys_of = make_differentiable_solve(pr, t_eval)
    g_adj = jax.grad(lambda p: jnp.sum(ys_of(p) ** 2))(pr.params)
    ys_o, sens_o = solve_dense_fwd_sens(BdfSolver(robertson.problem_dae()), t_eval)
    g_fwd = 2.0 * jnp.einsum("tn,ptn->p", ys_o, jnp.asarray(sens_o))
    rel = np.abs(np.asarray(g_adj) - np.asarray(g_fwd)) / np.max(
        np.abs(np.asarray(g_fwd))
    )
    assert np.max(rel) < 5e-3, (g_adj, g_fwd)


def test_quadrature_gradient_vs_fd():
    """Gradient of G = int u dt through the continuous adjoint with the
    u_y^T forcing term (reference AdjointRhs with_out,
    adjoint_equations.rs:330-460) vs central finite differences."""
    from diffsol_tpu.adjoint import make_differentiable_quadrature
    from diffsol_tpu.models.exponential_decay import problem as mk
    from diffsol_tpu.solvers.bdf import BdfSolver
    from diffsol_tpu.drivers import solve_dense

    pq = mk(integrate_out=True)
    g_of = make_differentiable_quadrature(pq, 4.0)
    grad = jax.grad(lambda p: jnp.sum(g_of(p)))(pq.params)

    def G(p):
        sol = solve_dense(
            BdfSolver(mk(integrate_out=True)), jnp.asarray([4.0]),
            params=p, max_steps=4000,
        )
        return float(jnp.sum(sol.gs[-1]))

    eps = 1e-6
    fd = np.array(
        [
            (G(pq.params + eps * jnp.eye(2)[i])
             - G(pq.params - eps * jnp.eye(2)[i])) / (2 * eps)
            for i in range(2)
        ]
    )
    assert np.max(np.abs(np.asarray(grad) - fd)) < 1e-4, (grad, fd)


def test_reset_adjoint_vs_fd():
    """jax.grad through root+reset events: the backward pass applies the
    event-boundary correction (reference apply_reset_with_adjoint,
    state.rs:560-692) -- gradients wrt BOTH the event-time-moving and the
    reset-value parameters match central finite differences."""
    from diffsol_tpu.models.exponential_decay import problem_with_reset
    from diffsol_tpu.solvers.bdf import BdfSolver
    from diffsol_tpu.drivers import solve_dense

    prr = problem_with_reset()
    t_eval = jnp.asarray([2.0, 6.0, 10.0])
    ys_of = make_differentiable_solve(prr, t_eval)
    grad = jax.grad(lambda p: jnp.sum(ys_of(p) ** 2))(prr.params)

    def L(p):
        sol = solve_dense(
            BdfSolver(problem_with_reset()), t_eval, params=p, max_steps=4000
        )
        return float(jnp.sum(sol.ys ** 2))

    eps = 1e-6
    fd = np.array(
        [
            (L(prr.params + eps * jnp.eye(2)[i])
             - L(prr.params - eps * jnp.eye(2)[i])) / (2 * eps)
            for i in range(2)
        ]
    )
    rel = np.abs(np.asarray(grad) - fd) / np.max(np.abs(fd))
    assert np.max(rel) < 1e-3, (grad, fd)


def test_event_capacity_overflow_fails_loudly():
    """Overflowing the static reset-event record must NOT silently drop
    event corrections (round-2 weak #3): the forward status becomes
    EVENT_CAPACITY_EXCEEDED and outputs/gradients are NaN-poisoned."""
    from diffsol_tpu import errors
    from diffsol_tpu.adjoint import forward_with_table
    from diffsol_tpu.models.exponential_decay import problem_with_reset
    from diffsol_tpu.solvers.bdf import BdfSolver

    # events fire at t = k * ln(1/0.6)/0.1 ~ 5.108 k: three in [0, 16]
    prr = problem_with_reset()
    t_eval = jnp.asarray([2.0, 8.0, 16.0])

    _ys, _g, _tab, ev, status = forward_with_table(
        BdfSolver(prr), t_eval, prr.params, 4096, max_events=8
    )
    assert int(status) >= 0
    assert int(ev["count"]) == 3

    ys, _g, _tab, ev, status = forward_with_table(
        BdfSolver(prr), t_eval, prr.params, 4096, max_events=1
    )
    assert int(status) == errors.EVENT_CAPACITY_EXCEEDED
    assert np.all(np.isnan(np.asarray(ys)))

    ys_of = make_differentiable_solve(prr, t_eval, max_events=1)
    grad = jax.grad(lambda p: jnp.sum(ys_of(p) ** 2))(prr.params)
    assert np.all(np.isnan(np.asarray(grad)))
