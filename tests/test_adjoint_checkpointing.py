"""Bounded-memory adjoint checkpointing (reference checkpointing.rs:91-250,
method.rs:620-705): sparse full-state checkpoints every K accepted steps +
per-segment forward re-solve in the backward pass.  Gradients must match the
dense-step-table mode on every feature axis (plain ODE, long horizon,
singular-mass DAE, reset events, quadrature outputs)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsol_tpu.adjoint import (
    make_differentiable_quadrature,
    make_differentiable_solve,
)
from diffsol_tpu.models import logistic


def _grads(problem, t_eval, loss_of_ys, K, **kw):
    ys_dense = make_differentiable_solve(problem, t_eval, **kw)
    ys_bnd = make_differentiable_solve(
        problem, t_eval, checkpoint_interval=K, **kw
    )
    p = problem.params
    np.testing.assert_allclose(
        np.asarray(ys_bnd(p)), np.asarray(ys_dense(p)), rtol=1e-9, atol=1e-12
    )
    g_dense = jax.grad(lambda pp: loss_of_ys(ys_dense(pp)))(p)
    g_bnd = jax.grad(lambda pp: loss_of_ys(ys_bnd(pp)))(p)
    return np.asarray(g_dense), np.asarray(g_bnd)


def test_bounded_matches_dense_logistic():
    problem = logistic.problem(rtol=1e-9, atol=1e-11)
    t_eval = jnp.linspace(0.0, 5.0, 5)
    w = jnp.arange(1.0, 6.0)[:, None]
    g_dense, g_bnd = _grads(
        problem, t_eval, lambda ys: jnp.sum(w * ys**2), K=8
    )
    np.testing.assert_allclose(g_bnd, g_dense, rtol=1e-5)


def test_bounded_long_horizon_neural_ode():
    """Long-horizon nonlinear system (neural-ODE shape: tanh layer rhs).

    The point of the bounded mode: storage O(segments * state + K * n)
    instead of O(steps * n).  K=16 over a many-hundred-step horizon =>
    dozens of segment re-solves; the gradient must still match the dense
    table.
    """
    from diffsol_tpu.problem import OdeBuilder

    n = 3

    def rhs(t, y, p):
        W = p[: n * n].reshape(n, n)
        b = p[n * n : n * n + n]
        return jnp.tanh(W @ y + b) - 0.1 * y

    def init(t, p):
        return p[n * n + n :]

    rng = np.random.default_rng(7)
    W0 = 0.4 * rng.standard_normal((n, n))
    params = jnp.concatenate(
        [
            jnp.asarray(W0.ravel()),
            jnp.asarray([0.1, -0.2, 0.05]),
            jnp.asarray([1.0, -0.5, 0.25]),
        ]
    )
    problem = (
        OdeBuilder()
        .rhs(rhs)
        .init(init)
        .p(params)
        .rtol(1e-8)
        .atol(1e-10)
        .build()
    )
    t_eval = jnp.linspace(0.0, 40.0, 6)
    g_dense, g_bnd = _grads(
        problem, t_eval, lambda ys: jnp.sum(ys**2), K=16, max_steps=4096
    )
    np.testing.assert_allclose(g_bnd, g_dense, rtol=2e-4, atol=1e-9)


def test_bounded_storage_is_sublinear():
    """The checkpoint record is O(max_steps/K) states, not O(max_steps)
    table rows (the whole point of the mode)."""
    from diffsol_tpu.adjoint import (
        forward_with_checkpoints,
        forward_with_table,
    )
    from diffsol_tpu.solvers.bdf import BdfSolver

    problem = logistic.problem()
    solver = BdfSolver(problem)
    t_eval = jnp.linspace(0.0, 5.0, 5)
    max_steps, K = 4096, 64
    _ys, _g, table, _ev, _st = forward_with_table(
        solver, t_eval, problem.params, max_steps
    )
    _ys2, _g2, (ck_ts, ck_states, n_ck), _ev2, _st2 = forward_with_checkpoints(
        solver, t_eval, problem.params, max_steps, K
    )
    assert table[0].shape[0] == max_steps + 1  # dense: one row per step
    assert ck_ts.shape[0] == max_steps // K + 2  # bounded: one per segment
    assert int(n_ck) >= 2


def test_bounded_dae_mass_matrix():
    """Singular-mass DAE: the adjoint's algebraic lambda rows + the
    M^{-T}-partitioned output jump must survive the segment re-solve."""
    from diffsol_tpu.models.robertson import problem_dae

    problem = problem_dae(rtol=1e-8, atol=1e-10)
    t_eval = jnp.asarray([0.1, 1.0, 10.0])
    w = jnp.asarray([1.0, 1e4, 1.0])[None, :]
    g_dense, g_bnd = _grads(
        problem, t_eval, lambda ys: jnp.sum(w * ys), K=16, max_steps=4096
    )
    np.testing.assert_allclose(g_bnd, g_dense, rtol=1e-4)


def test_bounded_reset_events():
    """Reset events inside a segment are re-found by the segment re-solve
    (double table knots at t*) and the boundary corrections fire in the
    containing segment."""
    from diffsol_tpu.models.exponential_decay import problem_with_reset

    problem = problem_with_reset()
    t_eval = jnp.asarray([2.0, 6.0, 10.0])
    g_dense, g_bnd = _grads(
        problem, t_eval, lambda ys: jnp.sum(ys**2), K=8, max_steps=2048
    )
    np.testing.assert_allclose(g_bnd, g_dense, rtol=1e-5)


def test_bounded_quadrature():
    from diffsol_tpu.models.exponential_decay import problem as mk

    pq = mk(integrate_out=True)
    g_dense_fn = make_differentiable_quadrature(pq, 4.0)
    g_bnd_fn = make_differentiable_quadrature(pq, 4.0, checkpoint_interval=8)
    p = pq.params
    np.testing.assert_allclose(
        np.asarray(g_bnd_fn(p)), np.asarray(g_dense_fn(p)), rtol=1e-9
    )
    g_dense = jax.grad(lambda pp: jnp.sum(g_dense_fn(pp)))(p)
    g_bnd = jax.grad(lambda pp: jnp.sum(g_bnd_fn(pp)))(p)
    np.testing.assert_allclose(
        np.asarray(g_bnd), np.asarray(g_dense), rtol=1e-5
    )
