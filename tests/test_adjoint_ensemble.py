"""Differentiable-ensemble tests: jax.grad over lockstep and vmap solves.

The capability the reference lacks (its adjoint is single-context,
adjoint.rs:13-159; the nbatch context batches only forward solves): per-
member gradients of ensemble solves.  Each test checks the batched adjoint
against the already-validated single-instance adjoint (itself tested vs
finite differences / forward sens in test_adjoint.py) and, for the ODE
case, directly against jax.jacfwd through the solver.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffsol_tpu.adjoint import (
    make_differentiable_quadrature,
    make_differentiable_solve,
)
from diffsol_tpu.adjoint_ensemble import (
    make_differentiable_quadrature_ensemble,
    make_differentiable_solve_ensemble,
)
from diffsol_tpu.models import logistic, robertson


def _member_params(base, B, spread=0.2):
    """B distinct parameter rows around ``base``."""
    base = np.asarray(base, dtype=np.float64)
    f = 1.0 + spread * np.linspace(-1.0, 1.0, B)[:, None]
    return jnp.asarray(base[None, :] * f)


def test_lockstep_grad_matches_single_instance():
    """Per-member lockstep-adjoint gradients == single-instance adjoint
    gradients, member by member (logistic, 4 distinct parameter rows)."""
    problem = logistic.problem(rtol=1e-8, atol=1e-10)
    t_eval = jnp.linspace(0.5, 3.0, 4)
    B = 4
    pb = _member_params(problem.params, B)

    ys_of = make_differentiable_solve_ensemble(problem, t_eval, B)
    loss = lambda p: jnp.sum(ys_of(p) ** 2)
    grad_b = jax.grad(loss)(pb)
    assert grad_b.shape == (B, 3)

    one = make_differentiable_solve(problem, t_eval)
    for b in range(B):
        g1 = jax.grad(lambda p: jnp.sum(one(p) ** 2))(pb[b])
        np.testing.assert_allclose(
            np.asarray(grad_b[b]), np.asarray(g1), rtol=5e-5, atol=1e-10
        )


def test_lockstep_grad_matches_jacfwd():
    """Lockstep-adjoint per-member gradients vs jax.jacfwd straight through
    the (differentiable) forward solver -- the sens-tolerance oracle."""
    problem = logistic.problem(rtol=1e-9, atol=1e-11)
    t_eval = jnp.linspace(0.5, 2.0, 3)
    B = 3
    pb = _member_params(problem.params, B)

    ys_of = make_differentiable_solve_ensemble(problem, t_eval, B)
    grad_b = jax.grad(lambda p: jnp.sum(ys_of(p) ** 2))(pb)

    # oracle: jacfwd straight through the raw solver (while_loop is
    # forward-differentiable; custom_vjp would block jvp)
    from diffsol_tpu.drivers import solve_dense
    from diffsol_tpu.solvers.bdf import BdfSolver

    solver = BdfSolver(problem)

    def ys_plain(p):
        return solve_dense(solver, t_eval, params=p, max_steps=4096).ys

    for b in range(B):
        jac = jax.jacfwd(ys_plain)(pb[b])  # (neval, n, np)
        ys = ys_plain(pb[b])
        g_fwd = 2.0 * jnp.einsum("ij,ijk->k", ys, jac)
        np.testing.assert_allclose(
            np.asarray(grad_b[b]), np.asarray(g_fwd), rtol=1e-4, atol=1e-10
        )


def test_lockstep_grad_dae_mass():
    """Singular-mass DAE (robertson): batched adjoint with the per-member
    M^{-T} output-jump partition and algebraic lambda rows."""
    problem = robertson.problem_dae(rtol=1e-8, atol=(1e-10, 1e-10, 1e-10))
    t_eval = jnp.asarray([0.1, 1.0, 10.0])
    B = 3
    pb = _member_params(problem.params, B, spread=0.1)
    w = jnp.asarray([1.0, 1e4, 1.0])[None, None, :]

    ys_of = make_differentiable_solve_ensemble(problem, t_eval, B)
    grad_b = jax.grad(lambda p: jnp.sum((w * ys_of(p)) ** 2))(pb)

    one = make_differentiable_solve(problem, t_eval)
    for b in range(B):
        g1 = jax.grad(lambda p: jnp.sum((w[0] * one(p)) ** 2))(pb[b])
        denom = np.max(np.abs(np.asarray(g1)))
        rel = np.abs(np.asarray(grad_b[b]) - np.asarray(g1)) / denom
        # lockstep shares one step sequence across members; the single
        # solves each take their own, so agreement is solver-tolerance level
        assert np.max(rel) < 1e-3, (grad_b[b], g1)


def test_lockstep_quadrature_grad():
    """Per-member gradients of the quadrature output G_b = int y_b dt."""
    problem = (
        logistic.problem(rtol=1e-8, atol=1e-10)
    )
    import dataclasses

    problem = dataclasses.replace(problem, integrate_out=True)
    B = 3
    pb = _member_params(problem.params, B)
    t_final = 2.0

    g_of = make_differentiable_quadrature_ensemble(problem, t_final, B)
    gb = g_of(pb)
    assert gb.shape == (B, 1)
    grad_b = jax.grad(lambda p: jnp.sum(g_of(p)))(pb)

    one = make_differentiable_quadrature(problem, t_final)
    for b in range(B):
        g1v = one(pb[b])
        np.testing.assert_allclose(
            np.asarray(gb[b]), np.asarray(g1v), rtol=1e-6
        )
        g1 = jax.grad(lambda p: jnp.sum(one(p)))(pb[b])
        np.testing.assert_allclose(
            np.asarray(grad_b[b]), np.asarray(g1), rtol=5e-5, atol=1e-10
        )


def test_independent_mode_grad():
    """mode='independent': vmap of the single-instance custom_vjp -- each
    member its own step sequence; gradients still per member."""
    problem = logistic.problem(rtol=1e-8, atol=1e-10)
    t_eval = jnp.linspace(0.5, 3.0, 4)
    B = 3
    pb = _member_params(problem.params, B)

    ys_of = make_differentiable_solve_ensemble(
        problem, t_eval, B, mode="independent"
    )
    ys = ys_of(pb)
    assert ys.shape == (4, B, 1)
    grad_b = jax.grad(lambda p: jnp.sum(ys_of(p) ** 2))(pb)

    one = make_differentiable_solve(problem, t_eval)
    for b in range(B):
        g1 = jax.grad(lambda p: jnp.sum(one(p) ** 2))(pb[b])
        np.testing.assert_allclose(
            np.asarray(grad_b[b]), np.asarray(g1), rtol=1e-6, atol=1e-12
        )


def test_lockstep_bounded_memory_grad():
    """checkpoint_interval on the ENSEMBLE adjoint: sparse full-state
    checkpoints + lockstep segment re-solve reproduce the dense-table
    per-member gradients (the lockstep lift of backward_pass_bounded)."""
    problem = logistic.problem(rtol=1e-8, atol=1e-10)
    t_eval = jnp.linspace(0.5, 3.0, 4)
    B = 3
    pb = _member_params(problem.params, B)

    dense = make_differentiable_solve_ensemble(
        problem, t_eval, B, max_steps=4096
    )
    bounded = make_differentiable_solve_ensemble(
        problem, t_eval, B, max_steps=4096, checkpoint_interval=16
    )
    loss = lambda f: (lambda p: jnp.sum(f(p) ** 2))
    ys_d = dense(pb)
    ys_b = bounded(pb)
    np.testing.assert_allclose(
        np.asarray(ys_b), np.asarray(ys_d), rtol=1e-10
    )
    g_d = jax.grad(loss(dense))(pb)
    g_b = jax.grad(loss(bounded))(pb)
    np.testing.assert_allclose(
        np.asarray(g_b), np.asarray(g_d), rtol=2e-4, atol=1e-10
    )


def test_lockstep_bounded_quadrature_grad():
    """checkpoint_interval on the ensemble QUADRATURE adjoint (bounded
    segment re-solve + the u_y^T forcing)."""
    import dataclasses

    problem = dataclasses.replace(
        logistic.problem(rtol=1e-8, atol=1e-10), integrate_out=True
    )
    B = 3
    pb = _member_params(problem.params, B)
    t_final = 2.0

    dense = make_differentiable_quadrature_ensemble(
        problem, t_final, B, max_steps=4096
    )
    bounded = make_differentiable_quadrature_ensemble(
        problem, t_final, B, max_steps=4096, checkpoint_interval=16
    )
    np.testing.assert_allclose(
        np.asarray(bounded(pb)), np.asarray(dense(pb)), rtol=1e-10
    )
    g_d = jax.grad(lambda p: jnp.sum(dense(p)))(pb)
    g_b = jax.grad(lambda p: jnp.sum(bounded(p)))(pb)
    np.testing.assert_allclose(
        np.asarray(g_b), np.asarray(g_d), rtol=2e-4, atol=1e-10
    )


# ---------------------------------------------------------------------------
# reset-event corrections in the lockstep backward pass (round-4 fix: the
# forward pass records events, the backward pass must apply the batched
# boundary corrections -- previously it integrated straight through the
# discontinuities and returned wrong gradients with no error)
# ---------------------------------------------------------------------------


def _time_reset_problem(rtol=1e-8, atol=1e-10):
    """Decay with a TIME-triggered reset: root at t = 2 (independent of y
    and params), reset y -> p[1].  The shared event time makes lockstep
    semantics exactly equal independent semantics for heterogeneous
    members, so per-member gradients must agree to solver tolerance."""
    from diffsol_tpu.problem import OdeBuilder

    return (
        OdeBuilder()
        .rhs(lambda t, y, p: -p[0] * y)
        .init(lambda t, p: jnp.full((2,), 1.0))
        .root(lambda t, y, p: jnp.array([t - 2.0]))
        .reset(lambda t, y, p: jnp.full_like(y, p[1]))
        .p([0.1, 0.7])
        .rtol(rtol)
        .atol(atol)
        .build()
    )


def test_lockstep_reset_grad_matches_independent():
    """Lockstep ensemble gradients THROUGH a reset event match the
    (FD-validated) single-instance adjoint per member -- incl. the
    reset-target parameter p[1], whose gradient was silently zero before
    the event corrections were threaded into the lockstep backward pass."""
    problem = _time_reset_problem()
    t_eval = jnp.asarray([1.0, 3.0, 4.0])
    B = 4
    pb = _member_params(problem.params, B, spread=0.15)

    ys_of = make_differentiable_solve_ensemble(
        problem, t_eval, B, max_steps=4096
    )
    grad_b = jax.grad(lambda p: jnp.sum(ys_of(p) ** 2))(pb)

    one = make_differentiable_solve(problem, t_eval, max_steps=4096)
    for b in range(B):
        g1 = jax.grad(lambda p: jnp.sum(one(p) ** 2))(pb[b])
        np.testing.assert_allclose(
            np.asarray(grad_b[b]), np.asarray(g1), rtol=1e-4, atol=1e-10
        )
    # the reset-target gradient must be nonzero (two eval points after the
    # event see p[1] directly)
    assert np.all(np.abs(np.asarray(grad_b[:, 1])) > 1e-3)


def test_lockstep_reset_grad_state_root():
    """STATE-dependent root (y[0] = 0.6) + reset, identical member rows:
    every member's lockstep gradient equals the single-instance adjoint
    gradient (itself validated vs central finite differences in
    test_adjoint.py) -- exercises the alpha event-time terms batched."""
    from diffsol_tpu.models.exponential_decay import problem_with_reset

    prr = problem_with_reset()
    t_eval = jnp.asarray([2.0, 6.0, 10.0])
    B = 3
    pb = jnp.broadcast_to(prr.params, (B,) + prr.params.shape)

    ys_of = make_differentiable_solve_ensemble(
        prr, t_eval, B, max_steps=4096
    )
    grad_b = jax.grad(lambda p: jnp.sum(ys_of(p) ** 2))(pb)

    one = make_differentiable_solve(prr, t_eval, max_steps=4096)
    g1 = jax.grad(lambda p: jnp.sum(one(p) ** 2))(prr.params)
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(grad_b[b]), np.asarray(g1), rtol=1e-5, atol=1e-12
        )


def test_lockstep_reset_grad_bounded_memory():
    """Bounded-memory lockstep adjoint through a reset event: the segment
    re-solve re-finds the event (max_events threaded, previously 0) and the
    correction fires inside its segment -- gradients match the dense-table
    lockstep pass."""
    problem = _time_reset_problem()
    t_eval = jnp.asarray([1.0, 3.0, 4.0])
    B = 3
    pb = _member_params(problem.params, B, spread=0.15)

    dense = make_differentiable_solve_ensemble(
        problem, t_eval, B, max_steps=4096
    )
    bounded = make_differentiable_solve_ensemble(
        problem, t_eval, B, max_steps=4096, checkpoint_interval=16
    )
    np.testing.assert_allclose(
        np.asarray(bounded(pb)), np.asarray(dense(pb)), rtol=1e-10
    )
    g_d = jax.grad(lambda p: jnp.sum(dense(p) ** 2))(pb)
    g_b = jax.grad(lambda p: jnp.sum(bounded(p) ** 2))(pb)
    np.testing.assert_allclose(
        np.asarray(g_b), np.asarray(g_d), rtol=2e-4, atol=1e-10
    )
