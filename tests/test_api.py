"""API-surface tests: method factory, resumable staged solves, statistics."""

import jax.numpy as jnp
import numpy as np
import pytest

import diffsol_tpu as dt
from diffsol_tpu import errors
from diffsol_tpu.models import exponential_decay, logistic
from diffsol_tpu.utils import stats_dict, stats_json


@pytest.mark.parametrize("method", dt.METHODS)
def test_factory_methods(method):
    problem = exponential_decay.problem(rtol=1e-6, atol=1e-8)
    s = dt.solver(problem, method)
    sol = dt.solve_dense(s, jnp.linspace(0.0, 1.0, 5))
    expected = exponential_decay.soln(sol.ts, problem.params)
    np.testing.assert_allclose(sol.ys, expected, rtol=1e-4, atol=1e-6)


def test_staged_resume_matches_single_solve():
    """Reference `solve_soln` semantics (solution.rs resumable solves):
    a Solution's final state is a restartable checkpoint."""
    problem = logistic.problem(rtol=1e-8, atol=1e-10)
    solver = dt.BdfSolver(problem)
    t1 = jnp.linspace(0.0, 5.0, 6)
    t2 = jnp.linspace(6.0, 10.0, 5)
    sol1 = dt.solve_dense(solver, t1)
    assert int(sol1.stop_reason) == errors.TSTOP_REACHED
    sol2 = dt.solve_dense(solver, t2, state=sol1.state)
    expected = logistic.soln(t2, problem.params)
    np.testing.assert_allclose(sol2.ys, expected, rtol=1e-6, atol=1e-9)


def test_state_mut_and_continue():
    """Reference test_state_mut: mutate the state mid-solve and continue."""
    problem = exponential_decay.problem(rtol=1e-8, atol=1e-10)
    solver = dt.BdfSolver(problem)
    sol1 = dt.solve_dense(solver, jnp.linspace(0.0, 1.0, 3))
    st = sol1.state
    # halve the state by hand; the solver must reinitialize (order 1)
    y_new = st.y * 0.5
    st = st.replace(
        y=y_new,
        dy=problem.eqn.rhs(st.t, y_new, problem.params),
        state_modified=jnp.asarray(True),
    )
    t2 = jnp.asarray([1.5, 2.0])
    sol2 = dt.solve_dense(solver, t2, state=st)
    # from t=1 the trajectory is 0.5 * y(1) * exp(-a (t-1))
    a = float(problem.params[0])
    base = 0.5 * np.exp(-a * 1.0)
    expected = base * np.exp(-a * (np.asarray(t2) - 1.0))
    np.testing.assert_allclose(sol2.ys[:, 0], expected, rtol=1e-6)


def test_stats_helpers():
    problem = logistic.problem()
    solver = dt.BdfSolver(problem)
    sol = dt.solve_dense(solver, jnp.linspace(0.0, 5.0, 3))
    d = stats_dict(sol)
    assert d["steps"] > 0
    assert d["newton_iterations"] >= d["steps"]
    assert "steps" in stats_json(sol)


def test_error_status_raises():
    """Error taxonomy surfaces as DiffsolError at the Python boundary."""

    def bad_rhs(t, y, p):
        # blows up in finite time: dy/dt = y^2 with y0=1 diverges at t=1
        return y * y

    problem = (
        dt.OdeBuilder()
        .rhs(bad_rhs)
        .init(lambda t, p: jnp.array([1.0]))
        .p([0.0])
        .rtol(1e-8)
        .atol(1e-10)
        .build()
    )
    solver = dt.BdfSolver(problem)
    sol = dt.solve_dense(solver, jnp.asarray([0.5, 2.0]), max_steps=2000)
    assert int(sol.stop_reason) < 0
    with pytest.raises(errors.DiffsolError):
        sol.raise_for_status()


def test_nonzero_t0():
    """Integration starting from t0 != 0 (all fixtures use t0 = 0)."""
    problem = (
        dt.OdeBuilder()
        .rhs(lambda t, y, p: -p[0] * y)
        .init(lambda t, p: jnp.array([2.0]))
        .p([0.4])
        .t0(3.0)
        .rtol(1e-8)
        .atol(1e-10)
        .build()
    )
    for method in ("bdf", "tsit45"):
        s = dt.solver(problem, method)
        t_eval = jnp.asarray([3.5, 4.0, 5.0])
        sol = dt.solve_dense(s, t_eval)
        expected = 2.0 * np.exp(-0.4 * (np.asarray(t_eval) - 3.0))
        np.testing.assert_allclose(sol.ys[:, 0], expected, rtol=1e-6)


def test_interpolate_dy():
    """Derivative dense output (reference test_interpolate_dy,
    ode_solver/mod.rs:909)."""
    import jax

    problem = logistic.problem(rtol=1e-9, atol=1e-11)
    for method in ("bdf", "tr_bdf2", "tsit45"):
        s = dt.solver(problem, method)
        step = jax.jit(s.step)
        state = s.init_state()
        for _ in range(25):
            state = step(state)
        t_mid = float(state.t) - 0.4 * float(state.t - state.t_prev) if hasattr(
            state, "t_prev"
        ) else float(state.t) - 0.3 * float(state.h)
        y_mid = s.interpolate(state, t_mid)
        dy_mid = s.interpolate_dy(state, t_mid)
        expected_dy = logistic.rhs(t_mid, y_mid, problem.params)
        np.testing.assert_allclose(
            np.asarray(dy_mid), np.asarray(expected_dy), rtol=1e-4, atol=1e-8
        )


def test_checkpoint_serialize_resume(tmp_path):
    """Solver states are plain pytrees: serialize a mid-solve checkpoint to
    disk, reload, and the resumed solve matches the uninterrupted one
    (reference checkpoint/into_state/set_state, method.rs:56-70)."""
    import jax

    problem = logistic.problem(rtol=1e-8, atol=1e-10)
    solver = dt.BdfSolver(problem)
    t1 = jnp.linspace(0.0, 4.0, 5)
    t2 = jnp.linspace(5.0, 10.0, 6)
    sol1 = dt.solve_dense(solver, t1)

    # serialize the checkpoint (leaves -> npz)
    leaves, treedef = jax.tree_util.tree_flatten(sol1.state)
    path = tmp_path / "ckpt.npz"
    np.savez(path, *[np.asarray(l) for l in leaves])
    loaded = np.load(path)
    leaves2 = [jnp.asarray(loaded[k]) for k in loaded.files]
    state2 = jax.tree_util.tree_unflatten(treedef, leaves2)

    sol_resumed = dt.solve_dense(solver, t2, state=state2)
    sol_direct = dt.solve_dense(solver, t2, state=sol1.state)
    np.testing.assert_array_equal(
        np.asarray(sol_resumed.ys), np.asarray(sol_direct.ys)
    )
    expected = logistic.soln(t2, problem.params)
    np.testing.assert_allclose(sol_resumed.ys, expected, rtol=1e-6, atol=1e-9)


def test_stop_time_before_current_time():
    """set_stop_time in the past surfaces STOP_TIME_BEFORE_CURRENT_TIME
    (reference OdeSolverError::StopTimeAtCurrentTime family)."""
    from diffsol_tpu.models.logistic import problem as mk
    from diffsol_tpu import errors

    s = dt.solver(mk(), "bdf")
    sol = dt.solve_dense(s, jnp.asarray([1.0, 2.0]), max_steps=1000)
    assert int(sol.stop_reason) >= 0
    # resume with a final time in the past
    sol2 = dt.solve_dense(
        s, jnp.asarray([0.5]), state=sol.state, max_steps=1000
    )
    assert int(sol2.stop_reason) == errors.STOP_TIME_BEFORE_CURRENT_TIME
    with pytest.raises(errors.DiffsolError):
        sol2.raise_for_status()


def test_with_config_mid_run():
    """Mid-run config change (reference method.rs:84 config_mut): a staged
    solve continues from the restartable state under a new config; capping
    timestep growth at 1.0 freezes h, so the second stage takes more steps
    than the same stage under the default config."""
    import dataclasses

    from diffsol_tpu.models import logistic
    from diffsol_tpu.problem import SolverConfig

    problem = logistic.problem(rtol=1e-8, atol=1e-10)
    solver = dt.BdfSolver(problem)
    sol1 = dt.solve(solver, 1.0, max_steps=2000)
    steps_stage1 = int(sol1.state.stats.steps)

    # default config continuation
    sol_def = dt.solve(solver, 5.0, state=sol1.state, max_steps=2000)
    # frozen-h continuation (growth clamped to 1)
    frozen = dataclasses.replace(
        solver.config,
        maximum_timestep_growth=1.0,
        minimum_timestep_growth=1.0,
    )
    solver2 = solver.with_config(frozen)
    sol_frz = dt.solve(solver2, 5.0, state=sol1.state, max_steps=2000)

    assert int(sol_frz.stop_reason) == errors.TSTOP_REACHED
    d_def = int(sol_def.state.stats.steps) - steps_stage1
    d_frz = int(sol_frz.state.stats.steps) - steps_stage1
    assert d_frz > d_def
    # both continuations end at the same solution
    np.testing.assert_allclose(
        np.asarray(sol_frz.state.y), np.asarray(sol_def.state.y), rtol=1e-6
    )


def test_f32_solves():
    """f32 precision option (reference ScalarType::F32,
    diffsol-c/src/scalar_type.rs) under an x64-enabled session: the whole
    solve carries float32 and matches the f64 trajectory to f32-level
    accuracy."""
    def build(dtype=None):
        b = (
            dt.OdeBuilder()
            .rhs(lambda t, y, p: p[0] * y * (1.0 - y / p[1]))
            .init(lambda t, p: jnp.asarray([p[2]]))
            .p([1.0, 10.0, 0.1])
            .rtol(1e-5)
            .atol(1e-7)
        )
        if dtype is not None:
            b = b.dtype(dtype)
        return b.build()

    t_eval = jnp.linspace(0.5, 5.0, 4)
    sol32 = dt.solve_dense(dt.BdfSolver(build(jnp.float32)), t_eval)
    sol64 = dt.solve_dense(dt.BdfSolver(build()), t_eval)
    assert sol32.ys.dtype == jnp.float32
    assert sol64.ys.dtype == jnp.float64
    assert int(sol32.stop_reason) >= 0
    np.testing.assert_allclose(
        np.asarray(sol32.ys), np.asarray(sol64.ys), rtol=2e-4
    )
    # stiff f32: robertson ODE at loose tolerance on TR-BDF2
    from diffsol_tpu.models import robertson

    prob32 = robertson.problem_ode(
        rtol=1e-4, atol=1e-6, dtype=jnp.float32
    )
    s = dt.solve_dense(
        dt.BdfSolver(prob32), jnp.asarray([0.4, 4.0]), max_steps=5000
    )
    assert s.ys.dtype == jnp.float32
    assert int(s.stop_reason) >= 0
    np.testing.assert_allclose(
        float(s.ys[0, 0]), 0.985172, rtol=5e-3
    )


def test_builder_rebuild_does_not_stack_dtype_wrappers():
    """build() must not mutate the builder: a second build with a different
    dtype must not truncate through a stale f32 cast (round-2 review
    regression)."""
    b = (
        dt.OdeBuilder()
        .rhs(lambda t, y, p: -p[0] * y)
        .init(lambda t, p: jnp.asarray([1.0 + 1e-12]))
        .p([1.0])
        .dtype(jnp.float32)
    )
    b.build()
    p64 = b.dtype(jnp.float64).build()
    y = p64.eqn.init(jnp.asarray(0.0), p64.params)
    assert y.dtype == jnp.float64
    assert float(y[0]) != 1.0  # the 1e-12 survives: no stale f32 truncation
