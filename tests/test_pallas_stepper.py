"""Fused whole-solve Pallas BDF stepper (ops/pallas_stepper.py).

Runs in interpret mode on the CPU suite backend (the Mosaic path needs a
real TPU; the driver bench exercises that).  Scope checks + a short stiff
robertson solve against the XLA BDF path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffsol_tpu as dt
from diffsol_tpu.models import robertson
from diffsol_tpu.ops.dfinterp import UnsupportedForPallas
from diffsol_tpu.ops.pallas_stepper import make_pallas_bdf_solve


def test_pallas_stepper_rejects_out_of_scope():
    from diffsol_tpu.models import exponential_decay

    prob_root = exponential_decay.problem_with_root()  # events out of scope
    with pytest.raises(UnsupportedForPallas):
        make_pallas_bdf_solve(prob_root, [1.0], nbatch=8)


def test_pallas_stepper_dae_diag_mass_interpret():
    """Diagonal-mass semi-explicit DAE (robertson DAE: mass diag(1,1,0),
    conservation constraint row) through the fused kernel matches the XLA
    lockstep DiagMass path member-wise."""
    problem = robertson.problem_dae(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))
    t_eval = [0.4, 4.0, 40.0]
    B = 4
    solve = make_pallas_bdf_solve(
        problem, t_eval, nbatch=B, tile=4, interpret=True
    )
    k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, B))
    params = jnp.stack(
        [k1, jnp.full((B,), 1e4), jnp.full((B,), 3e7)], axis=1
    )
    ys, status, steps = solve(params)
    assert int(jnp.min(status)) >= 0, np.asarray(status)
    # algebraic constraint x+y+z = 1 holds along the whole trajectory
    ysn = np.asarray(ys)
    np.testing.assert_allclose(ysn.sum(axis=1), 1.0, atol=1e-6)

    from diffsol_tpu.ensemble import make_lockstep_problem

    lp = make_lockstep_problem(problem, B)
    sol = dt.solve_dense(
        dt.BdfSolver(lp), jnp.asarray(t_eval),
        params=params.astype(lp.params.dtype), max_steps=2000,
    )
    assert int(sol.stop_reason) >= 0
    np.testing.assert_allclose(
        ysn, np.asarray(sol.ys), rtol=5e-3, atol=1e-8
    )


def test_pallas_stepper_rejects_inconsistent_dae_init():
    """A diag-mass DAE whose init violates the algebraic constraint is
    rejected loudly (the kernel has no consistent-IC Newton)."""
    prob = (
        dt.OdeBuilder()
        .rhs(lambda t, y, p: jnp.array(
            [-p[0] * y[0], y[0] + y[1] - 0.5]  # g(y0) = 1+0-0.5 != 0
        ))
        .init(lambda t, p: jnp.array([1.0, 0.0]))
        .mass(lambda t, p: jnp.diag(jnp.array([1.0, 0.0])))
        .p([0.1])
        .build()
    )
    with pytest.raises(UnsupportedForPallas, match="consistent"):
        make_pallas_bdf_solve(prob, [1.0], nbatch=4, tile=4, interpret=True)


def test_pallas_stepper_matches_xla_bdf_interpret():
    """Short robertson solve (to t=400, where stiffness is already fully
    developed: steps at 4 decades) in interpret mode matches the XLA BDF
    lockstep path member-wise to ~rtol."""
    problem = robertson.problem_ode(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))
    t_eval = [0.4, 4.0, 40.0, 400.0]
    B = 8
    solve = make_pallas_bdf_solve(
        problem, t_eval, nbatch=B, tile=8, interpret=True
    )
    k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, B))
    params = jnp.stack(
        [k1, jnp.full((B,), 1e4), jnp.full((B,), 3e7)], axis=1
    )
    ys, status, steps = solve(params)
    assert int(jnp.min(status)) >= 0, np.asarray(status)
    assert int(steps[0]) > 10

    from diffsol_tpu.ensemble import make_lockstep_problem

    lp = make_lockstep_problem(problem, B)
    sol = dt.solve_dense(
        dt.BdfSolver(lp), jnp.asarray(t_eval),
        params=params.astype(lp.params.dtype), max_steps=2000,
    )
    assert int(sol.stop_reason) >= 0
    ref = np.asarray(sol.ys)  # (neval, n, B)
    got = np.asarray(ys)
    # df32 (~2^-48) kernel vs f64 XLA path, both at rtol=1e-4: member-wise
    # agreement to a few x rtol
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=1e-8)


def test_solve_dense_ensemble_fused_mode():
    """The high-level ensemble entry routes mode='fused' through the
    Pallas kernel (interpret on CPU) and wraps it in the Solution
    surface; 'auto' on a CPU backend falls back to lockstep."""
    from diffsol_tpu.ensemble import solve_dense_ensemble

    problem = robertson.problem_ode(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))
    t_eval = [0.4, 4.0]
    B = 4
    k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, B))
    params = jnp.stack(
        [k1, jnp.full((B,), 1e4), jnp.full((B,), 3e7)], axis=1
    )
    sol_f = solve_dense_ensemble(
        dt.BdfSolver, problem, t_eval, params, mode="fused", interpret=True
    )
    assert int(sol_f.stop_reason) >= 0
    assert sol_f.ys.shape == (2, B, 3)
    sol_l = solve_dense_ensemble(
        dt.BdfSolver, problem, t_eval,
        params.astype(jnp.float64), mode="auto",
    )  # cpu backend: auto -> lockstep
    assert sol_l.ys.shape == (2, B, 3)
    np.testing.assert_allclose(
        np.asarray(sol_f.ys), np.asarray(sol_l.ys), rtol=5e-3, atol=1e-8
    )


def test_solve_dense_ensemble_fused_rejects_out_of_scope():
    from diffsol_tpu.ensemble import solve_dense_ensemble
    from diffsol_tpu.models import exponential_decay

    prob_root = exponential_decay.problem_with_root()  # events -> out of scope
    with pytest.raises(UnsupportedForPallas):
        solve_dense_ensemble(
            dt.BdfSolver, prob_root, [1.0], jnp.zeros((4, 2)),
            mode="fused", interpret=True,
        )


def test_solve_dense_ensemble_fused_sharded():
    """Fused tier over a device mesh: tiles are independent member
    blocks, so the batch axis shards with shard_map and the hot loop has
    no collectives; member trajectories match the unsharded fused solve
    to solver tolerance (per-tile step sequences differ)."""
    from jax.sharding import Mesh
    from diffsol_tpu.ensemble import solve_dense_ensemble

    problem = robertson.problem_ode(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))
    t_eval = [0.4, 4.0]
    B = 4
    k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, B))
    params = jnp.stack(
        [k1, jnp.full((B,), 1e4), jnp.full((B,), 3e7)], axis=1
    )
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("dp",))
    sol_m = solve_dense_ensemble(
        dt.BdfSolver, problem, t_eval, params, mode="fused", mesh=mesh,
        interpret=True,
    )
    assert int(sol_m.stop_reason) >= 0
    assert sol_m.ys.shape == (2, B, 3)
    sol_1 = solve_dense_ensemble(
        dt.BdfSolver, problem, t_eval, params, mode="fused", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(sol_m.ys), np.asarray(sol_1.ys), rtol=5e-3, atol=1e-8
    )
