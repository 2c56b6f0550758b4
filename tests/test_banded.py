"""Banded linear-solver tier tests: LU correctness, coloring Jacobians,
heat1d/heat2d MOL problems on BDF (the KLU-replacement path)."""

import jax
import jax.numpy as jnp
import numpy as np

import diffsol_tpu as dt
from diffsol_tpu import errors
from diffsol_tpu.models import heat1d, heat2d
from diffsol_tpu.ops.banded import (
    band_to_dense,
    dense_to_band,
    make_banded_jac,
    make_banded_solver,
)


def test_banded_lu_random():
    rng = np.random.default_rng(7)
    for (n, ml, mu) in [(16, 2, 2), (25, 5, 5), (10, 1, 3)]:
        a = np.zeros((n, n))
        for i in range(n):
            for j in range(max(0, i - ml), min(n, i + mu + 1)):
                a[i, j] = rng.standard_normal()
            a[i, i] += 6.0
        spec = make_banded_solver(ml, mu)
        band = dense_to_band(jnp.asarray(a), ml, mu)
        x = spec.solve(spec.factor(band), jnp.asarray(rng.standard_normal(n)))
        b = jnp.asarray(a) @ x
        np.testing.assert_allclose(
            np.asarray(jnp.asarray(a) @ x), np.asarray(b), rtol=1e-12
        )


def test_banded_lu_batched():
    """vmap/lockstep batching of factor+solve."""
    rng = np.random.default_rng(3)
    n, ml, mu, B = 12, 2, 2, 5
    a = rng.standard_normal((B, n, n)) * 0.1
    for b in range(B):
        a[b] += np.eye(n) * 4.0
        a[b] *= np.abs(np.arange(n)[None, :] - np.arange(n)[:, None]) <= 2
    spec = make_banded_solver(ml, mu)
    bands = jax.vmap(lambda m: dense_to_band(m, ml, mu))(jnp.asarray(a))
    rhs = jnp.asarray(rng.standard_normal((B, n)))
    xs = spec.solve(spec.factor(bands), rhs)
    res = jnp.einsum("bij,bj->bi", jnp.asarray(a), xs) - rhs
    assert float(jnp.max(jnp.abs(res))) < 1e-10


def test_heat1d_banded_bdf():
    problem, soln = heat1d.make(mgrid=20)
    from diffsol_tpu.ops.banded import make_banded_solver
    import dataclasses

    problem = dataclasses.replace(
        problem, linear_solver=make_banded_solver(1, 1)
    )
    # install the banded jacobian
    from diffsol_tpu.ops.banded import make_banded_jac

    eqn = dataclasses.replace(
        problem.eqn, rhs_jac=make_banded_jac(problem.eqn.rhs, 1, 1)
    )
    problem = dataclasses.replace(problem, eqn=eqn)
    solver = dt.BdfSolver(problem)
    t_eval = jnp.asarray([0.5, 0.51, 0.52, 0.53, 0.54])
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    expected = soln(np.asarray(t_eval))
    np.testing.assert_allclose(np.asarray(sol.ys), expected, rtol=1e-3, atol=1e-4)


def test_heat2d_banded_bdf():
    """IDA idaHeat2D-class DAE on the banded tier (boundary constraints)."""
    mgrid = 10
    problem = heat2d.make(mgrid=mgrid)
    solver = dt.BdfSolver(problem)
    t_eval = jnp.asarray([0.01, 0.02, 0.04, 0.08, 0.16])
    sol = dt.solve_dense(solver, t_eval)
    assert int(sol.stop_reason) == errors.TSTOP_REACHED
    ys = np.asarray(sol.ys)
    # compare against a dense-tier solve of the same problem
    problem_dense = heat2d.make(mgrid=mgrid, banded=False)
    sol_d = dt.solve_dense(dt.BdfSolver(problem_dense), t_eval)
    np.testing.assert_allclose(ys, np.asarray(sol_d.ys), rtol=1e-4, atol=1e-7)
    # physics: heat decays, boundaries stay 0
    assert ys[-1].max() < ys[0].max()
    n = mgrid * mgrid
    idx = np.arange(n)
    boundary = ~(
        ((idx % mgrid) > 0)
        & ((idx % mgrid) < mgrid - 1)
        & ((idx // mgrid) > 0)
        & ((idx // mgrid) < mgrid - 1)
    )
    assert np.abs(ys[:, boundary]).max() < 1e-8
