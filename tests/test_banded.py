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
    """Lockstep batching of factor+solve: batch-LAST (nb, n, B) band arrays
    and (n, B) right-hand sides (members on the lane axis)."""
    rng = np.random.default_rng(3)
    n, ml, mu, B = 12, 2, 2, 5
    a = rng.standard_normal((B, n, n)) * 0.1
    for b in range(B):
        a[b] += np.eye(n) * 4.0
        a[b] *= np.abs(np.arange(n)[None, :] - np.arange(n)[:, None]) <= 2
    spec = make_banded_solver(ml, mu)
    bands = jnp.moveaxis(
        jax.vmap(lambda m: dense_to_band(m, ml, mu))(jnp.asarray(a)), 0, -1
    )  # (nb, n, B)
    rhs = jnp.asarray(rng.standard_normal((B, n))).T  # (n, B)
    xs = spec.solve(spec.factor(bands), rhs)
    res = jnp.einsum("bij,jb->ib", jnp.asarray(a), xs) - rhs
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


def test_pallas_band_kernels_match_xla():
    """The Pallas f32 factor/solve (interpret on CPU) agrees with the XLA
    f64 path to f32 accuracy, single and batch-last batched."""
    from diffsol_tpu.ops import pallas_banded

    rng = np.random.default_rng(7)
    for ml, mu, n in [(1, 1, 12), (3, 2, 20), (0, 3, 9), (3, 0, 9), (4, 4, 33)]:
        a = np.eye(n) * 4.0 + rng.standard_normal((n, n)) * 0.2
        a *= np.abs(np.arange(n)[None, :] - np.arange(n)[:, None]) <= max(ml, mu)
        a *= (np.arange(n)[:, None] - np.arange(n)[None, :] <= ml)
        a *= (np.arange(n)[None, :] - np.arange(n)[:, None] <= mu)
        band = dense_to_band(jnp.asarray(a), ml, mu)
        b = jnp.asarray(rng.standard_normal(n))
        x_ref = np.linalg.solve(a, np.asarray(b))
        f = pallas_banded.band_lu_factor(band, ml, mu)
        x = pallas_banded.band_lu_solve(f, b, ml, mu)
        assert float(jnp.max(jnp.abs(x - x_ref))) < 1e-4, (ml, mu, n)
        # batch-last: 3 scaled copies
        B = 3
        bandB = band[:, :, None] * (1.0 + 0.1 * jnp.arange(B))
        bB = b[:, None] * jnp.ones((1, B))
        fB = pallas_banded.band_lu_factor(bandB, ml, mu)
        xB = pallas_banded.band_lu_solve(fB, bB, ml, mu)
        for k in range(B):
            xk_ref = np.linalg.solve(a * (1.0 + 0.1 * k), np.asarray(b))
            assert float(jnp.max(jnp.abs(xB[:, k] - xk_ref))) < 1e-4


def test_pallas_banded_bdf_heat1d():
    """Full BDF solve through the Pallas banded tier (f32 preconditioner,
    interpret mode on CPU): accuracy is governed by the f64 residual."""
    from diffsol_tpu.models import heat1d
    from diffsol_tpu.solvers.bdf import BdfSolver
    from diffsol_tpu.drivers import solve_dense
    import dataclasses

    problem, _soln = heat1d.make(mgrid=15)
    spec = make_banded_solver(1, 1, kernel="pallas")
    from diffsol_tpu.ops.banded import make_banded_jac

    banded_problem = dataclasses.replace(
        problem,
        linear_solver=spec,
        eqn=dataclasses.replace(
            problem.eqn, rhs_jac=make_banded_jac(problem.eqn.rhs, 1, 1)
        ),
    )
    t_eval = jnp.asarray([0.01, 0.05, 0.1])
    sol = solve_dense(BdfSolver(banded_problem), t_eval, max_steps=2000)
    sol.raise_for_status()
    # same spatial discretization through the dense tier is the oracle
    ref = solve_dense(BdfSolver(problem), t_eval, max_steps=2000)
    err = np.max(np.abs(np.asarray(sol.ys) - np.asarray(ref.ys)))
    assert err < 1e-4, err


def test_no_pivot_band_fails_loudly_not_silently():
    """The banded tier is a NO-PIVOT LU (valid for diagonally-dominant
    MOL operators).  A system that defeats it must surface as a TYPED
    solver failure (Newton non-convergence ladder), never as silently
    wrong numbers (round-2 weak #4: the failure mode is loud)."""
    import diffsol_tpu as dt
    from diffsol_tpu.ops.banded import make_banded_solver

    n = 16

    # an oscillator chain whose iteration matrix M - c*J has near-zero
    # diagonals with +-1 off-diagonals: elimination without pivoting
    # divides by ~0 immediately
    def rhs(t, y, p):
        u = y.reshape(n // 2, 2)
        du = jnp.stack([u[:, 1] * p[0], -u[:, 0] * p[0]], axis=1)
        return du.reshape(-1)

    problem = (
        dt.OdeBuilder()
        .rhs(rhs)
        .init(lambda t, p: jnp.arange(1.0, n + 1.0))
        .p([1.0e8])  # stiff rotation: c*J dominates, zero diagonal
        .rtol(1e-8)
        .atol(1e-10)
        .linear_solver(make_banded_solver(1, 1, kernel="xla"))
        .build()
    )
    sol = dt.solve_dense(
        dt.BdfSolver(problem), jnp.asarray([0.5, 1.0]), max_steps=200
    )
    # loud: a typed failure code, and no finite-but-wrong trajectory
    assert int(sol.stop_reason) < 0
