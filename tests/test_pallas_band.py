"""Fused whole-solve BANDED Pallas BDF stepper (ops/pallas_stepper_band.py).

Runs in interpret mode on the CPU suite backend (the Mosaic path needs a
real TPU; the driver bench exercises that).  Covers: the heat1d tridiag
class vs the XLA lockstep banded path, a wider (ml=mu=2) stencil, a
banded DAE with algebraic Dirichlet rows, scope rejections, and the
high-level ensemble routing (n > 8 banded problems fall through the
small-n tier to this kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffsol_tpu as dt
from diffsol_tpu.ops.banded import make_banded_solver
from diffsol_tpu.ops.dfinterp import UnsupportedForPallas
from diffsol_tpu.ops.pallas_stepper_band import make_pallas_band_bdf_solve


def _heat1d_banded(mgrid=15, rtol=1e-6, atol=1e-8):
    """heat1d (models/heat1d.py) built explicitly through the banded tier
    so (ml, mu) rides the solver spec."""
    n = mgrid + 1
    h = 1.0 / (mgrid + 2)

    def rhs(t, y, p):
        d = p[0]
        left = jnp.concatenate([jnp.zeros_like(y[:1]), y[:-1]])
        right = jnp.concatenate([y[1:], jnp.zeros_like(y[:1])])
        return d * (left - 2.0 * y + right) / (h * h)

    def init(t, p):
        x = (jnp.arange(n) + 1.0) * h
        return jnp.where(x < 0.5, 2.0 * x, 2.0 * (1.0 - x))

    return (
        dt.OdeBuilder().rhs(rhs).init(init).p([1.0]).rtol(rtol).atol(atol)
        .linear_solver(make_banded_solver(1, 1, kernel="xla")).build()
    )


def test_band_kernel_heat1d_matches_xla_bdf():
    """Homogeneous members: the fused banded kernel matches the XLA BDF
    trajectory on the same semi-discrete ODE to solver tolerance."""
    problem = _heat1d_banded(mgrid=15)
    t_eval = [0.01, 0.05, 0.2]
    B = 4
    params = jnp.broadcast_to(jnp.asarray([[1.0]]), (B, 1))
    solve = make_pallas_band_bdf_solve(
        problem, t_eval, nbatch=B, tile=B, interpret=True
    )
    ys, status, steps = solve(params)
    assert int(jnp.min(status)) >= 0, np.asarray(status)
    assert int(steps[0]) > 10

    sol = dt.solve_dense(dt.BdfSolver(problem), jnp.asarray(t_eval))
    ref = np.asarray(sol.ys)  # (neval, n)
    got = np.asarray(ys)      # (neval, n, B)
    np.testing.assert_allclose(got[:, :, 0], ref, rtol=2e-4, atol=1e-6)
    # all members identical parameters -> identical trajectories
    np.testing.assert_allclose(
        got, np.broadcast_to(got[:, :, :1], got.shape), rtol=0, atol=1e-12
    )


def test_band_kernel_heterogeneous_members():
    """Per-member diffusivities through the lane axis: each member matches
    its own single-instance XLA solve (faster diffusion decays faster)."""
    problem = _heat1d_banded(mgrid=11)
    t_eval = [0.02, 0.1]
    B = 3
    dvals = jnp.asarray([0.5, 1.0, 2.0])
    params = dvals[:, None]
    solve = make_pallas_band_bdf_solve(
        problem, t_eval, nbatch=B, tile=B, interpret=True
    )
    ys, status, _ = solve(params)
    assert int(jnp.min(status)) >= 0
    got = np.asarray(ys)
    for b in range(B):
        sol = dt.solve_dense(
            dt.BdfSolver(problem), jnp.asarray(t_eval),
            params=jnp.asarray([float(dvals[b])]),
        )
        np.testing.assert_allclose(
            got[:, :, b], np.asarray(sol.ys), rtol=5e-4, atol=1e-6
        )
    # ordering: larger d decays faster at the midpoint
    mid = got[-1, got.shape[1] // 2, :]
    assert mid[0] > mid[1] > mid[2]


def test_band_kernel_wide_band():
    """ml = mu = 2 (4th-order 5-point stencil) exercises the multi-column
    update windows of the no-pivot band LU and the >1-color probes."""
    n = 17
    h = 1.0 / (n + 1)

    def rhs(t, y, p):
        z2 = jnp.zeros_like(y[:2])
        z1 = jnp.zeros_like(y[:1])
        ym2 = jnp.concatenate([z2, y[:-2]])
        ym1 = jnp.concatenate([z1, y[:-1]])
        yp1 = jnp.concatenate([y[1:], z1])
        yp2 = jnp.concatenate([y[2:], z2])
        return p[0] * (
            -ym2 + 16.0 * ym1 - 30.0 * y + 16.0 * yp1 - yp2
        ) / (12.0 * h * h)

    def init(t, p):
        # polynomial bump (the kernel interpreter has no transcendentals)
        x = (jnp.arange(n) + 1.0) * h
        return 4.0 * x * (1.0 - x)

    problem = (
        dt.OdeBuilder().rhs(rhs).init(init).p([1.0]).rtol(1e-6).atol(1e-8)
        .linear_solver(make_banded_solver(2, 2, kernel="xla")).build()
    )
    t_eval = [0.02, 0.1]
    B = 2
    params = jnp.broadcast_to(jnp.asarray([[1.0]]), (B, 1))
    solve = make_pallas_band_bdf_solve(
        problem, t_eval, nbatch=B, tile=B, interpret=True
    )
    ys, status, _ = solve(params)
    assert int(jnp.min(status)) >= 0
    sol = dt.solve_dense(dt.BdfSolver(problem), jnp.asarray(t_eval))
    np.testing.assert_allclose(
        np.asarray(ys)[:, :, 0], np.asarray(sol.ys), rtol=5e-4, atol=1e-6
    )


def test_band_kernel_dae_dirichlet_rows():
    """Banded DAE: reaction-diffusion with ALGEBRAIC Dirichlet boundary
    rows (mass diag 0 at both ends).  The constraint rows pin u = 0 on
    the boundary through the whole solve."""
    n = 13
    h = 1.0 / (n - 1)

    def rhs(t, y, p):
        d = p[0]
        interior = d * (y[:-2] - 2.0 * y[1:-1] + y[2:]) / (h * h)
        return jnp.concatenate([y[:1], interior, y[-1:]])

    def init(t, p):
        # polynomial bump, zero at both (algebraic) boundary rows
        x = jnp.arange(n) * h
        return 4.0 * x * (1.0 - x)

    mass_diag = jnp.concatenate(
        [jnp.zeros(1), jnp.ones(n - 2), jnp.zeros(1)]
    )

    problem = (
        dt.OdeBuilder().rhs(rhs).init(init)
        .mass(lambda t, p: jnp.diag(mass_diag))
        .p([1.0]).rtol(1e-6).atol(1e-8)
        .linear_solver(make_banded_solver(1, 1, kernel="xla")).build()
    )
    t_eval = [0.02, 0.1]
    B = 2
    params = jnp.broadcast_to(jnp.asarray([[1.0]]), (B, 1))
    solve = make_pallas_band_bdf_solve(
        problem, t_eval, nbatch=B, tile=B, interpret=True
    )
    ys, status, _ = solve(params)
    assert int(jnp.min(status)) >= 0
    got = np.asarray(ys)
    # algebraic boundary rows pinned to zero along the trajectory
    np.testing.assert_allclose(got[:, 0, :], 0.0, atol=1e-9)
    np.testing.assert_allclose(got[:, -1, :], 0.0, atol=1e-9)
    sol = dt.solve_dense(dt.BdfSolver(problem), jnp.asarray(t_eval))
    np.testing.assert_allclose(
        got[:, :, 0], np.asarray(sol.ys), rtol=5e-4, atol=1e-6
    )


def test_band_kernel_scope_rejections():
    # no banded routing and no explicit ml/mu
    from diffsol_tpu.models import robertson

    prob = robertson.problem_ode()
    with pytest.raises(UnsupportedForPallas, match="banded"):
        make_pallas_band_bdf_solve(prob, [1.0], nbatch=4, interpret=True)


def test_ensemble_routes_banded_through_fused():
    """solve_dense_ensemble(mode='fused') falls through the small-n tier
    (n > 8) to the banded kernel and wraps the Solution surface."""
    from diffsol_tpu.ensemble import solve_dense_ensemble

    problem = _heat1d_banded(mgrid=11)
    t_eval = [0.02, 0.1]
    B = 3
    params = jnp.asarray([[0.5], [1.0], [2.0]])
    sol = solve_dense_ensemble(
        dt.BdfSolver, problem, t_eval, params, mode="fused", interpret=True
    )
    assert int(sol.stop_reason) >= 0
    assert sol.ys.shape == (2, B, 12)
    sol_l = solve_dense_ensemble(
        dt.BdfSolver, problem, t_eval,
        params.astype(jnp.float64), mode="lockstep",
    )
    np.testing.assert_allclose(
        np.asarray(sol.ys), np.asarray(sol_l.ys), rtol=5e-4, atol=1e-6
    )


def test_band_kernel_lu_growth_fails_loudly():
    """The in-kernel no-pivot band LU monitors Wilkinson element growth
    during factorization and fails the solve with a TYPED status when it
    blows up (round-4 weak #5: the XLA band tier fails loudly via the
    Newton ladder, tests/test_banded.py no_pivot_band_fails_loudly; the
    kernel tier must never return silently degraded numbers instead)."""
    from diffsol_tpu import errors
    from diffsol_tpu.ensemble import solve_dense_ensemble
    from diffsol_tpu.ops import pallas_stepper as ps

    # semi-explicit DAE chain of 3-row motifs
    #   y0' = y0;   0 = y0 - y2;   y2' = y1 - y2
    # whose iteration matrix A = M - cJ per motif is
    #   [[1-c, 0, 0], [-c, 0, c], [0, -c, 1+c]]
    # det = (1-c) c^2 != 0 (nonsingular; a PIVOTING solver handles it),
    # but elimination without pivoting hits an EXACTLY zero Schur pivot
    # on every algebraic row (A11' = 0 - l10*U01 = 0 since U01 = 0), so
    # the next multiplier is inf and the Schur update poisons the band
    # with inf/nan -- the growth monitor must fail the solve loudly.
    n = 12
    M0 = np.asarray(np.arange(n) % 3 == 0, np.float64)
    M1 = np.asarray(np.arange(n) % 3 == 1, np.float64)
    M2 = np.asarray(np.arange(n) % 3 == 2, np.float64)
    mass_diag = 1.0 - M1  # algebraic rows are the i%3==1 constraints

    def rhs(t, y, p):
        left = jnp.concatenate([jnp.zeros_like(y[:1]), y[:-1]])
        right = jnp.concatenate([y[1:], jnp.zeros_like(y[:1])])
        return p[0] * (
            M0 * y + M1 * (left - right) + M2 * (left - y)
        )

    # init satisfies the constraints exactly: y[3k] = y[3k+2]
    y_init = M0 + M2  # [1, 0, 1, 1, 0, 1, ...]

    problem = (
        dt.OdeBuilder()
        .rhs(rhs)
        .init(lambda t, p: jnp.asarray(y_init))
        .mass(lambda t, p: jnp.diag(jnp.asarray(mass_diag)))
        .p([1.0])
        .rtol(1e-6)
        .atol(1e-8)
        .linear_solver(make_banded_solver(1, 1, kernel="xla"))
        .build()
    )
    B = 4
    solve = make_pallas_band_bdf_solve(
        problem, [0.5, 1.0], nbatch=B, tile=B, max_steps=200,
        interpret=True,
    )
    params = jnp.broadcast_to(jnp.asarray([[1.0]]), (B, 1))
    ys, status, _steps = solve(params)
    assert int(jnp.min(status)) == ps._FAIL_LU_GROWTH, np.asarray(status)
    # loud: the poisoned tile carries NaNs, not finite-but-wrong numbers
    assert not np.any(np.isfinite(np.asarray(ys)))

    # and through the public ensemble surface it maps to the same typed
    # error the XLA band tier raises
    sol = solve_dense_ensemble(
        dt.BdfSolver, problem, [0.5, 1.0], params, mode="fused",
        max_steps=200, interpret=True,
    )
    assert int(sol.stop_reason) == errors.TOO_MANY_NONLINEAR_SOLVER_FAILURES


@pytest.mark.slow
def test_band_kernel_foodweb_dae():
    """The reference's foodweb DAE (foodweb.rs; reflect-pad Laplacian +
    einsum interaction rates + INCONSISTENT raw initial conditions that
    IDA's calc_ic corrects) runs END-TO-END through the banded fused
    kernel: the host-side f64 init performs the per-member consistent-IC
    solve, the vectorized df interpreter covers rev/dot_general, and the
    trajectory matches the XLA f64 path to solver tolerance."""
    from diffsol_tpu.models import foodweb

    prob = foodweb.make(nx=4)
    t_eval = [0.01]
    solve = make_pallas_band_bdf_solve(
        prob, t_eval, nbatch=2, tile=2, max_steps=300, interpret=True
    )
    ys, status, steps = solve(jnp.ones((2, 1)))
    assert int(jnp.min(status)) >= 0, np.asarray(status)
    assert int(steps[0]) > 10
    sol = dt.solve_dense(dt.BdfSolver(prob), jnp.asarray(t_eval),
                         max_steps=300)
    ref = np.asarray(sol.ys)
    got = np.asarray(ys)[:, :, 0]
    rel = np.max(np.abs(got - ref) / (np.abs(ref) + 1e-30))
    assert rel < 5e-4, rel
