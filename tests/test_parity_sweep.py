"""North-star trajectory-parity sweep at rtol = 1e-6 (BASELINE.json).

Every model in the suite is solved at rtol=1e-6/atol=1e-8 and compared
against its analytic solution or the reference's published solution values
(reference test_models/*.rs data tables / IDA & CVODE example output).
This is the "reproduce diffsol trajectories at rtol=1e-6 across the example
suite" criterion as one parametrized test.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import diffsol_tpu as dt
from diffsol_tpu.drivers import solve_dense
from diffsol_tpu.models import (
    exponential_decay,
    exponential_decay_algebraic,
    heat1d,
    logistic,
    misc,
    robertson,
)

RTOL = 1e-6
ATOL = 1e-8
# integration-accuracy budget for exact-solution comparisons: a few orders
# above rtol covers global-error accumulation over the horizon
CHECK = 200 * RTOL


def _tight(problem):
    return dataclasses.replace(
        problem,
        rtol=jnp.asarray(RTOL, problem.rtol.dtype),
        atol=jnp.full_like(problem.atol, ATOL),
    )


def case_exponential_decay():
    pr = exponential_decay.problem(rtol=RTOL, atol=ATOL)
    t = jnp.asarray([0.25, 0.5, 1.0])
    exact = np.exp(-0.1 * np.asarray(t))[:, None] * np.ones(2)
    return pr, t, exact


def case_logistic():
    pr = logistic.problem(rtol=RTOL, atol=ATOL)
    t = jnp.asarray([1.0, 5.0, 10.0])
    exact = np.asarray(logistic.soln(np.asarray(t), np.asarray(pr.params)))
    return pr, t, exact


def case_gaussian_decay():
    pr = _tight(misc.gaussian_decay_problem())
    t = jnp.asarray([0.5, 1.0])
    exact = np.asarray(misc.gaussian_decay_soln(np.asarray(t), np.asarray(pr.params)))
    return pr, t, exact


def case_dydt_y2():
    pr = _tight(misc.dydt_y2_problem())
    t = jnp.asarray([0.4, 0.8])
    exact = np.asarray(misc.dydt_y2_soln(np.asarray(t)))
    return pr, t, exact


def case_exponential_decay_algebraic():
    pr = _tight(exponential_decay_algebraic.problem())
    t = jnp.asarray([0.4, 0.8])
    exact = np.asarray(exponential_decay_algebraic.soln(np.asarray(t), np.asarray(pr.params)))
    return pr, t, exact


CASES = {
    "exponential_decay": case_exponential_decay,
    "logistic": case_logistic,
    "gaussian_decay": case_gaussian_decay,
    "dydt_y2": case_dydt_y2,
    "exponential_decay_algebraic": case_exponential_decay_algebraic,
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("method", ["bdf", "tr_bdf2", "tsit45"])
def test_exact_solution_parity(name, method):
    pr, t_eval, exact = CASES[name]()
    if method == "tsit45" and pr.eqn.mass is not None:
        pytest.skip("explicit RK cannot integrate DAEs")
    solver = dt.solver(pr, method)
    sol = solve_dense(solver, t_eval, max_steps=40_000)
    sol.raise_for_status()
    err = np.max(np.abs(np.asarray(sol.ys) - exact) / (np.abs(exact) + 1e-3))
    assert err < CHECK, (name, method, err)


def test_robertson_dae_ida_decades():
    """Robertson DAE vs the IDA reference solution over 8 time decades
    (reference robertson.rs data / idaRoberts output) at rtol=1e-6."""
    pr = robertson.problem_dae(rtol=RTOL, atol=(1e-10, 1e-8, 1e-8))
    decades = jnp.asarray([0.4, 4.0, 40.0, 400.0, 4e3, 4e4, 4e5, 4e6])
    expected = np.array([
        [9.851641e-01, 3.386242e-05, 1.480205e-02],
        [9.055097e-01, 2.240338e-05, 9.446793e-02],
        [7.158017e-01, 9.185037e-06, 2.841892e-01],
        [4.505360e-01, 3.223271e-06, 5.494608e-01],
        [1.832299e-01, 8.944378e-07, 8.167692e-01],
        [3.898902e-02, 1.622006e-07, 9.610108e-01],
        [4.936383e-03, 1.984224e-08, 9.950636e-01],
        [5.168093e-04, 2.068293e-09, 9.994832e-01],
    ])
    sol = solve_dense(dt.solver(pr, "bdf"), decades, max_steps=40_000)
    sol.raise_for_status()
    # the published table is IDA output at ITS tolerances (printed to 7
    # digits from an rtol=1e-4 run) -- 1e-3 relative is table precision
    np.testing.assert_allclose(
        np.asarray(sol.ys), expected, rtol=1e-3, atol=1e-10
    )


def test_heat1d_self_convergence():
    """heat1d MOL at rtol=1e-6 vs a tight-tolerance oracle of the SAME
    semidiscrete system (spatial error excluded by construction)."""
    pr, _ = heat1d.make(mgrid=20, rtol=RTOL, atol=ATOL)
    pr_tight, _ = heat1d.make(mgrid=20, rtol=1e-10, atol=1e-12)
    t = jnp.asarray([0.01, 0.05, 0.1])
    ys = solve_dense(dt.solver(pr, "bdf"), t, max_steps=40_000).ys
    ys_o = solve_dense(dt.solver(pr_tight, "bdf"), t, max_steps=40_000).ys
    assert np.max(np.abs(np.asarray(ys) - np.asarray(ys_o))) < CHECK
