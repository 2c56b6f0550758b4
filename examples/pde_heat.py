"""1D heat equation by method of lines on the banded linear-solver tier.

Equivalent of reference examples/pde-heat: the tridiagonal MOL Jacobian is
handled by the banded LU (the KLU-replacement path) with a 3-probe cyclic
coloring Jacobian.

Run: python examples/pde_heat.py
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt
from diffsol_tpu.models import heat1d
from diffsol_tpu.ops.banded import make_banded_jac, make_banded_solver


def main():
    mgrid = 50
    problem, soln = heat1d.make(mgrid=mgrid)
    eqn = dataclasses.replace(
        problem.eqn, rhs_jac=make_banded_jac(problem.eqn.rhs, 1, 1)
    )
    problem = dataclasses.replace(
        problem, eqn=eqn, linear_solver=make_banded_solver(1, 1)
    )
    solver = dt.BdfSolver(problem)
    t_eval = jnp.asarray([0.5, 0.52, 0.54])
    sol = dt.solve_dense(solver, t_eval)
    expected = soln(np.asarray(t_eval))
    err = float(np.max(np.abs(np.asarray(sol.ys) - expected)))
    print(f"{mgrid + 1}-point MOL heat solve on the banded tier: "
          f"{int(sol.state.stats.steps)} steps, max error {err:.2e}")
    assert err < 1e-4


if __name__ == "__main__":
    main()
