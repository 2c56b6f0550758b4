"""Forward sensitivities.

Two routes, mirroring the reference's continuous sensitivity equations
(reference crates/diffsol/src/ode_equations/sens_equations.rs,
ode_solver/sensitivities.rs `solve_dense_sensitivities`) and adding the
JAX-idiomatic alternative the reference cannot offer:

1. **Differentiate-the-solver** (:func:`solve_dense_fwd_sens`): forward-mode
   AD (``jax.jacfwd``) straight through the jitted adaptive solve.  The
   while-loop carry is jvp-transported, so the sensitivities are the exact
   derivatives of the discrete solution the solver produced.  This replaces
   the reference's hand-built SensEquations machinery with ~10 lines.

2. **Continuous sensitivity equations** integrated in lockstep with the
   main equation sharing the factorized ``M - c J`` (reference parity,
   including sensitivity error control): enabled with
   ``BdfSolver(problem, sens=True)`` -- see
   :mod:`diffsol_tpu.solvers.bdf_sens`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .drivers import init_state_jit, solve_dense


def solve_dense_fwd_sens(solver, t_eval, params=None, max_steps: int = 100_000):
    """Solution + forward sensitivities dy/dp by jacfwd through the solve.

    Returns ``(ys, sens)`` with ``ys``: (neval, n) and ``sens``:
    (nparams, neval, n) (matching the reference's solve_dense_sensitivities
    layout, sensitivities.rs).
    """
    p = solver.problem
    params = p.params if params is None else jnp.asarray(params)

    def ys_of(pp):
        state = init_state_jit(solver, pp)
        return solve_dense(
            solver, t_eval, params=pp, state=state, max_steps=max_steps
        ).ys

    ys = ys_of(params)
    sens = jax.jacfwd(ys_of)(params)  # (neval, n, nparams)
    return ys, jnp.moveaxis(sens, -1, 0)
