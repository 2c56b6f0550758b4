"""Fit Lotka-Volterra parameters with forward sensitivities (Gauss-Newton).

Equivalent of reference examples/predator-prey-fitting-forward (argmin with
forward sensitivities): here `solve_dense_fwd_sens` (jacfwd through the
solver) supplies the residual Jacobian for a Gauss-Newton loop.

Run: python examples/predator_prey_fitting.py
"""

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt
from diffsol_tpu.sens import solve_dense_fwd_sens


def main():
    def rhs(t, y, p):
        a, b, c, d = p
        return jnp.array([a * y[0] - b * y[0] * y[1], c * y[0] * y[1] - d * y[1]])

    def init(t, p):
        return jnp.array([1.0, 0.5])

    def make(p):
        return (
            dt.OdeBuilder().rhs(rhs).init(init).p(p).rtol(1e-8).atol(1e-10).build()
        )

    t_eval = jnp.linspace(0.0, 12.0, 30)
    true_p = jnp.array([1.1, 0.9, 0.8, 1.05])
    data = dt.solve_dense(dt.BdfSolver(make(true_p)), t_eval).ys

    p = jnp.array([1.0, 1.0, 1.0, 1.0])
    problem = make(p)
    solver = dt.BdfSolver(problem)
    for it in range(8):
        ys, sens = solve_dense_fwd_sens(solver, t_eval, params=p)
        r = (ys - data).reshape(-1)
        J = jnp.moveaxis(sens, 0, -1).reshape(-1, 4)  # (neval*n, nparams)
        # Gauss-Newton with Levenberg damping
        jtj = J.T @ J + 1e-8 * jnp.eye(4)
        step = jnp.linalg.solve(jtj, J.T @ r)
        p = p - step
        print(f"iter {it} |r| {float(jnp.linalg.norm(r)):.3e} p {p}")
    assert float(jnp.max(jnp.abs(p - true_p))) < 1e-5
    print(f"recovered p = {p}")


if __name__ == "__main__":
    main()
