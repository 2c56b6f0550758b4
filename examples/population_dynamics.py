"""Lotka-Volterra predator-prey population dynamics.

Equivalent of reference examples/population-dynamics: the same model built
two ways (DiffSL text and plain closures), solved adaptively, plus a
phase-plane sweep over initial conditions -- here the sweep is a lockstep
ensemble instead of a loop over solves.

Run: JAX_PLATFORMS=cpu python examples/population_dynamics.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt

DIFFSL = """
in_i { y0 = 1.0 }
a { 2.0/3.0 } b { 4.0/3.0 } c { 1.0 } d { 1.0 }
u_i {
    y1 = y0,
    y2 = y0,
}
F_i {
    a * y1 - b * y1 * y2,
    c * y1 * y2 - d * y2,
}
"""


def main():
    # --- DiffSL build (reference problem_diffsl) ---
    problem = dt.OdeBuilder().rtol(1e-6).atol(1e-8).build_from_diffsl(DIFFSL)
    sol = dt.solve(dt.BdfSolver(problem), 40.0)
    n = int(sol.n_points)
    print(f"DiffSL build: {n} steps to t=40, "
          f"final (prey, predator) = {sol.ys[n - 1]}")

    # --- closure build (reference problem_rust_closures) ---
    def rhs(t, y, p):
        return jnp.array(
            [
                2.0 / 3.0 * y[0] - 4.0 / 3.0 * y[0] * y[1],
                y[0] * y[1] - y[1],
            ]
        )

    problem2 = (
        dt.OdeBuilder()
        .rhs(rhs)
        .init(lambda t, p: jnp.array([p[0], p[0]]))
        .p([1.0])
        .rtol(1e-6)
        .atol(1e-8)
        .build()
    )
    sol2 = dt.solve(dt.ErkSolver(problem2), 40.0)  # explicit variant
    n2 = int(sol2.n_points)
    print(f"closure build (tsit45): {n2} steps, final = {sol2.ys[n2 - 1]}")

    # --- phase plane: ensemble over initial conditions (reference loops) ---
    y0s = jnp.linspace(0.4, 1.6, 8)[:, None]  # (B, 1) parameter rows
    t_eval = jnp.linspace(0.0, 12.0, 60)
    ens = dt.solve_dense_ensemble(
        dt.BdfSolver, problem2, t_eval, y0s, mode="lockstep"
    )
    ys = ens.ys  # (neval, B, 2)
    print(f"phase-plane ensemble: {y0s.shape[0]} orbits, "
          f"prey range [{float(ys[..., 0].min()):.3f}, "
          f"{float(ys[..., 0].max()):.3f}]")
    # orbits are closed: each member returns near its starting point
    assert int(ens.stop_reason) >= 0


if __name__ == "__main__":
    main()
