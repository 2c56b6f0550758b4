"""Lorenz attractor from DiffSL text.

Equivalent of reference examples/lorenz-attractor-diffsl-llvm
(src/lorenz.rs): the classic chaotic system built from the same DSL text,
solved with adaptive BDF.  Here the DSL traces to JAX instead of LLVM.

Run: python examples/lorenz_attractor.py
"""

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt

LORENZ = """
    a { 14.0 } b { 10.0 } c { 8.0 / 3.0 }
    u_i {
        x = 1.0,
        y = 0.0,
        z = 0.0,
    }
    F_i {
        b * (y - x);
        x * (a - z) - y;
        x * y - c * z;
    }
"""


def main():
    problem = dt.OdeBuilder().rtol(1e-8).atol(1e-10).build_from_diffsl(LORENZ)
    solver = dt.BdfSolver(problem)
    sol = dt.solve(solver, 20.0)
    n = int(sol.n_points)
    assert int(sol.stop_reason) >= 0
    ys = sol.ys[:n]
    # the trajectory should visit both wings of the attractor (x changes
    # sign) and stay bounded
    assert float(jnp.min(ys[:, 0])) < -1.0 < 1.0 < float(jnp.max(ys[:, 0]))
    assert float(jnp.max(jnp.abs(ys))) < 60.0
    print(
        f"lorenz: {n} points to t=20, "
        f"x range [{float(jnp.min(ys[:, 0])):.2f}, "
        f"{float(jnp.max(ys[:, 0])):.2f}], "
        f"z range [{float(jnp.min(ys[:, 2])):.2f}, "
        f"{float(jnp.max(ys[:, 2])):.2f}]"
    )


if __name__ == "__main__":
    main()
