"""Bouncing ball: event root-finding + state reset.

Equivalent of reference examples/bouncing-ball: a ball under gravity with a
root function at ground contact (y = 0) and a reset that reverses the
velocity with a restitution coefficient.  The solve auto-continues through
each bounce (reference root/reset protocol, lib.rs:194-213).

Run: python examples/bouncing_ball.py
"""

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt


def main():
    g, e = 9.81, 0.8  # gravity, restitution

    problem = (
        dt.OdeBuilder()
        .rhs(lambda t, y, p: jnp.array([y[1], -p[0]]))
        .init(lambda t, p: jnp.array([10.0, 0.0]))  # height 10, at rest
        .root(lambda t, y, p: jnp.array([y[0]]))  # ground contact
        .reset(lambda t, y, p: jnp.array([1e-9, -p[1] * y[1]]))  # bounce
        .p([g, e])
        .rtol(1e-8)
        .atol(1e-10)
        .build()
    )
    solver = dt.ErkSolver(problem)
    sol = dt.solve(solver, 8.0)
    n = int(sol.n_points)
    ts, ys = sol.ts[:n], sol.ys[:n]
    bounces = int(jnp.sum((ys[1:, 1] > 0) & (ys[:-1, 1] < 0)))
    print(f"integrated to t={float(ts[-1]):.3f} with {n} points, "
          f"{bounces} bounces, final height {float(ys[-1, 0]):.4f}")
    # first bounce at t = sqrt(2 h0 / g)
    t1 = (2 * 10.0 / g) ** 0.5
    heights = ys[:, 0]
    assert float(jnp.min(heights)) > -1e-6, "ball went through the floor"
    print(f"first impact expected at t={t1:.4f}")


if __name__ == "__main__":
    main()
