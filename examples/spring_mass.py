"""Damped spring-mass system with an event at maximum compression.

Equivalent of reference examples/spring-mass-system: integrate
m x'' + c x' + k x = 0 as a first-order system, find the first zero of the
velocity (a root-finding event) and report the first oscillation extremum.

Run: python examples/spring_mass.py
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt


def main():
    m, c, k = 1.0, 0.3, 4.0

    def rhs(t, y, p):
        x, v = y
        return jnp.array([v, -(p[2] * x + p[1] * v) / p[0]])

    problem = (
        dt.OdeBuilder()
        .rhs(rhs)
        .init(lambda t, p: jnp.array([1.0, 0.0]))
        .root(lambda t, y, p: jnp.array([y[1]]))  # velocity zero crossing
        .p([m, c, k])
        .rtol(1e-10)
        .atol(1e-12)
        .build()
    )
    solver = dt.solver(problem, "tsit45")
    sol = dt.solve(solver, 10.0)
    assert int(sol.stop_reason) == dt.errors.ROOT_FOUND
    t_ext, x_ext = float(sol.state.t), float(sol.state.y[0])
    # analytic: underdamped, extremum at t = pi/omega_d
    wd = np.sqrt(k / m - (c / (2 * m)) ** 2)
    t_exact = np.pi / wd
    print(f"first extremum at t={t_ext:.6f} (exact {t_exact:.6f}), "
          f"x={x_ext:.6f}")
    np.testing.assert_allclose(t_ext, t_exact, rtol=1e-6)


if __name__ == "__main__":
    main()
