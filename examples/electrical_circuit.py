"""RLC circuit as a linear DAE with a singular mass matrix.

Equivalent of reference examples/electrical-circuits: a driven RC network
where Kirchhoff's current law is an algebraic constraint.  States:
[v_c (capacitor voltage), i_r (resistor current)], with

    C dv_c/dt = i_c = i_in(t) - i_r        (differential)
    0         = v_c - i_r R                (algebraic: Ohm's law)

Run: python examples/electrical_circuit.py
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt


def main():
    R, C, I0 = 2.0, 0.5, 1.0  # ohms, farads, amps (DC source)

    def rhs(t, y, p):
        v_c, i_r = y
        return jnp.array([(p[2] - i_r) / p[1], v_c - i_r * p[0]])

    def mass(t, p):
        return jnp.diag(jnp.array([1.0, 0.0]))

    problem = (
        dt.OdeBuilder()
        .rhs(rhs)
        .init(lambda t, p: jnp.array([0.0, 0.0]))
        .mass(mass)
        .p([R, C, I0])
        .rtol(1e-8)
        .atol(1e-10)
        .build()
    )
    solver = dt.BdfSolver(problem)
    t_eval = jnp.linspace(0.0, 5.0, 11)
    sol = dt.solve_dense(solver, t_eval)
    # analytic: v_c = I0 R (1 - exp(-t/(RC))), i_r = v_c / R
    t = np.asarray(t_eval)
    v_exact = I0 * R * (1.0 - np.exp(-t / (R * C)))
    np.testing.assert_allclose(np.asarray(sol.ys[:, 0]), v_exact, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sol.ys[:, 1]), v_exact / R, rtol=1e-6
    )
    print(f"capacitor charges to {float(sol.ys[-1, 0]):.4f} V "
          f"(asymptote {I0 * R} V); KCL constraint satisfied throughout")


if __name__ == "__main__":
    main()
