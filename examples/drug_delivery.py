"""Two-compartment PK drug delivery with periodic dosing + sensitivities.

Equivalent of reference examples/compartmental-models-drug-delivery (+ the
-declarative and -sensitivities variants): repeated bolus doses applied via
RESUMABLE staged solves -- solve to each dose time, bump the central
compartment, continue from the same restartable state (reference
set_stop_time/step loop); then parameter sensitivities d(amount)/d(CL, Qp1)
by forward sensitivity analysis.

Run: JAX_PLATFORMS=cpu python examples/drug_delivery.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt

DIFFSL = """
in_i { CL = 100.0, Qp1 = 50.0 }
Vc { 1000.0 } Vp1 { 1000.0 }
u_i {
    centralamount = 0,
    peripheralamount = 0,
}
F_i {
    - centralamount / Vc * CL - Qp1 * (centralamount / Vc - peripheralamount / Vp1),
    Qp1 * (centralamount / Vc - peripheralamount / Vp1),
}
"""


def main():
    problem = dt.OdeBuilder().rtol(1e-6).atol(1e-8).build_from_diffsl(DIFFSL)
    solver = dt.BdfSolver(problem)
    doses = [(0.0, 1000.0), (6.0, 1000.0), (12.0, 1000.0), (18.0, 1000.0)]

    from diffsol_tpu.drivers import init_state_jit

    state = init_state_jit(solver, problem.params)
    # first dose at t=0 (reference: solver.state_mut().y[0] = dose)
    state = state.replace(
        y=state.y.at[0].add(doses[0][1]),
        state_modified=jnp.asarray(True),
    )
    print(f"t = 0.0 h: central = {float(state.y[0]):8.2f} ng")
    for t_dose, dose in doses[1:]:
        sol = dt.solve(solver, t_dose, state=state, max_steps=500)
        sol.raise_for_status()
        state = sol.state
        print(f"t = {float(state.t):4.1f} h: central = "
              f"{float(state.y[0]):8.2f} ng, peripheral = "
              f"{float(state.y[1]):8.2f} ng")
        state = state.replace(
            y=state.y.at[0].add(dose),
            state_modified=jnp.asarray(True),
        )
    sol = dt.solve(solver, 24.0, state=state, max_steps=500)
    sol.raise_for_status()
    print(f"t = 24.0 h: central = {float(sol.state.y[0]):8.2f} ng")

    # --- sensitivities (reference compartmental-...-sensitivities):
    # d(amounts)/d(CL, Qp1) over one dosing interval by continuous forward
    # sensitivity analysis
    p2 = (
        dt.OdeBuilder()
        .rtol(1e-8)
        .atol(1e-10)
        .build_from_diffsl(DIFFSL)
    )

    def init_dosed(t, p):
        return jnp.array([1000.0, 0.0])

    p2 = (
        dt.OdeBuilder()
        .rhs(p2.eqn.rhs)
        .init(init_dosed)
        .p(list(jnp.asarray(p2.params)))
        .rtol(1e-8)
        .atol(1e-10)
        .build()
    )
    t_eval = jnp.linspace(1.0, 6.0, 6)
    ys, sens = dt.solve_dense_fwd_sens(dt.BdfSolver(p2, sens=True), t_eval)
    print("sensitivities at t = 6 h:")
    print(f"  d(central)/dCL  = {float(sens[0, -1, 0]):+.4f}")
    print(f"  d(central)/dQp1 = {float(sens[1, -1, 0]):+.4f}")
    assert float(sens[0, -1, 0]) < 0.0  # more clearance -> less drug


if __name__ == "__main__":
    main()
