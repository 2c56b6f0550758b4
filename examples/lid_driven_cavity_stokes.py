"""Lid-driven cavity Stokes flow via the ODE solver (method of lines).

Equivalent in role to reference examples/lid-driven-cavity-stokes (a FEM
Stokes system time-stepped with TSIT45 over precomputed operator data): a
vorticity-streamfunction formulation on a uniform grid, with the Poisson
solve for the streamfunction folded into the RHS as a precomputed dense
inverse (setup-time numpy, like the reference's presolved L factor), and
Thom's formula driving the lid.  Integrated to steady state with the
explicit solver; the primary-vortex strength converges.

Run: JAX_PLATFORMS=cpu python examples/lid_driven_cavity_stokes.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt


def main():
    m = 17  # grid points per side (interior (m-2)^2 vorticity states)
    nu = 0.1
    h = 1.0 / (m - 1)
    mi = m - 2

    # interior 5-point Laplacian (dense; presolved inverse plays the role
    # of the reference's factored L operator)
    n = mi * mi
    L = np.zeros((n, n))
    for j in range(mi):
        for i in range(mi):
            k = j * mi + i
            L[k, k] = -4.0
            for dj, di in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                jj, ii = j + dj, i + di
                if 0 <= jj < mi and 0 <= ii < mi:
                    L[k, jj * mi + ii] = 1.0
    L /= h * h
    Linv = jnp.asarray(np.linalg.inv(L))

    def rhs(t, w, p):
        # psi solves lap(psi) = -w (psi = 0 on all walls)
        psi = (Linv @ (-w)).reshape(mi, mi)
        psi_full = jnp.zeros((m, m)).at[1:-1, 1:-1].set(psi)
        # boundary vorticity (Thom): w_wall = -2 psi_1 / h^2 (+ lid term)
        lid = p[0]
        w_full = jnp.zeros((m, m)).at[1:-1, 1:-1].set(w.reshape(mi, mi))
        w_full = w_full.at[0, :].set(-2.0 * psi_full[1, :] / h**2)
        w_full = w_full.at[-1, :].set(
            -2.0 * psi_full[-2, :] / h**2 - 2.0 * lid / h
        )
        w_full = w_full.at[:, 0].set(-2.0 * psi_full[:, 1] / h**2)
        w_full = w_full.at[:, -1].set(-2.0 * psi_full[:, -2] / h**2)
        # Stokes: dw/dt = nu * lap(w) (no advection)
        lap = (
            w_full[:-2, 1:-1] + w_full[2:, 1:-1]
            + w_full[1:-1, :-2] + w_full[1:-1, 2:]
            - 4.0 * w_full[1:-1, 1:-1]
        ) / h**2
        return (nu * lap).reshape(-1)

    problem = (
        dt.OdeBuilder()
        .rhs(rhs)
        .init(lambda t, p: jnp.zeros((n,)))
        .p([1.0])  # lid velocity
        .rtol(1e-6)
        .atol(1e-8)
        .build()
    )
    t_eval = jnp.asarray([0.5, 1.0, 2.0, 4.0])
    sol = dt.solve_dense(dt.ErkSolver(problem), t_eval, max_steps=20_000)
    sol.raise_for_status()
    for k, t in enumerate(t_eval):
        w = sol.ys[k]
        psi = Linv @ (-w)
        print(f"t = {float(t):4.1f}: primary vortex |psi|_max = "
              f"{float(jnp.max(jnp.abs(psi))):.5f}")
    # steady state: last two outputs agree
    p3 = float(jnp.max(jnp.abs(Linv @ (-sol.ys[2]))))
    p4 = float(jnp.max(jnp.abs(Linv @ (-sol.ys[3]))))
    assert abs(p4 - p3) / p4 < 1e-3, "not converged to steady cavity flow"
    print(f"steady-state Stokes cavity vortex strength: {p4:.5f}")


if __name__ == "__main__":
    main()
