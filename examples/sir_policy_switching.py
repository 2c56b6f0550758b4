"""Epidemic SIR model with policy switching at an infection threshold.

Equivalent of reference examples/epidemic-sir-policy-switching: integrate an
SIR model; when infections cross a threshold, an event fires and the reset
operator toggles a lockdown flag carried as an extra state, changing the
transmission rate.

Run: python examples/sir_policy_switching.py
"""

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt


def main():
    beta_hi, beta_lo, gamma = 0.5, 0.05, 0.1
    thresh_on, thresh_off = 0.15, 0.05  # hysteresis avoids chattering

    def rhs(t, y, p):
        s, i, r, lockdown = y
        beta = jnp.where(lockdown > 0.5, p[1], p[0])
        ds = -beta * s * i
        di = beta * s * i - p[2] * i
        return jnp.array([ds, di, p[2] * i, 0.0])

    def root(t, y, p):
        # lockdown OFF: fire when i rises to thresh_on;
        # lockdown ON: fire when i falls to thresh_off
        return jnp.array(
            [jnp.where(y[3] > 0.5, y[1] - p[4], y[1] - p[3])]
        )

    def reset(t, y, p):
        return y.at[3].set(1.0 - y[3])  # toggle policy

    problem = (
        dt.OdeBuilder()
        .rhs(rhs)
        .init(lambda t, p: jnp.array([0.99, 0.01, 0.0, 0.0]))
        .root(root)
        .reset(reset)
        .p([beta_hi, beta_lo, gamma, thresh_on, thresh_off])
        .rtol(1e-8)
        .atol(1e-10)
        .build()
    )
    solver = dt.BdfSolver(problem)
    sol = dt.solve(solver, 120.0)
    n = int(sol.n_points)
    ys = sol.ys[:n]
    peak = float(jnp.max(ys[:, 1]))
    switches = int(jnp.sum(jnp.abs(jnp.diff(ys[:, 3])) > 0.5))
    print(f"peak infections {peak:.4f} (on-threshold {thresh_on}), "
          f"{switches} policy switches, final recovered {float(ys[-1, 2]):.4f}")
    assert peak < 0.2, "lockdown policy failed to cap the peak"
    assert switches >= 2


if __name__ == "__main__":
    main()
