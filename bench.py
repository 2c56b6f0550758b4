"""Headline benchmark: 10k-member lockstep Robertson ensemble on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.md north star): solve a 10,000-member Robertson stiff-ODE
parameter ensemble (k1 perturbed ±10%) to t = 4e5 with the lockstep BDF
solver (shared adaptive steps, batched Newton + batched dense LU on the MXU).
``value`` is the per-instance wall time in microseconds.

``vs_baseline`` is the speedup over single-thread diffsol per instance,
using a 1.0 ms per-solve estimate for diffsol's robertson_ode at these
tolerances on the reference EPYC hardware (diffsol publishes only relative
numbers -- book/src/benchmarks/sundials.md; CVODE/diffsol robertson solves
are ~1 ms class).  The BASELINE.json target is vs_baseline >= 50.
"""

import json
import time

import jax
import jax.numpy as jnp

DIFFSOL_PER_INSTANCE_S = 1.0e-3  # single-thread diffsol estimate (see docstring)
NBATCH = 10_000


def main():
    # f64 for stiff-tolerance parity; XLA emulates f64 on TPU.
    jax.config.update("jax_enable_x64", True)

    from diffsol_tpu.ensemble import make_lockstep_problem
    from diffsol_tpu.drivers import solve_dense
    from diffsol_tpu.models import robertson
    from diffsol_tpu.solvers.bdf import BdfSolver

    problem = robertson.problem_ode()
    lp = make_lockstep_problem(problem, NBATCH)
    k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, NBATCH))
    params = jnp.stack(
        [k1, jnp.full((NBATCH,), 1.0e4), jnp.full((NBATCH,), 3.0e7)], axis=1
    ).astype(lp.params.dtype)
    solver = BdfSolver(lp)
    t_eval = jnp.asarray([0.4, 4.0, 40.0, 400.0, 4000.0, 4.0e4, 4.0e5])

    def run(pb):
        state = solver.init_state(pb)
        return solve_dense(solver, t_eval, params=pb, state=state, max_steps=5000)

    def sync(sol):
        # NB: on the axon tunnel backend block_until_ready does NOT block;
        # force a device->host scalar read to time real execution
        return float(jnp.sum(sol.ys))

    # warmup/compile
    sol = run(params)
    sync(sol)
    assert int(sol.stop_reason) >= 0, f"solve failed: {int(sol.stop_reason)}"

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sol = run(params)
        sync(sol)
        best = min(best, time.perf_counter() - t0)

    # sanity: mass conservation across the ensemble (ys is (neval, 3, B))
    cons = float(jnp.max(jnp.abs(sol.ys.sum(axis=1) - 1.0)))
    assert cons < 1e-3, f"conservation violated: {cons}"

    per_instance_us = best / NBATCH * 1e6
    vs_baseline = DIFFSOL_PER_INSTANCE_S / (best / NBATCH)
    print(
        json.dumps(
            {
                "metric": "robertson_10k_lockstep_ensemble_per_instance",
                "value": round(per_instance_us, 3),
                "unit": "us",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
