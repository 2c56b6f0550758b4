"""Solver comparison under frequent state-mutation events.

Equivalent of reference examples/performance-solver-events (src/main.rs):
a stiff 2-state linear system is integrated across 100 stop-time events
spaced 0.05 apart; at each event the solver state is mutated in place
(y += 1) and the solve resumes from the restartable state checkpoint --
the staged-solve protocol (reference set_stop_time + state_mut,
method.rs:56-70).  BDF, TR-BDF2 and ESDIRK34 are compared on wall time
and solver statistics.

Model (main.rs LAMBDA_SLOW/FAST): dy0/dt = -y0,
dy1/dt = 999*y0 - 1000*y1, rtol=1e-8/atol=1e-10.

Run: python examples/solver_events_performance.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt

EVENT_INTERVAL = 0.05
NUM_EVENTS = 101
LAMBDA_SLOW, LAMBDA_FAST = 1.0, 1000.0


def make_problem():
    def rhs(t, y, p):
        return jnp.array(
            [
                -LAMBDA_SLOW * y[0],
                (LAMBDA_FAST - LAMBDA_SLOW) * y[0] - LAMBDA_FAST * y[1],
            ]
        )

    return (
        dt.OdeBuilder()
        .rhs(rhs)
        .init(lambda t, p: jnp.array([1.0, 1.0]))
        .rtol(1e-8)
        .atol(1e-10)
        .build()
    )


def run_staged(solver_name: str):
    problem = make_problem()
    solver = dt.solver(problem, solver_name)
    state = dt.drivers.init_state_jit(solver, problem.params)

    # warmup: compile the staged solve once (final_time is a traced arg,
    # so all 100 stages share one executable)
    sol = dt.solve(solver, EVENT_INTERVAL, state=state, max_steps=2000)
    float(sol.ys[0, 0])

    state = dt.drivers.init_state_jit(solver, problem.params)
    t0 = time.perf_counter()
    for k in range(1, NUM_EVENTS):
        sol = dt.solve(
            solver, EVENT_INTERVAL * k, state=state, max_steps=2000
        )
        state = sol.state
        # the event: mutate the solver state in place (reference
        # state_mut(); state_modified makes the stepper re-initialize
        # its difference history from the new point)
        state = state.replace(
            y=state.y + 1.0, state_modified=jnp.asarray(True)
        )
        if hasattr(solver, "reinit_after_reset"):
            state = solver.reinit_after_reset(state, problem.params)
    y_final = [float(v) for v in state.y]
    elapsed = time.perf_counter() - t0
    stats = state.stats
    return {
        "solver": solver_name,
        "elapsed_s": elapsed,
        "steps": int(stats.steps),
        "error_test_fails": int(stats.error_test_failures),
        "newton_iters": int(stats.newton_iterations),
        "final_state": y_final,
    }


def main():
    rows = [run_staged(name) for name in ("bdf", "tr_bdf2", "esdirk34")]
    print(
        f"{'solver':<10} {'time (s)':>9} {'steps':>7} "
        f"{'err fails':>9} {'newton':>7}"
    )
    for r in rows:
        print(
            f"{r['solver']:<10} {r['elapsed_s']:>9.3f} {r['steps']:>7} "
            f"{r['error_test_fails']:>9} {r['newton_iters']:>7}"
        )
    # all solvers must agree on the final state (per-stage local error
    # ~rtol accumulates across the 100 restarts)
    ref = rows[0]["final_state"]
    for r in rows[1:]:
        for a, b in zip(ref, r["final_state"]):
            assert abs(a - b) < 1e-4, (ref, r)
    print(f"final state {ref} (all solvers agree)")


if __name__ == "__main__":
    main()
