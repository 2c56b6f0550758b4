"""Round-3 perf recon: t=4e10-matched robertson solve + B-scaling decomposition.

Questions (VERDICT r2 weak #1 / next #2):
  1. What does the APPLES-TO-APPLES workload cost -- identical params
     across members (the reference's shared-parameter groups), the
     reference's own t-span to 4e10, rtol=1e-4?  diffsol's published
     ngroups=10k number is 0.1340 s.
  2. How does total time scale with B (fixed program overhead vs
     per-member compute)?  steps and time/step at each point.

Run on the real TPU: python scripts/profile_r3_overhead.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/diffsol_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diffsol_tpu.drivers import solve_dense
from diffsol_tpu.ensemble import make_lockstep_problem
from diffsol_tpu.models import robertson
from diffsol_tpu.solvers.bdf import BdfSolver

T_EVAL_4E10 = [4.0 * 10.0**k for k in range(-1, 11)]  # 0.4 ... 4e10
T_EVAL_4E5 = [4.0 * 10.0**k for k in range(-1, 6)]


def run(nbatch, t_eval, rtol=1e-4, atol=1e-6, dtype=None, spread=True,
        max_steps=5000):
    problem = robertson.problem_ode(rtol=rtol, atol=atol, dtype=dtype)
    lp = make_lockstep_problem(problem, nbatch)
    if spread:
        k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, nbatch))
    else:
        k1 = jnp.full((nbatch,), 0.04)
    params = jnp.stack(
        [k1, jnp.full((nbatch,), 1.0e4), jnp.full((nbatch,), 3.0e7)], axis=1
    ).astype(lp.params.dtype)
    solver = BdfSolver(lp)
    te = jnp.asarray(t_eval)

    def go(pb):
        return solve_dense(solver, te, params=pb, max_steps=max_steps)

    sol = go(params)
    float(jnp.sum(sol.ys))
    assert int(sol.stop_reason) >= 0, int(sol.stop_reason)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sol = go(params)
        float(jnp.sum(sol.ys))
        best = min(best, time.perf_counter() - t0)
    steps = int(sol.state.stats.steps)
    return best, steps


def main():
    print(f"devices: {jax.devices()}")

    t, s = run(10_000, T_EVAL_4E10, spread=False)
    print(f"[matched t=4e10, shared params, B=10k, f64] total {t*1e3:.1f} ms, "
          f"{s} steps, {t/s*1e6:.0f} us/step, vs_diffsol {0.1340/t:.2f}x")

    t, s = run(10_000, T_EVAL_4E10, spread=False, dtype=jnp.float32)
    print(f"[matched t=4e10, shared params, B=10k, f32] total {t*1e3:.1f} ms, "
          f"{s} steps, {t/s*1e6:.0f} us/step, vs_diffsol {0.1340/t:.2f}x")

    for B in (100, 1000, 10_000, 100_000):
        t, s = run(B, T_EVAL_4E5)
        print(f"[t=4e5 spread B={B:>6} f64] total {t*1e3:.1f} ms, {s} steps, "
              f"{t/s*1e6:.0f} us/step, {t/B*1e6:.2f} us/inst")
    for B in (10_000, 100_000):
        t, s = run(B, T_EVAL_4E5, dtype=jnp.float32)
        print(f"[t=4e5 spread B={B:>6} f32] total {t*1e3:.1f} ms, {s} steps, "
              f"{t/s*1e6:.0f} us/step, {t/B*1e6:.2f} us/inst")


if __name__ == "__main__":
    main()
