"""Probe: pybamm DFN (962-state DAE) on the real TPU chip.

Round-3 status: the monolithic IC+solve program crashed the axon worker;
the suspected program-size lever was the 962-column jacfwd in the krylov
lu32 preconditioner, now replaced by colored probes.  This script runs the
bench config (one discharge hour, rtol=1e-4/atol=1e-6) and prints wall
times; on crash, the traceback identifies the failing program.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# NB: do NOT use PYTHONPATH for TPU runs -- ANY value of PYTHONPATH (even an
# empty dir) breaks the axon plugin's worker-hostname helper subprocess and
# JAX silently falls back to CPU.
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from diffsol_tpu.problem import InitialConditionOptions, OdeBuilder
from diffsol_tpu.drivers import solve_dense
from diffsol_tpu.solvers.bdf import BdfSolver

print("devices:", jax.devices(), flush=True)

path = "/root/reference/crates/diffsol/benches/pybamm_dfn.diffsl"
src = open(path).read()
t_build0 = time.perf_counter()
problem = (
    OdeBuilder()
    .rtol(1e-4)
    .atol(1e-6)
    .ic_options(InitialConditionOptions(armijo_constant=1e-1))
    .build_from_diffsl(src)
)
print(f"build: {time.perf_counter()-t_build0:.1f}s  n={problem.eqn.nstates} "
      f"linsol={problem.linear_solver.name}", flush=True)

t_eval = jnp.linspace(360.0, 3600.0, 10)
t0 = time.perf_counter()
sol = solve_dense(BdfSolver(problem), t_eval, max_steps=2000)
v = np.asarray(sol.gs)[:, 0]
print(f"first solve (compile+run): {time.perf_counter()-t0:.1f}s "
      f"stop={int(sol.stop_reason)} steps={int(sol.state.stats.steps)}", flush=True)
print("voltage:", v, flush=True)
assert np.all(v < 4.1) and np.all(v > 3.1), v

best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    sol = solve_dense(BdfSolver(problem), t_eval, max_steps=2000)
    float(jnp.sum(sol.ys[-1]))
    best = min(best, time.perf_counter() - t0)
print(f"steady solve: {best:.3f}s", flush=True)
