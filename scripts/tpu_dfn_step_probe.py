"""Probe: pybamm DFN (962-state DAE) on the real TPU, python-driven steps.

The whole-solve while_loop program for the DFN did not finish compiling on
the axon worker within 27 min (round-4 finding; the round-3 dense-tier
version crashed outright).  This probe drives the solve the way the
reference's own architecture does (one step program, host-side loop,
reference bdf.rs step() + the C ABI's solve loop): jit-compiles ONLY the
BDF step program (krylov tier, colored-probe lu32 preconditioner), loops
from the host at ~5 ms/dispatch over the tunnel, and interpolates the
terminal-voltage output at the bench eval points.

Reference bench config: crates/diffsol/benches/pybamm_dfn.rs:14-31 (one
discharge hour, rtol=1e-4, atol=1e-6, armijo_constant=0.1).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# NB: do NOT use PYTHONPATH for TPU runs -- ANY value of PYTHONPATH (even an
# empty dir) breaks the axon plugin's worker-hostname helper subprocess and
# JAX silently falls back to CPU.
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from diffsol_tpu.problem import InitialConditionOptions, OdeBuilder
from diffsol_tpu.drivers import init_state_jit
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

solver = BdfSolver(problem)
params = problem.params

t0 = time.perf_counter()
state = init_state_jit(solver, params)
float(state.t)  # sync
print(f"init_state (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)

step_jit = jax.jit(solver.step)
t0 = time.perf_counter()
state = step_jit(state, params)
float(state.t)
print(f"first step (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)

interp_jit = jax.jit(solver.interpolate)
out_jit = jax.jit(problem.eqn.out)

t_eval = np.linspace(360.0, 3600.0, 10)
t_end = float(t_eval[-1])

t0 = time.perf_counter()
nsteps = 1
voltages = {}
ei = 0
t_cur = float(state.t)
prev_state = state
while t_cur < t_end and nsteps < 2000:
    prev_state = state
    state = step_jit(state, params)
    t_new = float(state.t)  # host sync each step (tunnel ~5 ms)
    nsteps += 1
    while ei < len(t_eval) and t_new >= t_eval[ei]:
        y_i = interp_jit(state, jnp.asarray(t_eval[ei]))
        v_i = float(out_jit(jnp.asarray(t_eval[ei]), y_i, params)[0])
        voltages[float(t_eval[ei])] = v_i
        ei += 1
    t_cur = t_new
wall = time.perf_counter() - t0
v = np.array([voltages[float(t)] for t in t_eval[: len(voltages)]])
print(f"solve: {wall:.2f}s  steps={nsteps}  "
      f"({wall/nsteps*1e3:.1f} ms/step incl. tunnel dispatch)", flush=True)
print("voltage:", v, flush=True)
assert len(v) == len(t_eval), (len(v), len(t_eval))
assert np.all(v < 4.1) and np.all(v > 3.1), v
assert v[-1] < v[0]
print("OK", flush=True)
import json
print(json.dumps({
    "pybamm_dfn_tpu_stepdriven_s": round(wall, 3),
    "pybamm_dfn_tpu_steps": nsteps,
    "pybamm_dfn_tpu_ms_per_step": round(wall / nsteps * 1e3, 2),
}), flush=True)
