"""Probe: pybamm DFN (962-state DAE) LOCKSTEP ENSEMBLE, step-driven.

The flagship claim at real PDE scale: a B-member lockstep ensemble of the
reference's DFN battery model through the krylov-lockstep tier
(joint-block batched GMRES + per-member f32-LU preconditioning), driven
step-by-step from the host (the whole-solve program does not finish
XLA-compiling on the axon backend; see docs/round4_status.md #10).

Usage:
  python scripts/tpu_dfn_ensemble_probe.py          # real TPU, B=4
  python scripts/tpu_dfn_ensemble_probe.py --cpu 2 60   # cpu, B=2, 60 steps
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# NB: no PYTHONPATH for TPU runs (breaks axon init).
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

cpu = "--cpu" in sys.argv
args = [a for a in sys.argv[1:] if a != "--cpu"]
B = int(args[0]) if args else 4
MAXSTEPS = int(args[1]) if len(args) > 1 else 2000

if cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/diffsol_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diffsol_tpu.problem import InitialConditionOptions, OdeBuilder
from diffsol_tpu.drivers import init_state_jit
from diffsol_tpu.ensemble import make_lockstep_problem
from diffsol_tpu.solvers.bdf import BdfSolver

print("devices:", jax.devices(), flush=True)

src = open("/root/reference/crates/diffsol/benches/pybamm_dfn.diffsl").read()
t0 = time.perf_counter()
problem = (
    OdeBuilder()
    .rtol(1e-4)
    .atol(1e-6)
    .ic_options(InitialConditionOptions(armijo_constant=1e-1))
    # force the krylov tier on every backend: the TPU auto-route picks it
    # anyway (n>=256 unstructured), and the CPU sanity run must exercise
    # the SAME krylov-lockstep path (CPU auto-route would pick dense)
    .linear_solver("krylov")
    .build_from_diffsl(src)
)
lp = make_lockstep_problem(problem, B)
print(f"build+lift: {time.perf_counter()-t0:.1f}s  n={problem.eqn.nstates} "
      f"B={B} linsol={lp.linear_solver.name}", flush=True)

# the reference's DFN model text has no `in` inputs (nparams=0): members
# are identical, so this probe proves the tier's MACHINERY+THROUGHPUT at
# n=962 scale (member heterogeneity is proven by the heat1d krylov
# lockstep probe / tests, which do spread parameters)
np_params = np.asarray(problem.params)
if np_params.size:
    params_b = jnp.asarray(
        np_params[None, :] * (1.0 + 0.05 * np.linspace(-1, 1, B))[:, None]
    )
else:
    params_b = jnp.zeros((B, 0))
solver = BdfSolver(lp)

t0 = time.perf_counter()
state = init_state_jit(solver, params_b)
float(state.t)
print(f"init_state (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)

step_jit = jax.jit(solver.step)
t0 = time.perf_counter()
state = step_jit(state, params_b)
float(state.t)
print(f"first step (compile+run): {time.perf_counter()-t0:.1f}s", flush=True)

T_END = 3600.0
t0 = time.perf_counter()
nsteps = 1
while float(state.t) < T_END and nsteps < MAXSTEPS:
    state = step_jit(state, params_b)
    nsteps += 1
    if nsteps % 25 == 0:
        print(f"  step {nsteps}: t={float(state.t):.1f} "
              f"({(time.perf_counter()-t0)/nsteps*1e3:.0f} ms/step)",
              flush=True)
wall = time.perf_counter() - t0

out_jit = jax.jit(lp.eqn.out)
v = np.asarray(out_jit(state.t, state.y, params_b))  # (nout, B)
print(f"solve: {wall:.1f}s  steps={nsteps}  "
      f"({wall/nsteps*1e3:.0f} ms/step, B={B} members)", flush=True)
print("terminal voltages:", v[0], flush=True)
if float(state.t) >= T_END:
    assert np.all(v[0] > 3.0) and np.all(v[0] < 4.1), v
    if np_params.size:  # spread inputs => spread discharge depths
        assert len(set(np.round(v[0], 4))) > 1, v
print(json.dumps({
    f"pybamm_dfn_lockstep_b{B}_s": round(wall, 2),
    "steps": nsteps,
    "ms_per_step": round(wall / nsteps * 1e3, 1),
    "per_member_ms_per_step": round(wall / nsteps / B * 1e3, 1),
}), flush=True)
print("OK", flush=True)
