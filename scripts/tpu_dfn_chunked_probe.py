"""Probe: pybamm DFN step-driven solve with K BDF steps PER DISPATCH.

Round-4 finding (docs/design.md, scripts/tpu_dfn_step_probe.py): the
whole-solve while_loop program for the 962-state DFN never finished
compiling on the axon worker (>27 min), so the DFN runs step-driven from
the host -- but one step per dispatch pays the tunnel's ~28-45 ms
dispatch floor ~500 times.  This probe compiles a ``lax.fori_loop`` of K
steps as ONE program (the body is traced once, so compile cost stays
near the single-step program's, far below the whole-solve pathology) and
measures ms/step vs the single-step driver.  K amortizes the dispatch
floor K-fold; the host loop still checks t after each chunk, so the
solve stops within K-1 steps of the horizon exactly like the reference's
host-side step loop (reference crates/diffsol/src/ode_solver/method.rs
step-until protocol).

Usage: python scripts/tpu_dfn_chunked_probe.py [K ...]   (default 1 4 16)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# NB: do NOT use PYTHONPATH for TPU runs -- ANY value of PYTHONPATH (even an
# empty dir) breaks the axon plugin's worker-hostname helper subprocess and
# JAX silently falls back to CPU.
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/diffsol_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diffsol_tpu.problem import InitialConditionOptions, OdeBuilder
from diffsol_tpu.drivers import init_state_jit
from diffsol_tpu.solvers.bdf import BdfSolver

print("devices:", jax.devices(), flush=True)

Ks = [int(a) for a in _sys.argv[1:]] or [1, 4, 16]

path = "/root/reference/crates/diffsol/benches/pybamm_dfn.diffsl"
src = open(path).read()
t0 = time.perf_counter()
problem = (
    OdeBuilder()
    .rtol(1e-4)
    .atol(1e-6)
    .ic_options(InitialConditionOptions(armijo_constant=1e-1))
    .build_from_diffsl(src)
)
print(f"build: {time.perf_counter()-t0:.1f}s n={problem.eqn.nstates} "
      f"linsol={problem.linear_solver.name}", flush=True)

solver = BdfSolver(problem)
params = problem.params

t0 = time.perf_counter()
state0 = init_state_jit(solver, params)
float(state0.t)
print(f"init_state: {time.perf_counter()-t0:.1f}s", flush=True)

t_end = 3600.0
results = {}
for K in Ks:
    if K == 1:
        chunk = jax.jit(solver.step)
    else:
        def _chunk(state, params, _K=K):
            return jax.lax.fori_loop(
                0, _K, lambda i, s: solver.step(s, params), state
            )
        chunk = jax.jit(_chunk)
    t0 = time.perf_counter()
    state = chunk(state0, params)
    float(state.t)
    t_first = time.perf_counter() - t0
    # drive to the horizon (or 600 dispatches, whichever first)
    t0 = time.perf_counter()
    ndisp = 1
    while float(state.t) < t_end and ndisp < (600 // K + 1):
        state = chunk(state, params)
        ndisp += 1
    wall = time.perf_counter() - t0
    nsteps = int(np.asarray(state.stats.steps)) if hasattr(state, "stats") else ndisp * K
    # steps actually advanced during the timed window
    adv = ndisp * K
    ms_per_step = wall / max(adv - K, 1) * 1e3 if ndisp > 1 else float("nan")
    reached = float(state.t)
    print(
        f"K={K}: first(compile+run)={t_first:.1f}s dispatches={ndisp} "
        f"t_reached={reached:.0f}/{t_end:.0f} wall={wall:.2f}s "
        f"ms/step={ms_per_step:.1f}", flush=True,
    )
    results[f"dfn_chunked_K{K}_ms_per_step"] = round(ms_per_step, 2)
    results[f"dfn_chunked_K{K}_compile_s"] = round(t_first, 1)

print(json.dumps(results), flush=True)
