"""Count XLA kernels (fusions + standalone ops) in the lockstep BDF step
program vs the fused Pallas whole-solve program -- the before/after for the
round-3 fusion census (docs/design.md): the XLA step re-dispatches ~165
kernels per step; the Pallas tier dispatches ~1 kernel per member tile per
SOLVE.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# NB: do NOT use PYTHONPATH for TPU runs (breaks axon init).
import re
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from diffsol_tpu.ensemble import make_lockstep_problem
from diffsol_tpu.drivers import init_state_jit
from diffsol_tpu.models import robertson
from diffsol_tpu.ops.pallas_stepper import make_pallas_bdf_solve
from diffsol_tpu.solvers.bdf import BdfSolver

print("devices:", jax.devices(), flush=True)

T_EVAL = [0.4, 4.0, 40.0, 400.0, 4000.0, 4.0e4, 4.0e5]
B = 10_000
problem = robertson.problem_ode(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))
k1 = jnp.full((B,), 0.04)
params = jnp.stack([k1, jnp.full((B,), 1e4), jnp.full((B,), 3e7)], axis=1)


def kernel_count(txt):
    # executable thunks in the optimized HLO: fusions + non-fused
    # instructions that become kernels (custom-calls, while bodies count
    # their own inner kernels via the nested computations)
    fus = len(re.findall(r"^\s*ROOT?\s*.*fusion\(", txt, re.M))
    fus2 = txt.count(" fusion(")
    return fus2, txt.count(" while("), txt.count(" custom-call(")


lp = make_lockstep_problem(problem, B)
solver = BdfSolver(lp)
state = init_state_jit(solver, params)
step = jax.jit(solver.step).lower(state, params).compile()
txt = step.as_text()
f, w, c = kernel_count(txt)
print(f"XLA lockstep step program: fusions={f} while={w} custom_calls={c} "
      f"hlo_lines={len(txt.splitlines())}", flush=True)

solve = make_pallas_bdf_solve(problem, T_EVAL, nbatch=B)
comp = jax.jit(solve).lower(params).compile()
txt_p = comp.as_text()
f2, w2, c2 = kernel_count(txt_p)
print(f"Pallas whole-solve program: fusions={f2} while={w2} "
      f"custom_calls(pallas tiles)={c2} hlo_lines={len(txt_p.splitlines())}",
      flush=True)
