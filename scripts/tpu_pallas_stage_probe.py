"""Staged probe: where does the fused Pallas stepper spend its time?
trace (lower), compile, first run -- B=1024 single tile, t4e5 evals."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# NB: do NOT use PYTHONPATH for TPU runs -- ANY value of PYTHONPATH (even an
# empty dir) breaks the axon plugin's worker-hostname helper subprocess and
# JAX silently falls back to CPU.
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from diffsol_tpu.models import robertson
from diffsol_tpu.ops.pallas_stepper import make_pallas_bdf_solve

print("devices:", jax.devices(), flush=True)

T_EVAL = [0.4, 4.0, 40.0, 400.0, 4000.0, 4.0e4, 4.0e5]
problem = robertson.problem_ode(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, B))
params = jnp.stack([k1, jnp.full((B,), 1e4), jnp.full((B,), 3e7)], axis=1)

t0 = time.perf_counter()
solve = make_pallas_bdf_solve(problem, T_EVAL, nbatch=B)
print(f"make: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
lowered = jax.jit(solve).lower(params)
print(f"lower (trace): {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
compiled = lowered.compile()
print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

t0 = time.perf_counter()
ys, status, steps = compiled(params)
ys.block_until_ready()
print(f"first run: {time.perf_counter()-t0:.2f}s status={np.asarray(status)} "
      f"steps={np.asarray(steps)}", flush=True)
print("y(4e5) mid:", np.asarray(ys)[-1, :, B // 2], flush=True)

best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    r = compiled(params)
    float(jnp.sum(r[0][-1]))
    best = min(best, time.perf_counter() - t0)
print(f"steady latency: {best*1e3:.1f} ms  per-inst {best/B*1e6:.2f} us",
      flush=True)
