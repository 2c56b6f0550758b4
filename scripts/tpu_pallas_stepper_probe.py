"""Probe: fused Pallas BDF stepper on the real TPU chip.

Correctness vs robertson CVODE table + timing at B=10k (headline t4e5
config and the reference-matched t4e10 config).
"""
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

print("devices:", jax.devices(), file=sys.stderr)

T_EVAL = [0.4, 4.0, 40.0, 400.0, 4000.0, 4.0e4, 4.0e5]
T_EVAL_4E10 = [4.0 * 10.0**k for k in range(-1, 11)]

problem = robertson.problem_ode(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))

B = 10_000
k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, B))
params = jnp.stack([k1, jnp.full((B,), 1e4), jnp.full((B,), 3e7)], axis=1)

for tag, te in (("t4e5", T_EVAL), ("t4e10", T_EVAL_4E10)):
    solve = make_pallas_bdf_solve(problem, te, nbatch=B)
    jsolve = jax.jit(solve)
    t0 = time.perf_counter()
    ys, status, steps = jsolve(params)
    ys.block_until_ready()
    compile_s = time.perf_counter() - t0
    ysn = np.asarray(ys)
    print(f"[{tag}] compile+first: {compile_s:.2f}s status={np.asarray(status)} "
          f"steps={np.asarray(steps)}")
    # correctness vs CVODE table (shared-param member at k1=0.04 -> use
    # nearest member index B//2)
    mid = B // 2
    soln = robertson.SOLN
    if tag == "t4e5":
        for i, t in enumerate(te):
            row = ysn[i, :, mid]
            ref = np.asarray(soln[i + 1][1] if isinstance(soln[0], tuple) else soln)
        # just print trajectory for eyeball
        print("  y(t4e5) mid:", ysn[-1, :, mid])
    else:
        print("  y(4e10) mid:", ysn[-1, :, mid])
    # timing: marginal over 4 dispatches
    t1 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = jsolve(params)
        float(jnp.sum(r[0][-1]))
        t1 = min(t1, time.perf_counter() - t0)
    t4 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jsolve(params); jsolve(params); jsolve(params)
        r = jsolve(params)
        float(jnp.sum(r[0][-1]))
        t4 = min(t4, time.perf_counter() - t0)
    marginal = (t4 - t1) / 3.0
    print(f"  latency={t1*1e3:.1f} ms  marginal={marginal*1e3:.1f} ms  "
          f"per-instance={marginal/B*1e6:.3f} us")
