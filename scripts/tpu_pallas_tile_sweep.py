"""Tile-size sweep for the fused Pallas BDF stepper.

Separates the kernel's fixed per-step overhead (scalar control flow, loop
machinery) from its vector work: if steady latency is ~flat in tile size,
the kernel is overhead-bound and larger tiles amortize it per instance.

Usage: python scripts/tpu_pallas_tile_sweep.py [tile1 tile2 ...]
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

print("devices:", jax.devices(), flush=True)

T_EVAL = [0.4, 4.0, 40.0, 400.0, 4000.0, 4.0e4, 4.0e5]
problem = robertson.problem_ode(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))

tiles = [int(a) for a in sys.argv[1:]] or [1024, 4096, 8192, 16384]

for tile in tiles:
    B = tile
    k1 = jnp.full((B,), 0.04)
    params = jnp.stack([k1, jnp.full((B,), 1e4), jnp.full((B,), 3e7)], axis=1)
    t0 = time.perf_counter()
    solve = make_pallas_bdf_solve(problem, T_EVAL, nbatch=B, tile=tile)
    t_make = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = jax.jit(solve).lower(params).compile()
    t_comp = time.perf_counter() - t0
    try:
        ys, status, steps = compiled(params)
        ys.block_until_ready()
    except Exception as e:
        print(f"tile={tile}: RUN FAILED: {str(e)[:200]}", flush=True)
        continue
    st = int(np.asarray(status)[0])
    nsteps = int(np.asarray(steps)[0])
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        r = compiled(params)
        float(jnp.sum(r[0][-1]))
        best = min(best, time.perf_counter() - t0)
    # marginal (tunnel-latency-free) over 3 extra dispatches
    t4 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        compiled(params); compiled(params); compiled(params)
        r = compiled(params)
        float(jnp.sum(r[0][-1]))
        t4 = min(t4, time.perf_counter() - t0)
    marg = (t4 - best) / 3.0
    print(
        f"tile={tile}: make={t_make:.1f}s compile={t_comp:.1f}s "
        f"status={st} steps={nsteps} latency={best*1e3:.1f}ms "
        f"marginal={marg*1e3:.1f}ms per-step={marg/max(nsteps,1)*1e6:.1f}us "
        f"per-inst={marg/B*1e6:.3f}us",
        flush=True,
    )
