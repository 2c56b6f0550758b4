"""Tile-size sweep for the fused Pallas BDF stepper at the t=4e10 workload.

The t=4e5 sweep's device times (<3 ms) are swamped by the axon tunnel's
~1-2 ms marginal-timing noise.  This variant uses the reference-matched
t=4e10 span (~300 steps) and a deeper marginal (1-vs-8 dispatches, slope
over 7) so per-step numbers resolve to ~0.3 us.

Usage: python scripts/tpu_pallas_tile_sweep_t4e10.py [tile1 tile2 ...]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from diffsol_tpu.models import robertson
from diffsol_tpu.ops.pallas_stepper import make_pallas_bdf_solve

print("devices:", jax.devices(), flush=True)

T_EVAL = [4.0 * 10.0**k for k in range(-1, 11)]  # 0.4 .. 4e10
problem = robertson.problem_ode(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))

tiles = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096, 8192, 16384]

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

    def timed(ndisp):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(ndisp - 1):
                compiled(params)
            r = compiled(params)
            float(jnp.sum(r[0][-1]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    t8 = timed(8)
    marg = (t8 - t1) / 7.0
    print(
        f"tile={tile}: make={t_make:.1f}s compile={t_comp:.1f}s "
        f"status={st} steps={nsteps} latency={t1*1e3:.1f}ms "
        f"marginal={marg*1e3:.2f}ms per-step={marg/max(nsteps,1)*1e6:.2f}us "
        f"per-inst={marg/B*1e6:.4f}us",
        flush=True,
    )
