"""(tile, chains) sweep for the fused Pallas BDF stepper.

Round-4 finding: at tile=4096 the kernel is CRITICAL-PATH bound at
~8 us/step/tile (docs/design.md) -- halving the vector work moved nothing.
Chain interleaving (pallas_stepper `chains=C`) advances C independent
tiles inside ONE kernel: lane arrays widen to (C, tile) so every VPU op
carries all chains, overlapping their serial dependency chains.  This
sweep measures where the win saturates and which (tile, chains) minimizes
the reference-matched t=4e10 B=10k wall time.

Usage: python scripts/tpu_pallas_chain_sweep.py [t4e10|t4e5] [tile,chains[,prec] ...]
e.g.   python scripts/tpu_pallas_chain_sweep.py t4e10 10240,1 10240,1,mixed
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
# NB: do NOT use PYTHONPATH for TPU runs (breaks the axon plugin).
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/diffsol_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diffsol_tpu.models import robertson
from diffsol_tpu.ops.pallas_stepper import make_pallas_bdf_solve

print("devices:", jax.devices(), flush=True)

args = sys.argv[1:]
horizon = "t4e10"
if args and args[0] in ("t4e10", "t4e5"):
    horizon = args[0]
    args = args[1:]
if horizon == "t4e10":
    T_EVAL = [4.0 * 10.0**k for k in range(-1, 11)]  # bench T_EVAL_4E10
    B = 10_000
else:
    T_EVAL = [0.4, 4.0, 40.0, 400.0, 4000.0, 4.0e4, 4.0e5]
    B = 10_000
problem = robertson.problem_ode(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))

def _parse(a):
    parts = a.split(",")
    tile, chains = int(parts[0]), int(parts[1])
    prec = parts[2] if len(parts) > 2 else "df"
    return tile, chains, prec


combos = [_parse(a) for a in args] or [
    (4096, 1, "df"), (4096, 2, "df"), (4096, 3, "df"),
    (2048, 3, "df"), (2048, 6, "df"), (1024, 8, "df"),
]

k1 = jnp.full((B,), 0.04)
params = jnp.stack([k1, jnp.full((B,), 1e4), jnp.full((B,), 3e7)], axis=1)

for tile, chains, prec in combos:
    tag = f"tile={tile} chains={chains} prec={prec}"
    t0 = time.perf_counter()
    solve = make_pallas_bdf_solve(
        problem, T_EVAL, nbatch=B, tile=tile, chains=chains, precision=prec
    )
    t_make = time.perf_counter() - t0
    t0 = time.perf_counter()
    try:
        compiled = jax.jit(solve).lower(params).compile()
    except Exception as e:
        print(f"{tag}: COMPILE FAILED: {str(e)[:300]}", flush=True)
        continue
    t_comp = time.perf_counter() - t0
    try:
        ys, status, steps = compiled(params)
        float(jnp.sum(ys[-1]))
    except Exception as e:
        print(f"{tag}: RUN FAILED: {str(e)[:300]}", flush=True)
        continue
    st = int(np.min(np.asarray(status)))
    nsteps = int(np.max(np.asarray(steps)))
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
        f"{tag}: make={t_make:.1f}s "
        f"compile={t_comp:.1f}s status={st} steps={nsteps} "
        f"latency={best*1e3:.1f}ms marginal={marg*1e3:.2f}ms "
        f"per-step-call={marg/max(nsteps,1)*1e6:.1f}us "
        f"per-inst={marg/B*1e9:.0f}ns "
        f"vs_ref_0.134s={0.134/max(marg,1e-9):.1f}x",
        flush=True,
    )
