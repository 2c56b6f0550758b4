"""Real-chip probe of the fused BANDED Pallas BDF stepper (heat1d class).

Bring-up + marginal timing of ops/pallas_stepper_band.py on the TPU:
heat1d n=128 tridiagonal MOL ensemble, heterogeneous diffusivities.
Compare: the XLA krylov-lockstep path measured 235.7 ms/step for n=128
B=16 (scripts/tpu_krylov_lockstep_probe.py, round-4 status #13); the
banded XLA lockstep path is dispatch-bound the same way.  The fused
kernel runs the whole adaptive solve in one launch per member tile.

Usage: python scripts/tpu_band_stepper_probe.py [n] [B]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt
from diffsol_tpu.ops.banded import make_banded_solver
from diffsol_tpu.ops.pallas_stepper_band import make_pallas_band_bdf_solve

print("devices:", jax.devices(), flush=True)
assert jax.default_backend() == "tpu", jax.devices()

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
h = 1.0 / (n + 1)


def rhs(t, y, p):
    d = p[0]
    left = jnp.concatenate([jnp.zeros_like(y[:1]), y[:-1]])
    right = jnp.concatenate([y[1:], jnp.zeros_like(y[:1])])
    return d * (left - 2.0 * y + right) / (h * h)


def init(t, p):
    x = (jnp.arange(n) + 1.0) * h
    return jnp.where(x < 0.5, 2.0 * x, 2.0 * (1.0 - x))


problem = (
    dt.OdeBuilder().rhs(rhs).init(init).p([1.0]).rtol(1e-6).atol(1e-8)
    .linear_solver(make_banded_solver(1, 1, kernel="xla")).build()
)

T_EVAL = [0.001, 0.01, 0.05, 0.1, 0.2]
params = jnp.linspace(0.5, 2.0, B)[:, None]

t0 = time.perf_counter()
solve = make_pallas_band_bdf_solve(problem, T_EVAL, nbatch=B)
t_make = time.perf_counter() - t0
print(f"make={t_make:.1f}s tile={solve.tile} ntiles={solve.ntiles}", flush=True)

t0 = time.perf_counter()
compiled = jax.jit(solve).lower(params).compile()
t_comp = time.perf_counter() - t0
print(f"compile={t_comp:.1f}s", flush=True)

ys, status, steps = compiled(params)
ys.block_until_ready()
st = np.asarray(status)
nsteps = int(np.asarray(steps)[0])
print(f"status={st} steps={np.asarray(steps)}", flush=True)

# correctness: member 0 (d=0.5) vs host XLA single-instance solve
sol = dt.solve_dense(dt.BdfSolver(problem), jnp.asarray(T_EVAL),
                     params=jnp.asarray([0.5]))
ref = np.asarray(sol.ys)
got = np.asarray(ys)[:, :, 0]
err = np.max(np.abs(got - ref))
print(f"member-0 max abs err vs XLA f64: {err:.3e}", flush=True)

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
    f"latency={t1*1e3:.1f}ms marginal={marg*1e3:.2f}ms "
    f"per-step={marg/max(nsteps,1)*1e6:.2f}us "
    f"per-inst={marg/B*1e6:.3f}us "
    f"per-inst-per-step={marg/B/max(nsteps,1)*1e9:.2f}ns",
    flush=True,
)
