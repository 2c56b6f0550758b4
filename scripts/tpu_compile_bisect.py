"""Characterize the axon whole-solve XLA-compile pathology by n-bisection.

Round-4 finding (docs/round4_status.md): krylov-tier whole-solve
``lax.while_loop`` programs never finish XLA-compiling on the axon backend
at DFN scale (n=962: >27 min, no crash), while the single-STEP program
compiles in minutes.  This probe times the whole-solve compile for a
heat1d MOL problem routed through the SAME krylov(lu32) tier at a ladder
of state sizes, under a per-point wall timeout, to locate where compile
time leaves the normal band.

Each point prints: n, build seconds, compile seconds (or TIMEOUT), and the
step count of a short solve as a sanity check.  Run points one at a time
(the axon tunnel serves one client); a fresh process per point is NOT
needed — compile caches are keyed by program, and every n is a different
program.

Usage: python scripts/tpu_compile_bisect.py [n1 n2 ...]   (default ladder)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt
from diffsol_tpu.drivers import solve_dense
from diffsol_tpu.solvers.bdf import BdfSolver

print("devices:", jax.devices(), flush=True)

TIMEOUT_S = int(_os.environ.get("BISECT_TIMEOUT_S", "420"))
ns = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 512]


class _CompileTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise _CompileTimeout()


signal.signal(signal.SIGALRM, _alarm)

for n in ns:
    h = 1.0 / (n + 1)

    def rhs(t, y, p, h=h):
        d = p[0]
        left = jnp.concatenate([jnp.zeros_like(y[:1]), y[:-1]])
        right = jnp.concatenate([y[1:], jnp.zeros_like(y[:1])])
        return d * (left - 2.0 * y + right) / (h * h)

    def init(t, p, n=n, h=h):
        x = (jnp.arange(n) + 1.0) * h
        return jnp.where(x < 0.5, 2.0 * x, 2.0 * (1.0 - x))

    t0 = time.perf_counter()
    prob = (
        dt.OdeBuilder().rhs(rhs).init(init).p([1.0]).rtol(1e-6).atol(1e-8)
        .linear_solver("krylov").build()
    )
    solver = BdfSolver(prob)
    te = jnp.asarray([0.01, 0.1])
    t_build = time.perf_counter() - t0

    def run(p):
        return solve_dense(solver, te, params=p, max_steps=500)

    t0 = time.perf_counter()
    signal.alarm(TIMEOUT_S)
    try:
        compiled = jax.jit(run).lower(prob.params).compile()
        signal.alarm(0)
        t_comp = time.perf_counter() - t0
        sol = compiled(prob.params)
        steps = int(sol.state.stats.steps)
        ok = int(sol.stop_reason) >= 0
        print(
            f"n={n}: build={t_build:.1f}s compile={t_comp:.1f}s "
            f"steps={steps} ok={ok}",
            flush=True,
        )
    except _CompileTimeout:
        signal.alarm(0)
        print(
            f"n={n}: build={t_build:.1f}s compile=TIMEOUT(>{TIMEOUT_S}s)",
            flush=True,
        )
        break  # larger n will only be worse; stop the ladder
