"""Bisect the per-step cost of the lockstep BDF step on the real TPU.

Runs ONE process (first-compile penalty paid once); times fori_loop(200)
of solver.step under several knockouts, plus dumps optimized-HLO stats.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

NBATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
NSTEPS = 200

from diffsol_tpu.ensemble import make_lockstep_problem
from diffsol_tpu.models import robertson
from diffsol_tpu.solvers import bdf as bdf_mod
from diffsol_tpu.solvers.bdf import BdfSolver

problem = robertson.problem_ode(rtol=1e-6, atol=1e-8)
lp = make_lockstep_problem(problem, NBATCH)
k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, NBATCH))
params = jnp.stack(
    [k1, jnp.full((NBATCH,), 1.0e4), jnp.full((NBATCH,), 3.0e7)], axis=1
).astype(lp.params.dtype)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def time_steps(solver, label):
    state0 = jax.jit(solver.init_state)(params)

    @jax.jit
    def run(state):
        def body(i, st):
            return solver.step(st, params)

        return jax.lax.fori_loop(0, NSTEPS, body, state)

    t0 = time.perf_counter()
    out = run(state0)
    sync(out.y)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(state0)
        sync(out.y)
        best = min(best, time.perf_counter() - t0)
    st = out.stats
    print(
        f"{label:28s}: {best/NSTEPS*1e6:7.1f} us/step "
        f"(newton/step={int(st.newton_iterations)/NSTEPS:.2f}, "
        f"lu/step={int(st.linear_solver_setups)/NSTEPS:.2f}, "
        f"compile {compile_s:.0f}s)"
    )
    return best / NSTEPS


# ---- knockout variants ----------------------------------------------------

solver = BdfSolver(lp)
time_steps(solver, "full step")

# no jacobian machinery: keep factors forever
orig_jac_updates = BdfSolver._jacobian_updates
def no_jac_updates(self, st, t, y, params, c, kind):
    return st
BdfSolver._jacobian_updates = no_jac_updates
time_steps(BdfSolver(lp), "no _jacobian_updates")
BdfSolver._jacobian_updates = orig_jac_updates

# no order selection (always keep current order)
import types
orig_step = BdfSolver.step
src_marker = None

class NoTstop(BdfSolver):
    def _handle_tstop_pre(self, state):
        return jnp.asarray(False), state

time_steps(NoTstop(lp), "no tstop handling")

# no rescales: _compute_ru returns identity (kills the 8x8 matmuls)
orig_ru = bdf_mod._compute_ru
bdf_mod._compute_ru = lambda order, factor, dtype: jnp.eye(bdf_mod.ND, dtype=dtype)
time_steps(BdfSolver(lp), "identity RU rescale")
bdf_mod._compute_ru = orig_ru

# newton: single fixed iteration, no while loop
from diffsol_tpu.ops import newton as newton_mod
orig_newton = newton_mod.newton_solve
def fixed2_newton(residual, lin_solve, x0, error_y, atol, rtol, eta0, *, tol=0.2, max_iter=10, nbatch=1):
    x = x0
    for _ in range(2):
        x = x - lin_solve(residual(x))
    return newton_mod.NewtonResult(
        x=x, converged=jnp.asarray(True), niter=jnp.asarray(2, jnp.int32),
        eta=jnp.asarray(eta0, x.dtype),
    )
bdf_mod.newton_solve = fixed2_newton
time_steps(BdfSolver(lp), "fixed-2-iter newton")
bdf_mod.newton_solve = orig_newton
