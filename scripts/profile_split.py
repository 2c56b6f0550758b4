"""Split bench timing: eager init_state vs jitted init vs jitted solve."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

NBATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000

from diffsol_tpu.ensemble import make_lockstep_problem
from diffsol_tpu.drivers import solve_dense
from diffsol_tpu.models import robertson
from diffsol_tpu.solvers.bdf import BdfSolver

problem = robertson.problem_ode()
lp = make_lockstep_problem(problem, NBATCH)
k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, NBATCH))
params = jnp.stack(
    [k1, jnp.full((NBATCH,), 1.0e4), jnp.full((NBATCH,), 3.0e7)], axis=1
).astype(lp.params.dtype)
solver = BdfSolver(lp)
t_eval = jnp.asarray([0.4, 4.0, 40.0, 400.0, 4000.0, 4.0e4, 4.0e5])


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, *args, reps=3):
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


init_jit = jax.jit(solver.init_state)

t_init_jit = timeit(init_jit, params)
print(f"init_state jitted : {t_init_jit*1e3:8.1f} ms")

t0 = time.perf_counter()
st_eager = solver.init_state(params)
sync(st_eager)
t_init_eager = time.perf_counter() - t0
print(f"init_state eager  : {t_init_eager*1e3:8.1f} ms")

state0 = init_jit(params)


def solve_only(state, pb):
    return solve_dense(solver, t_eval, params=pb, state=state, max_steps=5000)


t_solve = timeit(solve_only, state0, params)
print(f"solve_dense jitted: {t_solve*1e3:8.1f} ms")
sol = solve_only(state0, params)
st = sol.state.stats
print(
    f"steps={int(st.steps)} newton={int(st.newton_iterations)} "
    f"lu={int(st.linear_solver_setups)}"
)
print(
    f"per-instance (jit init + solve): {(t_init_jit + t_solve)/NBATCH*1e6:.2f} us"
)
