"""Time each piece of the BDF step body in isolation on the real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

NBATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N = 300

from diffsol_tpu.ensemble import make_lockstep_problem
from diffsol_tpu.models import robertson
from diffsol_tpu.solvers import bdf as bdf_mod
from diffsol_tpu.solvers.bdf import BdfSolver
from diffsol_tpu.ops import smalllu
from diffsol_tpu.norms import squared_norm
from diffsol_tpu.ops.newton import newton_solve

problem = robertson.problem_ode()
lp = make_lockstep_problem(problem, NBATCH)
k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, NBATCH))
params = jnp.stack(
    [k1, jnp.full((NBATCH,), 1.0e4), jnp.full((NBATCH,), 3.0e7)], axis=1
).astype(lp.params.dtype)
solver = BdfSolver(lp)
state = jax.jit(solver.init_state)(params)
p = lp


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def bench(label, body, carry):
    @jax.jit
    def run(carry):
        def loop(c):
            x, k = c
            return (body(x, k), k + 1)

        return jax.lax.while_loop(lambda c: c[1] < N, loop, (carry, 0))

    sync(run(carry))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(carry))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s}: {best/N*1e6:7.1f} us/iter")


D = state.D
y = state.y
dtype = y.dtype
order = state.order

bench("noop (floor)", lambda x, k: x * 1.0000001, y)

bench(
    "predict + psi",
    lambda x, k: bdf_mod._predict_from_diff(D + x[None] * 1e-20, order)
    + bdf_mod._psi(D + x[None] * 1e-20, order, dtype),
    y,
)

bench(
    "update_diff",
    lambda x, k: bdf_mod._update_diff(x, y, order)[0:8],
    D,
)

bench(
    "compute_ru + rescale",
    lambda x, k: jnp.tensordot(
        bdf_mod._compute_ru(order, 0.9 + 1e-9 * k, dtype), x, axes=[[0], [0]]
    ),
    D,
)

bench(
    "rhs eval",
    lambda x, k: p.eqn.rhs(4.0, x, params),
    y,
)

bench(
    "wrms squared_norm",
    lambda x, k: x + 1e-20 * squared_norm(x, y, p.atol, p.rtol, NBATCH),
    y,
)

jac0 = state.jac
factors = state.factors
bench(
    "lu_solve_batch_last",
    lambda x, k: smalllu.lu_solve_batch_last(factors, x),
    y,
)

bench(
    "jac eval (AD)",
    lambda x, k: p.eqn.jac(4.0, x, params)[0, 0] * 1e-20 + x,
    y,
)

bench(
    "assemble + lu_factor",
    lambda x, k: smalllu.lu_factor_batch_last(
        jnp.eye(3, dtype=dtype)[:, :, None] - 0.01 * (jac0 + x[None, None] * 1e-20)
    )[0][0, 0] * 1e-20 + x,
    y,
)


def newton2(x, k):
    def residual(z):
        fx = p.eqn.rhs(4.0, z, params)
        return z - x + 0.01 * fx

    res = newton_solve(
        residual,
        lambda v: smalllu.lu_solve_batch_last(factors, v),
        x, x, p.atol, p.rtol, jnp.asarray(0.5, dtype),
        max_iter=10, nbatch=NBATCH,
    )
    return res.x


bench("newton_solve (to convergence)", newton2, y)

bench("full solver.step", lambda x, k: solver.step(x, params), state)
