"""Profile where the fixed per-step cost of the lockstep BDF solve goes.

Run on the real TPU: `python scripts/profile_step.py [nbatch]`.

Experiments:
  1. bench workload iteration counts (steps / attempts / newton iters) and
     total wall time -> derives the true cost per step attempt;
  2. while_loop with a trivial body -> per-iteration floor;
  3. while_loop whose body has K sequential lax.conds -> cost per cond
     boundary;
  4. while_loop whose body is one straight-line Newton-like iteration
     (residual + unrolled 3x3 LU solve + WRMS norm, no control flow)
     -> cost of the arithmetic itself.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

NBATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # tunnel backend: force a scalar read to really sync
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def exp1():
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

    def run(pb):
        state = solver.init_state(pb)
        return solve_dense(solver, t_eval, params=pb, state=state, max_steps=5000)

    t = timeit(run, params)
    sol = run(params)
    st = sol.state.stats
    print(
        f"exp1 bench solve: {t*1e3:.1f} ms total | steps={int(st.steps)} "
        f"err_fails={int(st.error_test_failures)} "
        f"newton_iters={int(st.newton_iterations)} "
        f"newton_fails={int(st.newton_fails)} "
        f"lu_setups={int(st.linear_solver_setups)} "
        f"jac_evals={int(st.jacobian_evals)}"
    )
    attempts = int(st.steps) + int(st.error_test_failures) + int(st.newton_fails)
    print(
        f"  -> per accepted step: {t/int(st.steps)*1e6:.0f} us | "
        f"per attempt: {t/attempts*1e6:.0f} us | "
        f"per newton iter: {t/int(st.newton_iterations)*1e6:.0f} us"
    )


N_ITERS = 1000


def exp2():
    x0 = jnp.ones((3, NBATCH))

    @jax.jit
    def run(x):
        def body(c):
            x, k = c
            return (x * 1.0000001 + 1e-9, k + 1)

        return jax.lax.while_loop(lambda c: c[1] < N_ITERS, body, (x, 0))

    t = timeit(run, x0)
    print(f"exp2 trivial while: {t/N_ITERS*1e6:.1f} us/iter")


def exp3(k_conds=8):
    x0 = jnp.ones((3, NBATCH))

    @jax.jit
    def run(x):
        def body(c):
            x, k = c
            for i in range(k_conds):
                x = jax.lax.cond(
                    (k + i) % 2 == 0,
                    lambda x: x * 1.0000001,
                    lambda x: x + 1e-9,
                    x,
                )
            return (x, k + 1)

        return jax.lax.while_loop(lambda c: c[1] < N_ITERS, body, (x, 0))

    t = timeit(run, x0)
    print(f"exp3 {k_conds} conds/iter: {t/N_ITERS*1e6:.1f} us/iter "
          f"(~{(t/N_ITERS)*1e6/k_conds:.1f} us/cond)")


def exp4():
    from diffsol_tpu.ops import smalllu
    from diffsol_tpu.norms import norm

    key = jax.random.PRNGKey(0)
    a = jnp.eye(3)[:, :, None] + 0.1 * jax.random.normal(key, (3, 3, NBATCH))
    factors = smalllu.lu_factor_batch_last(a)
    y = jnp.ones((3, NBATCH))

    @jax.jit
    def run(x):
        def body(c):
            x, k = c
            # robertson-like rhs
            f = jnp.stack(
                [
                    -0.04 * x[0] + 1e4 * x[1] * x[2],
                    0.04 * x[0] - 1e4 * x[1] * x[2] - 3e7 * x[1] ** 2,
                    3e7 * x[1] ** 2,
                ]
            )
            r = x - y + 0.01 * f
            delta = smalllu.lu_solve_batch_last(factors, r)
            x = x - 0.001 * delta
            nrm = norm(delta, y, 1e-6, 1e-4, NBATCH)
            x = x + 1e-12 * nrm
            return (x, k + 1)

        return jax.lax.while_loop(lambda c: c[1] < N_ITERS, body, (x, 0))

    t = timeit(run, y * 0.5)
    print(f"exp4 newton-like body: {t/N_ITERS*1e6:.1f} us/iter")


def exp5(k_ops=16):
    """Chain of reduce->broadcast pairs that XLA cannot fuse into one kernel:
    measures the marginal cost per fusion boundary inside a while body."""
    x0 = jnp.ones((3, NBATCH))

    @jax.jit
    def run(x):
        def body(c):
            x, k = c
            for _ in range(k_ops):
                s = jnp.sum(x)  # full reduce: fusion barrier
                x = x + s * 1e-20
            return (x, k + 1)

        return jax.lax.while_loop(lambda c: c[1] < N_ITERS, body, (x, 0))

    t = timeit(run, x0)
    print(
        f"exp5 {k_ops} reduce+bcast/iter: {t/N_ITERS*1e6:.1f} us/iter "
        f"(~{(t/N_ITERS)*1e6/k_ops:.2f} us/barrier)"
    )


def exp6():
    """f64 vs f32 elementwise chain cost inside a while body."""
    for dtype in (jnp.float64, jnp.float32):
        x0 = jnp.ones((3, NBATCH), dtype)

        @jax.jit
        def run(x):
            def body(c):
                x, k = c
                for _ in range(50):
                    x = x * 1.0000001 + 1e-9
                return (x, k + 1)

            return jax.lax.while_loop(lambda c: c[1] < N_ITERS, body, (x, 0))

        t = timeit(run, x0)
        print(f"exp6 50 elementwise {dtype.__name__}: {t/N_ITERS*1e6:.1f} us/iter")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  nbatch={NBATCH}")
    for name in sys.argv[2:] or ["exp2", "exp3", "exp4", "exp1"]:
        t0 = time.perf_counter()
        globals()[name]()
        print(f"  ({name} incl compile: {time.perf_counter()-t0:.1f} s)")
