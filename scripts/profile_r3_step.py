"""Decompose the BDF per-step fixed cost on the real TPU.

Components timed at B=10k f64 robertson (and B=100 for the fixed floor):
  (a) raw repeated solver.step in a fori_loop (no solve_dense write logic)
  (b) a dummy while_loop carrying the full BdfState with a trivial body
      (pure loop/carry overhead)
  (c) newton_solve alone (residual + LU solve + norm per iteration)
  (d) the D-matrix update + predict chain alone

Run: python scripts/profile_r3_step.py [B]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/diffsol_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from diffsol_tpu.drivers import init_state_jit
from diffsol_tpu.ensemble import make_lockstep_problem
from diffsol_tpu.models import robertson
from diffsol_tpu.solvers.bdf import BdfSolver

B = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N_STEPS = 200


def timeit(fn, *args):
    # each fn returns ONE scalar: a single device->host read syncs the run
    # (the tunnel costs ~5 ms per read; per-leaf reads would poison timing)
    out = fn(*args)
    float(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    problem = robertson.problem_ode(rtol=1e-4, atol=1e-6)
    lp = make_lockstep_problem(problem, B)
    k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, B))
    params = jnp.stack(
        [k1, jnp.full((B,), 1.0e4), jnp.full((B,), 3.0e7)], axis=1
    ).astype(lp.params.dtype)
    solver = BdfSolver(lp)
    state = init_state_jit(solver, params)
    state = solver.set_stop_time(state, 4.0e5)

    # (a) raw steps
    @jax.jit
    def raw_steps(st):
        end = jax.lax.fori_loop(
            0, N_STEPS, lambda i, s: solver.step(s, params), st
        )
        return jnp.sum(end.y[:, 0]) + end.t

    t, _ = timeit(raw_steps, state)
    print(f"[B={B}] (a) raw step x{N_STEPS}: {t/N_STEPS*1e6:.0f} us/step")

    # (b) dummy while carrying the full state
    @jax.jit
    def dummy_loop(st):
        def body(c):
            s, k = c
            return s.replace(t=s.t + 1e-9), k + 1

        end, _ = jax.lax.while_loop(
            lambda c: c[1] < N_STEPS, body, (st, jnp.asarray(0, jnp.int32))
        )
        return jnp.sum(end.y[:, 0]) + end.t

    t, _ = timeit(dummy_loop, state)
    print(f"[B={B}] (b) dummy while carry: {t/N_STEPS*1e6:.1f} us/iter")

    # (c) newton_solve alone (3 fixed iterations worth: use max_iter=3)
    from diffsol_tpu.ops.newton import newton_solve

    p = lp
    cval = state.h * 0.5

    @jax.jit
    def newton_only(st):
        def body(i, y):
            residual = lambda x: x - y + cval * p.eqn.rhs(st.t, x, params)
            lin = lambda v: p.linear_solver.solve(st.factors, v)
            res = newton_solve(
                residual, lin, y, y, p.atol, p.rtol, st.eta, nbatch=B
            )
            return res.x

        return jnp.sum(jax.lax.fori_loop(0, N_STEPS, body, st.y)[:, 0])

    t, _ = timeit(newton_only, state)
    print(f"[B={B}] (c) newton_solve x{N_STEPS}: {t/N_STEPS*1e6:.0f} us/call")

    # (d) D update + predict chain
    from diffsol_tpu.solvers.bdf import _predict_from_diff, _psi, _update_diff

    @jax.jit
    def d_chain(st):
        def body(i, D):
            y_pred = _predict_from_diff(D, st.order)
            psi = _psi(D, st.order, D.dtype)
            return _update_diff(D, y_pred * 1e-9 + psi * 0.0, st.order)

        return jnp.sum(jax.lax.fori_loop(0, N_STEPS, body, st.D)[0, :, 0])

    t, _ = timeit(d_chain, state)
    print(f"[B={B}] (d) D update+predict x{N_STEPS}: {t/N_STEPS*1e6:.1f} us/iter")

    # (e) one rhs + one linear solve + one norm, fori (fusion floor)
    from diffsol_tpu.norms import squared_norm

    @jax.jit
    def one_iter(st):
        def body(i, y):
            f = p.eqn.rhs(st.t, y, params)
            d = p.linear_solver.solve(st.factors, f)
            n = squared_norm(d, y, p.atol, p.rtol, B)
            return y - d * (1.0 + 0.0 * n)

        return jnp.sum(jax.lax.fori_loop(0, N_STEPS, body, st.y)[:, 0])

    t, _ = timeit(one_iter, state)
    print(f"[B={B}] (e) rhs+solve+norm x{N_STEPS}: {t/N_STEPS*1e6:.1f} us/iter")


if __name__ == "__main__":
    main()
