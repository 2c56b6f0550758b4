"""Flagship workload: 10k-member stiff Robertson parameter sweep.

The headline TPU capability vs the reference (which solves ensembles via the
CUDA nbatch context, one GPU): a lockstep BDF ensemble with a flat packed
state, sharded over whatever devices are available.

Run: python examples/robertson_ensemble_tpu.py [nbatch]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt
from diffsol_tpu.models import robertson


def main():
    nbatch = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    problem = robertson.problem_ode()
    k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, nbatch))
    params = jnp.stack(
        [k1, jnp.full((nbatch,), 1.0e4), jnp.full((nbatch,), 3.0e7)], axis=1
    )
    t_eval = jnp.asarray([0.4, 4.0, 400.0, 4.0e4, 4.0e5])

    # mode="auto": on a TPU backend this problem is in the fused Pallas
    # kernel tier's scope (whole adaptive solve = one kernel per member
    # tile); elsewhere it runs the XLA lockstep path
    t0 = time.perf_counter()
    sol = dt.solve_dense_ensemble(
        dt.BdfSolver, problem, t_eval, params, mode="auto", max_steps=5000
    )
    jax.block_until_ready(sol.ys)
    compile_and_run = time.perf_counter() - t0

    t0 = time.perf_counter()
    sol = dt.solve_dense_ensemble(
        dt.BdfSolver, problem, t_eval, params, mode="auto", max_steps=5000
    )
    jax.block_until_ready(sol.ys)
    run = time.perf_counter() - t0

    print(f"devices: {jax.devices()}")
    print(f"{nbatch} members x {len(t_eval)} outputs: "
          f"first call {compile_and_run:.2f}s, steady state {run:.3f}s "
          f"({run / nbatch * 1e6:.1f} us/instance)")
    cons = float(jnp.max(jnp.abs(sol.ys.sum(-1) - 1.0)))
    print(f"max conservation error across ensemble: {cons:.2e}")


if __name__ == "__main__":
    main()
