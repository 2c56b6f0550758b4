"""Fit a 1000-member mass-spring parameter ensemble with Adam on TPU.

The round-3 headline capability: ``jax.grad`` THROUGH a lockstep ensemble
solve.  One batched adjoint backward pass produces per-member gradients
(B, nparams) -- 1000 independent (k, c) fits advance in every Adam step,
all inside one compiled program.  The reference cannot do this: its adjoint
is single-context (reference crates/diffsol/src/ode_solver/adjoint.rs:13-159;
the nbatch context batches forward solves only), and each fit would be a
separate argmin run (examples/mass-spring-fitting-adjoint).

Run: python examples/mass_spring_fitting_ensemble.py        (TPU)
     JAX_PLATFORMS=cpu python examples/mass_spring_fitting_ensemble.py

Takes ~2-4 min including the two jit compiles (forward-table solve +
batched adjoint); the per-iteration cost after compile is milliseconds for
all 1000 members together.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
if os.environ.get("JAX_PLATFORMS"):
    # the axon TPU plugin ignores the env var; set the config knob too
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import optax

import diffsol_tpu as dt


def main():
    B = 1000

    def rhs(t, y, p):
        k, c = p[0], p[1]
        return jnp.array([y[1], -k * y[0] - c * y[1]])

    def init(t, p):
        return jnp.array([1.0, 0.0])

    problem = (
        dt.OdeBuilder()
        .rhs(rhs)
        .init(init)
        .p([2.0, 0.4])
        .rtol(1e-6)
        .atol(1e-8)
        .build()
    )
    t_eval = jnp.linspace(0.5, 8.0, 16)
    ys_of = dt.make_differentiable_solve_ensemble(
        problem, t_eval, B, max_steps=2048
    )

    # per-member ground truth: k in [2.5, 3.5], c in [0.15, 0.35]
    rng = np.random.default_rng(0)
    true_p = jnp.asarray(
        np.stack(
            [rng.uniform(2.5, 3.5, B), rng.uniform(0.15, 0.35, B)], axis=1
        )
    )
    data = ys_of(true_p)  # (neval, B, 2)

    def loss(p):
        return jnp.mean((ys_of(p) - data) ** 2)

    p = jnp.broadcast_to(jnp.array([2.0, 0.4]), (B, 2))
    opt = optax.adam(5e-2)
    opt_state = opt.init(p)

    @jax.jit
    def step(p, opt_state):
        l, g = jax.value_and_grad(loss)(p)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(p, updates), opt_state, l

    for it in range(120):
        p, opt_state, l = step(p, opt_state)
        if it % 20 == 0:
            err = float(jnp.max(jnp.abs(p - true_p)))
            print(f"iter {it:3d} loss {float(l):.3e} max|p-p*| {err:.3f}")
    err = float(jnp.max(jnp.abs(p - true_p)))
    print(f"final: loss {float(loss(p)):.3e}, max member error {err:.3f}")
    assert err < 0.05, err
    print(f"fitted all {B} members")


if __name__ == "__main__":
    main()
