"""DiffSL end-to-end: specify a model as DSL text, solve it, and fit its
parameters with jax.grad through the adjoint.

The reference needs LLVM + Enzyme for this workflow
(reference examples/intro-logistic-diffsl/src/main.rs + build_from_diffsl,
diffsl.rs:239-330); here the DSL is traced into JAX callables and the
gradient comes from the checkpointed-adjoint custom_vjp.

Run: JAX_PLATFORMS=cpu python examples/diffsl_logistic_fit.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import diffsol_tpu as dt

CODE = """
in_i { r = 0.5, k = 5.0 }
u { 0.1 }
F { r * u * (1.0 - u / k) }
"""


def main():
    problem = dt.OdeBuilder().rtol(1e-8).atol(1e-10).build_from_diffsl(CODE)
    t_eval = jnp.linspace(0.0, 8.0, 15)

    # synthetic data from the "true" parameters
    true_p = jnp.asarray([1.0, 10.0])
    ys_of = dt.make_differentiable_solve(problem, t_eval)
    data = ys_of(true_p)

    @jax.jit
    def loss(p):
        return jnp.sum((ys_of(p) - data) ** 2)

    import optax

    grad = jax.jit(jax.grad(loss))
    p = jnp.asarray(problem.params)  # DiffSL in_i defaults: [0.5, 5.0]
    opt = optax.adam(0.1)
    opt_state = opt.init(p)
    for it in range(200):
        updates, opt_state = opt.update(grad(p), opt_state)
        p = optax.apply_updates(p, updates)
    print(f"fitted p = {p} (true {true_p}), loss = {float(loss(p)):.3e}")
    assert float(loss(p)) < 1e-4
    print("OK")


if __name__ == "__main__":
    main()
