"""Fit a damped mass-spring system to data with adjoint gradients.

Equivalent of reference examples/mass-spring-fitting-adjoint (argmin +
adjoint sensitivities): here the entire fit is jax.grad + optax-free
gradient descent through the checkpointed adjoint backward pass.

Run: python examples/mass_spring_fitting_adjoint.py
"""

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt
from diffsol_tpu.adjoint import make_differentiable_solve


def main():
    def rhs(t, y, p):
        k, c = p[0], p[1]
        return jnp.array([y[1], -k * y[0] - c * y[1]])

    def init(t, p):
        return jnp.array([1.0, 0.0])

    problem = (
        dt.OdeBuilder().rhs(rhs).init(init).p([2.0, 0.4]).rtol(1e-8).atol(1e-10).build()
    )
    t_eval = jnp.linspace(0.0, 10.0, 40)
    ys_of = make_differentiable_solve(problem, t_eval)

    # synthetic data from the true parameters
    true_p = jnp.array([3.0, 0.25])
    data = ys_of(true_p)

    def loss(p):
        return jnp.mean((ys_of(p) - data) ** 2)

    p = jnp.array([2.0, 0.4])
    lg = jax.jit(jax.value_and_grad(loss))
    lr = 0.5
    for it in range(60):
        l, g = lg(p)
        p = p - lr * g
        if it % 15 == 0:
            print(f"iter {it:3d} loss {float(l):.3e} p {p}")
    print(f"fitted p = {p}, true p = {true_p}")
    assert float(jnp.max(jnp.abs(p - true_p))) < 0.02


if __name__ == "__main__":
    main()
