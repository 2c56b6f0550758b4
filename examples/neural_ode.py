"""Neural ODE trained with adjoint gradients through the BDF solver.

Equivalent of reference examples/neural-ode-weather-prediction (ONNX MLP +
adjoint training): a small MLP vector field whose flattened weights ARE the
ODE parameters; jax.grad through the solver (custom_vjp adjoint) trains it
to reproduce a spiral trajectory.

Run: python examples/neural_ode.py
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import diffsol_tpu as dt
from diffsol_tpu.adjoint import make_differentiable_solve

HIDDEN = 16


def unpack(p):
    i = 0
    w1 = p[i : i + 2 * HIDDEN].reshape(2, HIDDEN); i += 2 * HIDDEN
    b1 = p[i : i + HIDDEN]; i += HIDDEN
    w2 = p[i : i + HIDDEN * 2].reshape(HIDDEN, 2); i += HIDDEN * 2
    b2 = p[i : i + 2]
    return w1, b1, w2, b2


N_PARAMS = 2 * HIDDEN + HIDDEN + HIDDEN * 2 + 2


def vector_field(t, y, p):
    w1, b1, w2, b2 = unpack(p)
    h = jnp.tanh(y @ w1 + b1)
    return h @ w2 + b2


def main():
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.normal(scale=0.1, size=(N_PARAMS,)))

    problem = (
        dt.OdeBuilder()
        .rhs(vector_field)
        .init(lambda t, p: jnp.array([1.0, 0.0]))
        .p(p0)
        .rtol(1e-6)
        .atol(1e-8)
        .build()
    )
    t_eval = jnp.linspace(0.0, 2.0, 16)
    ys_of = make_differentiable_solve(problem, t_eval, max_steps=4096)

    # target: a decaying spiral
    a_true = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]])
    t = np.asarray(t_eval)
    target = jax.vmap(
        lambda tt: jax.scipy.linalg.expm(a_true * tt) @ jnp.array([1.0, 0.0])
    )(t_eval)

    def loss(p):
        return jnp.mean((ys_of(p) - target) ** 2)

    lg = jax.jit(jax.value_and_grad(loss))
    p = p0
    # simple Adam
    m = jnp.zeros_like(p); v = jnp.zeros_like(p)
    lr, b1m, b2m, eps = 0.05, 0.9, 0.999, 1e-8
    l0 = None
    for it in range(150):
        l, g = lg(p)
        if l0 is None:
            l0 = float(l)
        m = b1m * m + (1 - b1m) * g
        v = b2m * v + (1 - b2m) * g * g
        mh = m / (1 - b1m ** (it + 1))
        vh = v / (1 - b2m ** (it + 1))
        p = p - lr * mh / (jnp.sqrt(vh) + eps)
        if it % 30 == 0:
            print(f"iter {it:3d} loss {float(l):.4e}")
    print(f"loss: {l0:.3e} -> {float(l):.3e}")
    assert float(l) < 0.02 * l0, "neural ODE failed to train"


if __name__ == "__main__":
    main()
