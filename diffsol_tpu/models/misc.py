"""Small fixture problems: gaussian decay, dydt=y^2, Lorenz, robertson_ode
groups (reference test_models/gaussian_decay.rs, dydt_y2.rs,
robertson_ode.rs; Lorenz from examples/lorenz-attractor)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..problem import OdeBuilder, OdeProblem


def gaussian_decay_problem(size: int = 10, rtol=1e-6, atol=1e-6) -> OdeProblem:
    """dy_i/dt = -p_i t y_i; y(t) = exp(-p t^2 / 2) (gaussian_decay.rs)."""
    return (
        OdeBuilder()
        .rhs(lambda t, y, p: -p * t * y)
        .init(lambda t, p: jnp.ones((size,)))
        .p([0.1] * size)
        .rtol(rtol)
        .atol(atol)
        .build()
    )


def gaussian_decay_soln(t, p):
    t = jnp.asarray(t)
    return jnp.exp(-p[None, :] * (t**2 / 2.0)[:, None])


def dydt_y2_problem(size: int = 10, rtol=1e-4, atol=1e-6) -> OdeProblem:
    """dy/dt = y^2, y0 = -200; y = y0/(1 - y0 t) (dydt_y2.rs)."""
    return (
        OdeBuilder()
        .rhs(lambda t, y, p: y * y)
        .init(lambda t, p: jnp.full((size,), -200.0))
        .p([0.0])
        .rtol(rtol)
        .atol(atol)
        .build()
    )


def dydt_y2_soln(t, size: int = 10):
    t = np.asarray(t)
    y = -200.0 / (1.0 + 200.0 * t)
    return np.tile(y[:, None], (1, size))


def lorenz_problem(rtol=1e-6, atol=1e-8, p=(10.0, 28.0, 8.0 / 3.0)) -> OdeProblem:
    """The Lorenz attractor (examples/lorenz-attractor-diffsl-llvm)."""

    def rhs(t, y, p):
        s, r, b = p[0], p[1], p[2]
        return jnp.array(
            [s * (y[1] - y[0]), y[0] * (r - y[2]) - y[1], y[0] * y[1] - b * y[2]]
        )

    return (
        OdeBuilder()
        .rhs(rhs)
        .init(lambda t, p: jnp.array([1.0, 1.0, 1.0]))
        .p(list(p))
        .rtol(rtol)
        .atol(atol)
        .build()
    )


def robertson_ode_groups(ngroups: int = 4, rtol=1e-4) -> OdeProblem:
    """ngroups duplicated Robertson systems in one state vector
    (robertson_ode.rs:46-100; the reference's sparse-Jacobian benchmark).
    The 3x3 block-diagonal Jacobian is declared via a block-cyclic coloring
    Jacobian (3 JVP probes regardless of ngroups)."""

    n = 3 * ngroups

    def rhs(t, y, p):
        u = y.reshape(ngroups, 3)
        r0 = -p[0] * u[:, 0] + p[1] * u[:, 1] * u[:, 2]
        r1 = p[0] * u[:, 0] - p[1] * u[:, 1] * u[:, 2] - p[2] * u[:, 1] ** 2
        r2 = p[2] * u[:, 1] ** 2
        return jnp.stack([r0, r1, r2], axis=1).reshape(-1)

    def init(t, p):
        return jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), ngroups)

    atol = jnp.tile(jnp.asarray([1.0e-8, 1.0e-14, 1.0e-6]), ngroups)
    return (
        OdeBuilder()
        .rhs(rhs)
        .init(init)
        .p([0.04, 1.0e4, 3.0e7])
        .rtol(rtol)
        .atol(atol)
        .build()
    )
