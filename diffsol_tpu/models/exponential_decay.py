"""Exponential decay fixture: dy/dt = -a*y, p = [a, y0].

Mirrors the reference analytic test model (reference
crates/diffsol/src/ode_equations/test_models/exponential_decay.rs): two
identical decaying states, analytic solution y(t) = y0 * exp(-a t), default
p = [0.1, 1.0], t0 = 0, and root/reset variants for the event tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..problem import OdeBuilder, OdeProblem


def rhs(t, y, p):
    return -p[0] * y


def init(t, p):
    return jnp.full((2,), p[1])


def soln(t, p):
    """Analytic solution, shape (..., 2)."""
    t = jnp.asarray(t)
    return init(0.0, p) * jnp.exp(-p[0] * t)[..., None]


def problem(rtol=1e-6, atol=1e-6, p=(0.1, 1.0), integrate_out=False) -> OdeProblem:
    b = (
        OdeBuilder()
        .rhs(rhs)
        .init(init)
        .p(list(p))
        .rtol(rtol)
        .atol(atol)
    )
    if integrate_out:
        # default output = identity on state (sum quadrature checked in tests)
        b = b.integrate_out()
    return b.build()


def problem_with_root(rtol=1e-6, atol=1e-6, p=(0.1, 1.0)) -> OdeProblem:
    """Root when y[0] drops to 0.6 (exponential_decay.rs root variant)."""
    return (
        OdeBuilder()
        .rhs(rhs)
        .init(init)
        .root(lambda t, y, p_: jnp.array([y[0] - 0.6]))
        .p(list(p))
        .rtol(rtol)
        .atol(atol)
        .build()
    )


def problem_with_reset(rtol=1e-6, atol=1e-6, p=(0.1, 1.0)) -> OdeProblem:
    """Root at y[0] = 0.6 then reset y back to the initial value."""
    return (
        OdeBuilder()
        .rhs(rhs)
        .init(init)
        .root(lambda t, y, p_: jnp.array([y[0] - 0.6]))
        .reset(lambda t, y, p_: jnp.full_like(y, p_[1]))
        .p(list(p))
        .rtol(rtol)
        .atol(atol)
        .build()
    )
