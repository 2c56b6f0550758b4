"""Logistic growth fixture: du/dt = r*u*(1 - u/k), p = [r, k, y0].

Mirrors reference crates/diffsol/src/ode_equations/test_models/logistic.rs
with analytic solution u(t) = y0 e^{rt} / (1 - y0/k + (y0/k) e^{rt}).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..problem import OdeBuilder, OdeProblem


def rhs(t, y, p):
    r, k = p[0], p[1]
    return r * y * (1.0 - y / k)


def init(t, p):
    return jnp.array([p[2]])


def soln(t, p):
    r, k, y0 = p[0], p[1], p[2]
    t = jnp.asarray(t)
    e = jnp.exp(r * t)
    return (y0 * e / (1.0 - y0 / k + (y0 / k) * e))[..., None]


def problem(rtol=1e-6, atol=1e-6, p=(1.0, 1.0, 0.1)) -> OdeProblem:
    return OdeBuilder().rhs(rhs).init(init).p(list(p)).rtol(rtol).atol(atol).build()
