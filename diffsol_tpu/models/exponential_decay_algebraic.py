"""Exponential decay with an algebraic constraint (index-1 DAE).

Mirrors reference test_models/exponential_decay_with_algebraic.rs:
dy0/dt = -a y0, dy1/dt = -a y1, 0 = y2 - y1 with mass diag(1,1,0),
p = [a] (default 0.1), init = [1, 1, 0] (inconsistent: the IC solve must
find y2 = 1).  Analytic solution: all components = exp(-a t).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..problem import OdeBuilder, OdeProblem


def rhs(t, y, p):
    a = p[0]
    return jnp.array([-a * y[0], -a * y[1], y[2] - y[1]])


def mass(t, p):
    return jnp.diag(jnp.array([1.0, 1.0, 0.0]))


def init(t, p):
    return jnp.array([1.0, 1.0, 0.0])


def soln(t, p):
    t = jnp.asarray(t)
    e = jnp.exp(-p[0] * t)
    return jnp.stack([e, e, e], axis=-1)


def problem(rtol=1e-6, atol=1e-8, p=(0.1,)) -> OdeProblem:
    return (
        OdeBuilder().rhs(rhs).init(init).mass(mass).p(list(p)).rtol(rtol).atol(atol).build()
    )
