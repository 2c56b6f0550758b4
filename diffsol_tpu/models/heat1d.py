"""1D heat equation by method of lines (triangle-wave IC, Dirichlet BCs).

Mirrors reference test_models/heat1d.rs: u_t = D u_xx on (0,1) with u=0 at
both ends, grid x_i = (i+1) h, h = 1/(mgrid+2), n = mgrid+1 interior
points, initial condition the triangle wave u0(x) = 2x (x<1/2) else
2(1-x).  Analytic solution is the classic Fourier sine series
u(x,t) = (8/pi^2) sum_{odd m=2k-1} (-1)^(k-1) sin(m pi x)
exp(-m^2 pi^2 t) / m^2 (the odd harmonics alternate in sign).
The Jacobian is the tridiagonal Laplacian -- the banded linear-solver tier's
natural test problem.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..problem import OdeBuilder, OdeProblem


def make(mgrid: int = 20, rtol=1e-6, atol=1e-6):
    """Return (problem, soln_fn) for an mgrid+1-point MOL discretization."""
    n = mgrid + 1
    h = 1.0 / (mgrid + 2)

    def rhs(t, y, p):
        d = p[0]
        left = jnp.concatenate([jnp.zeros_like(y[:1]), y[:-1]])
        right = jnp.concatenate([y[1:], jnp.zeros_like(y[:1])])
        return d * (left - 2.0 * y + right) / (h * h)

    def init(t, p):
        x = (jnp.arange(n) + 1.0) * h
        return jnp.where(x < 0.5, 2.0 * x, 2.0 * (1.0 - x))

    problem = (
        OdeBuilder().rhs(rhs).init(init).p([1.0]).rtol(rtol).atol(atol).build()
    )

    def soln(t):
        """Fourier series solution at grid points (heat1d.rs:77-92)."""
        x = (np.arange(n) + 1.0) * h
        t = np.atleast_1d(np.asarray(t, dtype=np.float64))
        u = np.zeros((t.shape[0], n))
        for k in range(1, 100):
            m = 2 * k - 1
            # the odd harmonics of the triangle-wave IC alternate in sign:
            # sin(m*pi/2) = (-1)^(k-1)
            u += (
                (-1.0) ** (k - 1)
                * np.sin(m * np.pi * x)[None, :]
                * np.exp(-(m**2) * np.pi**2 * t)[:, None]
                / m**2
            )
        return 8.0 / np.pi**2 * u

    return problem, soln
