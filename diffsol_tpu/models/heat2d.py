"""2D heat equation DAE (IDA's idaHeat2D example), method of lines.

Mirrors reference test_models/heat2d.rs: u_t = u_xx + u_yy on the unit
square, MGRID x MGRID grid (row-major), Dirichlet boundaries expressed as
ALGEBRAIC constraints: mass diagonal is 1 at interior points and 0 at
boundary points, and the residual at a boundary point is u itself
(heat2d.rs:102-199).  init u0 = 16 x (1-x) y (1-y), output
g = (dx * ||u||_2)^2.

The Jacobian is the 5-point Laplacian: bandwidth (MGRID, MGRID) -- the
banded linear-solver tier replaces the reference's KLU here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.banded import make_banded_solver
from ..problem import OdeBuilder, OdeProblem


def make(mgrid: int = 10, rtol=1e-5, atol=1e-5, banded: bool = True):
    """Return the heat2d DAE problem (n = mgrid^2 states)."""
    n = mgrid * mgrid
    dx = 1.0 / (mgrid - 1)
    coeff = 1.0 / (dx * dx)
    idx = np.arange(n)
    ii = idx % mgrid
    jj = idx // mgrid
    interior = (ii > 0) & (ii < mgrid - 1) & (jj > 0) & (jj < mgrid - 1)
    interior_j = jnp.asarray(interior)
    mass_diag = jnp.asarray(np.where(interior, 1.0, 0.0))

    def rhs(t, y, p):
        u = y.reshape(mgrid, mgrid)
        lap = (
            jnp.roll(u, 1, 0) + jnp.roll(u, -1, 0)
            + jnp.roll(u, 1, 1) + jnp.roll(u, -1, 1)
            - 4.0 * u
        ).reshape(-1) * coeff
        return jnp.where(interior_j, lap, y)

    def mass(t, p):
        return jnp.diag(mass_diag)

    def init(t, p):
        x = (ii * dx).astype(np.float64)
        yv = (jj * dx).astype(np.float64)
        u0 = 16.0 * x * (1.0 - x) * yv * (1.0 - yv)
        return jnp.asarray(np.where(interior, u0, 0.0))

    def out(t, y, p):
        return jnp.array([jnp.sum(y * y) * dx * dx])

    b = (
        OdeBuilder()
        .rhs(rhs)
        .init(init)
        .mass(mass)
        .out(out)
        .p([1.0])
        .rtol(rtol)
        .atol(atol)
    )
    if banded:
        b = b.linear_solver(make_banded_solver(mgrid, mgrid))
    return b.build()
