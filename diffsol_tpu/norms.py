"""Scaled error norms.

The reference error norm (reference crates/diffsol-la/src/vector/mod.rs:199-212,
nalgebra_serial.rs:330-343) is the squared WRMS norm

    ||x||^2 = (1/n) * sum_i ( x_i / (|y_i| * rtol + atol_i) )^2

For batched (ensemble-lockstep) vectors the reference reduces the mean over
states per batch member, then takes the MAX across batch members so every
member shares one adaptive step (vector/mod.rs tests:756-775).  Here a vector
is an array whose LAST axis is the state axis; any leading axes are lockstep
batch axes and are max-reduced.
"""

from __future__ import annotations

import jax.numpy as jnp


def squared_norm(x, y, atol, rtol):
    """Squared WRMS norm of ``x`` scaled by ``|y|*rtol + atol``.

    Mean over the trailing (state) axis, max over any leading batch axes.
    Returns a scalar.
    """
    scale = jnp.abs(y) * rtol + atol
    term = x / scale
    per_batch = jnp.mean(term * term, axis=-1)
    return jnp.max(per_batch)


def norm(x, y, atol, rtol):
    """WRMS norm (square root of :func:`squared_norm`)."""
    return jnp.sqrt(squared_norm(x, y, atol, rtol))
