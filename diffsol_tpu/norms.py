"""Scaled error norms.

The reference error norm (reference crates/diffsol-la/src/vector/mod.rs:199-212,
nalgebra_serial.rs:330-343) is the squared WRMS norm

    ||x||^2 = (1/n) * sum_i ( x_i / (|y_i| * rtol + atol_i) )^2

For batched (ensemble-lockstep) vectors the reference reduces the mean over
states per batch member, then takes the MAX across batch members so every
member shares one adaptive step (vector/mod.rs tests:756-775).

TPU layout note: lockstep state vectors are stored FLAT as (nbatch * n,)
(member-major) so elementwise solver arithmetic fills the 128-wide vector
lanes regardless of how small each member system is; the norm reshapes to
(nbatch, n) internally for the mean-then-max reduction.  Extra leading axes
(e.g. sensitivity rows) are max-reduced as well.
"""

from __future__ import annotations

import jax.numpy as jnp


def squared_norm(x, y, atol, rtol, nbatch: int = 1):
    """Squared WRMS norm of ``x`` scaled by ``|y|*rtol + atol``.

    The trailing axis holds ``nbatch`` member systems of length
    ``x.shape[-1] // nbatch``: mean over states, max over members and over
    any extra leading axes.  Returns a scalar (or a vmap-batched scalar).
    """
    scale = jnp.abs(y) * rtol + atol
    term = x / scale
    sq = term * term
    if nbatch > 1:
        sq = sq.reshape(sq.shape[:-1] + (nbatch, sq.shape[-1] // nbatch))
    per_batch = jnp.mean(sq, axis=-1)
    return jnp.max(per_batch)


def norm(x, y, atol, rtol, nbatch: int = 1):
    """WRMS norm (square root of :func:`squared_norm`)."""
    return jnp.sqrt(squared_norm(x, y, atol, rtol, nbatch))
