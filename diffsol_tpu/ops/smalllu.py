"""Batched small-matrix dense LU with partial pivoting, in pure jnp.

Replaces XLA's LuDecomposition custom call for the solver hot path.  Two
reasons (both TPU-driven):

* TPU XLA implements LuDecomposition only for f32/c64 -- stiff-tolerance
  f64 solves would fail to compile;
* for the small systems ODE solvers factorize (n = 2..~40, batched over
  10k-member ensembles), an unrolled elimination compiles to straight-line
  batched VPU code with no dynamic control flow, which XLA fuses far better
  than the generic expander.

This is the TPU equivalent of the reference's dense LU backends
(reference crates/diffsol-la/src/linear_solver/nalgebra/lu.rs, faer/lu.rs,
cuda/lu.rs -- the latter loops cuSOLVER getrf over the batch; here the batch
is a vectorized leading axis).

The factorization is ``(lu, perm)`` with ``perm`` the row-permutation index
vector (applied to the RHS at solve time); batch dims broadcast.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_UNROLL_N = 48  # beyond this, fall back to jax.scipy (see linsol)


def lu_factor(a):
    """LU factorization with partial pivoting of a (..., n, n) matrix.

    Unrolled over the (static) dimension n; batched over leading dims.
    Returns (lu, perm) with L (unit diag) and U packed in ``lu`` and
    ``perm`` (..., n) int32 row-permutation indices.
    """
    n = a.shape[-1]
    batch = a.shape[:-2]
    lu = a
    perm = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), batch + (n,))
    rows = jnp.arange(n, dtype=jnp.int32)
    for k in range(n - 1):
        mag = jnp.abs(lu[..., k:, k])  # (..., n-k)
        pk = (k + jnp.argmax(mag, axis=-1)).astype(jnp.int32)  # (...,)
        # row swap k <-> pk as an index map applied to lu rows and perm
        pk_b = pk[..., None]
        swap = jnp.where(rows == k, pk_b, jnp.where(rows == pk_b, k, rows))
        lu = jnp.take_along_axis(lu, swap[..., None] * jnp.ones((n,), jnp.int32), axis=-2)
        perm = jnp.take_along_axis(perm, swap, axis=-1)
        pivot = lu[..., k, k]
        inv_p = 1.0 / pivot
        l = lu[..., k + 1 :, k] * inv_p[..., None]
        lu = lu.at[..., k + 1 :, k].set(l)
        lu = lu.at[..., k + 1 :, k + 1 :].add(
            -l[..., :, None] * lu[..., k : k + 1, k + 1 :]
        )
    return lu, perm


def lu_solve(factors, b):
    """Solve A x = b given :func:`lu_factor` output; b is (..., n).

    Batch dims of ``b`` broadcast against those of the factors (e.g. one
    factorization shared by nparams sensitivity right-hand sides).
    """
    lu, perm = factors
    n = lu.shape[-1]
    # broadcast b against factor batch dims, then apply the permutation
    if perm.ndim == 1:
        x = b[..., perm]
    else:
        bb = jnp.broadcast_to(b, jnp.broadcast_shapes(b.shape, perm.shape))
        pp = jnp.broadcast_to(perm, bb.shape)
        x = jnp.take_along_axis(bb, pp, axis=-1)
    # forward substitution (L unit lower)
    xs = [x[..., 0]]
    for i in range(1, n):
        acc = x[..., i]
        for j in range(i):
            acc = acc - lu[..., i, j] * xs[j]
        xs.append(acc)
    # back substitution (U upper)
    out = [None] * n
    for i in range(n - 1, -1, -1):
        acc = xs[i]
        for j in range(i + 1, n):
            acc = acc - lu[..., i, j] * out[j]
        out[i] = acc / lu[..., i, i]
    return jnp.stack(out, axis=-1)
