"""Pallas TPU kernel: fused WRMS squared-norm for lockstep ensembles.

The WRMS norm (see :mod:`diffsol_tpu.norms`) is evaluated several times per
step attempt (Newton deltas, error tests, order selection).  XLA emits it as
abs + mul + div + square + two reductions over the (n, B) state; this kernel
fuses the whole thing into one VMEM pass per block:

    out[j] = max_over_block_j( mean_i( (x[i,j] / (|y[i,j]|*rtol + atol[i]))^2 ) )

with the final cross-block max done by the caller (one tiny reduce).  The
kernel is f32 (TPU vector registers are 32-bit; f64 states use the jnp path)
and falls back to the jnp implementation off-TPU or for f64 -- call
:func:`wrms_squared_lockstep` which dispatches automatically.

This is the Pallas analog of the reference's hand-written batched reduction
kernel (reference crates/diffsol-la/src/cuda_kernels/vec_squared_norm.cu:
per-batch shared-memory reduction then max across batches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import norms

LANE = 128


def _wrms_kernel(x_ref, y_ref, atol_ref, rtol_ref, out_ref):
    rtol = rtol_ref[0, 0]
    scale = jnp.abs(y_ref[:]) * rtol + atol_ref[:]
    term = x_ref[:] / scale
    sq = term * term
    # mean over states (sublane axis), keep the member lanes
    out_ref[:] = jnp.mean(sq, axis=0, keepdims=True)


def wrms_squared_lockstep_pallas(x, y, atol, rtol):
    """Fused (n, B) -> scalar WRMS^2 with mean-over-states, max-over-members.

    Requires f32 inputs, B a multiple of 128.  ``atol`` is (n, 1) or (n, B).
    """
    n, b = x.shape
    atol_b = jnp.broadcast_to(atol, (n, b)).astype(x.dtype)
    rtol_arr = jnp.full((1, 1), rtol, x.dtype)
    nblocks = b // LANE
    per_member = pl.pallas_call(
        _wrms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, b), x.dtype),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((n, LANE), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANE), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANE), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, LANE), lambda j: (0, j), memory_space=pltpu.VMEM),
    )(x, y, atol_b, rtol_arr)
    return jnp.max(per_member)


def wrms_squared_lockstep(x, y, atol, rtol, *, interpret: bool = False):
    """Dispatch: Pallas kernel on TPU/f32 with lane-aligned members, else the
    jnp reference implementation (identical semantics)."""
    use_pallas = (
        x.ndim == 2
        and x.dtype == jnp.float32
        and x.shape[1] % LANE == 0
        and (interpret or jax.default_backend() == "tpu")
    )
    if not use_pallas:
        return norms.squared_norm(x, y, atol, rtol, nbatch=x.shape[-1])
    if interpret:
        n, b = x.shape
        atol_b = jnp.broadcast_to(atol, (n, b)).astype(x.dtype)
        rtol_arr = jnp.full((1, 1), rtol, x.dtype)
        per_member = pl.pallas_call(
            _wrms_kernel,
            out_shape=jax.ShapeDtypeStruct((1, b), x.dtype),
            grid=(b // LANE,),
            in_specs=[
                pl.BlockSpec((n, LANE), lambda j: (0, j)),
                pl.BlockSpec((n, LANE), lambda j: (0, j)),
                pl.BlockSpec((n, LANE), lambda j: (0, j)),
                pl.BlockSpec((1, 1), lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, LANE), lambda j: (0, j)),
            interpret=True,
        )(x, y, atol_b, rtol_arr)
        return jnp.max(per_member)
    return wrms_squared_lockstep_pallas(x, y, atol, rtol)
