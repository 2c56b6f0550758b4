"""Sparse-Jacobian compression by graph coloring.

The general-sparsity companion of the banded tier: detect the Jacobian's
sparsity pattern once at setup, color the column-conflict graph (native C++
greedy coloring, reference crates/diffsol/src/jacobian/coloring.rs +
greedy_coloring.rs; pure-Python fallback), then evaluate the full Jacobian
with ``ncolors`` JVP probes and a precomputed scatter -- the reference's
`JacobianColoring::jacobian_inplace` (jacobian/mod.rs:218-260) as traced
gather/scatter.

Where the reference detects sparsity with NaN probing (jacobian/mod.rs:16-114,
documented to fail under input-dependent control flow), we evaluate the
Jacobian concretely at the initial state at setup time -- exact under the
same assumption (structure independent of y) and without NaN hazards.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_NATIVE_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "coloring.cpp",
)


@lru_cache(maxsize=1)
def _load_native():
    """Compile and load the native coloring library (cached .so)."""
    try:
        cache_dir = os.path.join(tempfile.gettempdir(), "diffsol_tpu_native")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, "libdiffsol_coloring.so")
        if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(_NATIVE_SRC)
        ):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", so_path, _NATIVE_SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.diffsol_greedy_color.restype = ctypes.c_int64
        lib.diffsol_greedy_color.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        return lib
    except Exception:
        return None


def greedy_color(rows: np.ndarray, cols: np.ndarray, n_rows: int, n_cols: int):
    """Color the column-conflict graph of a sparsity pattern.

    Returns (colors, ncolors).  Uses the native C++ library when available,
    else a pure-Python greedy fallback with identical semantics.
    """
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    lib = _load_native()
    if lib is not None:
        colors = np.empty(n_cols, dtype=np.int64)
        nc = lib.diffsol_greedy_color(
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(rows),
            n_rows,
            n_cols,
            colors.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if nc > 0:
            return colors, int(nc)
    # pure-Python fallback
    row_cols: list[list[int]] = [[] for _ in range(n_rows)]
    for r, c in zip(rows, cols):
        row_cols[r].append(int(c))
    adj: list[set[int]] = [set() for _ in range(n_cols)]
    for rc in row_cols:
        for a in range(len(rc)):
            for b in range(a + 1, len(rc)):
                adj[rc[a]].add(rc[b])
                adj[rc[b]].add(rc[a])
    colors = np.full(n_cols, -1, dtype=np.int64)
    for c in range(n_cols):
        used = {colors[nb] for nb in adj[c] if colors[nb] >= 0}
        pick = 0
        while pick in used:
            pick += 1
        colors[c] = pick
    return colors, int(colors.max()) + 1


def detect_sparsity(rhs, t0, y0, params, n: int):
    """Structural sparsity by concrete Jacobian evaluation -> (rows, cols).

    Evaluated at generic randomized states (union of two probes) rather than
    y0, so entries that merely vanish at the initial state (e.g. products
    with zero initial components) are still captured.  Caveat shared with
    the reference's NaN probing (lib.rs:102-115): input-dependent control
    flow can hide structure.
    """
    rng = np.random.default_rng(0)
    y0_np = np.asarray(y0)
    scale = np.maximum(np.abs(y0_np), 1.0)
    # Probe set: y0 itself (always physical), a small RELATIVE
    # perturbation (catches entries that merely vanish at y0 without
    # leaving the model's physical region -- clamp/branch terms like the
    # pybamm DFN's max(min(c, cmax), eps) go NaN/flat far from y0), and
    # the generic absolute probe.  A probe whose Jacobian has non-finite
    # entries is DISCARDED: one NaN row would light the whole pattern
    # (NaN != 0) and silently destroy the compression.
    candidates = [
        y0_np,
        y0_np * (1.0 + rng.uniform(-1e-3, 1e-3, size=y0_np.shape))
        + 1e-6 * scale * rng.uniform(-1.0, 1.0, size=y0_np.shape),
        y0_np + rng.uniform(0.5, 1.5, size=y0_np.shape),
    ]
    pattern = np.zeros((n, n), dtype=bool)
    any_finite = False
    for y_probe_np in candidates:
        y_probe = jnp.asarray(y_probe_np, y0.dtype)
        jac = np.asarray(jax.jacfwd(rhs, argnums=1)(t0, y_probe, params))
        if not np.all(np.isfinite(jac)):
            continue
        pattern |= jac != 0.0
        any_finite = True
    if not any_finite:
        # every probe produced non-finite entries: no structural
        # information -- conservative dense pattern (coloring then
        # degenerates to n colors, callers' ncolors guards reject it)
        pattern[:] = True
    rows, cols = np.nonzero(pattern)
    return rows, cols


def make_colored_jac(rhs, rows, cols, colors, ncolors: int, n: int):
    """Dense Jacobian via ``ncolors`` JVP probes + precomputed scatter.

    Returns a (t, y, p) -> (n, n) callable.  For a problem with ncolors << n
    (MOL stencils, block-diagonal ensembles) this replaces n jacfwd columns
    with ncolors JVPs.
    """
    colors = np.asarray(colors)
    seeds_np = np.zeros((ncolors, n))
    seeds_np[colors, np.arange(n)] = 1.0
    probe_of_col = colors  # color index supplying column j
    rows_j = jnp.asarray(rows)
    cols_j = jnp.asarray(cols)
    probes_idx = jnp.asarray(probe_of_col[cols])

    def jac(t, y, p):
        seeds = jnp.asarray(seeds_np, y.dtype)

        def probe(v):
            return jax.jvp(lambda yy: rhs(t, yy, p), (y,), (v,))[1]

        probes = jax.vmap(probe)(seeds)  # (ncolors, n)
        vals = probes[probes_idx, rows_j]
        return jnp.zeros((n, n), y.dtype).at[rows_j, cols_j].set(vals)

    jac.jvp_probes = ncolors  # OpStatistics jac_mul_evals accounting
    return jac


def colored_jac_for_problem(rhs, t0, y0, params):
    """Convenience: detect pattern, color (native), build the extractor."""
    n = int(np.asarray(y0).shape[-1])
    rows, cols = detect_sparsity(rhs, t0, y0, params, n)
    colors, ncolors = greedy_color(rows, cols, n, n)
    return make_colored_jac(rhs, rows, cols, colors, ncolors, n), ncolors
