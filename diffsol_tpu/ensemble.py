"""Ensemble solving: the data-parallel axis of the framework.

The reference's parallelism axis is batched ensemble solving on one GPU via
the ``nbatch`` execution context (reference crates/diffsol-la/src/context/
mod.rs:20-51, vector/cuda.rs:34-65 2D kernel grids, cuda/lu.rs per-batch LU;
error norms reduce MAX across batch members so all members share one
adaptive step, vector/mod.rs tests:756-775).  The TPU build provides BOTH
semantics, each sharded over a ``jax.sharding.Mesh``:

* **lockstep** (reference parity): one solve whose state carries a leading
  batch axis; the WRMS norms max-reduce over the batch (see
  :mod:`diffsol_tpu.norms`), so all members share h/order/Jacobian-refresh
  decisions and the linear solves are batched dense LU -- this is the
  high-throughput mode (one program, no divergence);
* **independent**: ``vmap`` of the whole stepper -- JAX's while-loop
  batching gives each member its own adaptive control flow (finished members
  are masked).  More robust for heterogeneous ensembles, at the cost of
  all members stepping until the slowest finishes.

Sharding: both modes shard the batch axis across the mesh with
``NamedSharding``; member solves are embarrassingly parallel so the only
collective in lockstep mode is the error-norm max (XLA inserts it from the
sharded reduce).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .drivers import solve_dense
from .equations import OdeEquations
from .problem import OdeProblem


def make_lockstep_problem(problem: OdeProblem, nbatch: int) -> OdeProblem:
    """Lift a problem to lockstep-batched form (reference `nbatch` context).

    The returned problem's state is ``(nbatch, nstates)`` and its params are
    ``(nbatch, nparams)``; all equation callables are vmapped over the batch
    axis (with t shared).  Pass batched params to the solver entry points.
    Root functions are not supported in lockstep mode (the reference
    requires batch-consistent sign changes and panics otherwise).
    """
    eqn = problem.eqn
    if eqn.root is not None:
        raise ValueError(
            "lockstep ensembles do not support root functions; "
            "use independent (vmap) mode for event-driven problems"
        )

    b_rhs = jax.vmap(eqn.rhs, in_axes=(None, 0, 0))
    b_init = jax.vmap(eqn.init, in_axes=(None, 0))
    b_mass = None if eqn.mass is None else jax.vmap(eqn.mass, in_axes=(None, 0))
    b_out = None if eqn.out is None else jax.vmap(eqn.out, in_axes=(None, 0, 0))
    b_reset = (
        None if eqn.reset is None else jax.vmap(eqn.reset, in_axes=(None, 0, 0))
    )
    if eqn.rhs_jac is not None:
        b_jac = jax.vmap(eqn.rhs_jac, in_axes=(None, 0, 0))
    else:
        b_jac = jax.vmap(
            lambda t, y, p: jax.jacfwd(eqn.rhs, argnums=1)(t, y, p),
            in_axes=(None, 0, 0),
        )
    mass_mul_fn = None
    if b_mass is not None:
        def mass_mul_fn(t, p, v):  # noqa: E306
            return jnp.einsum("bij,bj->bi", b_mass(t, p), v)

    new_eqn = OdeEquations(
        rhs=b_rhs,
        init=b_init,
        mass=b_mass,
        root=None,
        out=b_out,
        reset=b_reset,
        rhs_jac=b_jac,
        mass_mul_fn=mass_mul_fn,
        nstates=eqn.nstates,
        nout=eqn.nout,
        nroots=0,
        nparams=eqn.nparams,
    )
    params_b = jnp.broadcast_to(
        problem.params, (nbatch,) + problem.params.shape
    )
    return dataclasses.replace(problem, eqn=new_eqn, params=params_b)


def solve_dense_ensemble(
    make_solver,
    problem: OdeProblem,
    t_eval,
    params_batch,
    mode: str = "lockstep",
    mesh: Optional[Mesh] = None,
    axis: str = "dp",
    max_steps: int = 100_000,
):
    """Solve an ensemble over ``params_batch`` (B, nparams).

    ``make_solver`` is a problem -> solver factory (e.g. ``BdfSolver``).
    With a ``mesh``, the batch axis is sharded over ``mesh[axis]``.
    Returns the vmapped/batched :class:`diffsol_tpu.drivers.Solution`.
    """
    params_batch = jnp.asarray(params_batch)
    nbatch = params_batch.shape[0]

    if mode == "lockstep":
        lp = make_lockstep_problem(problem, nbatch)
        solver = make_solver(lp)

        def run(pb):
            state = solver.init_state(pb)
            return solve_dense(
                solver, t_eval, params=pb, state=state, max_steps=max_steps
            )

        if mesh is not None:
            shard = NamedSharding(mesh, P(axis))
            params_batch = jax.device_put(params_batch, shard)
            run = jax.jit(run, in_shardings=(shard,))
        return run(params_batch)

    if mode == "independent":
        solver = make_solver(problem)

        def run_one(p):
            state = solver.init_state(p)
            return solve_dense(
                solver, t_eval, params=p, state=state, max_steps=max_steps
            )

        run = jax.vmap(run_one)
        if mesh is not None:
            shard = NamedSharding(mesh, P(axis))
            params_batch = jax.device_put(params_batch, shard)
            run = jax.jit(run, in_shardings=(shard,))
        return run(params_batch)

    raise ValueError(f"unknown ensemble mode: {mode!r}")
