"""Ensemble solving: the data-parallel axis of the framework.

The reference's parallelism axis is batched ensemble solving on one GPU via
the ``nbatch`` execution context (reference crates/diffsol-la/src/context/
mod.rs:20-51, vector/cuda.rs:34-65 2D kernel grids, cuda/lu.rs per-batch LU;
error norms reduce MAX across batch members so all members share one
adaptive step, vector/mod.rs tests:756-775).  The TPU build provides BOTH
semantics, each sharded over a ``jax.sharding.Mesh``:

* **lockstep** (reference parity): one solve whose state is the FLAT
  member-major concatenation (nbatch * nstates,) of all members.  The WRMS
  norms reshape internally and reduce mean-then-max (see
  :mod:`diffsol_tpu.norms`), so all members share h/order/Jacobian-refresh
  decisions and the linear solves are batched block LU.  The flat layout is
  the TPU-critical choice: a (10000, 3) state would occupy 3 of 128 vector
  lanes; flat (30000,) packs them fully.
* **independent**: ``vmap`` of the whole stepper -- JAX's while-loop
  batching gives each member its own adaptive control flow (finished
  members are masked).  More robust for heterogeneous/event-driven
  ensembles, at the cost of all members stepping until the slowest
  finishes.

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
from .ops.linsol import LinearSolverSpec
from .problem import OdeProblem


def _wrap_lockstep_spec(spec: LinearSolverSpec, nbatch: int, n: int) -> LinearSolverSpec:
    """Lift a linear-solver tier to flat lockstep operation: the matrix
    representation gains a leading batch axis; solve reshapes flat RHS
    vectors (..., B*n) to (..., B, n) blocks and back."""

    def solve(factors, b):
        blocks = b.reshape(b.shape[:-1] + (nbatch, n))
        x = spec.solve(factors, blocks)
        return x.reshape(b.shape)

    return LinearSolverSpec(
        name=f"lockstep({nbatch})+{spec.name}",
        assemble=spec.assemble,
        factor=spec.factor,
        solve=solve,
        placeholder_factors=spec.placeholder_factors,
        meta=(nbatch,) + spec.meta,
    )


def make_lockstep_problem(problem: OdeProblem, nbatch: int) -> OdeProblem:
    """Lift a problem to flat lockstep-batched form (reference `nbatch`
    context).  The returned problem's state is (nbatch * nstates,)
    member-major; params gain a leading (nbatch,) axis.  Root functions are
    not supported in lockstep mode (the reference requires batch-consistent
    sign changes and panics otherwise)."""
    eqn = problem.eqn
    if eqn.root is not None:
        raise ValueError(
            "lockstep ensembles do not support root functions; "
            "use independent (vmap) mode for event-driven problems"
        )
    n = eqn.nstates
    nout = eqn.nout

    def flatten(f, out_len):
        def g(t, yf, pb):
            y = yf.reshape(yf.shape[:-1] + (nbatch, n))
            return jax.vmap(f, in_axes=(None, 0, 0))(t, y, pb).reshape(
                yf.shape[:-1] + (out_len,)
            )

        return g

    b_rhs = flatten(eqn.rhs, nbatch * n)
    b_reset = None if eqn.reset is None else flatten(eqn.reset, nbatch * n)
    b_out = None if eqn.out is None else flatten(eqn.out, nbatch * max(nout, 1))

    def b_init(t, pb):
        return jax.vmap(eqn.init, in_axes=(None, 0))(t, pb).reshape(-1)

    if eqn.rhs_jac is not None:
        per_member_jac = eqn.rhs_jac
    else:
        per_member_jac = lambda t, y, p: jax.jacfwd(eqn.rhs, argnums=1)(t, y, p)

    def b_jac(t, yf, pb):
        y = yf.reshape(nbatch, n)
        return jax.vmap(per_member_jac, in_axes=(None, 0, 0))(t, y, pb)

    b_mass = None
    mass_mul_fn = None
    if eqn.mass is not None:
        def b_mass(t, pb):  # (B, n, n)
            return jax.vmap(eqn.mass, in_axes=(None, 0))(t, pb)

        def mass_mul_fn(t, pb, v):
            blocks = v.reshape(v.shape[:-1] + (nbatch, n))
            mv = jnp.einsum("bij,...bj->...bi", b_mass(t, pb), blocks)
            return mv.reshape(v.shape)

    new_eqn = OdeEquations(
        rhs=b_rhs,
        init=b_init,
        mass=b_mass,
        root=None,
        out=b_out,
        reset=b_reset,
        rhs_jac=b_jac,
        mass_mul_fn=mass_mul_fn,
        nstates=nbatch * n,
        nout=nbatch * nout,
        nroots=0,
        nparams=eqn.nparams,
    )
    params_b = jnp.broadcast_to(problem.params, (nbatch,) + problem.params.shape)
    atol_b = jnp.tile(problem.atol, nbatch)
    out_atol_b = (
        None if problem.out_atol is None else jnp.tile(problem.out_atol, nbatch)
    )
    return dataclasses.replace(
        problem,
        eqn=new_eqn,
        params=params_b,
        atol=atol_b,
        out_atol=out_atol_b,
        sens_rtol=None,
        sens_atol=None,
        lockstep_nbatch=nbatch,
        linear_solver=_wrap_lockstep_spec(problem.linear_solver, nbatch, n),
    )


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
    Returns a :class:`diffsol_tpu.drivers.Solution` whose ``ys`` is
    (neval, B, nstates).
    """
    params_batch = jnp.asarray(params_batch)
    nbatch = params_batch.shape[0]
    n = problem.eqn.nstates

    if mode == "lockstep":
        lp = make_lockstep_problem(problem, nbatch)
        solver = make_solver(lp)

        def run(pb):
            state = solver.init_state(pb)
            sol = solve_dense(
                solver, t_eval, params=pb, state=state, max_steps=max_steps
            )
            ys = sol.ys.reshape(sol.ys.shape[0], nbatch, n)
            gs = sol.gs
            if gs is not None and problem.eqn.nout:
                gs = gs.reshape(gs.shape[0], nbatch, problem.eqn.nout)
            return sol.replace(ys=ys, gs=gs)

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

        def run(pb):
            sol = jax.vmap(run_one)(pb)
            return sol.replace(ys=jnp.moveaxis(sol.ys, 0, 1))

        if mesh is not None:
            shard = NamedSharding(mesh, P(axis))
            params_batch = jax.device_put(params_batch, shard)
            run = jax.jit(run, in_shardings=(shard,))
        return run(params_batch)

    raise ValueError(f"unknown ensemble mode: {mode!r}")
