"""Event root-finding on the solver's dense-output interpolant.

Reimplements the reference's Sundials-style modified-secant root finder
(reference crates/diffsol/src/nonlinear_solver/root.rs:12-170 and the
sign-change scan diffsol-la/src/vector/nalgebra_serial.rs:484-504) as traced
control flow so it can run inside the jitted step loop.

Protocol: the solver stores root-function values ``g0`` at the last accepted
state; after each accepted step ``g1 = g(t_new, y_new)`` is compared to
``g0``.  On a sign change, a modified secant iteration on the solver's
interpolant brackets the root to within ``100*eps*(|t1| + |t1-t0|)``,
biasing the bracket with a multiplier ``alpha`` that halves/doubles based
on which side the sign change keeps landing.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_MAX_SECANT_ITERS = 100  # static safety bound; tol-based exit dominates


def root_finding(g0, g1):
    """Sign-change scan between g0 and g1.

    Returns (found_exact_zero, max_frac, imax) where imax is the index of the
    strongest crossing (argmax |g1/(g1-g0)| over components with g0*g1 < 0),
    or -1 if there is no sign change.
    """
    found_zero = jnp.any(g1 == 0.0)
    crossed = g0 * g1 < 0.0
    frac = jnp.where(crossed, jnp.abs(g1 / (g1 - g0)), 0.0)
    max_frac = jnp.max(frac, initial=0.0)
    any_cross = jnp.any(crossed)
    imax = jnp.where(any_cross, jnp.argmax(frac), -1).astype(jnp.int32)
    return found_zero, max_frac, imax


class RootCheckResult(NamedTuple):
    found: jax.Array  # bool
    t_root: jax.Array
    root_idx: jax.Array  # int32
    g0_next: jax.Array  # root-fn values to carry as g0 for the next step
    # lockstep only: members disagree on (found, crossing index) -- a typed
    # failure (the reference PANICS on batch-inconsistent sign patterns,
    # vector/cuda.rs:1166-1175); always False for single solves
    inconsistent: jax.Array


def check_root(
    root_fn: Callable,  # (t,) -> g values on the interpolant (y already bound)
    interp_y: Callable,  # (t,) -> y on the interpolant
    g0,
    t0,
    y_new,
    t_new,
    nbatch: int = 1,
) -> RootCheckResult:
    """Check for a root in (t0, t_new]; see module docstring.

    ``root_fn(t, y)`` evaluates the root function; ``interp_y(t)``
    interpolates the state inside the accepted step.

    With ``nbatch > 1`` the g values are lockstep 2-D arrays (nroots, B):
    every member must agree on (found, crossing index) -- the reference's
    batch-consistency requirement (vector/cuda.rs root_finding asserts
    first_result equality across batches and returns batch 0's result;
    tests vector/mod.rs:835-852).  The secant then polishes batch 0's
    crossing to a SHARED root time; disagreement sets ``inconsistent``
    (mapped to a typed failure by the steppers, since we cannot panic
    inside jit).
    """
    if nbatch > 1:
        g1_b = root_fn(t_new, y_new)  # (nroots, B)
        found_b, _fr, imax_b = jax.vmap(root_finding, in_axes=1)(g0, g1_b)
        inconsistent = jnp.any(found_b != found_b[0]) | jnp.any(
            imax_b != imax_b[0]
        )
        res0 = check_root(
            lambda tt, yy: root_fn(tt, yy)[..., 0],
            interp_y,
            g0[..., 0],
            t0,
            y_new,
            t_new,
        )
        return RootCheckResult(
            found=res0.found & ~inconsistent,
            t_root=res0.t_root,
            root_idx=res0.root_idx,
            g0_next=g1_b,
            inconsistent=inconsistent,
        )

    dtype = jnp.result_type(t_new)
    eps = jnp.finfo(dtype).eps
    g1 = root_fn(t_new, y_new)
    found_zero, _, imax = root_finding(g0, g1)

    def no_crossing(_):
        # root exactly at the upper boundary, or nothing
        idx = jnp.argmin(jnp.abs(g1)).astype(jnp.int32)
        return RootCheckResult(
            found=found_zero, t_root=t_new, root_idx=idx, g0_next=g1,
            inconsistent=jnp.asarray(False),
        )

    def secant(_):
        tol = 100.0 * eps * (jnp.abs(t_new) + jnp.abs(t_new - t0))
        half, double, five, pntone = 0.5, 2.0, 5.0, 0.1

        def cond(c):
            (t0_, t1_, *_rest, i, done) = c
            return (~done) & (jnp.abs(t1_ - t0_) > tol) & (i < _MAX_SECANT_ITERS)

        def body(c):
            (t0_, t1_, g0_, g1_, im, alpha, sc0, sc1, res_t, res_i, i, done) = c
            g1v = g1_[im]
            g0v = g0_[im]
            t_mid = t1_ - (t1_ - t0_) * g1v / (g1v - alpha * g0v)
            # keep t_mid away from the bracket boundaries
            fracint = jnp.abs(t1_ - t0_) / tol
            fracsub = jnp.where(fracint > five, pntone, half / fracint)
            t_mid = jnp.where(
                jnp.abs(t_mid - t0_) < half * tol, t0_ + fracsub * (t1_ - t0_), t_mid
            )
            t_mid = jnp.where(
                jnp.abs(t1_ - t_mid) < half * tol, t1_ - fracsub * (t1_ - t0_), t_mid
            )
            ymid = interp_y(t_mid)
            gmid = root_fn(t_mid, ymid)
            rootfnd, _, im2 = root_finding(g0_, gmid)
            lower = im2 >= 0

            # three-way update of the bracket
            t1_n = jnp.where(lower, t_mid, t1_)
            im_n = jnp.where(lower, im2, im)
            g1_n = jnp.where(lower, gmid, g1_)
            exact = (~lower) & rootfnd
            t0_n = jnp.where(lower | exact, t0_, t_mid)
            g0_n = jnp.where(lower | exact, g0_, gmid)
            res_t_n = jnp.where(exact, t_mid, res_t)
            res_i_n = jnp.where(exact, im, res_i)
            done_n = done | exact

            sc0_n = jnp.where(i % 2 == 0, lower, sc0)
            sc1_n = jnp.where(i % 2 == 1, lower, sc1)
            alpha_n = jnp.where(
                i >= 2,
                jnp.where(sc0_n != sc1_n, 1.0, jnp.where(sc0_n, half * alpha, double * alpha)),
                alpha,
            )
            return (
                t0_n, t1_n, g0_n, g1_n, im_n, alpha_n, sc0_n, sc1_n,
                res_t_n, res_i_n, i + 1, done_n,
            )

        init = (
            t0, t_new, g0, g1, imax,
            jnp.asarray(1.0, dtype),
            jnp.asarray(False), jnp.asarray(True),
            t_new, imax,
            jnp.asarray(0, jnp.int32), jnp.asarray(False),
        )
        (t0_, t1_, _g0_, _g1_, im, _a, _s0, _s1, res_t, res_i, _i, done) = (
            jax.lax.while_loop(cond, body, init)
        )
        t_root = jnp.where(done, res_t, t1_)
        idx = jnp.where(done, res_i, im)
        # g0 for the next step is re-initialized at the (pinned) state by the
        # driver via the state-modified path, but default to g1 here.
        return RootCheckResult(
            found=jnp.asarray(True), t_root=t_root, root_idx=idx, g0_next=g1,
            inconsistent=jnp.asarray(False),
        )

    return jax.lax.cond(imax < 0, no_crossing, secant, operand=None)
