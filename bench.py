"""Headline benchmark: 10k-member lockstep Robertson ensemble on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Workload (BASELINE.md north star): solve a 10,000-member Robertson stiff-ODE
parameter ensemble (k1 perturbed +-10%) over the reference's robertson_ode
output decades to t = 4e5 with the lockstep BDF solver (shared adaptive
steps, batched Newton + batched dense LU).  Tolerances rtol=1e-4/atol=1e-6
match the reference's own robertson_ode benchmark problem
(reference crates/diffsol/src/ode_equations/test_models/robertson_ode.rs:56-60
and book/src/benchmarks/python.md tol=1e-4 rows); a second config at
rtol=1e-6/atol=1e-8 (the BASELINE.json trajectory-parity tolerance) is
reported in the extra keys.

``vs_baseline`` divides a MEASURED single-thread CPU baseline by our
per-instance time.  The baseline is LSODA (compiled ODEPACK via
scipy.integrate.odeint -- the same Hindmarsh solver family as Sundials
CVODE, which the reference benchmarks itself against at ~0.9-1.9x,
book/src/benchmarks/sundials.md) solving the identical Robertson problem at
identical tolerances on THIS host, measured live in this run.  See
BASELINE_MEASURED.md for the full provenance discussion, including the
reference's published absolute numbers (book/src/benchmarks/python_results.csv)
and the Python-callback overhead caveat that inflates the LSODA time;
``vs_diffsol_ngroups10k`` compares against the reference's own published
10k-group robertson_ode ensemble wall time as the alternative denominator.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NBATCH = 10_000
# reference robertson_ode output decades within our t-span (robertson_ode.rs)
T_EVAL = [0.4, 4.0, 40.0, 400.0, 4000.0, 4.0e4, 4.0e5]

# Reference-published measured total wall time for robertson_ode with
# ngroups=10,000 (one 30k-state sparse-BDF solve to t=4e10), single host,
# book/src/benchmarks/python_results.csv row "10000,0.0001": 0.1340 s.
DIFFSOL_NGROUPS10K_S = 0.1340123851162692


def measure_lsoda(rtol, atol, nsolve=30):
    """Single-thread LSODA on this host, same problem/t_eval/tolerances."""
    from scipy.integrate import odeint

    def rhs(y, t, k1, k2, k3):
        return [
            -k1 * y[0] + k2 * y[1] * y[2],
            k1 * y[0] - k2 * y[1] * y[2] - k3 * y[1] ** 2,
            k3 * y[1] ** 2,
        ]

    t_eval = np.concatenate([[0.0], T_EVAL])
    y0 = [1.0, 0.0, 0.0]
    odeint(rhs, y0, t_eval, args=(0.04, 1e4, 3e7), rtol=rtol, atol=atol)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(nsolve):
            k1 = 0.04 * (1.0 + 0.1 * (2.0 * i / nsolve - 1.0))
            odeint(rhs, y0, t_eval, args=(k1, 1e4, 3e7), rtol=rtol, atol=atol)
        best = min(best, (time.perf_counter() - t0) / nsolve)
    return best


def run_tpu(rtol, atol, nbatch=NBATCH, dtype=None):
    from diffsol_tpu.ensemble import make_lockstep_problem
    from diffsol_tpu.drivers import solve_dense
    from diffsol_tpu.models import robertson
    from diffsol_tpu.solvers.bdf import BdfSolver

    # dtype=float32 is the f32 tier (reference ScalarType::F32): native
    # TPU floats, no f64 emulation -- trajectories agree with f64 to ~rtol
    problem = robertson.problem_ode(rtol=rtol, atol=atol, dtype=dtype)
    lp = make_lockstep_problem(problem, nbatch)
    k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, nbatch))
    params = jnp.stack(
        [k1, jnp.full((nbatch,), 1.0e4), jnp.full((nbatch,), 3.0e7)], axis=1
    ).astype(lp.params.dtype)
    solver = BdfSolver(lp)
    t_eval = jnp.asarray(T_EVAL)

    def run(pb):
        # state=None: init is folded into the jitted solve (ONE dispatch)
        return solve_dense(solver, t_eval, params=pb, max_steps=5000)

    def sync(sol):
        # NB: on the axon tunnel backend block_until_ready does NOT block;
        # force a device->host scalar read to time real execution
        return float(jnp.sum(sol.ys))

    sol = run(params)  # warmup/compile
    sync(sol)
    assert int(sol.stop_reason) >= 0, f"solve failed: {int(sol.stop_reason)}"
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sol = run(params)
        sync(sol)
        best = min(best, time.perf_counter() - t0)

    # sanity: mass conservation across the ensemble (ys is (neval, 3, B))
    cons = float(jnp.max(jnp.abs(sol.ys.sum(axis=1) - 1.0)))
    assert cons < 1e-3, f"conservation violated: {cons}"
    return best


def run_heat2d_banded(mgrid=20, nbatch=32):
    """MOL banded workload (Pallas banded LU on TPU): heat2d DAE ensemble.

    Validates the round-2 banded deliverable on real hardware: the XLA
    formulation could not even compile here (docs/round1_status.md).
    Returns (total_s, steps).
    """
    from diffsol_tpu.ensemble import make_lockstep_problem
    from diffsol_tpu.drivers import solve_dense
    from diffsol_tpu.models import heat2d
    from diffsol_tpu.solvers.bdf import BdfSolver

    problem = heat2d.make(mgrid=mgrid)
    lp = make_lockstep_problem(problem, nbatch)
    params = jnp.ones((nbatch, 1), lp.params.dtype)
    solver = BdfSolver(lp)
    t_eval = jnp.asarray([0.01, 0.03, 0.1])

    def run(pb):
        return solve_dense(solver, t_eval, params=pb, max_steps=2000)

    sol = run(params)
    assert int(sol.stop_reason) >= 0, f"heat2d failed: {int(sol.stop_reason)}"
    float(jnp.sum(sol.ys))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sol = run(params)
        float(jnp.sum(sol.ys))
        best = min(best, time.perf_counter() - t0)
    return best, int(sol.state.stats.steps)


def main():
    # f64 for stiff-tolerance parity; XLA emulates f64 on TPU.
    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: whole-solve compiles dominate bench wall
    # time; repeat runs (and the driver) hit the cache
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/diffsol_tpu_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    lsoda_hi = measure_lsoda(1e-4, 1e-6)
    lsoda_lo = measure_lsoda(1e-6, 1e-8)
    t_hi = run_tpu(1e-4, 1e-6)
    t_lo = run_tpu(1e-6, 1e-8)
    # ensemble-size sweep (reference book/src/benchmarks/python.md ngroups
    # table: per-instance time vs batch size)
    sweep = {b: run_tpu(1e-4, 1e-6, nbatch=b) for b in (100, 1000)}
    t_f32 = run_tpu(1e-4, 1e-6, dtype=jnp.float32)
    heat2d_s, heat2d_steps = run_heat2d_banded()

    per_hi = t_hi / NBATCH
    per_lo = t_lo / NBATCH
    print(
        json.dumps(
            {
                "metric": "robertson_10k_lockstep_ensemble_per_instance",
                "value": round(per_hi * 1e6, 3),
                "unit": "us",
                "vs_baseline": round(lsoda_hi / per_hi, 2),
                "baseline": "lsoda_measured_this_host_same_tol",
                "baseline_us": round(lsoda_hi * 1e6, 1),
                "rtol": 1e-4,
                "total_s": round(t_hi, 4),
                "value_rtol1e6": round(per_lo * 1e6, 3),
                "vs_baseline_rtol1e6": round(lsoda_lo / per_lo, 2),
                "baseline_rtol1e6_us": round(lsoda_lo * 1e6, 1),
                "vs_diffsol_ngroups10k": round(
                    DIFFSOL_NGROUPS10K_S / t_hi, 2
                ),
                "heat2d_mgrid20_b32_total_s": round(heat2d_s, 4),
                "heat2d_mgrid20_b32_steps": heat2d_steps,
                "per_instance_us_b100": round(sweep[100] / 100 * 1e6, 2),
                "per_instance_us_b1000": round(sweep[1000] / 1000 * 1e6, 2),
                "per_instance_us_f32": round(t_f32 / NBATCH * 1e6, 3),
                "f32_vs_f64_speedup": round(t_hi / t_f32, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
