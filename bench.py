"""Headline benchmark: 10k-member lockstep Robertson ensemble on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Workloads:
* robertson stiff-ODE ensemble, k1 spread +-10%, decades to t=4e5 at the
  reference's robertson_ode tolerances (rtol=1e-4/atol=1e-6,
  reference crates/diffsol/src/ode_equations/test_models/robertson_ode.rs:56-60)
  -- the headline per-instance number, plus rtol=1e-6, f32 and batch-size
  sweep variants;
* the REFERENCE-MATCHED config (round-2 verdict: the old comparison was
  flattered by a t-span mismatch): shared parameters across 10k members and
  the reference's own output decades to t=4e10
  (book/src/benchmarks/python_results.csv row "10000,0.0001" = 0.1340 s)
  -- reported as vs_diffsol_t4e10 / _f32;
* heat2d MOL banded DAE (Pallas banded LU) with a MEASURED compiled-CPU
  denominator: LSODA (ODEPACK) in its banded-Jacobian mode on the
  interior-point ODE reduction of the same grid/tolerances;
* foodweb reaction-diffusion DAE wall time.

Timing: the axon TPU tunnel costs a MEASURED fixed ~25-30 ms per dispatched
program (reported as dispatch_floor_ms; a local TPU does not pay it).
Headline numbers are MARGINAL per-solve times from a 1-vs-4 back-to-back
dispatch slope -- the throughput cost a production pipeline pays; the
single-dispatch latency (including the tunnel floor) is reported alongside
as *_latency_s keys.  NB: block_until_ready does NOT block on this tunnel;
every timed run syncs with a device->host scalar read.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NBATCH = 10_000
# reference robertson_ode output decades within our t-span (robertson_ode.rs)
T_EVAL = [0.4, 4.0, 40.0, 400.0, 4000.0, 4.0e4, 4.0e5]
T_EVAL_4E10 = [4.0 * 10.0**k for k in range(-1, 11)]  # 0.4 ... 4e10

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


def measure_lsoda_heat2d(mgrid, t_eval, rtol, atol, nsolve=5):
    """LSODA (banded-Jacobian mode) on the interior-point ODE reduction of
    heat2d: the compiled-CPU denominator for the banded tier (the algebraic
    boundary rows are identically zero under Dirichlet data, so the interior
    ODE is the same physics on the same grid)."""
    from scipy.integrate import odeint

    m = mgrid - 2  # interior points per side
    dx = 1.0 / (mgrid - 1)
    coeff = 1.0 / (dx * dx)
    ii = np.arange(mgrid) * dx
    x, yv = np.meshgrid(ii[1:-1], ii[1:-1], indexing="ij")
    u0 = (16.0 * x * (1.0 - x) * yv * (1.0 - yv)).reshape(-1)

    def rhs(u, t):
        g = np.zeros((m + 2, m + 2))
        g[1:-1, 1:-1] = u.reshape(m, m)
        lap = (
            g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:]
            - 4.0 * g[1:-1, 1:-1]
        ) * coeff
        return lap.reshape(-1)

    te = np.concatenate([[0.0], t_eval])
    odeint(rhs, u0, te, rtol=rtol, atol=atol, ml=m, mu=m)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _i in range(nsolve):
            odeint(rhs, u0, te, rtol=rtol, atol=atol, ml=m, mu=m)
        best = min(best, (time.perf_counter() - t0) / nsolve)
    return best


def _sync(sol):
    # device->host scalar read: the only reliable sync on the axon tunnel
    return float(jnp.sum(sol.ys[-1]))


def measure_marginal(run, params):
    """(marginal per-solve seconds, single-dispatch latency seconds).

    Marginal = slope of a 1-vs-4 back-to-back dispatch: subsequent
    dispatches overlap the tunnel latency, so (t4 - t1)/3 is the pure
    device time per solve."""
    _sync(run(params))  # warmup/compile
    t1 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run(params))
        t1 = min(t1, time.perf_counter() - t0)
    t4 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(params)
        run(params)
        run(params)
        _sync(run(params))
        t4 = min(t4, time.perf_counter() - t0)
    marginal = max((t4 - t1) / 3.0, 1e-9)
    return marginal, t1


def dispatch_floor():
    @jax.jit
    def noop(x):
        return x + 1.0

    x = jnp.asarray(1.0)
    float(noop(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(noop(x))
        best = min(best, time.perf_counter() - t0)
    return best


def run_robertson(rtol, atol, nbatch=NBATCH, dtype=None, t_eval=None,
                  spread=True, max_steps=5000):
    from diffsol_tpu.ensemble import make_lockstep_problem
    from diffsol_tpu.drivers import solve_dense
    from diffsol_tpu.models import robertson
    from diffsol_tpu.solvers.bdf import BdfSolver

    # dtype=float32 is the f32 tier (reference ScalarType::F32): native
    # TPU floats, no f64 emulation -- trajectories agree with f64 to ~rtol
    problem = robertson.problem_ode(rtol=rtol, atol=atol, dtype=dtype)
    lp = make_lockstep_problem(problem, nbatch)
    if spread:
        k1 = 0.04 * (1.0 + 0.1 * jnp.linspace(-1.0, 1.0, nbatch))
    else:  # reference-matched: every group shares the same parameters
        k1 = jnp.full((nbatch,), 0.04)
    params = jnp.stack(
        [k1, jnp.full((nbatch,), 1.0e4), jnp.full((nbatch,), 3.0e7)], axis=1
    ).astype(lp.params.dtype)
    solver = BdfSolver(lp)
    te = jnp.asarray(t_eval if t_eval is not None else T_EVAL)

    def run(pb):
        # state=None: init is folded into the jitted solve (ONE dispatch)
        return solve_dense(solver, te, params=pb, max_steps=max_steps)

    sol = run(params)
    _sync(sol)
    assert int(sol.stop_reason) >= 0, f"solve failed: {int(sol.stop_reason)}"
    # sanity: mass conservation across the ensemble (ys is (neval, 3, B))
    cons = float(jnp.max(jnp.abs(sol.ys.sum(axis=1) - 1.0)))
    assert cons < 1e-3, f"conservation violated: {cons}"
    # trajectory sanity vs the reference's CVODE/IDA table (robertson.rs):
    # x at the t_eval decades for the nominal member, 1% relative
    soln = robertson.SOLN
    mid = nbatch // 2 if spread else 0
    for row in range(1, 4):  # t = 0.4, 4, 40
        got = float(sol.ys[row - 1, 0, mid])
        want = float(soln[row, 1])
        rel = abs(got - want) / want
        assert rel < 2e-2, f"trajectory off at t={soln[row,0]}: {got} vs {want}"
    marginal, latency = measure_marginal(run, params)
    return marginal, latency, int(sol.state.stats.steps)


def run_banded_dae(make_problem, t_eval, nbatch=32, max_steps=2000):
    """MOL banded workload (Pallas banded LU on TPU); returns
    (marginal_s, latency_s, steps)."""
    from diffsol_tpu.ensemble import make_lockstep_problem
    from diffsol_tpu.drivers import solve_dense
    from diffsol_tpu.solvers.bdf import BdfSolver

    problem = make_problem()
    lp = make_lockstep_problem(problem, nbatch)
    params = jnp.broadcast_to(
        problem.params, (nbatch,) + problem.params.shape
    ).astype(lp.params.dtype)
    solver = BdfSolver(lp)
    te = jnp.asarray(t_eval)

    def run(pb):
        return solve_dense(solver, te, params=pb, max_steps=max_steps)

    sol = run(params)
    _sync(sol)
    assert int(sol.stop_reason) >= 0, f"banded solve failed: {int(sol.stop_reason)}"
    marginal, latency = measure_marginal(run, params)
    return marginal, latency, int(sol.state.stats.steps)


def main():
    # f64 for stiff-tolerance parity; XLA emulates f64 on TPU.
    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: whole-solve compiles dominate bench wall
    # time; repeat runs (and the driver) hit the cache
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/diffsol_tpu_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    floor = dispatch_floor()
    lsoda_hi = measure_lsoda(1e-4, 1e-6)
    lsoda_lo = measure_lsoda(1e-6, 1e-8)

    t_hi, lat_hi, _ = run_robertson(1e-4, 1e-6)
    t_lo, _, _ = run_robertson(1e-6, 1e-8)
    # reference-matched: shared params, the reference's own t-span to 4e10
    t_m64, _, _ = run_robertson(
        1e-4, 1e-6, t_eval=T_EVAL_4E10, spread=False
    )
    t_m32, _, _ = run_robertson(
        1e-4, 1e-6, t_eval=T_EVAL_4E10, spread=False, dtype=jnp.float32
    )
    # ensemble-size sweep (reference book/src/benchmarks/python.md ngroups
    # table: per-instance time vs batch size)
    sweep = {b: run_robertson(1e-4, 1e-6, nbatch=b)[0] for b in (100, 1000)}
    t_f32, _, _ = run_robertson(1e-4, 1e-6, dtype=jnp.float32)
    t_100k, _, _ = run_robertson(1e-4, 1e-6, nbatch=100_000)
    t_100k32, _, _ = run_robertson(
        1e-4, 1e-6, nbatch=100_000, dtype=jnp.float32
    )

    # unstructured-sparse (block-dense) tier: the reference's own
    # robertson_ode ngroups workload as ONE n=3000 problem, solved without
    # materializing a dense Jacobian (3x3 blocks on the lanes); published
    # diffsol number: python_results.csv row "1000,0.0001" = 0.012448 s
    from diffsol_tpu.drivers import solve_dense as _sd
    from diffsol_tpu.models.robertson import problem_ode_groups
    from diffsol_tpu.solvers.bdf import BdfSolver as _Bdf

    pgrp = problem_ode_groups(1000, rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))
    assert pgrp.linear_solver.name == "blockdiag(3,1000)"
    gsolver = _Bdf(pgrp)
    te10 = jnp.asarray(T_EVAL_4E10)

    def run_grp(pb):
        return _sd(gsolver, te10, params=pb, max_steps=5000)

    sol_g = run_grp(pgrp.params)
    _sync(sol_g)
    assert int(sol_g.stop_reason) >= 0, int(sol_g.stop_reason)
    t_grp, _ = measure_marginal(run_grp, pgrp.params)

    # banded MOL tier
    from diffsol_tpu.models import foodweb, heat2d

    heat_te = [0.01, 0.03, 0.1]
    heat_s, heat_lat, heat_steps = run_banded_dae(
        lambda: heat2d.make(mgrid=20), heat_te
    )
    heat_cpu = measure_lsoda_heat2d(20, heat_te, 1e-5, 1e-5)
    food_s, _, food_steps = run_banded_dae(
        lambda: foodweb.make(nx=10), [1e-3, 1e-2, 1e-1], max_steps=3000
    )

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
                "latency_s": round(lat_hi, 4),
                "dispatch_floor_ms": round(floor * 1e3, 2),
                "value_rtol1e6": round(per_lo * 1e6, 3),
                "vs_baseline_rtol1e6": round(lsoda_lo / per_lo, 2),
                "baseline_rtol1e6_us": round(lsoda_lo * 1e6, 1),
                # t-span-matched, shared-parameter comparison against the
                # reference's own published ngroups=10k run (to t=4e10)
                "vs_diffsol_t4e10": round(DIFFSOL_NGROUPS10K_S / t_m64, 2),
                "vs_diffsol_t4e10_f32": round(DIFFSOL_NGROUPS10K_S / t_m32, 2),
                "matched_t4e10_total_s": round(t_m64, 4),
                "matched_t4e10_f32_total_s": round(t_m32, 4),
                "per_instance_us_b100": round(sweep[100] / 100 * 1e6, 2),
                "per_instance_us_b1000": round(sweep[1000] / 1000 * 1e6, 2),
                "per_instance_us_b100k": round(t_100k / 100_000 * 1e6, 3),
                "per_instance_us_f32": round(t_f32 / NBATCH * 1e6, 3),
                "per_instance_us_b100k_f32": round(
                    t_100k32 / 100_000 * 1e6, 3
                ),
                "f32_vs_f64_speedup": round(t_hi / t_f32, 2),
                "heat2d_mgrid20_b32_total_s": round(heat_s, 4),
                "heat2d_mgrid20_b32_steps": heat_steps,
                "heat2d_per_instance_ms": round(heat_s / 32 * 1e3, 3),
                "heat2d_cpu_lsoda_banded_ms": round(heat_cpu * 1e3, 2),
                "heat2d_vs_cpu": round(heat_cpu / (heat_s / 32), 2),
                "foodweb_nx10_b32_total_s": round(food_s, 4),
                "foodweb_nx10_b32_steps": food_steps,
                "robertson_ode_ngroups1000_total_s": round(t_grp, 4),
                "vs_diffsol_ngroups1000": round(0.012448280966944164 / t_grp, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
