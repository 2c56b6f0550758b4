"""Headline benchmark: 10k-member lockstep Robertson ensemble on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Gate-hardening (round-5, after BENCH_r04 timed out with zero output):

* **Device assert first** (CLAUDE.md rule): the axon tunnel serves one
  client; a contended init silently falls back to CPU and every compile
  then runs on the 1-core host.  The bench asserts the TPU backend up
  front, and re-execs itself ONCE after a delay if it lost the tunnel.
* **Wall-clock budget** (`DIFFSOL_BENCH_BUDGET_S`, default 1100 s):
  checked before every row; rows are ordered cheapest-and-most-important
  first; skipped rows emit a loud `<row>_skipped_budget` key.
* **Partial results always emitted**: every completed row lands in one
  accumulator dict; the JSON line is printed in a `finally:` AND from a
  SIGTERM/SIGINT handler, so an external `timeout` still captures every
  row measured so far.
* Per-row wall times are reported as `secs_<row>` keys so future budget
  estimates are calibrated from the artifact itself.

Workloads (same metric keys as BENCH_r03; provenance in each row fn):
* robertson stiff-ODE lockstep ensembles at the reference's robertson_ode
  tolerances (reference crates/diffsol/src/ode_equations/test_models/
  robertson_ode.rs:56-60), incl. the REFERENCE-MATCHED t=4e10 config
  against the published ngroups=10k row
  (book/src/benchmarks/python_results.csv "10000,0.0001" = 0.1340 s);
* the fused whole-solve Pallas tiers (small-n + banded medium-n);
* heat2d/foodweb banded MOL DAEs with measured LSODA/CPU-XLA denominators;
* the pybamm DFN battery model (benches/pybamm_dfn.rs), step-driven, LAST
  behind a remaining-budget check (cold axon compile is ~23 min).

Timing: the axon TPU tunnel costs a MEASURED fixed ~25-45 ms per dispatched
program (dispatch_floor_ms; a local TPU does not pay it).  Headline numbers
are MARGINAL per-solve times from a 1-vs-4 back-to-back dispatch slope; the
single-dispatch latency is reported alongside as *_latency_s keys.
NB: block_until_ready does NOT block on this tunnel; every timed run syncs
with a device->host scalar read.
"""

import json
import os
import signal
import sys
import time

T0 = time.monotonic()
BUDGET_S = float(os.environ.get("DIFFSOL_BENCH_BUDGET_S", "1100"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

NBATCH = 10_000
# reference robertson_ode output decades within our t-span (robertson_ode.rs)
T_EVAL = [0.4, 4.0, 40.0, 400.0, 4000.0, 4.0e4, 4.0e5]
T_EVAL_4E10 = [4.0 * 10.0**k for k in range(-1, 11)]  # 0.4 ... 4e10

# Reference-published measured total wall time for robertson_ode with
# ngroups=10,000 (one 30k-state sparse-BDF solve to t=4e10), single host,
# book/src/benchmarks/python_results.csv row "10000,0.0001": 0.1340 s.
DIFFSOL_NGROUPS10K_S = 0.1340123851162692
DIFFSOL_NGROUPS1000_S = 0.012448280966944164

# ---------------------------------------------------------------------------
# result accumulator + always-emit machinery
# ---------------------------------------------------------------------------

R = {}
_EMITTED = False


def emit():
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    out = {
        "metric": R.pop(
            "metric", "robertson_10k_lockstep_ensemble_per_instance"
        ),
        "value": R.pop("value", None),
        "unit": R.pop("unit", "us"),
        "vs_baseline": R.pop("vs_baseline", None),
    }
    out.update(R)
    print(json.dumps(out), flush=True)


def _on_signal(signum, frame):
    R["terminated_by_signal"] = int(signum)
    R["elapsed_s"] = round(time.monotonic() - T0, 1)
    emit()
    os._exit(0)


signal.signal(signal.SIGTERM, _on_signal)
signal.signal(signal.SIGINT, _on_signal)


def remaining():
    return BUDGET_S - (time.monotonic() - T0)


def row(name, est_s, fn):
    """Run one bench row if the remaining budget covers its estimated cold
    cost; record its wall time; isolate failures to the row."""
    if remaining() < est_s:
        R[f"{name}_skipped_budget"] = round(remaining(), 1)
        print(f"bench: SKIP {name} (need ~{est_s}s, "
              f"{remaining():.0f}s left)", file=sys.stderr)
        return False
    t0 = time.monotonic()
    try:
        fn()
        return True
    except Exception as e:  # noqa: BLE001 - a row must not kill the bench
        R[f"{name}_error"] = repr(e)[:200]
        return False
    finally:
        R[f"secs_{name}"] = round(time.monotonic() - t0, 1)
        print(f"bench: {name} in {R[f'secs_{name}']}s "
              f"({remaining():.0f}s left)", file=sys.stderr)


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _sync(sol):
    # device->host scalar read: the only reliable sync on the axon tunnel
    return float(jnp.sum(sol.ys[-1]))


def _timed(thunk):
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


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


# v5e chip peaks (public spec): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.  The
# solver's hot path is f64-emulated VPU work, so MFU-vs-bf16-peak is tiny
# by construction -- the number's job is to say HOW tiny, and whether a
# regime is compute- or dispatch-bound.
V5E_PEAK_BF16_FLOPS = 197.0e12
V5E_HBM_BYTES_S = 819.0e9


def step_cost(solver, params):
    """(flops, bytes accessed) of the jitted single-step program via XLA's
    cost model.  While-loop bodies (the Newton/attempt loops) are counted
    ONCE, so these are per-step lower bounds."""
    from diffsol_tpu.drivers import init_state_jit

    state = init_state_jit(solver, params)
    c = jax.jit(solver.step).lower(state, params).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0] if c else {}
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def mfu_keys(tag, solver, params, total_s, steps):
    """mfu_<tag> / bw_<tag> / flops_per_step_<tag> keys for one workload."""
    try:
        flops, bts = step_cost(solver, params)
    except Exception:
        return {}
    sec_per_step = total_s / max(steps, 1)
    return {
        f"flops_per_step_{tag}": flops,
        f"bytes_per_step_{tag}": bts,
        f"mfu_{tag}": round(flops / sec_per_step / V5E_PEAK_BF16_FLOPS, 6),
        f"hbm_util_{tag}": round(bts / sec_per_step / V5E_HBM_BYTES_S, 4),
    }


# ---------------------------------------------------------------------------
# CPU baselines (LSODA; cheap, measured on this host)
# ---------------------------------------------------------------------------


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


def measure_lsoda_nfe(rtol, atol):
    """(nfe per solve, measured per-callback seconds) for the robertson
    LSODA baseline -- used to report a Python-callback-overhead-corrected
    estimate of a compiled-RHS LSODA."""
    from scipy.integrate import odeint

    def rhs(y, t, k1, k2, k3):
        return [
            -k1 * y[0] + k2 * y[1] * y[2],
            k1 * y[0] - k2 * y[1] * y[2] - k3 * y[1] ** 2,
            k3 * y[1] ** 2,
        ]

    t_eval = np.concatenate([[0.0], T_EVAL])
    y0 = [1.0, 0.0, 0.0]
    _, info = odeint(
        rhs, y0, t_eval, args=(0.04, 1e4, 3e7), rtol=rtol, atol=atol,
        full_output=True,
    )
    nfe = int(info["nfe"][-1])
    yv = [0.5, 0.3, 0.2]
    t0 = time.perf_counter()
    for _ in range(20000):
        rhs(yv, 0.0, 0.04, 1e4, 3e7)
    per_cb = (time.perf_counter() - t0) / 20000
    return nfe, per_cb


def measure_lsoda_heat2d(mgrid, t_eval, rtol, atol, nsolve=5):
    """LSODA (banded-Jacobian mode) on the interior-point ODE reduction of
    heat2d: the compiled-CPU denominator for the banded tier."""
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


# ---------------------------------------------------------------------------
# workload runners
# ---------------------------------------------------------------------------


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
    # trajectory sanity vs the reference's CVODE/IDA table (robertson.rs)
    soln = robertson.SOLN
    mid = nbatch // 2 if spread else 0
    for r_ in range(1, 4):  # t = 0.4, 4, 40
        got = float(sol.ys[r_ - 1, 0, mid])
        want = float(soln[r_, 1])
        rel = abs(got - want) / want
        assert rel < 2e-2, f"trajectory off at t={soln[r_,0]}: {got} vs {want}"
    marginal, latency = measure_marginal(run, params)
    return marginal, latency, int(sol.state.stats.steps), solver, params


def run_banded_dae(make_problem, t_eval, nbatch=32, max_steps=2000):
    """MOL banded workload (Pallas banded LU on TPU); returns
    (marginal_s, latency_s, steps, solver, params)."""
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
    return marginal, latency, int(sol.state.stats.steps), solver, params


def bench_simple(problem, t_eval, nbatch=1000, max_steps=2000):
    from diffsol_tpu.ensemble import make_lockstep_problem
    from diffsol_tpu.drivers import solve_dense as _sdense
    from diffsol_tpu.solvers.bdf import BdfSolver as _B

    lp = make_lockstep_problem(problem, nbatch)
    pb = jnp.broadcast_to(
        problem.params, (nbatch,) + problem.params.shape
    ).astype(lp.params.dtype)
    sv = _B(lp)

    def run(p):
        return _sdense(sv, jnp.asarray(t_eval), params=p,
                       max_steps=max_steps)

    s = run(pb)
    _sync(s)
    assert int(s.stop_reason) >= 0
    m, _ = measure_marginal(run, pb)
    return m


def _marginal_pallas(psolve, pp):
    """Marginal timing for a fused-kernel solve fn returning (ys, ...)."""
    def run_p(p):
        r_ = psolve(p)
        float(jnp.sum(r_[0][-1]))
        return r_

    t1 = min(_timed(lambda: run_p(pp)) for _ in range(3))
    t4 = min(
        _timed(lambda: (psolve(pp), psolve(pp), psolve(pp), run_p(pp)))
        for _ in range(3)
    )
    return max((t4 - t1) / 3, 0.0)


# ---------------------------------------------------------------------------
# rows
# ---------------------------------------------------------------------------


def row_headline():
    lsoda_hi = measure_lsoda(1e-4, 1e-6)
    nfe_hi, per_cb = measure_lsoda_nfe(1e-4, 1e-6)
    lsoda_hi_compiled_est = max(lsoda_hi - nfe_hi * per_cb, 1e-9)
    t_hi, lat_hi, steps_hi, solver_hi, params_hi = run_robertson(1e-4, 1e-6)
    per_hi = t_hi / NBATCH
    R["metric"] = "robertson_10k_lockstep_ensemble_per_instance"
    R["value"] = round(per_hi * 1e6, 3)
    R["unit"] = "us"
    R["vs_baseline"] = round(lsoda_hi / per_hi, 2)
    R["baseline"] = "lsoda_measured_this_host_same_tol"
    R["baseline_us"] = round(lsoda_hi * 1e6, 1)
    R["rtol"] = 1e-4
    R["total_s"] = round(t_hi, 4)
    R["latency_s"] = round(lat_hi, 4)
    # LSODA denominator honesty: measured per-callback cost x nfe,
    # subtracted -- the compiled-RHS LSODA estimate
    R["baseline_lsoda_nfe"] = nfe_hi
    R["baseline_callback_us"] = round(per_cb * 1e6, 3)
    R["baseline_compiled_est_us"] = round(lsoda_hi_compiled_est * 1e6, 1)
    R["vs_baseline_compiled_est"] = round(lsoda_hi_compiled_est / per_hi, 2)
    R.update(mfu_keys("robertson_b10k", solver_hi, params_hi, t_hi, steps_hi))


def row_matched_t4e10():
    # reference-matched: shared params, the reference's own t-span to 4e10
    t_m64, _, _, _, _ = run_robertson(
        1e-4, 1e-6, t_eval=T_EVAL_4E10, spread=False
    )
    R["vs_diffsol_t4e10"] = round(DIFFSOL_NGROUPS10K_S / t_m64, 2)
    R["matched_t4e10_total_s"] = round(t_m64, 4)


def row_matched_t4e10_f32():
    t_m32, _, _, _, _ = run_robertson(
        1e-4, 1e-6, t_eval=T_EVAL_4E10, spread=False, dtype=jnp.float32
    )
    R["vs_diffsol_t4e10_f32"] = round(DIFFSOL_NGROUPS10K_S / t_m32, 2)
    R["matched_t4e10_f32_total_s"] = round(t_m32, 4)


def _pallas_solve(prb, te_p, nb, **kw):
    from diffsol_tpu.ops.pallas_stepper import make_pallas_bdf_solve

    return jax.jit(make_pallas_bdf_solve(prb, te_p, nbatch=nb, **kw))


def _pallas_robertson_params(nb):
    return jnp.stack(
        [jnp.full((nb,), 0.04), jnp.full((nb,), 1e4), jnp.full((nb,), 3e7)],
        axis=1,
    )


def row_pallas_main():
    """The flagship row: fused whole-solve Pallas kernel, reference-matched
    t=4e10 B=10k (vs the published 0.134 s)."""
    from diffsol_tpu.models import robertson

    prob_p = robertson.problem_ode(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))
    nb = 10_000
    # ONE wide tile for the whole batch (B=10k pads to 10240 lanes = one
    # ungridded kernel call): probed on-chip round 5 at 5.81 ms marginal
    # vs 6.87 ms for 3x tile=4096 calls -- the per-call while-iteration
    # overhead dominates once the VPU work is this thin.
    psolve = _pallas_solve(prob_p, T_EVAL_4E10, nb, tile=10_240)
    pp = _pallas_robertson_params(nb)
    ys, status, _st = psolve(pp)
    ys.block_until_ready()
    assert int(jnp.min(status)) >= 0, int(jnp.min(status))
    val = _marginal_pallas(psolve, pp)
    R["pallas_t4e10_b10k_total_s"] = round(val, 6)
    if val < 1e-3:
        R["pallas_t4e10_b10k_note"] = "below ~1ms measurement noise"
    R["vs_diffsol_t4e10_pallas"] = round(
        DIFFSOL_NGROUPS10K_S / max(val, 1e-9), 2
    )
    try:
        from diffsol_tpu.ops.pallas_flops import kernel_flops_per_step

        fl = kernel_flops_per_step(
            prob_p, T_EVAL_4E10, nbatch=nb, tile=10_240
        )
        if fl:
            steps = int(jnp.max(_st))
            sec_per_step = val / max(steps * fl["ntiles"], 1)
            R["flops_per_step_pallas_t4e10"] = fl["flops_per_step"]
            R["mfu_pallas_t4e10"] = round(
                fl["flops_per_step"] / sec_per_step / V5E_PEAK_BF16_FLOPS, 6
            )
    except Exception as e:
        R["mfu_pallas_error"] = repr(e)[:120]


def row_pallas_dae():
    from diffsol_tpu.models import robertson

    prob_d = robertson.problem_dae(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))
    nb = 10_000
    psolve = _pallas_solve(prob_d, T_EVAL_4E10, nb)
    pp = _pallas_robertson_params(nb)
    ys, status, _ = psolve(pp)
    ys.block_until_ready()
    assert int(jnp.min(status)) >= 0, int(jnp.min(status))
    val = _marginal_pallas(psolve, pp)
    R["pallas_dae_t4e10_b10k_total_s"] = round(val, 6)
    R["vs_diffsol_t4e10_pallas_dae"] = round(
        DIFFSOL_NGROUPS10K_S / max(val, 1e-9), 2
    )


def row_pallas_small():
    from diffsol_tpu.models import exponential_decay, robertson

    prob_p = robertson.problem_ode(rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))
    psolve = _pallas_solve(prob_p, T_EVAL, 1000)
    pp = _pallas_robertson_params(1000)
    ys, status, _ = psolve(pp)
    ys.block_until_ready()
    assert int(jnp.min(status)) >= 0
    val = _marginal_pallas(psolve, pp)
    R["pallas_t4e5_b1000_total_s"] = round(val, 6)
    if val < 1e-3:
        R["pallas_t4e5_b1000_note"] = "below ~1ms measurement noise"

    prob_e = exponential_decay.problem(rtol=1e-4, atol=1e-6)
    nb = 1000
    psolve_e = _pallas_solve(prob_e, [0.25, 0.5, 0.75, 1.0], nb)
    pp_e = jnp.broadcast_to(
        jnp.asarray(prob_e.params), (nb, prob_e.params.shape[0])
    )
    ys, status, _ = psolve_e(pp_e)
    ys.block_until_ready()
    assert int(jnp.min(status)) >= 0
    R["pallas_expdecay_b1000_total_s"] = round(
        _marginal_pallas(psolve_e, pp_e), 6
    )


def row_pallas_band():
    """Fused whole-solve BANDED Pallas stepper (medium-n MOL tier): heat1d
    n=128 x B=1024 heterogeneous-diffusivity ensemble, whole adaptive
    solve in one kernel launch per member tile.  Chip provenance:
    scripts/tpu_band_stepper_probe.py."""
    from diffsol_tpu.models import heat1d as _h1
    from diffsol_tpu.ops.pallas_stepper_band import make_pallas_band_bdf_solve

    h1prob, _ = _h1.make(mgrid=127, rtol=1e-6, atol=1e-8)
    B_band = 1024
    h1te = [0.001, 0.01, 0.05, 0.1, 0.2]
    bsolve = jax.jit(
        make_pallas_band_bdf_solve(h1prob, h1te, nbatch=B_band, ml=1, mu=1)
    )
    pband = jnp.linspace(0.5, 2.0, B_band)[:, None]
    ys_b, status_b, _steps_b = bsolve(pband)
    ys_b.block_until_ready()
    assert int(jnp.min(status_b)) >= 0, np.asarray(status_b)
    t_band = _marginal_pallas(bsolve, pband)
    R["pallas_band_heat1d_n128_b1024_total_s"] = round(t_band, 6)
    R["pallas_band_heat1d_per_inst_us"] = round(t_band / B_band * 1e6, 3)


def row_rtol1e6():
    lsoda_lo = measure_lsoda(1e-6, 1e-8)
    t_lo, _, _, _, _ = run_robertson(1e-6, 1e-8)
    per_lo = t_lo / NBATCH
    R["value_rtol1e6"] = round(per_lo * 1e6, 3)
    R["vs_baseline_rtol1e6"] = round(lsoda_lo / per_lo, 2)
    R["baseline_rtol1e6_us"] = round(lsoda_lo * 1e6, 1)


def row_blockdiag():
    # unstructured-sparse (block-dense) tier: the reference's robertson_ode
    # ngroups workload as ONE n=3000 problem (3x3 blocks on the lanes);
    # published diffsol: python_results.csv "1000,0.0001" = 0.012448 s
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
    R["robertson_ode_ngroups1000_total_s"] = round(t_grp, 4)
    R["vs_diffsol_ngroups1000"] = round(DIFFSOL_NGROUPS1000_S / t_grp, 3)


def row_blockdiag_lockstep():
    # blockdiag x lockstep: ngroups=100 per member x B=100 members, all
    # 10,000 group-instances in ONE (3,3,K*B) batch-last blockdiag stack --
    # the same total workload as the reference's published ngroups=10k row
    from diffsol_tpu.drivers import solve_dense as _sd
    from diffsol_tpu.ensemble import make_lockstep_problem as _mklock
    from diffsol_tpu.models.robertson import problem_ode_groups
    from diffsol_tpu.solvers.bdf import BdfSolver as _Bdf

    te10 = jnp.asarray(T_EVAL_4E10)
    pgrp100 = problem_ode_groups(100, rtol=1e-4, atol=(1e-8, 1e-6, 1e-6))
    lp_grp = _mklock(pgrp100, 100)
    pb_grp = jnp.broadcast_to(
        pgrp100.params, (100,) + pgrp100.params.shape
    ).astype(lp_grp.params.dtype)
    gsolver2 = _Bdf(lp_grp)

    def run_grp_lock(pb):
        return _sd(gsolver2, te10, params=pb, max_steps=5000)

    sol_gl = run_grp_lock(pb_grp)
    _sync(sol_gl)
    assert int(sol_gl.stop_reason) >= 0, int(sol_gl.stop_reason)
    t_grp_lock, _ = measure_marginal(run_grp_lock, pb_grp)
    R["robertson_ode_g100xb100_total_s"] = round(t_grp_lock, 4)
    R["robertson_ode_g100xb100_per_group_us"] = round(
        t_grp_lock / 10_000 * 1e6, 3
    )
    R["vs_diffsol_ngroups10k_blockdiag_lockstep"] = round(
        DIFFSOL_NGROUPS10K_S / t_grp_lock, 2
    )


def row_sweep():
    # ensemble-size sweep (reference book/src/benchmarks/python.md ngroups
    # table: per-instance time vs batch size)
    for b in (100, 1000):
        tb, _, sb, sv, pb = run_robertson(1e-4, 1e-6, nbatch=b)
        R[f"per_instance_us_b{b}"] = round(tb / b * 1e6, 2)
        if b == 1000:
            R.update(mfu_keys("robertson_b1k", sv, pb, tb, sb))


def row_f32():
    t_hi = R.get("total_s")
    t_f32, _, _, _, _ = run_robertson(1e-4, 1e-6, dtype=jnp.float32)
    R["per_instance_us_f32"] = round(t_f32 / NBATCH * 1e6, 3)
    if t_hi:
        R["f32_vs_f64_speedup"] = round(t_hi / t_f32, 2)


def row_b100k():
    t_100k, _, s_100k, sv_100k, p_100k = run_robertson(
        1e-4, 1e-6, nbatch=100_000
    )
    R["per_instance_us_b100k"] = round(t_100k / 100_000 * 1e6, 3)
    R.update(mfu_keys("robertson_b100k", sv_100k, p_100k, t_100k, s_100k))


def row_b100k_f32():
    t_100k32, _, _, _, _ = run_robertson(
        1e-4, 1e-6, nbatch=100_000, dtype=jnp.float32
    )
    R["per_instance_us_b100k_f32"] = round(t_100k32 / 100_000 * 1e6, 3)


def row_heat2d():
    from diffsol_tpu.models import heat2d

    heat_te = [0.01, 0.03, 0.1]
    heat_s, _, heat_steps, heat_solver, heat_params = run_banded_dae(
        lambda: heat2d.make(mgrid=20), heat_te
    )
    R["heat2d_mgrid20_b32_total_s"] = round(heat_s, 4)
    R["heat2d_mgrid20_b32_steps"] = heat_steps
    R["heat2d_per_instance_ms"] = round(heat_s / 32 * 1e3, 3)
    R.update(mfu_keys("heat2d_b32", heat_solver, heat_params, heat_s,
                      heat_steps))
    heat_cpu = measure_lsoda_heat2d(20, heat_te, 1e-5, 1e-5)
    R["heat2d_cpu_lsoda_banded_ms"] = round(heat_cpu * 1e3, 2)
    R["heat2d_vs_cpu"] = round(heat_cpu / (heat_s / 32), 2)


def row_foodweb():
    from diffsol_tpu.models import foodweb

    food_s, _, food_steps, _, _ = run_banded_dae(
        lambda: foodweb.make(nx=10), [1e-3, 1e-2, 1e-1], max_steps=3000
    )
    R["foodweb_nx10_b32_total_s"] = round(food_s, 4)
    R["foodweb_nx10_b32_steps"] = food_steps


def row_ci_simple():
    # reference CI bench problems (ode_solvers_ci.rs:15-120):
    # exponential_decay and heat1d as lockstep ensembles
    from diffsol_tpu.models import exponential_decay, heat1d

    t_exp = bench_simple(exponential_decay.problem(rtol=1e-4, atol=1e-6),
                         [0.25, 0.5, 0.75, 1.0])
    R["exponential_decay_b1000_per_instance_us"] = round(
        t_exp / 1000 * 1e6, 3
    )
    t_h1d = bench_simple(heat1d.make(mgrid=21)[0], [0.1, 0.5, 1.0], nbatch=32)
    R["heat1d_mgrid21_b32_total_s"] = round(t_h1d, 4)


def row_cpu_denominators():
    """Framework-on-CPU single-instance times via a forced-cpu subprocess
    (scripts/bench_cpu_denominator.py): the XLA-compiled-RHS CPU baseline
    class.  Budget-aware: the subprocess gets the remaining budget (minus
    margin) and emits partial results itself."""
    import subprocess

    sub_budget = max(min(remaining() - 60.0, 600.0), 60.0)
    env = dict(os.environ)
    env["DIFFSOL_CPU_DEN_BUDGET_S"] = str(sub_budget)
    env.pop("PYTHONPATH", None)  # breaks the axon plugin (CLAUDE.md)
    out = subprocess.run(
        ["python", "scripts/bench_cpu_denominator.py"],
        capture_output=True, text=True, timeout=sub_budget + 60,
        env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    cpu_den = json.loads(out.stdout.strip().splitlines()[-1])
    for k, v in cpu_den.items():
        if isinstance(v, (int, float)):
            R[k + "_cpu_xla_ms"] = round(v * 1e3, 3)
    # cross-ratios against rows already measured
    if cpu_den.get("heat2d_b1_s") and R.get("heat2d_mgrid20_b32_total_s"):
        R["heat2d_vs_cpu_xla"] = round(
            cpu_den["heat2d_b1_s"]
            / (R["heat2d_mgrid20_b32_total_s"] / 32), 2
        )
    if cpu_den.get("foodweb_b1_s") and R.get("foodweb_nx10_b32_total_s"):
        R["foodweb_vs_cpu_xla"] = round(
            cpu_den["foodweb_b1_s"] / (R["foodweb_nx10_b32_total_s"] / 32), 2
        )
    if cpu_den.get("robertson_b1_s") and R.get("total_s"):
        R["robertson_vs_cpu_xla"] = round(
            cpu_den["robertson_b1_s"] / (R["total_s"] / NBATCH), 2
        )
    if (cpu_den.get("heat1d_n128_b1_s")
            and R.get("pallas_band_heat1d_n128_b1024_total_s")):
        R["heat1d_n128_band_vs_cpu_xla"] = round(
            cpu_den["heat1d_n128_b1_s"]
            / (R["pallas_band_heat1d_n128_b1024_total_s"] / 1024), 2
        )


def row_dfn():
    """The reference's full pybamm DFN battery model (962-state DAE,
    crates/diffsol/benches/pybamm_dfn.rs:14-31: one discharge hour at
    rtol=1e-4/atol=1e-6).  STEP-DRIVEN: only the single-step program is
    jitted and the loop runs on the host -- the reference's own
    architecture (bdf.rs step() under a host solve loop); the whole-solve
    while_loop program never finishes XLA-compiling on the axon backend
    (round-4 finding, >27 min)."""
    from diffsol_tpu.problem import InitialConditionOptions, OdeBuilder
    from diffsol_tpu.drivers import init_state_jit
    from diffsol_tpu.solvers.bdf import BdfSolver as _B

    dfn_src = open(
        "/root/reference/crates/diffsol/benches/pybamm_dfn.diffsl"
    ).read()
    dfn_prob = (
        OdeBuilder()
        .rtol(1e-4)
        .atol(1e-6)
        .ic_options(InitialConditionOptions(armijo_constant=1e-1))
        .build_from_diffsl(dfn_src)
    )
    dfn_te = np.linspace(360.0, 3600.0, 10)
    dfn_solver = _B(dfn_prob)
    dfn_params = dfn_prob.params
    step_jit = jax.jit(dfn_solver.step)
    interp_jit = jax.jit(dfn_solver.interpolate)
    out_jit = jax.jit(dfn_prob.eqn.out)
    # compile both programs up front (first dispatch pays compile)
    st0 = init_state_jit(dfn_solver, dfn_params)
    float(step_jit(st0, dfn_params).t)

    floor = R.get("dispatch_floor_ms", 30.0) / 1e3

    def run_dfn_once():
        st = init_state_jit(dfn_solver, dfn_params)
        t_cur = float(st.t)
        nsteps = 0
        vols = []
        ei = 0
        while t_cur < dfn_te[-1] and nsteps < 2000:
            st = step_jit(st, dfn_params)
            t_cur = float(st.t)  # host sync (pays the tunnel dispatch)
            nsteps += 1
            while ei < len(dfn_te) and t_cur >= dfn_te[ei]:
                y_i = interp_jit(st, jnp.asarray(dfn_te[ei]))
                vols.append(
                    float(out_jit(jnp.asarray(dfn_te[ei]), y_i,
                                  dfn_params)[0])
                )
                ei += 1
        return np.asarray(vols), nsteps

    t0 = time.perf_counter()
    v_d, dfn_steps = run_dfn_once()
    t_dfn = time.perf_counter() - t0
    assert len(v_d) == len(dfn_te), (len(v_d), len(dfn_te))
    assert np.all(v_d < 4.1) and np.all(v_d > 3.1), v_d
    assert v_d[-1] < v_d[0]  # discharging
    R["pybamm_dfn_total_s"] = round(t_dfn, 3)
    R["pybamm_dfn_linsol"] = dfn_prob.linear_solver.name
    R["pybamm_dfn_steps"] = dfn_steps
    R["pybamm_dfn_ms_per_step"] = round(t_dfn / dfn_steps * 1e3, 2)
    # the host-driven loop pays one tunnel dispatch per step; a local
    # (non-tunneled) TPU would not -- report the floor-corrected est.
    R["pybamm_dfn_est_local_s"] = round(
        max(t_dfn - dfn_steps * floor, 0.0), 3
    )


def row_dfn_ensemble():
    """The DFN at the ENSEMBLE axis (the reference tracks pybamm DFN as a
    bench of record, crates/diffsol/benches/pybamm_dfn.rs:14-31; the
    reference has no batched-DFN mode at all -- this row is the
    TPU-native win axis): a B=8 lockstep ensemble through the
    krylov-lockstep tier (joint-block batched GMRES + per-member f32-LU
    preconditioning), step-driven like row_dfn.  Measures a fixed step
    window (full discharge at B=8 would blow the budget) and reports
    ms/step/member against the single-instance row."""
    from diffsol_tpu.problem import InitialConditionOptions, OdeBuilder
    from diffsol_tpu.drivers import init_state_jit
    from diffsol_tpu.ensemble import make_lockstep_problem
    from diffsol_tpu.solvers.bdf import BdfSolver as _B

    B, NMEAS = 8, 40
    src = open(
        "/root/reference/crates/diffsol/benches/pybamm_dfn.diffsl"
    ).read()
    prob = (
        OdeBuilder()
        .rtol(1e-4)
        .atol(1e-6)
        .ic_options(InitialConditionOptions(armijo_constant=1e-1))
        .linear_solver("krylov")  # the n>=256 auto-route picks it anyway
        .build_from_diffsl(src)
    )
    lp = make_lockstep_problem(prob, B)
    np_params = np.asarray(prob.params)
    if np_params.size:
        params_b = jnp.asarray(
            np_params[None, :] * (1.0 + 0.05 * np.linspace(-1, 1, B))[:, None]
        )
    else:  # the reference DFN text has no `in` inputs
        params_b = jnp.zeros((B, 0))
    solver = _B(lp)
    state = init_state_jit(solver, params_b)
    step_jit = jax.jit(solver.step)
    state = step_jit(state, params_b)  # pays compile
    float(state.t)
    # warm a few steps past startup ramp, then measure NMEAS host-synced
    for _ in range(5):
        state = step_jit(state, params_b)
    float(state.t)
    t0 = time.perf_counter()
    for _ in range(NMEAS):
        state = step_jit(state, params_b)
        float(state.t)  # host sync: same step-driven regime as row_dfn
    wall = time.perf_counter() - t0
    assert float(state.t) > 0.0 and bool(jnp.all(jnp.isfinite(state.y)))
    ms_step = wall / NMEAS * 1e3
    R["pybamm_dfn_ensemble_B"] = B
    R["pybamm_dfn_ensemble_steps_measured"] = NMEAS
    R["pybamm_dfn_ensemble_ms_per_step"] = round(ms_step, 1)
    R["pybamm_dfn_ensemble_ms_per_step_per_member"] = round(ms_step / B, 1)
    if R.get("pybamm_dfn_ms_per_step"):
        # ensemble-axis speedup: B members cost this much less than B
        # sequential single-instance solves
        R["pybamm_dfn_ensemble_vs_single"] = round(
            R["pybamm_dfn_ms_per_step"] / (ms_step / B), 2
        )


def main():
    # --- backend assert FIRST (CLAUDE.md rule): a contended axon tunnel
    # silently falls back to CPU and every compile then runs on the 1-core
    # host -- the r04 gate timeout.  Re-exec once after a delay.
    devs = jax.devices()
    plat = devs[0].platform.lower()
    print(f"bench: devices={devs}", file=sys.stderr)
    R["device"] = str(devs[0])
    if plat not in ("tpu", "axon") and not os.environ.get(
        "DIFFSOL_BENCH_ALLOW_CPU"
    ):
        if not os.environ.get("DIFFSOL_BENCH_RETRIED"):
            print("bench: lost the TPU tunnel (cpu fallback); retrying in "
                  "30 s", file=sys.stderr)
            time.sleep(30.0)
            os.environ["DIFFSOL_BENCH_RETRIED"] = "1"
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise RuntimeError(
            f"TPU backend unavailable (platform={plat}); refusing to bench "
            "on CPU fallback"
        )

    # f64 for stiff-tolerance parity; XLA emulates f64 on TPU.
    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: whole-solve compiles dominate bench wall
    # time; repeat runs (and the driver) hit the cache
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DIFFSOL_BENCH_CACHE", "/tmp/diffsol_tpu_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    R["budget_s"] = BUDGET_S
    R["dispatch_floor_ms"] = round(dispatch_floor() * 1e3, 2)

    # --- rows: cheapest-and-most-important first; est_s are COLD-compile
    # estimates (calibrated on the axon chip; see secs_* keys of past runs)
    row("headline", 150, row_headline)
    row("pallas_main", 90, row_pallas_main)
    row("matched_t4e10", 100, row_matched_t4e10)
    row("pallas_band", 100, row_pallas_band)
    row("matched_t4e10_f32", 90, row_matched_t4e10_f32)
    row("pallas_dae", 80, row_pallas_dae)
    row("pallas_small", 90, row_pallas_small)
    row("blockdiag_lockstep", 120, row_blockdiag_lockstep)
    row("rtol1e6", 110, row_rtol1e6)
    row("f32", 80, row_f32)
    row("sweep", 150, row_sweep)
    row("heat2d", 120, row_heat2d)
    row("ci_simple", 130, row_ci_simple)
    row("blockdiag", 100, row_blockdiag)
    row("foodweb", 110, row_foodweb)
    row("b100k", 140, row_b100k)
    row("b100k_f32", 90, row_b100k_f32)
    row("cpu_denominators", 150, row_cpu_denominators)
    # the DFN row costs ~23 min of axon compile cold; only run it when the
    # budget clearly covers it (cache-primed it fits easily)
    row("dfn", 1500, row_dfn)
    row("dfn_ensemble", 900, row_dfn_ensemble)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        R["bench_error"] = repr(e)[:300]
        raise
    finally:
        R["elapsed_s"] = round(time.monotonic() - T0, 1)
        emit()
