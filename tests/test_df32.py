"""df32 transcendental kernels + interpreter coverage (round-5).

The fused Pallas tiers need the user's rhs re-evaluated in double-float
arithmetic; round 4 covered only polynomial/rational primitives.  These
tests pin the argument-reduction transcendentals (ops/df32.py) to their
documented accuracy (~2^-47 relative; sin/cos absolute error ~|x|*2^-48
from the two-split reduction), the dual-number chain rules, and the
end-to-end fused solve of transcendental right-hand sides against the
XLA f64 path (reference parity role: the reference's hot loop is
model-agnostic, crates/diffsol/src/ode_solver/bdf.rs:1277-1465, and its
DiffSL bridge feeds exp/sinh/tanh models like benches/pybamm_dfn.diffsl).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsol_tpu.ops import df32
from diffsol_tpu.ops.df32 import DF, DFAlgebra
from diffsol_tpu.ops.dfinterp import DualAlgebra, SArr, make_interpreter


def _df(x64):
    x64 = jnp.asarray(x64, jnp.float64)
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return DF(hi, lo)


def _to64(d: DF):
    return np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64)


REL = 4e-14  # ~2^-47 with margin for the composed refinements


@pytest.mark.parametrize(
    "fn,ref,lo,hi",
    [
        # exp's lower end: below exp(x) ~ 1e-30 the lo word of the result
        # underflows to f32-subnormal and accuracy degrades to ~2^-24
        # relative (the general df32 representation floor, same clamp the
        # XLA path applies in ops/controller.py)
        (df32.exp, np.exp, -55.0, 80.0),
        (df32.expm1, np.expm1, -30.0, 30.0),
        (df32.log, np.log, 1e-30, 1e30),
        (df32.sqrt, np.sqrt, 1e-30, 1e30),
        (df32.sinh, np.sinh, -30.0, 30.0),
        (df32.cosh, np.cosh, -30.0, 30.0),
        (df32.tanh, np.tanh, -25.0, 25.0),
        (df32.logistic, lambda x: 1.0 / (1.0 + np.exp(-x)), -60.0, 60.0),
    ],
)
def test_unary_accuracy(fn, ref, lo, hi):
    if lo > 0:  # log/sqrt: log-spaced positive domain
        x = np.logspace(np.log10(lo), np.log10(hi), 4001)
    else:
        x = np.linspace(lo, hi, 4001)
    xd = _df(x)
    got = _to64(fn(xd))
    # reference at the df-REPRESENTABLE input: isolates algorithm error
    # from input quantization (exp's condition number is |x|, so the
    # unavoidable input rounding alone contributes |x| * 2^-49 rel)
    want = ref(_to64(xd))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
    assert np.max(rel) < REL, (np.max(rel), x[np.argmax(rel)])


def test_exp_tiny_results_degrade_gracefully():
    """Below |exp(x)| ~ 1e-24 the lo word's pow-2 scale goes f32-subnormal
    and is flushed: accuracy degrades toward 2^-24 but stays ~1e-9-class
    down to x ~ -69 (documented df32 representation floor)."""
    x = np.linspace(-69.0, -55.0, 2001)
    got = _to64(df32.exp(_df(x)))
    want = np.exp(x)
    rel = np.abs(got - want) / want
    # bound: lost-lo <= min-normal 1.2e-38 / exp(-69) ~ 1.2e-8
    assert np.max(rel) < 2e-8, np.max(rel)


def test_expm1_near_zero():
    x = np.linspace(-1e-6, 1e-6, 1001)
    got = _to64(df32.expm1(_df(x)))
    want = np.expm1(x)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-300)
    assert np.max(rel[x != 0.0]) < REL


def test_log1p_near_zero():
    x = np.concatenate([np.linspace(-1e-6, 1e-6, 1001),
                        np.linspace(-0.9, 10.0, 1001)])
    got = _to64(df32.log1p(_df(x)))
    want = np.log1p(x)
    denom = np.maximum(np.abs(want), 1e-300)
    rel = np.abs(got - want) / denom
    # series window full accuracy; log branch: 2^-47 abs / |log1p| >= .03
    assert np.max(rel[want != 0.0]) < 5e-13
    tight = np.abs(x) < 1.0 / 32.0
    assert np.max(rel[tight & (want != 0.0)]) < REL


def test_sincos_accuracy():
    x = np.linspace(-50.0, 50.0, 20001)
    s, c = df32.sincos(_df(x))
    # absolute error bound |x| * 2^-48 (+ polynomial tail), documented
    bound = (np.abs(x) + 1.0) * 2.0**-46
    assert np.max(np.abs(_to64(s) - np.sin(x)) - bound) < 0
    assert np.max(np.abs(_to64(c) - np.cos(x)) - bound) < 0
    # pythagorean identity stays tight
    ident = _to64(s) ** 2 + _to64(c) ** 2 - 1.0
    assert np.max(np.abs(ident)) < 1e-13


def test_pow_accuracy():
    x = np.logspace(-5, 5, 501)
    y = np.linspace(-3.0, 3.0, 501)
    xd, yd = _df(x), _df(y)
    got = _to64(df32.pow_(xd, yd))
    want = _to64(xd) ** _to64(yd)
    rel = np.abs(got - want) / np.abs(want)
    # exp(y log x): error ~ (1 + |y log x|) * 2^-47; |y log x| <= 35 here
    assert np.max(rel) < 1e-12


def test_exp_overflow_saturates():
    x = np.array([-200.0, -100.0, 100.0, 200.0])
    got = _to64(df32.exp(_df(x)))
    assert got[0] == 0.0 and got[1] == 0.0
    assert np.isinf(got[2]) and np.isinf(got[3])
    gm1 = _to64(df32.expm1(_df(x)))
    assert gm1[0] == -1.0 and np.isinf(gm1[3])


def test_sign_and_square():
    x = np.array([-2.5, -0.0, 0.0, 3.0])
    assert np.allclose(_to64(df32.sign(_df(x))), np.sign(x))
    assert np.allclose(_to64(df32.square(_df(x))), x * x, rtol=1e-14)


# ---------------------------------------------------------------------------
# dual-number chain rules through the interpreter
# ---------------------------------------------------------------------------


def _dual_grad(fn_jnp, x0: float):
    """d fn/dx at x0 through the scalar df interpreter's DualAlgebra."""
    with jax.enable_x64(False):
        jaxpr = jax.make_jaxpr(fn_jnp)(jnp.zeros((), jnp.float32))
    lanes = jnp.zeros((4,), jnp.float32)
    dual = DualAlgebra(DFAlgebra)
    run = make_interpreter(dual, lanes)
    x = DF(jnp.full((4,), np.float32(x0)),
           jnp.full((4,), np.float32(np.float64(x0) - np.float32(x0))))
    one = df32.const(1.0, like=lanes)
    out = run(jaxpr, [SArr((), [(x, one)])])[0]
    val, tan = out.flat[0]
    return float(_to64(val)[0]), float(_to64(tan)[0])


@pytest.mark.parametrize(
    "fn,x0",
    [
        (lambda x: jnp.exp(x) * jnp.sin(x), 0.7),
        (lambda x: jnp.log(x + 2.0) + jnp.sqrt(x), 1.3),
        (lambda x: jnp.tanh(x) + jnp.sinh(x) * jnp.cosh(x), 0.4),
        (lambda x: jnp.power(x + 1.5, 2.5), 0.8),
        (lambda x: jax.nn.sigmoid(3.0 * x), -0.6),
        (lambda x: jnp.expm1(x) - jnp.log1p(x), 0.05),
        (lambda x: jnp.where(x > 0.5, jnp.cos(x), x * x), 0.9),
        (lambda x: jnp.where(x > 0.5, jnp.cos(x), x * x), 0.1),
    ],
)
def test_dual_chain_rules(fn, x0):
    val, tan = _dual_grad(fn, x0)
    want_v = float(fn(jnp.asarray(x0, jnp.float64)))
    want_t = float(jax.grad(fn)(jnp.asarray(x0, jnp.float64)))
    assert abs(val - want_v) < 1e-12 * max(abs(want_v), 1.0)
    assert abs(tan - want_t) < 1e-11 * max(abs(want_t), 1.0)


# ---------------------------------------------------------------------------
# end-to-end: transcendental rhs through the fused tiers (interpret mode)
# ---------------------------------------------------------------------------


def _fused_vs_xla(problem, t_eval, params_b, rtol=3e-5):
    import diffsol_tpu as dt

    sol_f = dt.solve_dense_ensemble(
        dt.BdfSolver, problem, t_eval, params_b, mode="fused", interpret=True
    )
    sol_x = dt.solve_dense_ensemble(
        dt.BdfSolver, problem, t_eval, params_b, mode="lockstep"
    )
    assert int(sol_f.stop_reason) >= 0
    assert int(sol_x.stop_reason) >= 0
    err = np.max(np.abs(np.asarray(sol_f.ys) - np.asarray(sol_x.ys)))
    scale = np.max(np.abs(np.asarray(sol_x.ys)))
    assert err < rtol * max(scale, 1.0), err
    return sol_f


def test_fused_exp_rhs():
    """Stiff flame-propagation-like model with exp/sinh in the rhs."""
    from diffsol_tpu.problem import OdeBuilder

    def rhs(t, y, p):
        return jnp.stack([
            -p[0] * jnp.expm1(y[0]) + 0.1 * jnp.sin(t),
            p[1] * (jnp.tanh(y[0]) - y[1]),
        ])

    problem = (
        OdeBuilder()
        .rhs(rhs)
        .init(lambda t, p: jnp.asarray([1.0, 0.0]))
        .p([2.0, 1.5])
        .rtol(1e-6)
        .atol(1e-8)
        .build()
    )
    B = 4
    pb = jnp.stack([jnp.linspace(1.5, 2.5, B), jnp.full((B,), 1.5)], axis=1)
    _fused_vs_xla(problem, [0.5, 1.0, 2.0, 4.0], pb)


def test_fused_sir_like_exp():
    """SIR with a seasonal exp-modulated contact rate (transcendental in
    both t and y)."""
    from diffsol_tpu.problem import OdeBuilder

    def rhs(t, y, p):
        beta = p[0] * jnp.exp(0.3 * jnp.cos(2.0 * jnp.pi * t))
        s, i = y[0], y[1]
        inf = beta * s * i
        return jnp.stack([-inf, inf - p[1] * i, p[1] * i])

    problem = (
        OdeBuilder()
        .rhs(rhs)
        .init(lambda t, p: jnp.asarray([0.99, 0.01, 0.0]))
        .p([1.5, 0.25])
        .rtol(1e-6)
        .atol(1e-9)
        .build()
    )
    B = 4
    pb = jnp.stack([jnp.linspace(1.2, 1.8, B), jnp.full((B,), 0.25)], axis=1)
    sol = _fused_vs_xla(problem, [1.0, 2.0, 5.0, 10.0], pb)
    ys = np.asarray(sol.ys)
    # conservation: S + I + R = 1
    assert np.max(np.abs(ys.sum(axis=2) - 1.0)) < 1e-6


def test_fused_band_transcendental():
    """Banded (medium-n) tier with an exp reaction term: a
    reaction-diffusion rhs now in scope for the banded kernel."""
    import diffsol_tpu as dt
    from diffsol_tpu.ops.banded import make_banded_solver
    from diffsol_tpu.problem import OdeBuilder

    n = 16
    h = 1.0 / (n + 1)

    def rhs(t, y, p):
        left = jnp.concatenate([jnp.zeros_like(y[:1]), y[:-1]])
        right = jnp.concatenate([y[1:], jnp.zeros_like(y[:1])])
        lap = (left - 2.0 * y + right) / (h * h)
        return p[0] * lap + p[1] * jnp.exp(-y) * jnp.tanh(y)

    def init(t, p):
        x = (jnp.arange(n) + 1.0) * h
        return jnp.sin(jnp.pi * x)

    problem = (
        OdeBuilder()
        .rhs(rhs)
        .init(init)
        .p([1.0, 5.0])
        .rtol(1e-6)
        .atol(1e-8)
        .linear_solver(make_banded_solver(1, 1))
        .build()
    )
    B = 4
    pb = jnp.stack([jnp.linspace(0.8, 1.2, B), jnp.full((B,), 5.0)], axis=1)
    from diffsol_tpu.ops.pallas_stepper_band import make_pallas_band_bdf_solve

    t_eval = [0.01, 0.05, 0.1]
    bsolve = make_pallas_band_bdf_solve(
        problem, t_eval, nbatch=B, ml=1, mu=1, interpret=True, tile=B
    )
    ys_b, status, _ = bsolve(pb)
    assert int(jnp.min(status)) >= 0
    sol_x = dt.solve_dense_ensemble(
        dt.BdfSolver, problem, t_eval, pb, mode="lockstep"
    )
    err = np.max(np.abs(np.asarray(ys_b) - np.moveaxis(np.asarray(sol_x.ys), 1, 2)))
    assert err < 3e-5, err
