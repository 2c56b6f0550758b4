"""SDE solver tests (the reference has only a stub, op/stoch.rs +
ode_solver/sde.rs:1-7; this capability goes beyond parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsol_tpu.solvers.sde import solve_em, solve_em_ensemble, solve_milstein


def test_em_ornstein_uhlenbeck_moments():
    """OU process dX = -theta X dt + sigma dW: stationary variance
    sigma^2/(2 theta)."""
    theta, sigma = 1.5, 0.4

    def rhs(t, y, p):
        return -p[0] * y

    def diff(t, y, p):
        return jnp.full_like(y, p[1])

    params = jnp.array([theta, sigma])
    y0 = jnp.zeros(1)
    sols = solve_em_ensemble(
        rhs, diff, y0, 0.0, 8.0, 2000, params, jax.random.key(0), 4096
    )
    tail = np.asarray(sols.ys[:, -500:, 0])  # stationary samples
    var = tail.var()
    expected = sigma**2 / (2 * theta)
    np.testing.assert_allclose(var, expected, rtol=0.1)
    assert abs(tail.mean()) < 0.02


def test_milstein_gbm_strong_order():
    """Geometric Brownian motion has an exact pathwise solution; Milstein
    must beat Euler-Maruyama in strong error at the same step count."""
    mu, sigma = 0.05, 0.5

    def rhs(t, y, p):
        return p[0] * y

    def diff(t, y, p):
        return p[1] * y

    params = jnp.array([mu, sigma])
    y0 = jnp.ones(1)
    key = jax.random.key(42)

    # exact solution reconstructed from the same Brownian increments
    nsteps = 400
    keys = jax.random.split(key, nsteps)
    h = 1.0 / nsteps
    dws = jnp.stack([jax.random.normal(k, (1,)) for k in keys]) * jnp.sqrt(h)
    w = jnp.cumsum(dws[:, 0])
    t = (jnp.arange(nsteps) + 1) * h
    exact_final = float(jnp.exp((mu - 0.5 * sigma**2) * t[-1] + sigma * w[-1]))

    em = solve_em(rhs, diff, y0, 0.0, 1.0, nsteps, params, key)
    mil = solve_milstein(rhs, diff, y0, 0.0, 1.0, nsteps, params, key)
    err_em = abs(float(em.ys[-1, 0]) - exact_final)
    err_mil = abs(float(mil.ys[-1, 0]) - exact_final)
    assert err_mil < err_em
    assert err_mil < 0.01


def test_classify_noise_kinds():
    """reference op/stoch.rs:6-66 StochOpKind classification."""
    from diffsol_tpu.solvers.sde import classify_noise

    y0 = jnp.asarray([1.0, 2.0, 3.0])
    p = jnp.asarray([0.5])

    # additive: g independent of y
    assert classify_noise(lambda t, y, pp: jnp.full_like(y, 0.3), y0, p) \
        == "additive"
    # diagonal: g_i = p * y_i
    assert classify_noise(lambda t, y, pp: pp[0] * y, y0, p) == "diagonal"
    # scalar: one driving process
    assert classify_noise(
        lambda t, y, pp: (pp[0] * y)[:, None], y0, p
    ) == "scalar"
    # 1-state diagonal form is also one process -> scalar (stoch.rs kind())
    assert classify_noise(
        lambda t, y, pp: pp[0] * y, jnp.asarray([1.0]), p
    ) == "scalar"
    # state cross-coupling in diagonal form stays diagonal: the reference
    # probe only checks per-process dW coupling (stoch.rs:43-63)
    assert classify_noise(
        lambda t, y, pp: pp[0] * jnp.roll(y, 1), y0, p
    ) == "diagonal"
    # zero processes
    assert classify_noise(
        lambda t, y, pp: jnp.zeros((3, 0)), y0, p
    ) == "zero"
    # general square matrix, truly diagonal structure
    assert classify_noise(
        lambda t, y, pp: jnp.diag(pp[0] * y), y0, p
    ) == "diagonal"
    # general square matrix with cross-process coupling
    assert classify_noise(
        lambda t, y, pp: pp[0] * jnp.outer(y, y), y0, p
    ) == "other"
