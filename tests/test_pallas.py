"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsol_tpu import norms
from diffsol_tpu.ops.pallas_norms import wrms_squared_lockstep


def test_pallas_wrms_matches_jnp():
    rng = np.random.default_rng(5)
    n, b = 3, 256
    x = jnp.asarray(rng.standard_normal((n, b)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((n, b)), jnp.float32)
    atol = jnp.asarray(rng.uniform(1e-8, 1e-6, (n, 1)), jnp.float32)
    rtol = 1e-4
    ref = norms.squared_norm(x, y, atol, rtol, nbatch=b)
    out = wrms_squared_lockstep(x, y, atol, rtol, interpret=True)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)


def test_pallas_wrms_fallback_f64():
    # f64 and unaligned shapes use the jnp path transparently
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((3, 100)))
    y = jnp.asarray(rng.standard_normal((3, 100)))
    atol = jnp.full((3, 1), 1e-8)
    ref = norms.squared_norm(x, y, atol, 1e-4, nbatch=100)
    out = wrms_squared_lockstep(x, y, atol, 1e-4)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-12)
