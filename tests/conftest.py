"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Multi-chip sharding is validated on a virtual CPU mesh (the driver separately
dry-runs the multi-chip path); numerical parity tests need f64.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force cpu here
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: whole-solve while-loops take 10-60 s each to
# compile and dominate suite wall time; repeat runs hit the cache instead
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("DIFFSOL_JAX_CACHE", "/tmp/diffsol_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop in-memory jit caches after each test module.

    The XLA CPU compiler segfaults deterministically (inside
    backend_compile) once a single process has accumulated the whole
    suite's worth of live compiled whole-solve executables — every test
    file passes in isolation.  Clearing between modules bounds the live
    set; the persistent on-disk cache keeps the recompiles cheap.
    """
    yield
    jax.clear_caches()
