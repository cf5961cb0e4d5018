"""Test harness: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware.

Note: this machine auto-imports jax at interpreter startup (site hook) and
pre-sets JAX_PLATFORMS=axon (the tunneled TPU), so plain env manipulation
is too late — we must go through jax.config before any backend initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compile cache: CPU-mesh graphs recompile identically across
# pytest runs; caching them cuts suite wall time on this 1-core host
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        f"tests must run on the virtual CPU mesh, got {jax.default_backend()}"
    )
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.device_count()}"
    )
