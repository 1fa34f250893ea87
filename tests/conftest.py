"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware. The env vars must be set before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin force-selects itself regardless of the JAX_PLATFORMS
# env var; updating the config AFTER import is the only way to get a real
# (multi-device) CPU backend in this environment.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Compilation in this environment is very slow; persist compiled executables
# across test processes. The cache dir is keyed by the host's CPU feature
# set: XLA:CPU AOT executables compiled on a machine with different ISA
# extensions segfault when loaded (observed across container hosts).
import hashlib

try:
    with open("/proc/cpuinfo") as f:
        _flags = next((ln for ln in f if ln.startswith("flags")), "")
    _cpu_key = hashlib.sha1(_flags.encode()).hexdigest()[:8]
except OSError:
    _cpu_key = "nohost"
jax.config.update(
    "jax_compilation_cache_dir", f"/root/repo/.jax_cache_cpu/{_cpu_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
