"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding
logic is exercised without TPU hardware (the driver's dryrun does the
same). This must happen before jax is imported anywhere.
"""

import hashlib
import os
import platform

# the axon TPU plugin registers itself from sitecustomize (before this
# conftest runs) whenever PALLAS_AXON_POOL_IPS is set, and its register()
# forces the platform; point jax back at the virtual CPU mesh explicitly
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("MARIA_TPU_CACHE_DIR", "/tmp/maria-tpu-data")
# persistent XLA compile cache: repeat suite runs (and repeat builds of
# the same program within one run) skip recompilation. Keyed by a machine
# fingerprint — AOT artifacts from a host with different CPU features
# load with a "could lead to SIGILL" warning.
try:
    with open("/proc/cpuinfo") as _f:
        _cpu = next((line for line in _f if line.startswith("flags")), "")
except OSError:
    _cpu = platform.processor()
_tag = hashlib.md5((platform.machine() + _cpu).encode()).hexdigest()[:8]
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", f"/tmp/jax-cpu-cache-{_tag}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the axon sitecustomize imports jax at interpreter start, BEFORE this
# conftest runs, so the JAX_COMPILATION_CACHE_DIR env var above is read
# too late — the runtime config update is what actually enables the
# persistent cache on this machine
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
