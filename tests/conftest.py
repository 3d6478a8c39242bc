import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (reference tests similarly validate the MPI
# code at mpiexec -np 2, test/test.sh:74-80).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(__file__))

# persistent XLA compile cache: the suite re-traces many small sector shapes;
# caching across runs cuts wall-clock dramatically on CPU
import jax  # noqa: E402

# this container's sitecustomize force-registers the axon TPU backend and
# overrides the JAX_PLATFORMS env var; the config update below wins, keeping
# the test suite on the virtual 8-device CPU mesh
jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent XLA compilation cache is deliberately NOT enabled for
# the CPU suite: this jax build segfaults both when loading cache entries
# written on a different machine type (AOT machine-feature mismatch ->
# SIGILL) and intermittently when serializing CPU executables
# (compilation_cache.put_executable_and_time). Set
# EDIPACK_TPU_XLA_CACHE=/path to opt in on a trusted single machine.
_cache = os.environ.get("EDIPACK_TPU_XLA_CACHE")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


# this jaxlib build intermittently SEGFAULTS in backend_compile_and_load
# when many hundreds of live compiled executables have accumulated (seen
# mid-suite in the slow tier; any single file passes in isolation).
# Dropping the executable caches between modules keeps the live-executable
# count bounded; the cost is re-tracing shared shapes per module.
import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
    gc.collect()
