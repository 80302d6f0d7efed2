"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is how multi-chip sharding is tested without real TPU hardware
(SURVEY.md §4 implication): every test sees 8 CPU devices, so
`jax.sharding.Mesh`-based code paths (distributed BA, pipelined stages)
compile and execute the same collectives they would on a pod slice.
"""

import os
import sys

# Force-override: the session env pins JAX_PLATFORMS=axon (the real TPU
# tunnel); unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu"
# via jax.config at interpreter startup, overriding the env var — override
# it back so tests really run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Compilation on this 2-vCPU host is the test-time bottleneck; persist
# compiled executables across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
