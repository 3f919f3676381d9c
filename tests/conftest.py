"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py and the driver's compile checks;
tests must be hermetic and fast, so they force the CPU backend with 8
virtual devices (for the multi-chip sharding tests) before jax is imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the driver env pins axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize registers the axon (TPU tunnel) PJRT plugin
# and prepends it to jax_platforms regardless of the env var; force CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by XLA
# compiles (every distinct shape/cap combination re-traces); caching them
# across runs cuts repeat suite time by an order of magnitude.
jax.config.update("jax_compilation_cache_dir", "/tmp/treensearch_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA CPU backend segfaults in backend_compile after ~45-50
    in-process compilations of this suite (reproduced deterministically,
    independent of WHICH tests precede); dropping live executables
    between modules avoids the pile-up, and the persistent disk cache
    keeps the re-loads cheap."""
    yield
    jax.clear_caches()
