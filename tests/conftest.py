"""Test harness: run everything on a simulated 8-device CPU mesh.

The TPU-native answer to "test multi-chip without a cluster": force the host
platform with 8 virtual devices so sharding/pjit paths compile and execute
in CI exactly as they would across a real slice.

Note: this environment's sitecustomize registers an `axon` TPU backend and
programmatically sets ``jax_platforms="axon,cpu"`` at interpreter start, so
the JAX_PLATFORMS env var alone is not enough — we must override the config
after importing jax (before any computation runs).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (full model on the CPU mesh)"
    )
