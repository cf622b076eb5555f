"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests emulate
an 8-device topology on the host CPU (the standard JAX pattern for
testing `shard_map`/`pjit` layouts without a pod).

Note: the environment's sitecustomize imports jax and registers a TPU
plugin before conftest runs, so plain env vars are too late —
`jax.config.update` still works because no backend has initialized
yet at collection time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
