"""Test env: force CPU platform with 8 virtual devices so multi-chip sharding
paths (mesh/pjit/shard_map) run without TPU hardware.

NOTE: this machine's sitecustomize force-registers the `axon` TPU platform
ahead of JAX_PLATFORMS, so the env var alone is NOT enough — we also update
jax.config before any backend use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "golden: slow torch-oracle golden parity tests (deselect with -m 'not golden')",
    )
    config.addinivalue_line(
        "markers",
        "multiprocess: forks real coordinator-connected worker processes",
    )
    config.addinivalue_line(
        "markers",
        "convergence: 100-300-step tiny-overfit loops per training recipe "
        "(slow; deselect with -m 'not convergence')",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(231)  # reference eval seed (SURVEY.md §4)
