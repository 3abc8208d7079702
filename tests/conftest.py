"""Test configuration: force a virtual 8-device CPU mesh before JAX initializes.

Mirrors the test strategy in SURVEY.md §4: multi-chip (DP / sharded-dedup) logic is
exercised on a CPU-simulated mesh so the suite runs anywhere; the real TPU chip is
only used by bench.py.
"""
import os

# Must be set before jax is imported anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
