"""Test configuration: force a virtual 8-device CPU mesh before JAX initializes.

Mirrors the test strategy in SURVEY.md §4: multi-chip (DP / sharded-dedup) logic is
exercised on a CPU-simulated mesh so the suite runs anywhere; the real TPU chip is
only used by bench.py.
"""
import os

# Must be set before jax is imported anywhere in the test process. Hard-set (not
# setdefault): the interactive session may point JAX at the axon TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

# XLA CPU's oneDNN fast path trades f32 matmul precision for speed; golden parity
# tests need deterministic full-precision accumulation.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
