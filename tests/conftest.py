"""Test configuration: force JAX onto CPU with 8 virtual devices.

This is the TPU-codebase equivalent of a fake distributed backend
(SURVEY.md §4): multi-device mesh tests run on host CPU via
``--xla_force_host_platform_device_count`` without real chips.
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

# BPX_TEST_PLATFORM=axon runs the suite against the real TPU backend
# (used to verify backend-sensitive tests, e.g. the pallas dropout
# statistics, on actual hardware); default is the 8-device virtual CPU.
os.environ["JAX_PLATFORMS"] = os.environ.get("BPX_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
