"""Test harness config: force an 8-device CPU mesh before JAX imports.

Tests run on CPU (Pallas kernels in interpret mode) so the suite is
hardware-independent; multi-device sharding/ring-attention tests use the
8 virtual devices. Set TPU_FLASH_TEST_TPU=1 to run against real hardware.
"""

import os
import sys

if not os.environ.get("TPU_FLASH_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon PJRT plugin (if present) force-registers itself and overrides
    # JAX_PLATFORMS; pin the config explicitly before any backend init.
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
