"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the reference simulates multi-node
with multi-rank single-node, ref: tests/CMakeLists.txt:159-178; we simulate
multi-chip with xla_force_host_platform_device_count).  Numerics run in f64
for iteration-count parity with the (f64) reference.
"""

import os

# Must be set before the CPU backend first initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# A TPU plugin may already be registered (sitecustomize); force the CPU
# backend for tests — it honors the virtual device count above.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
