"""Test configuration: run every test on a virtual 8-device CPU mesh.

Multi-device correctness is validated the TPU-native way (SURVEY.md §4):
``xla_force_host_platform_device_count`` stands in for a multi-chip slice.

Note: the environment may pre-import jax with a TPU platform already
selected (JAX_PLATFORMS env), so we must override via the config API, not
os.environ.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
