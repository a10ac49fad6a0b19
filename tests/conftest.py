"""Test config: force the CPU backend with 8 virtual devices so multi-chip
sharding logic runs in CI without TPUs (SURVEY.md §4 implication (4)).

Note: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (the single-chip TPU tunnel), so env vars alone are too
late — we must update jax.config directly. Tests must never touch the tunnel:
it is single-client and a second process wedges on it.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
