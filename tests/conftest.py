"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (the bench runs on the real chip)."""

import os

# KANZI_TPU_TESTS_TPU=1 keeps the real TPU visible so the Pallas kernel
# tests run on hardware; the default is the virtual 8-device CPU mesh.
if os.environ.get("KANZI_TPU_TESTS_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

    # the axon sitecustomize pins jax to the (single-client) TPU tunnel; tests
    # must run on a virtual 8-device CPU mesh instead
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
