"""Test configuration: run JAX on CPU with 8 virtual devices.

Tests exercise numerical parity and the multi-chip sharding path without TPU
hardware: a virtual 8-device CPU platform stands in for an 8-chip slice
(the driver separately dry-runs the multi-chip path via __graft_entry__).
"""

import os

# The image pins JAX_PLATFORMS=axon (the TPU tunnel); tests must run on a
# virtual 8-device CPU platform, so force it before jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(12345)


@pytest.fixture(scope="session")
def fixtures_dir():
    import pathlib
    return pathlib.Path(__file__).resolve().parent / "fixtures"
