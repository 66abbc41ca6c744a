"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on a host-platform mesh (the driver
separately dry-runs the multi-chip path); numerical parity tests run in
float64 on CPU, which requires x64 mode.  Both env vars must be set before
jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REF_DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def ref_data():
    if not REF_DATA.exists():
        pytest.skip("reference data not mounted")
    return REF_DATA


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
