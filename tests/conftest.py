"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on a host-platform mesh (the driver
separately dry-runs the multi-chip path); numerical parity tests run in
float64 on CPU, which requires x64 mode.  Both env vars must be set before
jax is imported anywhere.
"""

import os
import re

flags = os.environ.get("XLA_FLAGS", "")
_m = re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
if _m is None:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
elif int(_m.group(1)) < 8:
    # a smaller leftover count (e.g. a debugging shell export) would
    # silently degrade every multi-chip sharding test to a smaller
    # mesh; bump it — the backend is not initialized yet at conftest
    # time, so the correction takes effect
    os.environ["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "--xla_force_host_platform_device_count=8", flags)

import jax

# This image's interpreter boot (sitecustomize) registers a remote-TPU
# backend and force-overrides jax_platforms, ignoring the JAX_PLATFORMS env
# var — tests must run on the local CPU backend, so override via config
# (backends are not initialized yet at conftest time).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# this image compiles XLA slowly on its single CPU core; the persistent
# cache makes every repeated computation across test runs a ~100ms reload
jax.config.update("jax_compilation_cache_dir",
                  str(__import__("pathlib").Path(__file__).parents[1]
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

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
