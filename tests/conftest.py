"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code is
validated on XLA's host platform with 8 virtual devices (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.py).
"""

import os

# Must be set before jax is imported anywhere. Hard-set (not setdefault):
# the session environment pins JAX_PLATFORMS to the real TPU tunnel, but
# tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The TPU-tunnel sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter start, overriding JAX_PLATFORMS. Override it back before any
# backend is initialized: tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA CPU compiles of the conv trunk are slow;
# cache them across test runs.
_CACHE_DIR = pathlib.Path(__file__).resolve().parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

REFERENCE_TEST_PICS = pathlib.Path("/root/reference/resources/test_pics")


@pytest.fixture(scope="session")
def test_pics_dir() -> pathlib.Path:
    if not REFERENCE_TEST_PICS.is_dir():
        pytest.skip("reference test_pics not available")
    return REFERENCE_TEST_PICS


@pytest.fixture()
def rng() -> np.random.Generator:
    return np.random.default_rng(1234)
