"""Test configuration: run everything on CPU with 8 virtual devices so mesh
sharding is exercised without TPU hardware (the JAX-idiomatic fake-backend
pattern). Must run before jax is imported anywhere."""

import os

# Force CPU even when a TPU plugin's sitecustomize has already registered a
# backend and set jax_platforms at interpreter startup: hard-assign the env
# var, request 8 virtual CPU devices, and override via jax.config (which wins
# over whatever the plugin's register() configured). Must run before any
# backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on virtual CPU devices"

import pathlib

import numpy as np
import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")
WHEEL_DATASET = REFERENCE_ROOT / "datasets" / "nerf-raw" / "wheel_real_robot"


@pytest.fixture(scope="session")
def wheel_dataset():
    if not WHEEL_DATASET.exists():
        pytest.skip("reference wheel dataset not mounted")
    return WHEEL_DATASET


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
