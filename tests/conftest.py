"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring how JAX
projects test pod-scale code without a pod. Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# The environment may pre-import jax (via sitecustomize) with another platform
# already configured; config.update overrides that after the fact.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")
ASSETS = REFERENCE / "assets"


@pytest.fixture(scope="session")
def assets_dir() -> pathlib.Path:
    if not ASSETS.exists():
        pytest.skip("reference assets not mounted")
    return ASSETS


@pytest.fixture(scope="session")
def cornell_scene(assets_dir):
    from orion_tpu.scene import load_scene

    return load_scene(assets_dir / "cornell-box.rtc")


@pytest.fixture(scope="session")
def view_test_scene(assets_dir):
    from orion_tpu.scene import load_scene

    return load_scene(assets_dir / "view_test.rtc")
