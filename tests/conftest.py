"""Test harness configuration.

Runs the whole suite on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware (the reference's analog: replaying OIDN tests
across ISAs via Intel SDE, scripts/test.py --arch).
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (remote TPU tunnel) via
# sitecustomize; tests must run on the local virtual-CPU mesh, so override
# both the env var and the already-initialized jax config.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_scenes():
    scenes = REFERENCE / "scenes"
    if not scenes.is_dir():
        pytest.skip("reference scenes not available")
    return scenes


@pytest.fixture(scope="session")
def cornell_scene(reference_scenes):
    from mygpuraytracer_tpu.scene import load_scene

    return load_scene(str(reference_scenes / "cornell.txt"))
