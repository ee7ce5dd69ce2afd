"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4), and
enable x64 so bit-faithfulness tests can match the reference's float64
accumulation paths."""

import os
import pathlib

# Must be set before jax initializes. Force-override: the environment may
# pin JAX_PLATFORMS to a TPU plugin (e.g. axon), but tests run on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def goldens():
    def load(name: str):
        return np.load(GOLDEN_DIR / f"{name}.npz")

    return load


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
