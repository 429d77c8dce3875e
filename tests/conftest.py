"""Test configuration: run everything on the CPU backend with 8 virtual devices
so multi-chip sharding logic is exercised without TPU hardware (the driver
separately dry-runs the multi-chip path; bench.py runs on the real chip)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    return jax.devices()
