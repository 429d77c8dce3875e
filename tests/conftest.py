"""Test configuration: run everything on the CPU backend with 8 virtual devices
so multi-chip sharding logic is exercised without TPU hardware (the driver
separately dry-runs the multi-chip path; bench.py runs on the real chip)."""

import os

# Force CPU: the ambient environment sets JAX_PLATFORMS=axon (remote TPU via
# tunnel, remote compile) which makes every test op a network round-trip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize (axon) pre-imports jax in every interpreter, so the env var
# alone can be captured too late; force the platform through the config API
# and fail loudly if a TPU backend sneaks in (its f32 matmuls are 3-pass bf16,
# which breaks exact-parity tests).
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# persist compiled executables across test runs within this boot (/tmp): a
# home-dir cache can carry AOT results from a different machine type (SIGILL)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    return jax.devices()
