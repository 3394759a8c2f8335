"""Test harness: run everything on CPU with 8 virtual devices so sharding
tests exercise real collectives without TPU hardware (SURVEY.md §4)."""
import os

# Must override: the environment pins JAX_PLATFORMS=axon (remote TPU tunnel),
# which is single-client and far too slow for unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize already imported jax and pinned jax_platforms to
# "axon,cpu" before conftest ran, so the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end CLI/train tests")
