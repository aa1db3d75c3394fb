"""Test configuration: force CPU with 8 virtual devices so sharding/pjit
paths are exercised without TPU hardware, and enable x64 for oracle accuracy.

Must run before jax is imported anywhere in the test process.
"""

import os

if os.environ.get("GTO_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("GTO_TEST_TPU", "0") != "1":
    # the container's sitecustomize registers a TPU plugin and forces the
    # platform via jax.config (which overrides the env var) — counter it at
    # the config level so tests stay on CPU even under a raw pytest launch
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE_DATA = os.environ.get("GTO_DATA_DIR", "/root/reference/data")


@pytest.fixture(scope="session")
def data_dir():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("robot asset directory not available")
    return REFERENCE_DATA
