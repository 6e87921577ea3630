"""Test config: run everything on CPU with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware. Must run before the
first jax import anywhere in the test session."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; override at the config level so tests run on the virtual
# 8-device CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute full-backbone compiles; deselect for iteration "
        "with -m 'not slow' (CI of record runs everything)",
    )
    config.addinivalue_line(
        "markers",
        "heavy: torch-oracle converter parity suites (~minutes each on CPU); "
        "second deselection tier for fast iteration with "
        "-m 'not slow and not heavy' (CI of record runs everything)",
    )
