"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run without TPU hardware by splitting the host CPU into 8
XLA devices — the test rig the reference never had (SURVEY.md §4: "no fake backends and
no multi-node test rig").

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU backend, and
# remote-compiling every unit test is both slow and hardware-flaky.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins the TPU backend regardless of JAX_PLATFORMS; the
# config override below wins as long as no backend has initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


@pytest.fixture(scope="session")
def eight_devices():
    assert len(jax.devices()) == 8, "conftest failed to fork CPU into 8 devices"
    return jax.devices()
