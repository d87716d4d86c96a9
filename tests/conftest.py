"""Test configuration: force a virtual 8-device CPU mesh before jax imports.

Mirrors the reference's hermetic-CPU unit-test strategy
(reference tests run on CPU; distributed tests simulate multi-process on one
host — here multi-chip is simulated with xla_force_host_platform_device_count).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize pins jax_platforms to "axon,cpu" (the remote TPU
# tunnel), which silently overrides JAX_PLATFORMS env — force CPU here, before
# any backend initializes, so tests are hermetic and fast.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _registries():
    from diffnorm_tpu.registry import _import_all

    _import_all()
