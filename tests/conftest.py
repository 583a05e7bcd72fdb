"""Test configuration: force a virtual 8-device CPU mesh BEFORE importing jax.

Multi-chip sharding tests run on the host platform with
``--xla_force_host_platform_device_count=8`` (the reference has no test suite
at all — SURVEY.md §4 — so this suite is the framework's own strategy:
every workload is a deterministic scenario asserted allclose against the CPU
oracle in ``raytracing_tests_tpu/reference/``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the harness exports axon; tests are CPU-only
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize may have imported jax before us, freezing jax_platforms=axon;
# override through the config API as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
