"""Test configuration.

Tests run on a simulated 8-device CPU platform so multi-chip sharding paths
are exercised without TPU hardware — the analogue of the reference's
Topology::use_fake_numa_topology (src/lib/scheduler/topology.hpp:81), which
fakes multi-NUMA-node topologies for scheduler tests.

Must set env vars before jax is imported anywhere.
"""

import os

# Force CPU even though the session env sets JAX_PLATFORMS=axon (real TPU
# tunnel) — unit tests must not hold / wait on the single real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# jax is already imported by the axon sitecustomize with JAX_PLATFORMS=axon;
# override at runtime (the backend is not initialized until first use).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

from hyrise_tpu.storage.catalog import reset_default_catalog  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_catalog():
    # Reference: BaseTest resets StorageManager between tests
    # (src/test/base_test.hpp:29-80).
    reset_default_catalog()
    yield
    reset_default_catalog()


REFERENCE_TABLES = "/root/reference/src/test/tables"
