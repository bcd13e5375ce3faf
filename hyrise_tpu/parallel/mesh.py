"""Device mesh setup.

The successor of the reference's Topology singleton
(reference: src/lib/scheduler/topology.hpp:43-110 — NUMA nodes × CPUs, with
fake-topology support for tests). Here: a 1-D `jax.sharding.Mesh` over all
devices; the "fake topology" equivalent is
XLA_FLAGS=--xla_force_host_platform_device_count=N on CPU (tests/conftest.py).

Multi-host: call jax.distributed.initialize() before make_mesh() and the
mesh spans all processes' devices (the ICI/DCN data plane replaces the
reference's shared-memory NUMA axis).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shards"


def make_mesh(n_devices: Optional[int] = None, axis: str = SHARD_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, \
            f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_spec(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the mesh axis (leading array dim)."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
