"""Multi-host bring-up.

Reference: none (Hyrise is single-node; SURVEY §2.3 "distributed
communication backend: none"). This is the genuinely new piece: a thin
wrapper over `jax.distributed.initialize` so the same engine code runs on a
multi-host TPU pod slice. On a pod:

    COORDINATOR=host0:8476 NUM_PROCESSES=4 PROCESS_ID=$i python app.py

and every process calls `initialize_from_env()` before touching jax devices;
`make_mesh()` then spans all hosts' chips and the shard_map programs in
parallel/ run with ICI/DCN collectives unchanged (data placement via
`jax.make_array_from_single_device_arrays` per host shard is the ingest
path; hash_partition already produces per-shard blocks).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_from_env() -> bool:
    """Initialize jax.distributed from COORDINATOR/NUM_PROCESSES/PROCESS_ID
    env vars. Returns True if multi-process mode was initialized; False when
    the env vars are absent (single-process: no-op)."""
    coordinator = os.environ.get("COORDINATOR")
    if not coordinator:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(os.environ["NUM_PROCESSES"]),
        process_id=int(os.environ["PROCESS_ID"]),
    )
    return True


def process_info():
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": [str(d) for d in jax.local_devices()],
        "global_devices": [str(d) for d in jax.devices()],
    }
