"""Hash-partitioned (sharded) tables.

The multi-host successor of the reference's per-NUMA-node chunk placement
(reference: src/lib/storage/numa_placement_manager.hpp:25-75 and the
NodeQueueScheduler's per-node queues). A ShardedTable holds every column as a
[n_shards, shard_capacity] device array sharded over the mesh axis, plus a
per-shard live-row count vector. Rows are placed by hash(key) % n_shards at
ingest — queries that join/group on the partition key run with zero exchange;
others repartition via all_to_all (exchange.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, bucket_capacity


@dataclasses.dataclass
class ShardedColumn:
    """Per-shard slice of a Column.

    MUST mirror every host-metadata field of storage.column.Column (enforced
    by tests/test_dist_compiler.py::test_sharded_column_metadata_parity):
    partitioning only re-routes rows, so table-global metadata (dictionary,
    unique, val_range) stays valid per shard — a shard's value set is a
    subset of the table's. `encoded` stays None: sharded columns are always
    dense device arrays.
    """
    name: str
    dtype: DataType
    data: jax.Array                    # [n_shards, shard_cap]
    validity: Optional[jax.Array]      # [n_shards, shard_cap] or None
    dictionary: Optional[np.ndarray]
    encoded: Optional[object] = None
    unique: bool = False
    val_range: Optional[tuple] = None  # host-known (min, max) over live rows


class ShardedTable:
    # plan.compiler._col_bounds keys off this: sharded sources contribute
    # INGEST metadata only — a device min/max over a [n_shards, cap] array
    # outside shard_map wedges the mesh collective rendezvous (VERDICT r3).
    is_sharded = True
    def __init__(self, columns: List[ShardedColumn], counts: jax.Array,
                 num_rows: int, mesh: Mesh, name: str = "",
                 partition_key: Optional[str] = None):
        self.columns = columns
        self.counts = counts            # [n_shards] int32, replicated
        self.num_rows = num_rows
        self.mesh = mesh
        self.name = name
        self.partition_key = partition_key
        self._by_name = {}
        for i, c in enumerate(columns):
            self._by_name.setdefault(c.name, i)

    @property
    def n_shards(self) -> int:
        return self.columns[0].data.shape[0]

    @property
    def shard_capacity(self) -> int:
        return self.columns[0].data.shape[1]

    def column(self, name: str) -> ShardedColumn:
        return self.columns[self._by_name[name]]

    def env(self) -> Dict[str, tuple]:
        return {c.name: (c.data, c.validity) for c in self.columns}


def hash_partition(table: Table, key_col: str, mesh: Mesh,
                   n_shards: Optional[int] = None) -> ShardedTable:
    """Partition a host/global Table by hash of an integer key column."""
    from hyrise_tpu import native

    n = n_shards if n_shards is not None else mesh.devices.size
    rows = table.num_rows
    key = np.asarray(table.column(key_col).data[:rows]).astype(np.int64)
    # Fibonacci hashing then mod — spreads consecutive keys (the reference
    # uses murmur2 for the same purpose, utils/murmur_hash.hpp:12-18).
    # Routed by the native C++ kernel when available (native/).
    target = native.hash_partition(key, n)
    return partition_by_targets(table, target, mesh, n, key_col)


def partition_by_targets(table: Table, target: np.ndarray, mesh: Mesh,
                         n_shards: Optional[int] = None,
                         partition_key: Optional[str] = None) -> ShardedTable:
    """Partition by an explicit per-row shard target (the custom-router form:
    hot-key splitting, runtime migration — parallel/placement.py)."""
    from hyrise_tpu import native

    n = n_shards if n_shards is not None else mesh.devices.size
    rows = table.num_rows
    counts, order = native.radix_route(np.asarray(target, dtype=np.int32), n)
    shard_cap = bucket_capacity(int(counts.max()) if rows else 1)
    offsets = np.concatenate([[0], np.cumsum(counts)])

    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    cols: List[ShardedColumn] = []
    for c in table.columns:
        data_host = np.asarray(c.data[:rows])
        buf = np.zeros((n, shard_cap), dtype=data_host.dtype)
        vbuf = None
        if c.validity is not None:
            v_host = np.asarray(c.validity[:rows])
            vbuf = np.zeros((n, shard_cap), dtype=bool)
        for s in range(n):
            idx = order[offsets[s]:offsets[s + 1]]
            buf[s, :len(idx)] = data_host[idx]
            if vbuf is not None:
                vbuf[s, :len(idx)] = v_host[idx]
        data = jax.device_put(buf, sharding)
        validity = jax.device_put(vbuf, sharding) if vbuf is not None else None
        cols.append(ShardedColumn(c.name, c.dtype, data, validity,
                                  c.dictionary, encoded=None,
                                  unique=c.unique, val_range=c.val_range))
    counts_dev = jax.device_put(counts.astype(np.int32),
                                NamedSharding(mesh, P()))
    return ShardedTable(cols, counts_dev, rows, mesh, name=table.name,
                        partition_key=partition_key)
