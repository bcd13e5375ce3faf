"""Skew detection and mitigation for hash-partitioned tables.

Successor of the reference's NUMAPlacementManager
(src/lib/storage/numa_placement_manager.hpp:25-75 + migration tasks): the
reference polls ChunkAccessCounters, computes node imbalance, and migrates
hot chunks between NUMA nodes (imbalance_threshold=0.1, migration_count=3).

Here the imbalance axis is hash-shard row counts (and, during joins, the
per-partition match histograms). Mitigations:
- `rebalance`: re-partition with a different hash salt when shard row
  counts exceed the imbalance threshold.
- `split_hot_keys`: salted replication of heavy-hitter keys (SURVEY §7
  "skewed all-to-all"): a hot build-side key k is replicated to all shards;
  probe rows carrying k are routed by hash(k, salt=row) instead — turning
  one overloaded partition into an even spread. Returns the hot-key list
  for the probe-side router.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from hyrise_tpu.parallel.partition import ShardedTable, hash_partition
from hyrise_tpu.storage.table import Table

IMBALANCE_THRESHOLD = 0.1  # reference default (numa_placement_manager.hpp)


def shard_imbalance(st: ShardedTable) -> float:
    """max/mean - 1 over shard row counts (0 = perfectly even)."""
    counts = np.asarray(st.counts, dtype=np.float64)
    if counts.sum() == 0:
        return 0.0
    return float(counts.max() / max(counts.mean(), 1.0) - 1.0)


def detect_hot_keys(table: Table, key_col: str, n_shards: int,
                    factor: float = 4.0) -> np.ndarray:
    """Keys whose row count exceeds factor * (rows / n_shards) — they
    overload any single shard regardless of hash quality."""
    n = table.num_rows
    keys = np.asarray(table.column(key_col).data[:n])
    return _hot_from_keys(keys, n_shards, factor)


def _hot_from_keys(keys: np.ndarray, n_shards: int, factor: float,
                   max_keys: int = 64) -> np.ndarray:
    n = keys.size
    uniq, counts = np.unique(keys, return_counts=True)
    threshold = max(factor * n / max(n_shards, 1) / 16, 8)
    hot = counts > threshold
    if hot.sum() > max_keys:  # cap the static hot list: keep the heaviest
        order = np.argsort(-counts)
        keep = order[:max_keys]
        mask = np.zeros(len(uniq), dtype=bool)
        mask[keep] = True
        hot &= mask
    return uniq[hot]


def detect_hot_keys_sharded(st: ShardedTable, key_col: str,
                            factor: float = 4.0) -> np.ndarray:
    """Hot keys of a hash-partitioned table (host-side scan over all shards).
    Used by the distributed plan compiler to pick skew-aware shuffle routing
    for joins (parallel/dist_compiler.py)."""
    counts = np.asarray(st.counts)
    data = np.asarray(st.column(key_col).data)
    keys = np.concatenate([data[s, :counts[s]] for s in range(len(counts))]) \
        if len(counts) else np.empty(0, dtype=np.int64)
    return _hot_from_keys(keys, st.n_shards, factor)


def needs_rebalance(st: ShardedTable,
                    threshold: float = IMBALANCE_THRESHOLD) -> bool:
    return shard_imbalance(st) > threshold


def split_hot_keys(table: Table, key_col: str, hot_keys: np.ndarray,
                   n_shards: int) -> np.ndarray:
    """Salted routing targets: normal rows by hash(key); hot-key rows spread
    round-robin. Returns a per-row target array usable by a custom
    partitioner (the build side must replicate hot keys to all shards)."""
    from hyrise_tpu.native import hash_partition as hp

    n = table.num_rows
    keys = np.asarray(table.column(key_col).data[:n]).astype(np.int64)
    targets = hp(keys, n_shards)
    if len(hot_keys):
        hot = np.isin(keys, hot_keys)
        targets[hot] = np.arange(int(hot.sum())) % n_shards
    return targets
