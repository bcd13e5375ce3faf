"""Runtime-feedback placement: observe per-shard load, migrate hot tables.

Reference: NUMAPlacementManager
(src/lib/storage/numa_placement_manager.hpp:25-75) runs a periodic
collect-measure-migrate loop over ChunkAccessCounters
(src/lib/storage/chunk_access_counter.hpp:24-41, decaying history ring):
chunks whose observed access rate makes a node hot are migrated to cold
nodes, at most `migration_count` per cycle, when imbalance exceeds
`imbalance_threshold`.

TPU analogue: the "nodes" are mesh shards and the access counters are the
per-shard intermediate-row counts every DistributedCompiledQuery already
reports through its capacity-oracle control output ([n_shards, sites] —
dist_compiler._counts_host). The PlacementManager accumulates a decaying
per-table history of that load signal; when a sharded table's observed
shard imbalance exceeds the threshold it re-partitions the stored shards —
hot keys split round-robin across shards (skew.split_hot_keys), everything
else re-hashed — and swaps the new ShardedTable into the catalog so every
LATER query compiles against the balanced placement. This is the runtime
half of the skew machinery: parallel/skew.py decides per-join at trace
time from base-table histograms; this migrates the stored shards from
observed load.
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional

import numpy as np

from hyrise_tpu.parallel.partition import (ShardedTable, hash_partition,
                                           partition_by_targets)
from hyrise_tpu.parallel.skew import detect_hot_keys, split_hot_keys

# reference defaults, numa_placement_manager.hpp:30-36
IMBALANCE_THRESHOLD = 0.1
MIGRATION_COUNT = 3
COUNTER_HISTORY_RANGE = 7


class AccessCounter:
    """Decaying per-shard load history (ChunkAccessCounter ring analogue)."""

    def __init__(self, n_shards: int, history: int = COUNTER_HISTORY_RANGE):
        self.ring: deque = deque(maxlen=history)
        self.n_shards = n_shards

    def record(self, per_shard_rows: np.ndarray) -> None:
        self.ring.append(np.asarray(per_shard_rows, dtype=np.float64))

    def load(self) -> np.ndarray:
        """Recency-weighted per-shard load (newest observation heaviest)."""
        if not self.ring:
            return np.zeros(self.n_shards)
        w = 2.0 ** np.arange(len(self.ring))
        return sum(wi * obs for wi, obs in zip(w, self.ring))

    def imbalance(self) -> float:
        load = self.load()
        total = load.sum()
        if total <= 0:
            return 0.0
        return float(load.max() / max(load.mean(), 1e-9) - 1.0)


class PlacementManager:
    """collect_measure_and_migrate over a ShardedCatalog.

    Usage:
        pm = PlacementManager(catalog, shard_cat)
        dq = DistributedCompiledQuery(plan, shard_cat); out = dq.run()
        pm.observe(dq)              # pull the load signal
        migrated = pm.run_once()    # migrate up to migration_count tables
    """

    def __init__(self, catalog, shard_cat,
                 imbalance_threshold: float = IMBALANCE_THRESHOLD,
                 migration_count: int = MIGRATION_COUNT,
                 history: int = COUNTER_HISTORY_RANGE):
        self.catalog = catalog          # unsharded source tables
        self.shard_cat = shard_cat
        self.threshold = imbalance_threshold
        self.migration_count = migration_count
        self.history = history
        self.counters: Dict[str, AccessCounter] = {}
        self.migrations: List[str] = []  # log of migrated table names

    def observe(self, dq) -> None:
        """Record a finished query's per-shard access volume against every
        sharded table it read. The ChunkAccessCounter increment is the rows
        each shard holds of that table — a query that reads a table charges
        every shard its stored row count (access frequency x shard size is
        exactly what the reference's counters accumulate; per-query
        intermediate skew is the exchange routers' job, parallel/skew.py)."""
        for name in dq.sharded_source_names():
            st = self.shard_cat.get(name)
            if not isinstance(st, ShardedTable):
                continue
            c = self.counters.setdefault(
                name, AccessCounter(st.n_shards, self.history))
            c.record(np.asarray(st.counts, dtype=np.float64))

    def imbalance(self, name: str) -> float:
        c = self.counters.get(name)
        return c.imbalance() if c is not None else 0.0

    def run_once(self) -> List[str]:
        """One migration cycle: re-partition the most imbalanced sharded
        tables (observed load > threshold), at most migration_count."""
        cands = sorted(((self.imbalance(n), n) for n in self.counters),
                       reverse=True)
        migrated = []
        for imb, name in cands[:self.migration_count]:
            if imb <= self.threshold:
                break
            st = self.shard_cat.get(name)
            if not isinstance(st, ShardedTable) or st.partition_key is None:
                continue
            source = self.catalog.get_table(name)
            n = st.n_shards
            hot = detect_hot_keys(source, st.partition_key, n)
            if len(hot):
                targets = split_hot_keys(source, st.partition_key, hot, n)
                new_st = partition_by_targets(source, targets, st.mesh, n,
                                              partition_key=None)
                # hot keys are spread across shards: the table is no longer
                # co-partitionable by this key (partition_key=None makes
                # the distributed compiler shuffle instead of assuming
                # locality)
            else:
                new_st = hash_partition(source, st.partition_key, st.mesh, n)
            self.shard_cat.entries[name] = new_st
            self.counters.pop(name, None)  # fresh history post-migration
            self.migrations.append(name)
            migrated.append(name)
        return migrated
