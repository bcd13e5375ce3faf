"""Skew handling on the distributed path (BASELINE config 4's 'skewed keys'
axis; the reference analogue is NUMAPlacementManager's imbalance-driven
migration, numa_placement_manager.hpp:25-75).

Two mechanisms under test:
1. the capacity oracle's max-across-shards overflow retry absorbs a join
   key where one value owns most rows (the shuffle concentrates them on one
   shard; that shard's capacity grows, results stay exact);
2. skew detection (parallel/skew.py) quantifies shard imbalance and hot
   keys so ingest/planning can react.
"""

import numpy as np
import pandas as pd

from hyrise_tpu.ops.aggregate import Aggregate
from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.ops.get_table import GetTable
from hyrise_tpu.ops.join import Join
from hyrise_tpu.ops.sort import Sort
from hyrise_tpu.expression import ast
from hyrise_tpu.parallel.dist_compiler import (DistributedCompiledQuery,
                                               ShardedCatalog)
from hyrise_tpu.parallel.mesh import make_mesh
from hyrise_tpu.parallel.partition import hash_partition
from hyrise_tpu.parallel.skew import (detect_hot_keys, shard_imbalance,
                                      split_hot_keys)
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import JoinMode
from hyrise_tpu.utils.table_eq import assert_tables_equal


def _skewed_env(n=4000, hot_frac=0.6, seed=2):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, 500, size=n).astype(np.int64)
    k[rng.random(n) < hot_frac] = 7  # one heavy-hitter key
    fact = Table.from_pandas("fact", pd.DataFrame({
        "k": k, "v": rng.normal(size=n)}))
    dim = Table.from_pandas("dim", pd.DataFrame({
        "k": np.arange(500, dtype=np.int64),
        "w": rng.normal(size=500),
        "salt": rng.integers(0, 1 << 30, size=500).astype(np.int64)}))
    cat = Catalog()
    cat.add_table("fact", fact)
    cat.add_table("dim", dim)
    mesh = make_mesh(8)
    sc = ShardedCatalog(mesh)
    # both sharded by NON-join columns -> the join must shuffle by k, and
    # the hot key concentrates 60% of fact on ONE shard
    sc.add_sharded("fact", fact, "v")
    sc.add_sharded("dim", dim, "salt")
    return cat, sc, fact


def test_skewed_shuffle_join_is_exact():
    cat, sc, fact = _skewed_env()

    def plan(c):
        j = Join(GetTable("fact", c), GetTable("dim", c), JoinMode.INNER,
                 ("k", "k"))
        return Sort(Aggregate(j, ["k"], [("s", ast.sum_(ast.col("v"))),
                                         ("n", ast.count_())]), ["k"])

    ref = execute_plan(plan(cat))
    dq = DistributedCompiledQuery(plan(cat), sc)
    got = dq.run()
    assert_tables_equal(got.rows(), ref.rows(), ordered=True, rel_tol=1e-9)
    # steady state after the skew-driven capacity growth
    got2 = dq.run()
    assert dq.last_retries == 0
    assert_tables_equal(got2.rows(), ref.rows(), ordered=True, rel_tol=1e-9)


def test_skew_detection_quantifies_hot_keys():
    cat, sc, fact = _skewed_env()
    hot = detect_hot_keys(fact, "k", 8)
    assert 7 in hot.tolist()
    # partitioning BY the skewed key shows the imbalance detect/mitigate loop
    mesh = make_mesh(8)
    st = hash_partition(fact, "k", mesh)
    assert shard_imbalance(st) > 1.0  # one shard owns >2x the mean
    targets = split_hot_keys(fact, "k", hot, 8)
    counts = np.bincount(targets, minlength=8).astype(np.float64)
    assert counts.max() / counts.mean() - 1.0 < 0.5  # salted spread is even
