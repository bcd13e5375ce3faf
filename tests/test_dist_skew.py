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


def _big_skew_env(n_fact=120_000, n_dim=70_000, hot_frac=0.5, seed=5):
    """Build side too large to broadcast -> the join must SHUFFLE, and the
    hot probe key would land 50% of fact on one shard without mitigation."""
    rng = np.random.default_rng(seed)
    k = rng.integers(0, n_dim, size=n_fact).astype(np.int64)
    k[rng.random(n_fact) < hot_frac] = 7
    fact = Table.from_pandas("fact", pd.DataFrame({
        "k": k, "v": rng.normal(size=n_fact)}))
    dim = Table.from_pandas("dim", pd.DataFrame({
        "k": np.arange(n_dim, dtype=np.int64),
        "w": rng.normal(size=n_dim),
        "salt": rng.integers(0, 1 << 30, size=n_dim).astype(np.int64)}))
    cat = Catalog()
    cat.add_table("fact", fact)
    cat.add_table("dim", dim)
    mesh = make_mesh(8)
    sc = ShardedCatalog(mesh)
    sc.add_sharded("fact", fact, "v")      # NOT the join key -> must shuffle
    sc.add_sharded("dim", dim, "salt")
    return cat, sc


def test_hot_key_split_engages_on_shuffle_join():
    """The compiler detects the heavy hitter, replicates its build rows and
    spreads its probe rows — the shuffle capacity stays near n/shards
    instead of growing to the hot key's full row count."""
    cat, sc = _big_skew_env()

    def plan(c):
        j = Join(GetTable("fact", c), GetTable("dim", c), JoinMode.INNER,
                 ("k", "k"))
        return Aggregate(j, [], [("s", ast.sum_(ast.col("v"))),
                                 ("sw", ast.sum_(ast.col("w"))),
                                 ("n", ast.count_())])

    ref = execute_plan(plan(cat))
    dq = DistributedCompiledQuery(plan(cat), sc)
    got = dq.run()
    assert_tables_equal(got.rows(), ref.rows(), ordered=True, rel_tol=1e-9)
    # the skew machinery actually engaged
    (hot,) = [h for h in dq._hot_keys.values()]
    assert 7 in hot.tolist()
    assert "shuffle" in dq._decisions.values()
    # the spread probe shuffle never needed a hot-key-sized shard capacity:
    # 50% of 120k rows on one shard would force >= 65536; spread stays near
    # 120k/8 per shard
    p_sites = [c for l, c in zip(dq._labels, dq.caps)
               if l == "join.shuffle_p"]
    assert p_sites and max(p_sites) <= 32768, list(zip(dq._labels, dq.caps))
    # steady state: no retraces
    got2 = dq.run()
    assert dq.last_retries == 0
    assert_tables_equal(got2.rows(), ref.rows(), ordered=True, rel_tol=1e-9)


def test_hot_key_split_join_modes():
    """Replicated hot build rows must not duplicate output for semi/anti/
    left modes (each probe row lives on exactly one shard)."""
    cat, sc = _big_skew_env(n_fact=40_000, n_dim=70_000)

    for mode in (JoinMode.INNER, JoinMode.LEFT, JoinMode.SEMI, JoinMode.ANTI):
        def plan(c, mode=mode):
            j = Join(GetTable("fact", c), GetTable("dim", c), mode,
                     ("k", "k"))
            cols = [("s", ast.sum_(ast.col("v"))), ("n", ast.count_())]
            return Aggregate(j, [], cols)

        ref = execute_plan(plan(cat))
        dq = DistributedCompiledQuery(plan(cat), sc)
        got = dq.run()
        assert_tables_equal(got.rows(), ref.rows(), ordered=True,
                            rel_tol=1e-9), mode


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
