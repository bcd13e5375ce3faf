"""Runtime-feedback placement (parallel/placement.py): the
NUMAPlacementManager analogue that migrates stored shards from OBSERVED
query load (reference numa_placement_manager.hpp:25-75 +
chunk_access_counter.hpp:24-41)."""

import numpy as np
import pandas as pd

from hyrise_tpu.expression import ast
from hyrise_tpu.ops.aggregate import Aggregate
from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.ops.get_table import GetTable
from hyrise_tpu.parallel.dist_compiler import (DistributedCompiledQuery,
                                               ShardedCatalog)
from hyrise_tpu.parallel.mesh import make_mesh
from hyrise_tpu.parallel.placement import AccessCounter, PlacementManager
from hyrise_tpu.parallel.skew import shard_imbalance
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.table import Table
from hyrise_tpu.utils.table_eq import assert_tables_equal


def _skewed_env(n=4000, hot_frac=0.6, seed=3):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, 500, size=n).astype(np.int64)
    k[rng.random(n) < hot_frac] = 7  # one heavy-hitter key
    fact = Table.from_pandas("fact", pd.DataFrame({
        "k": k, "v": rng.normal(size=n)}))
    cat = Catalog()
    cat.add_table("fact", fact)
    mesh = make_mesh(8)
    sc = ShardedCatalog(mesh)
    # partitioned BY the skewed key: 60% of rows land on one shard
    sc.add_sharded("fact", fact, "k")
    return cat, sc


def _plan(c):
    return Aggregate(GetTable("fact", c), ["k"],
                     [("s", ast.sum_(ast.col("v")))])


def test_access_counter_decay_and_imbalance():
    c = AccessCounter(4, history=3)
    assert c.imbalance() == 0.0
    c.record([100, 0, 0, 0])
    assert c.imbalance() > 2.0
    for _ in range(3):  # balanced recent history pushes the spike out
        c.record([25, 25, 25, 25])
    assert c.imbalance() < 0.1


def test_placement_migrates_hot_table_and_stays_correct():
    cat, sc = _skewed_env()
    ref = execute_plan(_plan(cat))

    before = shard_imbalance(sc.get("fact"))
    assert before > 1.0  # the hot key makes one shard dominant

    pm = PlacementManager(cat, sc)
    dq = DistributedCompiledQuery(_plan(cat), sc)
    out = dq.run()
    assert_tables_equal(out.rows(), ref.rows(), ordered=False, rel_tol=1e-9)
    pm.observe(dq)
    assert pm.imbalance("fact") > PlacementManager.__init__.__defaults__[0]

    migrated = pm.run_once()
    assert migrated == ["fact"]
    after = shard_imbalance(sc.get("fact"))
    assert after < before / 2  # hot key now spread round-robin

    # queries against the migrated placement still match single-node
    dq2 = DistributedCompiledQuery(_plan(cat), sc)
    out2 = dq2.run()
    assert_tables_equal(out2.rows(), ref.rows(), ordered=False, rel_tol=1e-9)

    # a second cycle with balanced load migrates nothing
    pm.observe(dq2)
    assert pm.run_once() == []
