"""Blocked (streaming) whole-plan execution — plan/blocked.py.

The chunk-axis capability (reference: chunk.hpp:44 Chunk::MAX_SIZE,
aggregate.cpp per-chunk maps merged at the end): the fact table runs
through ONE block-shaped compiled program, partial aggregates merge on the
host. Correctness oracle: the plain eager engine on the same data."""

import numpy as np
import pytest

from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.plan.blocked import BlockedCompiledQuery
from hyrise_tpu.plan.compiler import PlanNotCompilable
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.tpch.dbgen import generate_tables
from hyrise_tpu.tpch.queries import TPCH_PLANS
from hyrise_tpu.utils.table_eq import assert_tables_equal

SF = 0.02
_state = {}


def _cat():
    if "cat" not in _state:
        tables = generate_tables(SF)
        cat = Catalog()
        for name, t in tables.items():
            cat.add_table(name, t)
        _state["cat"] = cat
    return _state["cat"]


@pytest.mark.parametrize("qid", [1, 3, 6, 14])
def test_blocked_matches_eager(qid):
    cat = _cat()
    ref = execute_plan(TPCH_PLANS[qid](cat))
    cap = cat.get_table("lineitem").capacity
    block = max(cap // 4, 1 << 14)  # force multiple blocks
    bq = BlockedCompiledQuery(TPCH_PLANS[qid](cat), cat, block_rows=block)
    assert bq.n_blocks >= 2 or cap <= block
    out = bq.run()
    assert_tables_equal(out.rows(), ref.rows(), ordered=True, rel_tol=1e-6)
    # steady state: a second full pass reuses the compiled block program
    out2 = bq.run()
    assert bq.last_retries == 0
    assert_tables_equal(out2.rows(), ref.rows(), ordered=True, rel_tol=1e-6)


def test_blocked_rejects_self_join():
    cat = _cat()
    # Q18 references lineitem twice (HAVING subquery self-join): not
    # row-distributive over one stream occurrence
    with pytest.raises(PlanNotCompilable):
        BlockedCompiledQuery(TPCH_PLANS[18](cat), cat,
                             stream_table="lineitem", block_rows=1 << 14)


def test_blocked_rejects_no_aggregate():
    cat = _cat()
    with pytest.raises(PlanNotCompilable):
        BlockedCompiledQuery(TPCH_PLANS[2](cat), cat, block_rows=1 << 14)


def test_blocked_avg_over_integer_column():
    """r3 advisor (high): blocked AVG decomposes to SUM/COUNT; over an
    INTEGER column the finisher divided INT64 by INT64 with truncating
    semantics (AVG=1 instead of 1.5). AVG must be FLOAT64 regardless of
    input type, matching aggregate_result_type and the eager path."""
    import pandas as pd
    from hyrise_tpu.expression import ast
    from hyrise_tpu.ops.aggregate import Aggregate
    from hyrise_tpu.ops.get_table import GetTable
    from hyrise_tpu.storage.table import Table

    df = pd.DataFrame({
        "g": np.repeat(np.arange(4, dtype=np.int64), 4),
        "v": np.arange(16, dtype=np.int64),   # group means: 1.5, 5.5, ...
    })
    cat = Catalog()
    cat.add_table("t", Table.from_pandas("t", df))

    def plan(c):
        return Aggregate(GetTable("t", c), ["g"],
                         [("a", ast.avg_(ast.col("v"))),
                          ("q", ast.avg_(ast.col("g")))])

    ref = execute_plan(plan(cat)).to_pandas().sort_values("g")
    bq = BlockedCompiledQuery(plan(cat), cat, block_rows=8)
    got = bq.run().to_pandas().sort_values("g")
    assert bq.n_blocks == 2
    np.testing.assert_allclose(got["a"].to_numpy(dtype=np.float64),
                               ref["a"].to_numpy(dtype=np.float64))
    assert got["a"].tolist() == [1.5, 5.5, 9.5, 13.5]


def test_blocked_run_leaves_plan_intact():
    """r3 advisor (low): _merge_and_finish used to permanently rewire the
    caller's plan (tail_parent.inputs[0] = merged subtree); the original
    root must execute identically after a blocked run."""
    cat = _cat()
    plan = TPCH_PLANS[1](cat)
    agg_child = []
    node = plan
    while node.name in ("Sort", "Projection", "Limit", "Alias"):
        node = node.inputs[0]
    orig_agg = node
    bq = BlockedCompiledQuery(plan, cat, block_rows=1 << 14)
    out = bq.run()
    # the tail chain still hangs off the ORIGINAL Aggregate
    node = plan
    while node.name in ("Sort", "Projection", "Limit", "Alias"):
        parent, node = node, node.inputs[0]
    assert node is orig_agg
    for op in _walk_plan(plan):
        op.clear_output()
    ref = execute_plan(plan)
    assert_tables_equal(out.rows(), ref.rows(), ordered=True, rel_tol=1e-6)


def _walk_plan(root):
    seen, order = set(), []

    def rec(op):
        if id(op) in seen:
            return
        seen.add(id(op))
        for i in op.inputs:
            rec(i)
        order.append(op)

    rec(root)
    return order


def test_blocked_topk_limit_sort_root():
    """Limit(Sort(..)) roots stream without an aggregate: per-block top-K,
    K-bucket shrink, one final re-sort of K*n_blocks rows (the chunked
    analogue of the reference's materialize-sort, sort.cpp:180-210)."""
    import pandas as pd
    from hyrise_tpu.expression import ast
    from hyrise_tpu.ops.get_table import GetTable
    from hyrise_tpu.ops.misc import Limit
    from hyrise_tpu.ops.sort import Sort
    from hyrise_tpu.ops.table_scan import TableScan
    from hyrise_tpu.storage.table import Table
    from hyrise_tpu.types import SortMode

    rng = np.random.default_rng(4)
    n = 5000
    df = pd.DataFrame({
        "a": rng.integers(0, 1000, n).astype(np.int64),
        "v": rng.normal(size=n).astype(np.float64),
    })
    cat = Catalog()
    cat.add_table("t", Table.from_pandas("t", df))

    def plan(c):
        return Limit(Sort(TableScan(GetTable("t", c),
                                    ast.col("a") < ast.lit(500)),
                          [("v", SortMode.DESCENDING), "a"]), 25)

    ref = execute_plan(plan(cat))
    bq = BlockedCompiledQuery(plan(cat), cat, block_rows=2048)
    assert bq._mode == "topk" and bq.n_blocks >= 2
    out = bq.run()
    assert_tables_equal(out.rows(), ref.rows(), ordered=True, rel_tol=1e-9)
    out2 = bq.run()  # steady state reuses the block program
    assert bq.last_retries == 0
    assert_tables_equal(out2.rows(), ref.rows(), ordered=True, rel_tol=1e-9)


def test_blocked_rejects_semi_build_stream():
    """Q4 shape: lineitem on the BUILD side of a semi join. Per-block semi
    against a blocked build side re-emits an order for every block holding
    one of its lineitems — SUM-merged partial counts double-count. Must be
    refused (plan/segmented.py decomposes these instead)."""
    cat = _cat()
    with pytest.raises(PlanNotCompilable, match="not row-distributive"):
        BlockedCompiledQuery(TPCH_PLANS[4](cat), cat, block_rows=1 << 14)


def test_blocked_rejects_left_build_nested_agg():
    """Q13 shape: orders on the build side of a LEFT join under a nested
    aggregate — both edges are non-distributive."""
    cat = _cat()
    with pytest.raises(PlanNotCompilable, match="not row-distributive"):
        BlockedCompiledQuery(TPCH_PLANS[13](cat), cat, block_rows=1 << 14)


def test_blocked_rejects_anti_build_stream():
    """Q22 shape: orders on the build side of an anti join — a customer
    with no orders in SOME block would pass that block's anti join."""
    cat = _cat()
    with pytest.raises(PlanNotCompilable, match="not row-distributive"):
        BlockedCompiledQuery(TPCH_PLANS[22](cat), cat, block_rows=1 << 14)


def test_blocked_rejects_nested_aggregate_on_path():
    """A nested Aggregate between the stream leaf and the split point is
    not row-distributive: per-block inner groups are partial."""
    import pandas as pd
    from hyrise_tpu.expression import ast
    from hyrise_tpu.ops.aggregate import Aggregate
    from hyrise_tpu.ops.get_table import GetTable
    from hyrise_tpu.storage.table import Table

    rng = np.random.default_rng(3)
    n = 4096
    df = pd.DataFrame({
        "g": rng.integers(0, 7, n).astype(np.int64),
        "v": rng.random(n).astype(np.float64),
    })
    cat = Catalog()
    cat.add_table("big", Table.from_pandas("big", df))
    inner = Aggregate(GetTable("big", cat), ["g"],
                      [("s", ast.sum_(ast.col("v")))])
    outer = Aggregate(inner, [], [("m", ast.max_(ast.col("s")))])
    with pytest.raises(PlanNotCompilable, match="not row-distributive"):
        BlockedCompiledQuery(outer, cat, block_rows=1024)


def test_blocked_accepts_semi_probe_stream():
    """Positive control: the stream table on the PRESERVED side of a semi
    join is row-distributive — each stream row passes or not independently
    of blocking. Value-checked against the eager engine."""
    import pandas as pd
    from hyrise_tpu.expression import ast
    from hyrise_tpu.ops.aggregate import Aggregate
    from hyrise_tpu.ops.get_table import GetTable
    from hyrise_tpu.ops.join import Join
    from hyrise_tpu.ops.sort import Sort
    from hyrise_tpu.storage.table import Table
    from hyrise_tpu.types import JoinMode

    rng = np.random.default_rng(11)
    n = 4096
    big = pd.DataFrame({
        "k": rng.integers(0, 200, n).astype(np.int64),
        "g": rng.integers(0, 5, n).astype(np.int64),
        "v": rng.random(n).astype(np.float64),
    })
    dim = pd.DataFrame({"dk": np.arange(0, 200, 3, dtype=np.int64)})
    cat = Catalog()
    cat.add_table("big", Table.from_pandas("big", big))
    cat.add_table("dim", Table.from_pandas("dim", dim))

    def plan(c):
        semi = Join(GetTable("big", c), GetTable("dim", c), JoinMode.SEMI,
                    ("k", "dk"))
        agg = Aggregate(semi, ["g"], [("s", ast.sum_(ast.col("v"))),
                                      ("n", ast.count_())])
        return Sort(agg, ["g"])

    ref = execute_plan(plan(cat))
    bq = BlockedCompiledQuery(plan(cat), cat, block_rows=1024)
    assert bq.n_blocks >= 2
    out = bq.run()
    assert_tables_equal(out.rows(), ref.rows(), ordered=True, rel_tol=1e-9)


def test_blocked_having_tail():
    """A TableScan between the root and the Aggregate (HAVING) runs on the
    merged result."""
    import pandas as pd
    from hyrise_tpu.expression import ast
    from hyrise_tpu.ops.aggregate import Aggregate
    from hyrise_tpu.ops.get_table import GetTable
    from hyrise_tpu.ops.sort import Sort
    from hyrise_tpu.ops.table_scan import TableScan
    from hyrise_tpu.storage.table import Table

    rng = np.random.default_rng(9)
    n = 4000
    df = pd.DataFrame({
        "g": rng.integers(0, 50, n).astype(np.int64),
        "v": rng.random(n).astype(np.float64),
    })
    cat = Catalog()
    cat.add_table("t", Table.from_pandas("t", df))

    def plan(c):
        agg = Aggregate(GetTable("t", c), ["g"],
                        [("s", ast.sum_(ast.col("v")))])
        having = TableScan(agg, ast.col("s") > ast.lit(40.0))
        return Sort(having, ["g"])

    ref = execute_plan(plan(cat))
    assert ref.num_rows > 0
    bq = BlockedCompiledQuery(plan(cat), cat, block_rows=1024)
    assert bq.n_blocks >= 2
    out = bq.run()
    assert_tables_equal(out.rows(), ref.rows(), ordered=True, rel_tol=1e-9)
