"""Sort + Aggregate operator tests (pandas as oracle), mirroring the
reference's sort_test.cpp / aggregate_test.cpp coverage."""

import os

import numpy as np
import pandas as pd

from hyrise_tpu.expression.ast import avg_, col, count_, count_distinct, lit, max_, min_, sum_
from hyrise_tpu.ops import TableWrapper, execute_plan
from hyrise_tpu.ops.aggregate import Aggregate
from hyrise_tpu.ops.sort import Sort
from hyrise_tpu.storage.load_table import load_table
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import SortMode
from hyrise_tpu.utils.table_eq import assert_tables_equal

from conftest import REFERENCE_TABLES


def _load(name):
    return load_table(os.path.join(REFERENCE_TABLES, name), name)


def test_sort_single_asc():
    t = _load("int_float.tbl")
    out = execute_plan(Sort(TableWrapper(t), ["a"]))
    df = t.to_pandas().sort_values("a", kind="stable")
    assert_tables_equal(out.rows(), list(df.itertuples(index=False)))


def test_sort_desc():
    t = _load("int_float.tbl")
    out = execute_plan(Sort(TableWrapper(t), [("a", SortMode.DESCENDING)]))
    df = t.to_pandas().sort_values("a", ascending=False, kind="stable")
    assert_tables_equal(out.rows(), list(df.itertuples(index=False)))


def test_sort_string():
    t = _load("int_string.tbl")
    out = execute_plan(Sort(TableWrapper(t), ["b"]))
    df = t.to_pandas().sort_values("b", kind="stable")
    assert_tables_equal(out.rows(), list(df.itertuples(index=False)))


def test_sort_nulls_first_and_last():
    t = _load("int_float_with_null.tbl")
    out = execute_plan(Sort(TableWrapper(t), [("a", SortMode.ASCENDING)]))
    rows = out.rows()
    assert rows[0][0] is None  # nulls first (Hyrise default)
    out2 = execute_plan(Sort(TableWrapper(t),
                             [("a", SortMode.ASCENDING_NULLS_LAST)]))
    rows2 = out2.rows()
    assert rows2[-1][0] is None


def test_sort_multi_column():
    df = pd.DataFrame({
        "a": np.array([2, 1, 2, 1, 2], dtype=np.int32),
        "b": np.array([5.0, 4.0, 3.0, 2.0, 1.0], dtype=np.float32),
    })
    t = Table.from_pandas("t", df)
    out = execute_plan(Sort(TableWrapper(t),
                            [("a", SortMode.ASCENDING),
                             ("b", SortMode.DESCENDING)]))
    exp = df.sort_values(["a", "b"], ascending=[True, False], kind="stable")
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)))


def test_aggregate_global_sum_count():
    t = _load("int_float.tbl")
    out = execute_plan(Aggregate(TableWrapper(t), [],
                                 [("s", sum_(col("a"))),
                                  ("c", count_()),
                                  ("m", min_(col("b"))),
                                  ("M", max_(col("b"))),
                                  ("av", avg_(col("a")))]))
    df = t.to_pandas()
    assert out.num_rows == 1
    r = out.rows()[0]
    assert r[0] == df["a"].sum()
    assert r[1] == len(df)
    assert abs(r[2] - df["b"].min()) < 1e-3
    assert abs(r[3] - df["b"].max()) < 1e-3
    assert abs(r[4] - df["a"].mean()) < 1e-6


def test_aggregate_groupby():
    df = pd.DataFrame({
        "g": np.array(["x", "y", "x", "z", "y", "x"], dtype=object),
        "v": np.array([1, 2, 3, 4, 5, 6], dtype=np.int32),
    })
    t = Table.from_pandas("t", df)
    out = execute_plan(Aggregate(TableWrapper(t), ["g"],
                                 [("s", sum_(col("v"))),
                                  ("c", count_(col("v"))),
                                  ("av", avg_(col("v")))]))
    exp = df.groupby("g", as_index=False).agg(
        s=("v", "sum"), c=("v", "count"), av=("v", "mean"))
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_aggregate_multi_groupby():
    df = pd.DataFrame({
        "g1": np.array(["a", "a", "b", "b", "a"], dtype=object),
        "g2": np.array([1, 2, 1, 1, 1], dtype=np.int32),
        "v": np.array([10.0, 20.0, 30.0, 40.0, 50.0], dtype=np.float32),
    })
    t = Table.from_pandas("t", df)
    out = execute_plan(Aggregate(TableWrapper(t), ["g1", "g2"],
                                 [("s", sum_(col("v")))]))
    exp = df.groupby(["g1", "g2"], as_index=False).agg(s=("v", "sum"))
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_aggregate_null_group_and_null_skip():
    from hyrise_tpu.storage.table import TableColumnDefinition
    from hyrise_tpu.types import DataType
    t = Table.from_arrays(
        "t",
        [TableColumnDefinition("g", DataType.INT32, True),
         TableColumnDefinition("v", DataType.INT32, True)],
        [np.array([1, 0, 1, 0, 2], dtype=np.int32),
         np.array([1, 2, 0, 4, 5], dtype=np.int32)],
        [np.array([True, False, True, False, True]),
         np.array([True, True, False, True, True])],
    )
    out = execute_plan(Aggregate(TableWrapper(t), ["g"],
                                 [("s", sum_(col("v"))),
                                  ("c", count_(col("v")))]))
    # groups: g=1 -> rows (v=1, v=NULL) => s=1, c=1
    #         g=2 -> v=5 => s=5 c=1 ; g=NULL -> v=2,4 => s=6 c=2
    rows = {r[0]: (r[1], r[2]) for r in out.rows()}
    assert rows[1] == (1, 1)
    assert rows[2] == (5, 1)
    assert rows[None] == (6, 2)


def test_aggregate_sum_empty_group_is_null_count_zero():
    from hyrise_tpu.storage.table import TableColumnDefinition
    from hyrise_tpu.types import DataType
    t = Table.from_arrays("t", [TableColumnDefinition("v", DataType.INT32)],
                          [np.array([], dtype=np.int32)])
    out = execute_plan(Aggregate(TableWrapper(t), [],
                                 [("s", sum_(col("v"))), ("c", count_())]))
    assert out.num_rows == 1
    assert out.rows()[0] == (None, 0)


def test_count_distinct():
    df = pd.DataFrame({
        "g": np.array(["a", "a", "a", "b", "b"], dtype=object),
        "v": np.array([1, 1, 2, 3, 3], dtype=np.int32),
    })
    t = Table.from_pandas("t", df)
    out = execute_plan(Aggregate(TableWrapper(t), ["g"],
                                 [("cd", count_distinct(col("v")))]))
    exp = df.groupby("g", as_index=False).agg(cd=("v", "nunique"))
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_distinct_via_groupby_no_aggregates():
    df = pd.DataFrame({"v": np.array([3, 1, 3, 2, 1], dtype=np.int32)})
    t = Table.from_pandas("t", df)
    out = execute_plan(Aggregate(TableWrapper(t), ["v"], []))
    assert sorted(r[0] for r in out.rows()) == [1, 2, 3]


def test_aggregate_expression_argument():
    # TPC-H Q1 style: SUM(price * (1 - discount))
    df = pd.DataFrame({
        "p": np.array([10.0, 20.0], dtype=np.float32),
        "d": np.array([0.1, 0.5], dtype=np.float32),
    })
    t = Table.from_pandas("t", df)
    out = execute_plan(Aggregate(TableWrapper(t), [],
                                 [("s", sum_(col("p") * (lit(1.0) - col("d"))))]))
    assert abs(out.rows()[0][0] - (10 * 0.9 + 20 * 0.5)) < 1e-4


def test_min_max_string():
    t = _load("int_string.tbl")
    out = execute_plan(Aggregate(TableWrapper(t), [],
                                 [("mn", min_(col("b"))), ("mx", max_(col("b")))]))
    df = t.to_pandas()
    assert out.rows()[0] == (df["b"].min(), df["b"].max())
