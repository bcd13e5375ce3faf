"""Limit / UnionAll / UnionPositions / Difference / Alias tests."""

import numpy as np
import pandas as pd

from hyrise_tpu.ops import TableWrapper, execute_plan
from hyrise_tpu.ops.misc import Alias, Difference, Limit, UnionAll, UnionPositions
from hyrise_tpu.storage.table import Table
from hyrise_tpu.utils.table_eq import assert_tables_equal


def t_of(df, name="t"):
    return Table.from_pandas(name, df)


def test_limit():
    df = pd.DataFrame({"a": np.arange(10, dtype=np.int32)})
    out = execute_plan(Limit(TableWrapper(t_of(df)), 3))
    assert out.num_rows == 3
    out = execute_plan(Limit(TableWrapper(t_of(df)), 99))
    assert out.num_rows == 10


def test_alias():
    df = pd.DataFrame({"a": np.arange(3, dtype=np.int32),
                       "b": np.arange(3, dtype=np.int32)})
    out = execute_plan(Alias(TableWrapper(t_of(df)), ["x", "y"]))
    assert out.column_names == ["x", "y"]
    out = execute_plan(Alias(TableWrapper(t_of(df)), ["y"], ["b"]))
    assert out.column_names == ["y"]


def test_union_all():
    d1 = pd.DataFrame({"a": np.array([1, 2], dtype=np.int32),
                       "s": np.array(["x", "y"], dtype=object)})
    d2 = pd.DataFrame({"a": np.array([3], dtype=np.int32),
                       "s": np.array(["z"], dtype=object)})
    out = execute_plan(UnionAll(TableWrapper(t_of(d1)), TableWrapper(t_of(d2))))
    assert_tables_equal(out.rows(), [(1, "x"), (2, "y"), (3, "z")],
                        ordered=False)


def test_union_positions_dedups():
    d1 = pd.DataFrame({"a": np.array([1, 2, 2], dtype=np.int32)})
    d2 = pd.DataFrame({"a": np.array([2, 3], dtype=np.int32)})
    out = execute_plan(UnionPositions(TableWrapper(t_of(d1)),
                                      TableWrapper(t_of(d2))))
    assert sorted(r[0] for r in out.rows()) == [1, 2, 3]


def test_difference():
    d1 = pd.DataFrame({"a": np.array([1, 2, 3, 4], dtype=np.int32),
                       "s": np.array(["a", "b", "c", "d"], dtype=object)})
    d2 = pd.DataFrame({"a": np.array([2, 4], dtype=np.int32),
                       "s": np.array(["b", "d"], dtype=object)})
    out = execute_plan(Difference(TableWrapper(t_of(d1)), TableWrapper(t_of(d2))))
    assert_tables_equal(out.rows(), [(1, "a"), (3, "c")], ordered=False)


def test_difference_respects_all_columns():
    d1 = pd.DataFrame({"a": np.array([1, 1], dtype=np.int32),
                       "b": np.array([10, 20], dtype=np.int32)})
    d2 = pd.DataFrame({"a": np.array([1], dtype=np.int32),
                       "b": np.array([10], dtype=np.int32)})
    out = execute_plan(Difference(TableWrapper(t_of(d1)), TableWrapper(t_of(d2))))
    assert out.rows() == [(1, 20)]
