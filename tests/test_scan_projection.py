"""TableScan + Projection + expression evaluator tests.

Mirrors the reference's table_scan_test.cpp / expression_evaluator tests:
load reference .tbl fixtures, scan/project, compare against a pandas oracle
with EXPECT_TABLE_EQ semantics.
"""

import os

import numpy as np
import pytest

from hyrise_tpu.expression.ast import col, lit, Case
from hyrise_tpu.expression.evaluator import evaluate
from hyrise_tpu.ops import GetTable, Projection, TableScan, TableWrapper, execute_plan
from hyrise_tpu.storage.load_table import load_table
from hyrise_tpu.utils.table_eq import assert_tables_equal

from conftest import REFERENCE_TABLES


def _load(name):
    return load_table(os.path.join(REFERENCE_TABLES, name), name)


def scan_rows(tbl_file, predicate):
    t = _load(tbl_file)
    out = execute_plan(TableScan(TableWrapper(t), predicate))
    return t, out


def test_scan_int_greater():
    t, out = scan_rows("int_float.tbl", col("a") > lit(123))
    df = t.to_pandas()
    expected = df[df["a"] > 123].itertuples(index=False)
    assert_tables_equal(out.rows(), list(expected))


def test_scan_float_leq():
    t, out = scan_rows("int_float.tbl", col("b") <= lit(457.7))
    df = t.to_pandas()
    # literal cast to float32 column type, like the reference
    expected = df[df["b"] <= np.float32(457.7)].itertuples(index=False)
    assert_tables_equal(out.rows(), list(expected))


def test_scan_between():
    t, out = scan_rows("int_float.tbl", col("a").between(123, 1234))
    df = t.to_pandas()
    expected = df[(df["a"] >= 123) & (df["a"] <= 1234)].itertuples(index=False)
    assert_tables_equal(out.rows(), list(expected))


def test_scan_column_vs_column():
    t, out = scan_rows("int_float.tbl", col("a") >= col("b"))
    df = t.to_pandas()
    expected = df[df["a"] >= df["b"]].itertuples(index=False)
    assert_tables_equal(out.rows(), list(expected))


def test_scan_string_equals():
    t, out = scan_rows("int_string.tbl", col("b") == lit("test4"))
    assert out.num_rows == 1
    assert out.rows()[0] == (4, "test4")


def test_scan_string_range():
    t, out = scan_rows("int_string.tbl", col("b") < lit("test2"))
    df = t.to_pandas()
    expected = df[df["b"] < "test2"].itertuples(index=False)
    assert_tables_equal(out.rows(), list(expected))


def test_scan_string_not_present_equals():
    t, out = scan_rows("int_string.tbl", col("b") == lit("zzz"))
    assert out.num_rows == 0


def test_scan_string_not_equals_absent_value():
    t, out = scan_rows("int_string.tbl", col("b") != lit("zzz"))
    assert out.num_rows == t.num_rows


def test_scan_like():
    t, out = scan_rows("int_string.tbl", col("b").like("test1%"))
    df = t.to_pandas()
    expected = df[df["b"].str.startswith("test1")].itertuples(index=False)
    assert_tables_equal(out.rows(), list(expected))


def test_scan_not_like():
    t, out = scan_rows("int_string.tbl", col("b").not_like("test1%"))
    df = t.to_pandas()
    expected = df[~df["b"].str.startswith("test1")].itertuples(index=False)
    assert_tables_equal(out.rows(), list(expected))


def test_scan_in():
    t, out = scan_rows("int_float.tbl", col("a").isin([123, 1234]))
    assert out.num_rows == 2


def test_scan_is_null():
    t, out = scan_rows("int_float_with_null.tbl", col("a").is_null())
    assert out.num_rows == 1
    t, out2 = scan_rows("int_float_with_null.tbl", col("a").is_not_null())
    assert out2.num_rows == t.num_rows - 1


def test_scan_null_comparison_filters_row():
    # a > 0 must NOT return rows where a IS NULL
    t, out = scan_rows("int_float_with_null.tbl", col("a") > lit(-(10**9)))
    df = t.to_pandas()
    non_null = df["a"].notna().sum()
    assert out.num_rows == non_null


def test_scan_and_or():
    t, out = scan_rows("int_float.tbl",
                       (col("a") > 123) & (col("b") < lit(458.0)))
    df = t.to_pandas()
    expected = df[(df["a"] > 123) & (df["b"] < 458.0)].itertuples(index=False)
    assert_tables_equal(out.rows(), list(expected))

    t, out = scan_rows("int_float.tbl",
                       (col("a") == 123) | (col("a") == 1234))
    assert out.num_rows == 2


def test_projection_arithmetic():
    t = _load("int_float.tbl")
    p = Projection(TableWrapper(t), [
        ("a", col("a")),
        ("a_plus_1", col("a") + 1),
        ("prod", col("a") * col("b")),
    ])
    out = execute_plan(p)
    df = t.to_pandas()
    expected = list(zip(df["a"], df["a"] + 1,
                        (df["a"].astype("float32") * df["b"].astype("float32"))))
    assert_tables_equal(out.rows(), expected, rel_tol=1e-5)


def test_projection_case():
    t = _load("int_float.tbl")
    p = Projection(TableWrapper(t), [
        ("c", Case([(col("a") > lit(1000), lit(1))], lit(0))),
    ])
    out = execute_plan(p)
    df = t.to_pandas()
    expected = [(1 if a > 1000 else 0,) for a in df["a"]]
    assert_tables_equal(out.rows(), expected)


def test_projection_substr():
    t = _load("int_string.tbl")
    p = Projection(TableWrapper(t), [
        ("s", col("b").substr(1, 5)),
    ])
    out = execute_plan(p)
    df = t.to_pandas()
    expected = [(s[:5],) for s in df["b"]]
    assert_tables_equal(out.rows(), expected)


def test_integer_division_truncates_toward_zero():
    from hyrise_tpu.storage.table import Table, TableColumnDefinition
    from hyrise_tpu.types import DataType
    t = Table.from_arrays("t", [TableColumnDefinition("a", DataType.INT32)],
                          [np.array([-7, 7, -8], dtype=np.int32)])
    p = Projection(TableWrapper(t), [("d", col("a") / 2)])
    out = execute_plan(p)
    assert [r[0] for r in out.rows()] == [-3, 3, -4]


def test_chained_scans():
    t = _load("int_float.tbl")
    plan = TableScan(TableScan(TableWrapper(t), col("a") > 123),
                     col("b") > lit(457.0))
    out = execute_plan(plan)
    df = t.to_pandas()
    expected = df[(df["a"] > 123) & (df["b"] > 457.0)].itertuples(index=False)
    assert_tables_equal(out.rows(), list(expected))
