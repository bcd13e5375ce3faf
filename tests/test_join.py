"""Join tests — the analogue of the reference's join_equi_test.cpp /
join_full_test.cpp harness (all operators × modes × conditions), with pandas
merge as oracle."""

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.ops import TableWrapper, execute_plan
from hyrise_tpu.ops.join import Join, JoinHash, JoinNestedLoop, JoinSortMerge, Product
from hyrise_tpu.storage.table import Table, TableColumnDefinition
from hyrise_tpu.types import DataType, JoinMode, PredicateCondition
from hyrise_tpu.utils.table_eq import assert_tables_equal


def make_tables():
    left = pd.DataFrame({
        "a": np.array([1, 2, 2, 3, 5], dtype=np.int32),
        "x": np.array(["l0", "l1", "l2", "l3", "l4"], dtype=object),
    })
    right = pd.DataFrame({
        "b": np.array([2, 2, 3, 4], dtype=np.int32),
        "y": np.array(["r0", "r1", "r2", "r3"], dtype=object),
    })
    return Table.from_pandas("L", left), Table.from_pandas("R", right), left, right


def run_join(tl, tr, mode, pair=("a", "b"), cond=PredicateCondition.EQUALS,
             cls=Join):
    return execute_plan(cls(TableWrapper(tl), TableWrapper(tr), mode, pair, cond))


def test_inner_equi():
    tl, tr, dl, dr = make_tables()
    out = run_join(tl, tr, JoinMode.INNER)
    exp = dl.merge(dr, left_on="a", right_on="b")
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_inner_equi_hash_alias():
    tl, tr, dl, dr = make_tables()
    out = run_join(tl, tr, JoinMode.INNER, cls=JoinHash)
    exp = dl.merge(dr, left_on="a", right_on="b")
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_left_join():
    tl, tr, dl, dr = make_tables()
    out = run_join(tl, tr, JoinMode.LEFT)
    exp = dl.merge(dr, left_on="a", right_on="b", how="left")
    exp = exp.astype(object).where(exp.notna(), None)
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_right_join():
    tl, tr, dl, dr = make_tables()
    out = run_join(tl, tr, JoinMode.RIGHT)
    exp = dl.merge(dr, left_on="a", right_on="b", how="right")
    exp = exp.astype(object).where(exp.notna(), None)
    assert out.column_names == ["a", "x", "b", "y"]
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_outer_join():
    tl, tr, dl, dr = make_tables()
    out = run_join(tl, tr, JoinMode.OUTER)
    exp = dl.merge(dr, left_on="a", right_on="b", how="outer")
    exp = exp.astype(object).where(exp.notna(), None)
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_semi_join():
    tl, tr, dl, dr = make_tables()
    out = run_join(tl, tr, JoinMode.SEMI)
    exp = dl[dl["a"].isin(dr["b"])]
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_anti_join():
    tl, tr, dl, dr = make_tables()
    out = run_join(tl, tr, JoinMode.ANTI)
    exp = dl[~dl["a"].isin(dr["b"])]
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


@pytest.mark.parametrize("cond,op", [
    (PredicateCondition.LESS_THAN, "<"),
    (PredicateCondition.LESS_THAN_EQUALS, "<="),
    (PredicateCondition.GREATER_THAN, ">"),
    (PredicateCondition.GREATER_THAN_EQUALS, ">="),
    (PredicateCondition.NOT_EQUALS, "!="),
])
def test_non_equi_inner(cond, op):
    tl, tr, dl, dr = make_tables()
    out = run_join(tl, tr, JoinMode.INNER, cond=cond, cls=JoinSortMerge)
    cross = dl.merge(dr, how="cross")
    exp = cross[eval(f'cross["a"] {op} cross["b"]')]
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


@pytest.mark.parametrize("cond,op", [
    (PredicateCondition.EQUALS, "=="),
    (PredicateCondition.LESS_THAN, "<"),
])
def test_nested_loop_matches_sorted_engine(cond, op):
    tl, tr, dl, dr = make_tables()
    out = run_join(tl, tr, JoinMode.INNER, cond=cond, cls=JoinNestedLoop)
    cross = dl.merge(dr, how="cross")
    exp = cross[eval(f'cross["a"] {op} cross["b"]')]
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_join_with_null_keys():
    tl = Table.from_arrays(
        "L",
        [TableColumnDefinition("a", DataType.INT32, True),
         TableColumnDefinition("x", DataType.INT32)],
        [np.array([1, 2, 0], dtype=np.int32), np.array([10, 20, 30], dtype=np.int32)],
        [np.array([True, True, False]), None],
    )
    tr = Table.from_arrays(
        "R",
        [TableColumnDefinition("b", DataType.INT32, True)],
        [np.array([1, 0], dtype=np.int32)],
        [np.array([True, False])],
    )
    # NULL keys never match
    out = run_join(tl, tr, JoinMode.INNER)
    assert out.num_rows == 1
    assert out.rows()[0][0] == 1
    # LEFT: NULL-key row kept with NULL right side
    out = run_join(tl, tr, JoinMode.LEFT)
    assert out.num_rows == 3
    # ANTI: NULL-key row is unmatched -> kept
    out = run_join(tl, tr, JoinMode.ANTI)
    assert {r[1] for r in out.rows()} == {20, 30}


def test_string_key_join_different_dictionaries():
    tl = Table.from_pandas("L", pd.DataFrame({
        "k": np.array(["apple", "pear", "kiwi"], dtype=object)}))
    tr = Table.from_pandas("R", pd.DataFrame({
        "k2": np.array(["pear", "apple", "plum"], dtype=object),
        "v": np.array([1, 2, 3], dtype=np.int32)}))
    out = run_join(tl, tr, JoinMode.INNER, pair=("k", "k2"))
    got = {(r[0], r[2]) for r in out.rows()}
    assert got == {("apple", 2), ("pear", 1)}


def test_int32_int64_key_promotion():
    tl = Table.from_arrays("L", [TableColumnDefinition("a", DataType.INT32)],
                           [np.array([1, 2], dtype=np.int32)])
    tr = Table.from_arrays("R", [TableColumnDefinition("b", DataType.INT64)],
                           [np.array([2, 3], dtype=np.int64)])
    out = run_join(tl, tr, JoinMode.INNER, pair=("a", "b"))
    assert out.num_rows == 1


def test_product():
    tl, tr, dl, dr = make_tables()
    out = execute_plan(Product(TableWrapper(tl), TableWrapper(tr)))
    exp = dl.merge(dr, how="cross")
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_empty_inputs():
    tl, tr, dl, dr = make_tables()
    empty = Table.from_arrays("E", [TableColumnDefinition("b", DataType.INT32)],
                              [np.array([], dtype=np.int32)])
    out = run_join(tl, empty, JoinMode.INNER)
    assert out.num_rows == 0
    out = run_join(tl, empty, JoinMode.LEFT)
    assert out.num_rows == tl.num_rows
    out = run_join(tl, empty, JoinMode.ANTI)
    assert out.num_rows == tl.num_rows


def test_duplicate_heavy_keys():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 5, size=300).astype(np.int32)
    b = rng.integers(0, 5, size=200).astype(np.int32)
    tl = Table.from_pandas("L", pd.DataFrame({"a": a}))
    tr = Table.from_pandas("R", pd.DataFrame({"b": b}))
    out = run_join(tl, tr, JoinMode.INNER)
    exp = pd.DataFrame({"a": a}).merge(pd.DataFrame({"b": b}),
                                       left_on="a", right_on="b")
    assert out.num_rows == len(exp)
