"""Whole-plan compilation (plan/compiler.py): the ENTIRE operator DAG traced
into one jitted program with oracle-speculated capacities must reproduce the
eager per-operator path exactly — including after capacity-overflow retries
and capacity tightening.

This is the test surface for the reference's JIT subsystem analogue
(src/lib/operators/jit_operator/): same plans, one fused program.
"""

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.expression.ast import avg_, col, count_, lit, sum_
from hyrise_tpu.ops import GetTable, TableWrapper, execute_plan
from hyrise_tpu.ops.aggregate import Aggregate
from hyrise_tpu.ops.join import Join, JoinNestedLoop, Product
from hyrise_tpu.ops.misc import Difference, Limit, UnionAll
from hyrise_tpu.ops.projection import Projection
from hyrise_tpu.ops.sort import Sort
from hyrise_tpu.ops.table_scan import TableScan
from hyrise_tpu.plan.compiler import CompiledQuery
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import JoinMode, PredicateCondition
from hyrise_tpu.utils.table_eq import assert_tables_equal


def make_catalog():
    rng = np.random.default_rng(7)
    n, m = 500, 80
    cat = Catalog()
    cat.add_table("t", Table.from_pandas("t", pd.DataFrame({
        "a": rng.integers(0, 50, size=n).astype(np.int32),
        "b": rng.random(n).astype(np.float64),
        "s": np.array([f"v{int(x):02d}" for x in rng.integers(0, 9, n)],
                      dtype=object),
        "nullable": np.where(rng.random(n) < 0.2, np.nan,
                             rng.random(n)),
    })))
    cat.add_table("d", Table.from_pandas("d", pd.DataFrame({
        "k": np.arange(m, dtype=np.int32),
        "w": rng.random(m).astype(np.float64),
    })))
    return cat


def both(plan_factory, cat):
    """Run a plan eagerly and compiled; compare row sets."""
    eager = execute_plan(plan_factory(cat)).rows()
    cq = CompiledQuery(plan_factory(cat), cat)
    compiled = cq.run().rows()
    assert_tables_equal(compiled, eager, ordered=True, rel_tol=1e-9)
    # second run exercises the tightened-capacity program
    compiled2 = cq.run().rows()
    assert_tables_equal(compiled2, eager, ordered=True, rel_tol=1e-9)
    return cq


def test_scan_project_sort():
    cat = make_catalog()
    both(lambda c: Sort(Projection(TableScan(GetTable("t", c),
                                             col("a") < lit(10)),
                                   ["a", ("bb", col("b") * lit(2.0))]),
                        ["a", "bb"]), cat)


def test_aggregate_groups():
    cat = make_catalog()
    both(lambda c: Sort(Aggregate(GetTable("t", c), ["s"],
                                  [("cnt", count_()),
                                   ("sb", sum_(col("b"))),
                                   ("an", avg_(col("nullable")))]),
                        ["s"]), cat)


def test_join_inner_and_left():
    cat = make_catalog()
    for mode in (JoinMode.INNER, JoinMode.LEFT):
        both(lambda c, mode=mode: Sort(
            Join(TableScan(GetTable("t", c), col("a") < lit(30)),
                 GetTable("d", c), mode, ("a", "k")),
            ["a", "b"]), cat)


def test_join_outer_union_limit():
    cat = make_catalog()
    both(lambda c: Limit(Sort(
        Join(GetTable("t", c), GetTable("d", c), JoinMode.OUTER, ("a", "k")),
        ["a", "b"]), 17), cat)
    both(lambda c: Sort(UnionAll(
        TableScan(GetTable("t", c), col("a") < lit(5)),
        TableScan(GetTable("t", c), col("a") >= lit(45))), ["a", "b"]), cat)


def test_semi_anti_product():
    cat = make_catalog()
    for mode in (JoinMode.SEMI, JoinMode.ANTI):
        both(lambda c, mode=mode: Sort(
            Join(GetTable("t", c), TableScan(GetTable("d", c),
                                             col("k") < lit(20)),
                 mode, ("a", "k")), ["a", "b"]), cat)
    both(lambda c: Sort(Product(
        TableScan(GetTable("t", c), col("a") < lit(2)),
        TableScan(GetTable("d", c), col("k") < lit(3))), ["a", "b", "k"]),
        cat)


def test_nested_loop_and_difference():
    cat = make_catalog()
    both(lambda c: Sort(JoinNestedLoop(
        TableScan(GetTable("t", c), col("a") < lit(5)),
        TableScan(GetTable("d", c), col("k") < lit(10)),
        JoinMode.INNER, ("a", "k"), PredicateCondition.GREATER_THAN),
        ["a", "k"]), cat)
    both(lambda c: Sort(Difference(
        Projection(GetTable("t", c), ["a"]),
        Projection(TableScan(GetTable("t", c), col("a") < lit(25)), ["a"])),
        ["a"]), cat)


def test_overflow_retry_converges():
    """A join with fan-out >1 must overflow the probe-rows estimate and
    converge via retry."""
    cat = Catalog()
    n = 2000
    cat.add_table("f", Table.from_pandas("f", pd.DataFrame({
        "k": np.zeros(n, dtype=np.int32)})))  # all rows share one key
    cat.add_table("g", Table.from_pandas("g", pd.DataFrame({
        "k2": np.zeros(5, dtype=np.int32), "x": np.arange(5.0)})))
    plan = Join(GetTable("f", cat), GetTable("g", cat), JoinMode.INNER,
                ("k", "k2"))
    cq = CompiledQuery(plan, cat)
    out = cq.run()
    assert out.num_rows == n * 5
    assert cq.last_retries >= 1


def test_compiled_is_sync_free_after_learning():
    """After capacities are learned, a run must issue NO oracle host syncs
    (the counts stay on device until the single result fetch)."""
    cat = make_catalog()
    plan = Sort(Aggregate(TableScan(GetTable("t", cat), col("a") < lit(10)),
                          ["s"], [("cnt", count_())]), ["s"])
    cq = CompiledQuery(plan, cat)
    cq.run()
    caps_before = list(cq.caps)
    cq.run()
    assert cq.last_retries == 0
    assert list(cq.caps) == caps_before
