"""Console, planviz, CSV/binary IO, scheduler, benchmark runner, TPC-C."""

import io
import os

import numpy as np
import pandas as pd

from hyrise_tpu.bench.runner import (BenchmarkConfig, BenchmarkRunner,
                                     generate_synthetic_table)
from hyrise_tpu.ops import GetTable, TableWrapper, execute_plan
from hyrise_tpu.ops.import_export import (export_binary, export_csv, load_binary,
                                          load_csv)
from hyrise_tpu.ops.print_op import format_table
from hyrise_tpu.ops.table_scan import TableScan
from hyrise_tpu.expression.ast import col, lit
from hyrise_tpu.parallel.scheduler import (ImmediateScheduler, OperatorTask,
                                           PoolScheduler, schedule_plan,
                                           set_scheduler)
from hyrise_tpu.storage.catalog import default_catalog
from hyrise_tpu.storage.table import Table
from hyrise_tpu.utils.table_eq import assert_tables_equal
from hyrise_tpu.utils.visualize import lqp_to_dot, pqp_to_dot


def make_table():
    return Table.from_pandas("t", pd.DataFrame({
        "a": np.array([1, 2, 3], dtype=np.int32),
        "s": np.array(["x", None, "z"], dtype=object),
    }))


def test_csv_roundtrip(tmp_path):
    t = make_table()
    path = str(tmp_path / "t.csv")
    export_csv(t, path)
    assert os.path.exists(path + ".json")
    t2 = load_csv(path)
    assert_tables_equal(t2.rows(), t.rows())


def test_binary_roundtrip(tmp_path):
    t = make_table()
    path = str(tmp_path / "t.npz")
    export_binary(t, path)
    t2 = load_binary(path)
    assert_tables_equal(t2.rows(), t.rows())


def test_print_format():
    t = make_table()
    s = format_table(t)
    assert "a" in s and "NULL" in s and "(3 rows)" in s


def test_visualize():
    from hyrise_tpu.plan.lqp import PredicateNode, StoredTableNode
    dot = lqp_to_dot(PredicateNode(col("a") > lit(1), StoredTableNode("t")))
    assert "digraph LQP" in dot and "Predicate" in dot
    plan = TableScan(TableWrapper(make_table()), col("a") > lit(1))
    execute_plan(plan)
    dot = pqp_to_dot(plan)
    assert "TableScan" in dot and "rows" in dot


def test_scheduler_pool_matches_immediate():
    t = make_table()
    plan1 = TableScan(TableWrapper(t), col("a") > lit(1))
    plan2 = TableScan(TableWrapper(t), col("a") > lit(1))
    set_scheduler(None)
    r1 = schedule_plan(plan1)
    set_scheduler(PoolScheduler(workers=4))
    try:
        r2 = schedule_plan(plan2)
    finally:
        set_scheduler(None)
    assert_tables_equal(r1.rows(), r2.rows())


def test_scheduler_tasks_shared_subplans():
    t = make_table()
    base = TableWrapper(t)
    s1 = TableScan(base, col("a") > lit(1))
    s2 = TableScan(base, col("a") > lit(2))
    from hyrise_tpu.ops.join import Product
    top = Product(s1, s2)
    tasks = OperatorTask.make_tasks_from_operator(top)
    assert len(tasks) == 4  # base shared once


def test_scheduler_error_propagates():
    bad = TableScan(TableWrapper(make_table()), col("nope") > lit(1))
    set_scheduler(PoolScheduler(workers=2))
    try:
        import pytest
        with pytest.raises(KeyError):
            schedule_plan(bad)
    finally:
        set_scheduler(None)


def test_benchmark_runner():
    t = generate_synthetic_table(1000, 2)

    def q():
        return execute_plan(TableScan(TableWrapper(t), col("column_0") > 500))

    r = BenchmarkRunner(BenchmarkConfig(max_runs=3, warmup_runs=1),
                        {"scan": q})
    r.run()
    rep = r.report()
    assert rep["benchmarks"][0]["iterations"] == 3
    assert rep["benchmarks"][0]["real_time_ms"] > 0


def test_tpcc_generator():
    from hyrise_tpu.tpcc.generator import generate_tpcc_tables
    tables = generate_tpcc_tables(1)
    assert set(tables) == {"item", "warehouse", "district", "customer",
                           "history", "stock", "tpcc_order", "order_line",
                           "new_order"}
    assert tables["warehouse"].num_rows == 1
    assert tables["district"].num_rows == 10
    assert tables["customer"].num_rows == 30000
    assert tables["new_order"].num_rows == 9000


def test_console_commands():
    from hyrise_tpu.console import Console
    from hyrise_tpu.storage.catalog import reset_default_catalog
    out = io.StringIO()
    c = Console(out=out)
    c.catalog.add_table("t", make_table())
    assert c.handle("print t")
    assert "NULL" in out.getvalue()
    assert c.handle("SELECT a FROM t WHERE a > 1")
    assert "(2 rows)" in out.getvalue()
    assert c.handle("txinfo")
    assert c.handle("help")
    assert not c.handle("quit")
