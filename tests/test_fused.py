"""FusedFilterAggregate must reproduce TableScan+Aggregate (Q1/Q6 shapes)."""

from hyrise_tpu.expression.ast import avg_, col, count_, lit, sum_
from hyrise_tpu.kernels.fused import FusedFilterAggregate
from hyrise_tpu.ops import GetTable, execute_plan
from hyrise_tpu.ops.aggregate import Aggregate
from hyrise_tpu.ops.sort import Sort
from hyrise_tpu.ops.table_scan import TableScan
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.tpch.dbgen import generate_tables
from hyrise_tpu.utils.table_eq import assert_tables_equal

_cat = None


def _setup():
    global _cat
    if _cat is None:
        _cat = Catalog()
        for name, t in generate_tables(0.002).items():
            _cat.add_table(name, t)
    return _cat


def q6_predicate():
    return ((col("l_shipdate") >= lit("1994-01-01"))
            & (col("l_shipdate") < lit("1995-01-01"))
            & col("l_discount").between(0.05, 0.07001)
            & (col("l_quantity") < lit(24)))


def test_fused_q6():
    cat = _setup()
    pred = q6_predicate()
    aggs = [("revenue", sum_(col("l_extendedprice") * col("l_discount")))]
    fused = execute_plan(FusedFilterAggregate(GetTable("lineitem", cat),
                                              pred, [], aggs))
    ref = execute_plan(Aggregate(TableScan(GetTable("lineitem", cat), pred),
                                 [], aggs))
    assert_tables_equal(fused.rows(), ref.rows(), rel_tol=1e-9)


def test_fused_q1():
    cat = _setup()
    pred = col("l_shipdate") <= lit("1998-12-01")
    disc_price = col("l_extendedprice") * (lit(1) - col("l_discount"))
    aggs = [
        ("sum_qty", sum_(col("l_quantity"))),
        ("sum_disc_price", sum_(disc_price)),
        ("avg_disc", avg_(col("l_discount"))),
        ("count_order", count_()),
    ]
    groupby = ["l_returnflag", "l_linestatus"]
    fused = execute_plan(Sort(
        FusedFilterAggregate(GetTable("lineitem", cat), pred, groupby, aggs),
        groupby))
    ref = execute_plan(Sort(
        Aggregate(TableScan(GetTable("lineitem", cat), pred), groupby, aggs),
        groupby))
    assert_tables_equal(fused.rows(), ref.rows(), rel_tol=1e-9)


def test_fused_reexecution_uses_cache():
    cat = _setup()
    op = FusedFilterAggregate(GetTable("lineitem", cat), q6_predicate(), [],
                              [("revenue", sum_(col("l_extendedprice")
                                                * col("l_discount")))])
    r1 = execute_plan(op).rows()
    op.clear_output()
    op.inputs[0].clear_output()
    r2 = execute_plan(op).rows()
    assert r1 == r2
    assert op._jitted is not None
