"""FusedFilterAggregate must reproduce TableScan+Aggregate (Q1/Q6 shapes)."""

import numpy as np

from hyrise_tpu.expression.ast import avg_, col, count_, lit, sum_
from hyrise_tpu.kernels.fused import FusedFilterAggregate
from hyrise_tpu.ops import GetTable, TableWrapper, execute_plan
from hyrise_tpu.ops.aggregate import Aggregate
from hyrise_tpu.ops.sort import Sort
from hyrise_tpu.ops.table_scan import TableScan
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.table import Table
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


def test_fused_falls_back_on_null_group_keys():
    """NULL group keys must form their own group (general path), not merge
    into dictionary[0]."""
    import pandas as pd
    df = pd.DataFrame({"g": ["a", None, "a", None], "x": [1.0, 2.0, 3.0, 4.0]})
    t = Table.from_pandas("t", df)
    op = FusedFilterAggregate(TableWrapper(t), None, ["g"],
                              [("s", sum_(col("x")))])
    out = execute_plan(op)
    rows = {r[0]: r[1] for r in out.rows()}
    assert rows["a"] == 4.0
    assert rows[None] == 6.0


def test_fused_all_null_input_group_is_null():
    """SUM over a group whose aggregate inputs are all NULL is NULL, not 0."""
    import pandas as pd
    df = pd.DataFrame({"g": ["a", "a", "b"], "x": [None, None, 7.0]})
    t = Table.from_pandas("t", df)
    op = FusedFilterAggregate(TableWrapper(t), None, ["g"],
                              [("s", sum_(col("x")))])
    out = execute_plan(op)
    rows = {r[0]: r[1] for r in out.rows()}
    assert rows["a"] is None
    assert rows["b"] == 7.0


def test_fused_integer_sum_uses_int64():
    import pandas as pd
    big = 2**31  # each beyond int32; sum far beyond float32 precision
    df = pd.DataFrame({"g": ["a"] * 3,
                       "x": np.array([big, big, 1], dtype=np.int64)})
    t = Table.from_pandas("t", df)
    op = FusedFilterAggregate(TableWrapper(t), None, ["g"],
                              [("s", sum_(col("x")))])
    out = execute_plan(op)
    assert out.rows()[0][1] == 2 * big + 1


def test_fused_respects_masked_layout():
    """Regression: FusedFilterAggregate assumed prefix liveness
    (arange < num_rows); a masked post-join table silently aggregated dead
    rows / dropped live ones (surfaced as TPC-H Q17 SQL-compiled returning
    NULL on the first trace, before capacity tightening compacts)."""
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd
    from hyrise_tpu.expression import ast
    from hyrise_tpu.kernels.fused import FusedFilterAggregate
    from hyrise_tpu.ops.base import execute_plan
    from hyrise_tpu.ops.get_table import TableWrapper
    from hyrise_tpu.storage.table import Table

    t = Table.from_pandas("t", pd.DataFrame({
        "v": np.arange(8, dtype=np.float32)}))
    lm = np.zeros(t.capacity, dtype=bool)
    lm[[1, 3, 5, 7]] = True
    masked = Table(t.columns, 4, name="t", live=jnp.asarray(lm))
    out = execute_plan(FusedFilterAggregate(
        TableWrapper(masked), ast.col("v") > ast.lit(2.0), [],
        [("s", ast.sum_(ast.col("v")))]))
    assert out.rows() == [(15.0,)]  # live rows 1,3,5,7; >2 keeps 3+5+7
