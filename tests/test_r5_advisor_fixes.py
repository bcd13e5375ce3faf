"""Round-5 advisor-finding regression tests.

1. blocked.py: Limit(Sort(Aggregate)) roots must take the aggregate-split
   path, not per-block top-K (groups split across blocks would yield
   duplicate keys with partial aggregates).
2. index_scan.py: extra_equals conjuncts must survive the TableScan
   fallback for BETWEEN/LIKE/IS_NULL conditions too.
3. misc.py _row_hash: f64 values outside float32's range must not collapse
   to one hash (Difference uses hash equality as row equality).
4. aggregate.py: float GROUP BY keys — all NaNs form one group.
"""

import math

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.expression.ast import AggregateExpr, col
from hyrise_tpu.ops.aggregate import Aggregate
from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.ops.get_table import GetTable, TableWrapper
from hyrise_tpu.ops.index_scan import IndexScan
from hyrise_tpu.ops.misc import Difference, Limit
from hyrise_tpu.ops.sort import Sort
from hyrise_tpu.plan.blocked import BlockedCompiledQuery
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.index import create_index
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import AggregateFunction, PredicateCondition
from hyrise_tpu.utils.table_eq import assert_tables_equal


def test_blocked_topk_over_aggregate_splits_at_aggregate():
    # groups deliberately interleaved so every block sees every key: a
    # per-block top-K of the whole root would emit duplicate keys with
    # partial sums
    n = 4096
    df = pd.DataFrame({
        "k": (np.arange(n) % 7).astype(np.int64),
        "v": np.ones(n, dtype=np.int64),
    })
    t = Table.from_pandas("t", df)
    cat = Catalog()
    cat.add_table("t", t)

    def plan():
        agg = Aggregate(GetTable("t", cat), ["k"],
                        [("s", AggregateExpr(AggregateFunction.SUM,
                                             col("v")))])
        from hyrise_tpu.types import SortMode
        return Limit(Sort(agg, [("s", SortMode.DESCENDING),
                                ("k", SortMode.ASCENDING)]), 3)

    ref = execute_plan(plan())
    bq = BlockedCompiledQuery(plan(), cat, block_rows=t.capacity // 4)
    assert bq.n_blocks >= 2
    assert bq._mode == "agg"  # NOT topk: aggregate below the sort
    out = bq.run()
    assert_tables_equal(out.rows(), ref.rows(), ordered=True)
    # every key appears at most once in the merged top-K
    keys = [r[0] for r in out.rows()]
    assert len(keys) == len(set(keys))


@pytest.mark.parametrize("cond,value,value2,mask_fn", [
    (PredicateCondition.BETWEEN, 5, 12,
     lambda df: (df.a >= 5) & (df.a <= 12)),
    (PredicateCondition.IS_NOT_NULL, None, None,
     lambda df: df.a.notna()),
])
def test_index_scan_fallback_keeps_extra_equals(cond, value, value2, mask_fn):
    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame({
        "a": rng.integers(0, 20, n).astype(np.int64),
        "s": rng.choice(["red", "green", "blue"], n),
    })
    t = Table.from_pandas("t", df)
    cat = Catalog()
    cat.add_table("t", t)
    create_index(t, ["a"])  # no composite on (a, s) -> fallback path
    scan = IndexScan(GetTable("t", cat), "a", cond, value, value2,
                     extra_equals=[("s", "red")])
    out = execute_plan(scan)
    expect = int((mask_fn(df) & (df.s == "red")).sum())
    assert out.num_rows == expect


def test_index_scan_like_fallback_keeps_extra_equals():
    df = pd.DataFrame({
        "s": ["apple", "apricot", "banana", "apple", "avocado"],
        "g": ["x", "y", "x", "y", "x"],
    })
    t = Table.from_pandas("t", df)
    cat = Catalog()
    cat.add_table("t", t)
    create_index(t, ["s"])
    scan = IndexScan(GetTable("t", cat), "s", PredicateCondition.LIKE, "ap%",
                     extra_equals=[("g", "y")])
    out = execute_plan(scan)
    # apple/apricot match LIKE; only apricot(y) and apple(y) have g == 'y'
    assert out.num_rows == 2


def test_difference_distinguishes_huge_floats():
    # all three magnitudes exceed float32's max (3.4e38): the old triple-f32
    # decomposition collapsed them to the same (inf, -inf, NaN) hash triple
    left = pd.DataFrame({"v": np.array([1e300, 2e300, 5e-300, 1.0],
                                       dtype=np.float64)})
    right = pd.DataFrame({"v": np.array([2e300, 5e-300],
                                        dtype=np.float64)})
    out = execute_plan(Difference(
        TableWrapper(Table.from_pandas("l", left)),
        TableWrapper(Table.from_pandas("r", right))))
    vals = sorted(r[0] for r in out.rows())
    assert vals == [1.0, 1e300]


def test_difference_tiny_floats_not_all_zero():
    # far below float32's subnormal floor (~1.4e-45) these all hashed as
    # 0.0 before; normal f64s only — XLA backends may flush f64
    # SUBNORMALS (<2.2e-308) to zero, which no hash can undo
    left = pd.DataFrame({"v": np.array([5e-300, 7e-300, 0.0, 3e-60],
                                       dtype=np.float64)})
    right = pd.DataFrame({"v": np.array([7e-300], dtype=np.float64)})
    out = execute_plan(Difference(
        TableWrapper(Table.from_pandas("l", left)),
        TableWrapper(Table.from_pandas("r", right))))
    vals = sorted(r[0] for r in out.rows())
    assert vals == [0.0, 5e-300, 3e-60]


def test_row_hash_equal_values_equal_hash():
    import jax.numpy as jnp

    from hyrise_tpu.ops.misc import _row_hash
    vals = np.array([1e300, 1e300, -1e300, 3.5, 3.5, 5e-300, 0.0, -0.0,
                     np.inf, np.inf, -np.inf], dtype=np.float64)
    from hyrise_tpu.storage.column import Column
    from hyrise_tpu.types import DataType
    t = Table([Column("v", DataType.FLOAT64, jnp.asarray(vals))], len(vals))
    h = np.asarray(_row_hash(t))
    assert h[0] == h[1] and h[3] == h[4] and h[8] == h[9]
    # distinct values -> distinct hashes (these particular ones)
    assert len({h[0], h[2], h[3], h[5], h[6], h[8], h[10]}) == 7


@pytest.mark.parametrize("fastpath", ["0", "1"])
def test_float_groupby_nan_one_group(fastpath, monkeypatch):
    monkeypatch.setenv("HYRISE_TPU_FASTPATH", fastpath)
    # build columns directly: from_pandas would turn NaN into SQL NULL
    import jax.numpy as jnp

    from hyrise_tpu.storage.column import Column
    from hyrise_tpu.types import DataType
    k = jnp.asarray(np.array([1.5, np.nan, 2.5, np.nan, np.nan, 1.5],
                             dtype=np.float64))
    v = jnp.asarray(np.array([1, 10, 100, 20, 30, 2], dtype=np.int64))
    t = Table([Column("k", DataType.FLOAT64, k),
               Column("v", DataType.INT64, v)], 6, name="t")
    agg = Aggregate(TableWrapper(t), ["k"],
                    [("s", AggregateExpr(AggregateFunction.SUM, col("v"))),
                     ("c", AggregateExpr(AggregateFunction.COUNT, col("v")))])
    out = execute_plan(agg)
    rows = out.rows()
    assert len(rows) == 3  # 1.5, 2.5, NaN — NaNs in ONE group
    by_key = {("nan" if (isinstance(r[0], float) and math.isnan(r[0]))
               else r[0]): (r[1], r[2]) for r in rows}
    assert by_key[1.5] == (3, 2)
    assert by_key[2.5] == (100, 1)
    assert by_key["nan"] == (60, 3)
