"""TPU fast-path primitive formulations, exercised ON CPU with
HYRISE_TPU_FASTPATH=1 so the sort-based kernels (kernels/tpu_prims.py) get
CI coverage without hardware — the reference's operator tests sweep
implementation variants the same way (src/test/base_test.hpp:33-42).
"""

import numpy as np
import pytest
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _force_fastpath(monkeypatch):
    monkeypatch.setenv("HYRISE_TPU_FASTPATH", "1")


def test_gather_columns_via_sort_matches_take():
    from hyrise_tpu.kernels.tpu_prims import gather_columns_via_sort, take_1d

    rng = np.random.default_rng(0)
    for n, m in [(1000, 3000), (5000, 128), (7, 7), (1, 5)]:
        idx = jnp.asarray(rng.integers(0, n, size=m).astype(np.int32))
        srcs = [
            jnp.asarray(rng.integers(-9, 9, size=n).astype(np.int32)),
            jnp.asarray(rng.random(n).astype(np.float32)),
            jnp.asarray(rng.integers(0, 2, size=n).astype(bool)),
            jnp.asarray(rng.random(n).astype(np.float64)),
            jnp.asarray(rng.integers(0, 1 << 40, size=n).astype(np.int64)),
        ]
        outs = gather_columns_via_sort(srcs, idx)
        for s, o in zip(srcs, outs):
            np.testing.assert_array_equal(np.asarray(o),
                                          np.asarray(s)[np.asarray(idx)])
        np.testing.assert_array_equal(
            np.asarray(take_1d(srcs[0], idx)),
            np.asarray(srcs[0])[np.asarray(idx)])


def test_gather_via_sort_duplicate_and_monotone_indices():
    from hyrise_tpu.kernels.tpu_prims import gather_columns_via_sort

    src = jnp.asarray(np.arange(100, dtype=np.int64) * 3)
    for idx_np in [np.zeros(50, dtype=np.int32),
                   np.arange(100, dtype=np.int32),
                   np.full(10, 99, dtype=np.int32)]:
        idx = jnp.asarray(idx_np)
        (out,) = gather_columns_via_sort([src], idx)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(src)[idx_np])


def test_compiled_query_batches_gathers_and_matches_eager():
    """A join+aggregate plan through CompiledQuery: first run learns the
    consumed-column sets, second run executes with batched sort-gathers;
    results must match the eager path, and the learned sets must hold
    exactly the consumed columns (late materialization preserved)."""
    import pandas as pd

    from hyrise_tpu.expression.ast import col, lit, sum_
    from hyrise_tpu.ops.aggregate import Aggregate, AggregateExpr
    from hyrise_tpu.ops.base import execute_plan
    from hyrise_tpu.ops.get_table import TableWrapper
    from hyrise_tpu.ops.join import Join
    from hyrise_tpu.ops.table_scan import TableScan
    from hyrise_tpu.plan.compiler import CompiledQuery
    from hyrise_tpu.storage.table import Table
    from hyrise_tpu.types import AggregateFunction, JoinMode
    from hyrise_tpu.utils.table_eq import assert_tables_equal

    rng = np.random.default_rng(7)
    n_o, n_l = 200, 1000
    orders = Table.from_pandas("orders", pd.DataFrame({
        "o_orderkey": np.arange(1, n_o + 1, dtype=np.int64),
        "o_flag": rng.integers(0, 3, size=n_o).astype(np.int32),
        "o_unused": rng.random(n_o).astype(np.float32),
    }))
    lineitem = Table.from_pandas("lineitem", pd.DataFrame({
        "l_orderkey": rng.integers(1, n_o + 1, size=n_l).astype(np.int64),
        "l_price": rng.random(n_l).astype(np.float64),
        "l_unused": rng.random(n_l).astype(np.float32),
    }))

    def build():
        j = Join(TableWrapper(lineitem), TableWrapper(orders),
                 JoinMode.INNER, ("l_orderkey", "o_orderkey"))
        f = TableScan(j, col("o_flag") == lit(1))
        return Aggregate(f, ["o_flag"],
                         [("s", AggregateExpr(AggregateFunction.SUM,
                                              col("l_price")))])

    ref = execute_plan(build())
    cq = CompiledQuery(build())
    prev = None
    for _ in range(6):
        got = cq.run()
        state = (tuple(cq.caps), cq._gather_sig())
        if prev == state:
            break
        prev = state
    assert_tables_equal(got.rows(), ref.rows(), ordered=False, rel_tol=1e-9)
    assert cq._gather_known_upto == len(cq.gather_used) > 0
    used = set().union(*cq.gather_used)
    # the untouched columns must never have been materialized
    assert "o_unused:d" not in used and "l_unused:d" not in used
    # re-run with the learned sets: stable, no retrace, same result
    caps_before = list(cq.caps)
    got2 = cq.run()
    assert list(cq.caps) == caps_before and cq.last_retries == 0
    assert_tables_equal(got2.rows(), ref.rows(), ordered=False, rel_tol=1e-9)


def test_gather_seeding_round_trip():
    """seed_gathers reproduces the learned batching on a fresh
    CompiledQuery with no learning retrace (the cap-cache v2 flow)."""
    import pandas as pd

    from hyrise_tpu.expression.ast import col
    from hyrise_tpu.ops.base import execute_plan
    from hyrise_tpu.ops.get_table import TableWrapper
    from hyrise_tpu.ops.join import Join
    from hyrise_tpu.plan.compiler import CompiledQuery
    from hyrise_tpu.storage.table import Table
    from hyrise_tpu.types import JoinMode
    from hyrise_tpu.ops.projection import Projection

    rng = np.random.default_rng(3)
    a = Table.from_pandas("a", pd.DataFrame({
        "k": np.arange(50, dtype=np.int64),
        "x": rng.random(50).astype(np.float64)}))
    b = Table.from_pandas("b", pd.DataFrame({
        "k": rng.integers(0, 50, size=300).astype(np.int64),
        "y": rng.random(300).astype(np.float64)}))

    def build():
        j = Join(TableWrapper(b), TableWrapper(a), JoinMode.INNER, ("k", "k"))
        return Projection(j, [("z", col("x") + col("y"))])

    ref = execute_plan(build())
    cq1 = CompiledQuery(build())
    prev = None
    for _ in range(6):
        cq1.run()
        state = (tuple(cq1.caps), cq1._gather_sig())
        if prev == state:
            break
        prev = state

    cq2 = CompiledQuery(build())
    cq2.caps[:] = list(cq1.caps)
    cq2.seed_gathers([sorted(s) for s in cq1.gather_used])
    got = cq2.run()
    assert cq2.last_retries == 0
    assert cq2._gather_sig() == cq1._gather_sig()
    from hyrise_tpu.utils.table_eq import assert_tables_equal
    assert_tables_equal(got.rows(), ref.rows(), ordered=False, rel_tol=1e-9)


def test_prefix_sum_i32_mxu_exact_above_2_24():
    """r3 advisor (low): the 2-limb split capped inputs at 2^24; a skewed
    join where one probe key matches >=16.7M build rows silently corrupted
    segment offsets. The 3-limb split must be exact over full int32."""
    import numpy as np
    import jax.numpy as jnp
    from hyrise_tpu.kernels.tpu_prims import prefix_sum_i32_mxu

    rng = np.random.default_rng(11)
    v = rng.integers(0, 1 << 31, size=1500, dtype=np.int64).astype(np.int32)
    v[7] = (1 << 31) - 1
    v[600] = 1 << 24
    got = np.asarray(prefix_sum_i32_mxu(jnp.asarray(v)))
    np.testing.assert_array_equal(got, np.cumsum(v.astype(np.int64)))


def test_fast_sorted_groupby_key_packing_wide():
    """Wide multi-key GROUP BY (the Q10 shape: many dictionary columns +
    a float column + ranged ints) through the fast path: packed key words
    must produce the same groups, order, reps, NULL handling, and
    aggregates as the eager engine."""
    import pandas as pd
    from hyrise_tpu.expression import ast
    from hyrise_tpu.ops.aggregate import Aggregate
    from hyrise_tpu.ops.base import execute_plan
    from hyrise_tpu.ops.get_table import TableWrapper
    from hyrise_tpu.ops.sort import Sort
    from hyrise_tpu.storage.table import Table
    from hyrise_tpu.utils.table_eq import assert_tables_equal

    rng = np.random.default_rng(42)
    n = 3000
    df = pd.DataFrame({
        "s1": rng.choice([f"w{i}" for i in range(40)], n),
        "s2": rng.choice(["a", "b", "c"], n),
        "s3": rng.choice([f"x{i}" for i in range(300)], n),
        "i1": rng.integers(-50, 2000, n).astype(np.int64),
        "f1": np.round(rng.normal(size=n), 1),   # float keys incl. dup + neg
        "i2": rng.integers(0, 5, n).astype(np.int32),
        "v": rng.random(n).astype(np.float64),
    })
    df["s2"] = df["s2"].astype(object)
    df.loc[rng.choice(n, 200, replace=False), "s2"] = None
    df.loc[rng.choice(n, 200, replace=False), "f1"] = None
    t = Table.from_pandas("t", df)
    assert t.column("i1").val_range is not None
    assert t.column("s2").has_validity

    gb = ["s1", "s2", "s3", "i1", "f1", "i2"]

    def plan(src):
        return Sort(Aggregate(TableWrapper(src), gb, [
            ("sv", ast.sum_(ast.col("v"))),
            ("cnt", ast.count_()),
            ("mx", ast.max_(ast.col("v"))),
        ]), gb)

    import os
    os.environ["HYRISE_TPU_FASTPATH"] = "0"
    try:
        ref = execute_plan(plan(t))
    finally:
        os.environ["HYRISE_TPU_FASTPATH"] = "1"
    try:
        agg = Aggregate(TableWrapper(t), gb, [
            ("sv", ast.sum_(ast.col("v"))),
            ("cnt", ast.count_()),
            ("mx", ast.max_(ast.col("v"))),
        ])
        got_unsorted = execute_plan(agg)
        got = execute_plan(Sort(TableWrapper(got_unsorted), gb))
    finally:
        os.environ.pop("HYRISE_TPU_FASTPATH", None)
    assert_tables_equal(got.rows(), ref.rows(), ordered=True, rel_tol=1e-9)
    # packing actually reduced operands: 6 keys + dead flag -> few words
    keys, specs = agg._group_key_operands(
        [t.column(c) for c in gb], t.live_mask())
    # dead flag + packed word + (f1 validity + f1 raw) + packed word
    assert len(keys) <= 5, len(keys)
    assert sum(1 for s in specs if s[0] == "packed") == 5
