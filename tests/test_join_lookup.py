"""Fused lookup-join path (ops/join.py _lookup_execute +
kernels/tpu_prims.lookup_last_eq): unique-build-key INNER/LEFT/RIGHT joins
and existence SEMI/ANTI joins as one merged sort instead of the
sort-probe-expand cascade. Oracle = pandas merge / the general engine path.

Reference parity: same semantics as JoinHash (join_hash.cpp probe /
probe_semi_anti) for the at-most-one-match cases it covers."""

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.kernels import tpu_prims
from hyrise_tpu.ops import TableWrapper, execute_plan
from hyrise_tpu.ops.join import Join
from hyrise_tpu.ops.table_scan import TableScan
from hyrise_tpu.expression.ast import col, lit
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import JoinMode, PredicateCondition
from hyrise_tpu.utils.table_eq import assert_tables_equal


def _mark_unique(t, name):
    t.column(name).unique = True
    return t


def make_tables(unique_build=True):
    rng = np.random.default_rng(7)
    n = 200
    probe = pd.DataFrame({
        "k": rng.integers(0, 80, n).astype(np.int32),
        "pv": np.arange(n, dtype=np.int64),
    })
    if unique_build:
        keys = np.arange(0, 120, 2, dtype=np.int32)  # unique, some missing
    else:
        keys = rng.integers(0, 80, 90).astype(np.int32)
    build = pd.DataFrame({
        "bk": keys,
        "bv": (keys.astype(np.int64) * 10),
        "bs": np.array([f"s{k}" for k in keys], dtype=object),
    })
    tp, tb = Table.from_pandas("P", probe), Table.from_pandas("B", build)
    if unique_build:
        _mark_unique(tb, "bk")
    return tp, tb, probe, build


def run(tl, tr, mode, pair=("k", "bk")):
    op = Join(TableWrapper(tl), TableWrapper(tr), mode, pair)
    out = execute_plan(op)
    return out, op


@pytest.mark.parametrize("fastpath", ["0", "1"])
def test_lookup_last_eq_matches_searchsorted(fastpath, monkeypatch):
    monkeypatch.setenv("HYRISE_TPU_FASTPATH", fastpath)
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    bk = rng.permutation(np.arange(50, dtype=np.int64))
    bvalid = rng.random(50) > 0.2
    pk = rng.integers(-5, 60, 300).astype(np.int64)
    matched, bid = tpu_prims.lookup_last_eq(
        jnp.asarray(bk), jnp.asarray(bvalid), jnp.asarray(pk))
    matched, bid = np.asarray(matched), np.asarray(bid)
    for i, q in enumerate(pk):
        hits = np.nonzero((bk == q) & bvalid)[0]
        assert matched[i] == (len(hits) > 0)
        if len(hits):
            assert bid[i] == hits.max()  # LAST matching row (highest id)


@pytest.mark.parametrize("fastpath", ["0", "1"])
@pytest.mark.parametrize("mode", [JoinMode.INNER, JoinMode.LEFT,
                                  JoinMode.RIGHT])
def test_unique_build_modes(mode, fastpath, monkeypatch):
    monkeypatch.setenv("HYRISE_TPU_FASTPATH", fastpath)
    if mode is JoinMode.RIGHT:
        tp, tb, probe, build = make_tables()
        # left = build side (unique key), right = probe side kept whole
        out, op = run(tb, tp, mode, pair=("bk", "k"))
        exp = build.merge(probe, left_on="bk", right_on="k", how="right")
    else:
        tp, tb, probe, build = make_tables()
        out, op = run(tp, tb, mode)
        how = "inner" if mode is JoinMode.INNER else "left"
        exp = probe.merge(build, left_on="k", right_on="bk", how=how)
    assert op.performance_data.extra.get("lookup_join") is True
    exp = exp.astype(object).where(exp.notna(), None)
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


@pytest.mark.parametrize("fastpath", ["0", "1"])
@pytest.mark.parametrize("mode", [JoinMode.SEMI, JoinMode.ANTI])
@pytest.mark.parametrize("unique_build", [True, False])
def test_existence_modes(mode, unique_build, fastpath, monkeypatch):
    monkeypatch.setenv("HYRISE_TPU_FASTPATH", fastpath)
    tp, tb, probe, build = make_tables(unique_build)
    out, op = run(tp, tb, mode)
    assert op.performance_data.extra.get("lookup_join") is True
    keep = probe["k"].isin(build["bk"])
    exp = probe[keep if mode is JoinMode.SEMI else ~keep]
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


@pytest.mark.parametrize("fastpath", ["0", "1"])
def test_non_unique_build_uses_general_path(fastpath, monkeypatch):
    monkeypatch.setenv("HYRISE_TPU_FASTPATH", fastpath)
    tp, tb, probe, build = make_tables(unique_build=False)
    out, op = run(tp, tb, JoinMode.INNER)
    assert op.performance_data.extra.get("lookup_join") is None
    exp = probe.merge(build, left_on="k", right_on="bk")
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


@pytest.mark.parametrize("fastpath", ["0", "1"])
def test_null_keys_never_match(fastpath, monkeypatch):
    monkeypatch.setenv("HYRISE_TPU_FASTPATH", fastpath)
    probe = pd.DataFrame({"k": pd.array([1, None, 3, None, 7],
                                        dtype="Int32")})
    build = pd.DataFrame({"bk": pd.array([1, 3, None], dtype="Int32"),
                          "bv": pd.array([10, 30, 99], dtype="Int64")})
    tp = Table.from_pandas("P", probe.astype({"k": "Int32"}))
    tb = _mark_unique(Table.from_pandas("B", build), "bk")
    inner, op = run(tp, tb, JoinMode.INNER)
    assert op.performance_data.extra.get("lookup_join") is True
    assert_tables_equal(inner.rows(), [(1, 1, 10), (3, 3, 30)],
                        ordered=False)
    left, _ = run(tp, tb, JoinMode.LEFT)
    assert_tables_equal(left.rows(),
                        [(1, 1, 10), (None, None, None), (3, 3, 30),
                         (None, None, None), (7, None, None)], ordered=False)
    anti, _ = run(tp, tb, JoinMode.ANTI)  # NULL probe keys are kept
    assert_tables_equal(anti.rows(), [(None,), (None,), (7,)], ordered=False)


@pytest.mark.parametrize("fastpath", ["0", "1"])
def test_chained_joins_preserve_unique_through_filter(fastpath, monkeypatch):
    """unique flags survive filters and the probe side of a lookup join, so
    a second join in the chain also takes the fused path."""
    monkeypatch.setenv("HYRISE_TPU_FASTPATH", fastpath)
    orders = pd.DataFrame({
        "o_id": np.arange(100, dtype=np.int32),
        "o_ck": (np.arange(100) % 10).astype(np.int32),
    })
    cust = pd.DataFrame({"c_id": np.arange(10, dtype=np.int32),
                         "c_n": np.arange(10, dtype=np.int64) * 7})
    li = pd.DataFrame({
        "l_oid": np.repeat(np.arange(100), 2).astype(np.int32),
        "l_q": np.arange(200, dtype=np.int64),
    })
    to = _mark_unique(Table.from_pandas("O", orders), "o_id")
    tc = _mark_unique(Table.from_pandas("C", cust), "c_id")
    tl = Table.from_pandas("L", li)
    scan = TableScan(TableWrapper(to), col("o_id") < lit(50))
    j1 = Join(scan, TableWrapper(tc), JoinMode.INNER, ("o_ck", "c_id"))
    j2 = Join(TableWrapper(tl), j1, JoinMode.INNER, ("l_oid", "o_id"))
    out = execute_plan(j2)
    assert j1.performance_data.extra.get("lookup_join") is True
    assert j2.performance_data.extra.get("lookup_join") is True
    exp = li.merge(orders[orders.o_id < 50], left_on="l_oid",
                   right_on="o_id").merge(cust, left_on="o_ck",
                                          right_on="c_id")
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


@pytest.mark.parametrize("fastpath", ["0", "1"])
def test_compiled_lookup_join(fastpath, monkeypatch):
    """The lookup path under whole-plan compilation (masked outputs,
    compact_if_shrunk sites) matches the eager result."""
    monkeypatch.setenv("HYRISE_TPU_FASTPATH", fastpath)
    from hyrise_tpu.plan.compiler import CompiledQuery
    tp, tb, probe, build = make_tables()
    scan = TableScan(TableWrapper(tp), col("k") < lit(40))
    j = Join(scan, TableWrapper(tb), JoinMode.INNER, ("k", "bk"))
    cq = CompiledQuery(j)
    out = cq.run()
    for _ in range(3):  # reach the tighten fixpoint (compaction kicks in)
        out = cq.run()
    exp = probe[probe.k < 40].merge(build, left_on="k", right_on="bk")
    assert_tables_equal(out.rows(), list(exp.itertuples(index=False)),
                        ordered=False)


def test_compiled_string_join_unequal_dictionaries():
    """r3 advisor (high): the compiled SEMI join on string keys with
    DIFFERENT dictionaries remaps codes into merged-dictionary space, but
    the LUT bound came from ctx.col_bounds in ORIGINAL code space — build
    keys with merged code > bound were silently dropped. The bound must be
    (0, len(merged)-1) when a remap occurred."""
    import pandas as pd
    from hyrise_tpu.ops.get_table import TableWrapper
    from hyrise_tpu.ops.join import Join
    from hyrise_tpu.plan.compiler import CompiledQuery
    from hyrise_tpu.storage.table import Table
    from hyrise_tpu.types import JoinMode

    probe = Table.from_pandas("probe", pd.DataFrame(
        {"s": ["a", "b", "c", "d", "e"]}))
    build = Table.from_pandas("build", pd.DataFrame(
        {"t": ["b", "d", "zz"]}))  # 'zz' sorts past every probe value
    for mode in (JoinMode.SEMI, JoinMode.ANTI):
        plan = Join(TableWrapper(probe), TableWrapper(build),
                    mode, ("s", "t"))
        eager = execute_plan(plan).to_pandas()
        for op in list(plan.inputs) + [plan]:
            op.clear_output()
        compiled = CompiledQuery(
            Join(TableWrapper(probe), TableWrapper(build),
                 mode, ("s", "t"))).run().to_pandas()
        assert sorted(eager["s"]) == sorted(compiled["s"]), mode
    assert sorted(execute_plan(
        Join(TableWrapper(probe), TableWrapper(build),
             JoinMode.SEMI, ("s", "t"))).to_pandas()["s"]) == ["b", "d"]


def test_lut_bounds_not_inherited_by_derived_column():
    """r3 advisor (medium): a projected column aliased to a base column's
    name (x+1 AS x) must NOT inherit the base column's ingest val_range —
    bounds travel on the Column and die at any value transformation, so
    the compiled join falls back to the exact sort probe."""
    import pandas as pd
    import numpy as np
    from hyrise_tpu.expression import ast
    from hyrise_tpu.ops.get_table import TableWrapper
    from hyrise_tpu.ops.join import Join
    from hyrise_tpu.ops.projection import Projection
    from hyrise_tpu.plan.compiler import CompiledQuery
    from hyrise_tpu.storage.table import Table
    from hyrise_tpu.types import JoinMode

    probe = Table.from_pandas("probe", pd.DataFrame(
        {"x": np.arange(8, dtype=np.int64)}))          # base range [0, 7]
    build = Table.from_pandas("build", pd.DataFrame(
        {"x": np.arange(8, dtype=np.int64)}))
    # derived build key: x+10 AS x — values [10, 17], outside base range
    shifted = Projection(TableWrapper(build),
                         [(ast.col("x") + ast.lit(10)).alias("x")])
    probe_shift = Projection(TableWrapper(probe),
                             [(ast.col("x") + ast.lit(10)).alias("x")])
    got = CompiledQuery(
        Join(probe_shift, shifted, JoinMode.SEMI, ("x", "x"))
    ).run().to_pandas()
    assert sorted(got["x"]) == list(range(10, 18))
