"""Join mode × condition matrix: JoinNestedLoop (dense pair-mask, all modes)
cross-checked against the sorted-range Join engine, plus the
optimizer-selected IndexScan.

Reference: src/test/operators/join_full_test.cpp runs a shared harness
across all join operators × modes × predicate conditions;
optimizer/strategy/index_scan_rule.cpp selects IndexScan when a chunk index
exists."""

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.expression import ast
from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.ops.get_table import TableWrapper
from hyrise_tpu.ops.join import Join, JoinNestedLoop
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import JoinMode, PredicateCondition
from hyrise_tpu.utils.table_eq import assert_tables_equal

MODES = [JoinMode.INNER, JoinMode.LEFT, JoinMode.RIGHT, JoinMode.OUTER,
         JoinMode.SEMI, JoinMode.ANTI]
CONDS = [PredicateCondition.EQUALS, PredicateCondition.NOT_EQUALS,
         PredicateCondition.LESS_THAN, PredicateCondition.GREATER_THAN_EQUALS]


def _tables(seed=0, n=23, m=17):
    rng = np.random.default_rng(seed)
    lk = pd.array(rng.integers(0, 8, size=n), dtype="Int64")
    lk[rng.random(n) < 0.2] = None          # NULL join keys on both sides
    rk = pd.array(rng.integers(0, 8, size=m), dtype="Int64")
    rk[rng.random(m) < 0.2] = None
    lt = Table.from_pandas("l", pd.DataFrame({
        "a": lk, "lv": np.arange(n, dtype=np.int32)}))
    rt = Table.from_pandas("r", pd.DataFrame({
        "b": rk, "rv": np.arange(100, 100 + m, dtype=np.int32)}))
    return lt, rt


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("cond", CONDS)
def test_nested_loop_matches_sorted_engine(mode, cond):
    lt, rt = _tables()
    sorted_out = execute_plan(Join(TableWrapper(lt), TableWrapper(rt),
                                   mode, ("a", "b"), cond))
    nl_out = execute_plan(JoinNestedLoop(TableWrapper(lt), TableWrapper(rt),
                                         mode, ("a", "b"), cond))
    assert nl_out.column_names == sorted_out.column_names
    assert_tables_equal(nl_out.rows(), sorted_out.rows(), ordered=False)


@pytest.mark.parametrize("mode", MODES)
def test_nested_loop_matches_pandas_equi(mode):
    lt, rt = _tables(seed=3)
    out = execute_plan(JoinNestedLoop(TableWrapper(lt), TableWrapper(rt),
                                      mode, ("a", "b")))
    # manual expectation (pandas merge wrongly matches NaN == NaN)
    lrows, rrows = lt.rows(), rt.rows()
    exp_rows = []
    l_matched, r_matched = set(), set()
    for i, (la, lv) in enumerate(lrows):
        for j, (rb, rv) in enumerate(rrows):
            if la is not None and rb is not None and la == rb:
                exp_rows.append((la, lv, rb, rv))
                l_matched.add(i)
                r_matched.add(j)
    if mode is JoinMode.SEMI:
        exp_rows = [lrows[i] for i in sorted(l_matched)]
    elif mode is JoinMode.ANTI:
        exp_rows = [r for i, r in enumerate(lrows) if i not in l_matched]
    else:
        if mode in (JoinMode.LEFT, JoinMode.OUTER):
            exp_rows += [(la, lv, None, None) for i, (la, lv)
                         in enumerate(lrows) if i not in l_matched]
        if mode in (JoinMode.RIGHT, JoinMode.OUTER):
            exp_rows += [(None, None, rb, rv) for j, (rb, rv)
                         in enumerate(rrows) if j not in r_matched]
        if mode is JoinMode.INNER:
            pass
    assert_tables_equal(out.rows(), exp_rows, ordered=False)


def test_index_scan_rule_selects_index_scan():
    from hyrise_tpu.plan import lqp as L
    from hyrise_tpu.plan.optimizer import Optimizer
    from hyrise_tpu.plan.translator import translate_lqp
    from hyrise_tpu.storage.catalog import Catalog
    from hyrise_tpu.storage.index import create_index
    from hyrise_tpu.utils.visualize import pqp_to_dot

    rng = np.random.default_rng(1)
    t = Table.from_pandas("t", pd.DataFrame({
        "k": rng.integers(0, 1000, size=500).astype(np.int64),
        "v": rng.normal(size=500)}))
    create_index(t, "k")
    cat = Catalog()
    cat.add_table("t", t)

    plan = L.PredicateNode(ast.col("k") < ast.lit(100),
                           L.StoredTableNode("t"))
    opt = Optimizer().optimize(plan, cat)
    pqp = translate_lqp(opt, cat)
    assert "IndexScan" in pqp.describe()
    out = execute_plan(pqp)
    assert pqp_to_dot(pqp)  # renders

    # equivalence against a plain scan
    from hyrise_tpu.ops.table_scan import TableScan
    ref = execute_plan(TableScan(TableWrapper(t),
                                 ast.col("k") < ast.lit(100)))
    assert_tables_equal(out.rows(), ref.rows(), ordered=False)
    # and the rule leaves non-indexed tables alone
    plan2 = L.PredicateNode(ast.col("v") < ast.lit(0.0),
                            L.StoredTableNode("t"))
    pqp2 = translate_lqp(Optimizer().optimize(plan2, cat), cat)
    assert "IndexScan" not in pqp2.describe()
