"""All 22 TPC-H queries executed as ONE compiled program each (whole-plan
jit, plan/compiler.py) vs the sqlite oracle — the compiled-path twin of
test_tpch.py. This is the capability the reference's JIT subsystem provides
(jit_operator/jit_aware_lqp_translator.cpp: maximal fused pipelines)."""

import pytest

from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.plan.compiler import CompiledQuery, PlanNotCompilable
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.tpch.dbgen import generate_tables
from hyrise_tpu.tpch.queries import TPCH_PLANS, TPCH_SQL
from hyrise_tpu.utils.sqlite_oracle import SqliteOracle
from hyrise_tpu.utils.table_eq import assert_tables_equal

SF = 0.01
QUERY_SF = {20: 0.05}

_state = {}


def _setup(sf=SF):
    if sf in _state:
        return _state[sf]
    tables = generate_tables(sf)
    cat = Catalog()
    for name, t in tables.items():
        cat.add_table(name, t)
    oracle = SqliteOracle(tables)
    for ddl in [
        "CREATE INDEX idx_l_ok ON lineitem(l_orderkey)",
        "CREATE INDEX idx_l_pk ON lineitem(l_partkey)",
        "CREATE INDEX idx_l_ps ON lineitem(l_partkey, l_suppkey)",
        "CREATE INDEX idx_o_ck ON orders(o_custkey)",
        "CREATE INDEX idx_o_ok ON orders(o_orderkey)",
        "CREATE INDEX idx_ps_pk ON partsupp(ps_partkey)",
    ]:
        oracle.conn.execute(ddl)
    _state[sf] = (cat, oracle)
    return cat, oracle


@pytest.mark.parametrize("qid", sorted(TPCH_PLANS))
def test_tpch_compiled(qid):
    cat, oracle = _setup(QUERY_SF.get(qid, SF))
    expected = oracle.query(TPCH_SQL[qid])
    cq = CompiledQuery(TPCH_PLANS[qid](cat), cat)
    out = cq.run()
    assert_tables_equal(out.rows(), expected, ordered=False, rel_tol=1e-3,
                        abs_tol=1e-4)
    # re-run with tightened capacities: must stay correct and retry-free
    out2 = cq.run()
    assert cq.last_retries == 0
    assert_tables_equal(out2.rows(), expected, ordered=False, rel_tol=1e-3,
                        abs_tol=1e-4)


@pytest.mark.parametrize("qid", sorted(TPCH_SQL))
def test_tpch_sql_compiled(qid):
    """SQL front end with whole-plan compiled execution
    (SQLPipelineBuilder.with_compiled_execution)."""
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
    cat, oracle = _setup(QUERY_SF.get(qid, SF))
    expected = oracle.query(TPCH_SQL[qid])
    out = (SQLPipelineBuilder(TPCH_SQL[qid]).with_catalog(cat)
           .with_compiled_execution().create_pipeline().get_result_table())
    assert_tables_equal(out.rows(), expected, ordered=False, rel_tol=1e-3,
                        abs_tol=1e-4)
