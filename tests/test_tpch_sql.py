"""TPC-H through the FULL SQL front end (parse -> LQP -> optimize ->
physical) vs the sqlite oracle — the reference's sqlite_testrunner pattern
applied to the TPC-H texts. All 22 queries pass (Q21's multi-EXISTS
correlation is decorrelated to semi/anti joins with residual predicates).
"""

import pytest

from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.tpch.dbgen import generate_tables
from hyrise_tpu.tpch.queries import TPCH_SQL
from hyrise_tpu.utils.sqlite_oracle import SqliteOracle
from hyrise_tpu.utils.table_eq import assert_tables_equal

SF = 0.01

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
        "CREATE INDEX idx_o_ck ON orders(o_custkey)",
        "CREATE INDEX idx_ps_pk ON partsupp(ps_partkey)",
    ]:
        oracle.conn.execute(ddl)
    _state[sf] = (cat, oracle)
    return cat, oracle


QUERY_SF = {20: 0.05}


@pytest.mark.parametrize("qid", sorted(TPCH_SQL))
def test_tpch_via_sql(qid):
    cat, oracle = _setup(QUERY_SF.get(qid, SF))
    sql = TPCH_SQL[qid]
    expected = oracle.query(sql)
    out = (SQLPipelineBuilder(sql).with_catalog(cat)
           .dont_cache_query_plans().create_pipeline().get_result_table())
    assert_tables_equal(out.rows(), expected, ordered=False, rel_tol=1e-3,
                        abs_tol=1e-4)
