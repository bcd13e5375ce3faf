"""TPC-H correctness: all 22 queries vs the sqlite oracle on identical
generated data — the reference's own test strategy
(src/test/tpc/tpch_test.cpp: dbgen data into both engines, compare with
relative float tolerance, unordered)."""

import pytest

from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.tpch.dbgen import generate_tables
from hyrise_tpu.tpch.queries import TPCH_PLANS, TPCH_SQL
from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.utils.sqlite_oracle import SqliteOracle
from hyrise_tpu.utils.table_eq import assert_tables_equal

SF = 0.01

# per-query scale overrides so every query returns rows (the reference tunes
# SF 0.004-0.02 per query for the same reason, tpch_test.cpp:40-43)
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
    # indexes keep correlated-subquery oracle queries fast
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
def test_tpch_query(qid):
    cat, oracle = _setup(QUERY_SF.get(qid, SF))
    expected = oracle.query(TPCH_SQL[qid])
    plan = TPCH_PLANS[qid](cat)
    out = execute_plan(plan)
    actual = out.rows()
    # sanity: the query should produce rows on this data (like the
    # reference's scale-factor tuning, tpch_test.cpp:40-43)
    if qid not in (2,):  # Q2's double-equality on price can legitimately be empty at tiny SF
        assert len(expected) > 0, f"oracle returned no rows for Q{qid}"
    assert_tables_equal(actual, expected, ordered=False, rel_tol=1e-3,
                        abs_tol=1e-4)
