"""SQL front-end tests: parser, translator, pipeline vs pandas/sqlite."""

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.sql.parser import parse_sql, SQLParseError
from hyrise_tpu.sql.pipeline import run_sql
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.table import Table
from hyrise_tpu.utils.table_eq import assert_tables_equal


@pytest.fixture
def cat():
    c = Catalog()
    c.add_table("t", Table.from_pandas("t", pd.DataFrame({
        "a": np.array([1, 2, 3, 4], dtype=np.int32),
        "b": np.array([10.0, 20.0, 30.0, 40.0], dtype=np.float32),
        "s": np.array(["x", "y", "x", "z"], dtype=object),
    })))
    c.add_table("u", Table.from_pandas("u", pd.DataFrame({
        "k": np.array([1, 2, 2, 5], dtype=np.int32),
        "v": np.array(["p", "q", "r", "s"], dtype=object),
    })))
    return c


def test_parser_basics():
    stmts = parse_sql("SELECT a, b AS x FROM t WHERE a > 1 ORDER BY a DESC;")
    assert len(stmts) == 1
    s = stmts[0]
    assert s.select[0][0] is None and s.select[1][0] == "x"
    assert s.orderby[0][1] == "desc"


def test_parser_error():
    with pytest.raises(SQLParseError):
        parse_sql("SELEC a FROM t")


def test_simple_select(cat):
    out = run_sql("SELECT a, b FROM t WHERE a >= 2", cat)
    assert_tables_equal(out.rows(), [(2, 20.0), (3, 30.0), (4, 40.0)],
                        ordered=False)


def test_select_star(cat):
    out = run_sql("SELECT * FROM t", cat)
    assert out.column_names == ["a", "b", "s"]
    assert out.num_rows == 4


def test_expressions(cat):
    out = run_sql("SELECT a + 1 AS a1, b * 2 AS b2 FROM t WHERE a = 1", cat)
    assert out.rows() == [(2, 20.0)]


def test_order_limit(cat):
    out = run_sql("SELECT a FROM t ORDER BY a DESC LIMIT 2", cat)
    assert [r[0] for r in out.rows()] == [4, 3]


def test_string_ops(cat):
    out = run_sql("SELECT a FROM t WHERE s = 'x'", cat)
    assert sorted(r[0] for r in out.rows()) == [1, 3]
    out = run_sql("SELECT a FROM t WHERE s LIKE '%x%'", cat)
    assert sorted(r[0] for r in out.rows()) == [1, 3]
    out = run_sql("SELECT a FROM t WHERE s IN ('x', 'z')", cat)
    assert sorted(r[0] for r in out.rows()) == [1, 3, 4]


def test_aggregate(cat):
    out = run_sql("SELECT s, SUM(a) AS sa, COUNT(*) AS c FROM t GROUP BY s "
                  "ORDER BY s", cat)
    assert out.rows() == [("x", 4, 2), ("y", 2, 1), ("z", 4, 1)]


def test_aggregate_no_groupby(cat):
    out = run_sql("SELECT SUM(a), AVG(b), MIN(a), MAX(a), COUNT(*) FROM t", cat)
    r = out.rows()[0]
    assert r[0] == 10 and abs(r[1] - 25.0) < 1e-6 and r[2] == 1 \
        and r[3] == 4 and r[4] == 4


def test_having(cat):
    out = run_sql("SELECT s, COUNT(*) AS c FROM t GROUP BY s HAVING "
                  "COUNT(*) > 1", cat)
    assert out.rows() == [("x", 2)]


def test_distinct(cat):
    out = run_sql("SELECT DISTINCT s FROM t", cat)
    assert sorted(r[0] for r in out.rows()) == ["x", "y", "z"]


def test_join_implicit(cat):
    out = run_sql("SELECT a, v FROM t, u WHERE a = k ORDER BY a, v", cat)
    assert out.rows() == [(1, "p"), (2, "q"), (2, "r")]


def test_join_explicit(cat):
    out = run_sql("SELECT a, v FROM t JOIN u ON a = k ORDER BY a, v", cat)
    assert out.rows() == [(1, "p"), (2, "q"), (2, "r")]


def test_left_join(cat):
    out = run_sql("SELECT a, v FROM t LEFT JOIN u ON a = k ORDER BY a", cat)
    assert len(out.rows()) == 5  # a=2 matches twice; 3,4 null-padded
    nulls = [r for r in out.rows() if r[1] is None]
    assert {r[0] for r in nulls} == {3, 4}


def test_self_join_aliases(cat):
    out = run_sql("SELECT t1.a, t2.a FROM t t1, t t2 "
                  "WHERE t1.a = t2.a AND t1.a < 2", cat)
    assert out.rows() == [(1, 1)]


def test_subquery_in_from(cat):
    out = run_sql("SELECT x FROM (SELECT a + 1 AS x FROM t) sub "
                  "WHERE x > 3 ORDER BY x", cat)
    assert [r[0] for r in out.rows()] == [4, 5]


def test_in_subquery(cat):
    out = run_sql("SELECT a FROM t WHERE a IN (SELECT k FROM u) ORDER BY a",
                  cat)
    assert [r[0] for r in out.rows()] == [1, 2]
    out = run_sql("SELECT a FROM t WHERE a NOT IN (SELECT k FROM u) "
                  "ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [3, 4]


def test_exists_subquery(cat):
    out = run_sql("SELECT a FROM t WHERE EXISTS "
                  "(SELECT * FROM u WHERE k = a) ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [1, 2]
    out = run_sql("SELECT a FROM t WHERE NOT EXISTS "
                  "(SELECT * FROM u WHERE k = a) ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [3, 4]


def test_scalar_subquery(cat):
    out = run_sql("SELECT a FROM t WHERE b > (SELECT AVG(b) FROM t) "
                  "ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [3, 4]


def test_correlated_scalar_aggregate(cat):
    # each row of t vs per-key max of u... use t/u: for a in u.k
    out = run_sql(
        "SELECT a FROM t WHERE a < (SELECT COUNT(*) + 1 FROM u WHERE k = a) "
        "ORDER BY a", cat)
    # a=1: count=1 -> 1 < 2 yes; a=2: count=2 -> 2<3 yes; a=3: no match rows
    assert [r[0] for r in out.rows()] == [1, 2]


def test_case_expression(cat):
    out = run_sql("SELECT a, CASE WHEN a > 2 THEN 1 ELSE 0 END AS big "
                  "FROM t ORDER BY a", cat)
    assert [r[1] for r in out.rows()] == [0, 0, 1, 1]


def test_between_and_arithmetic(cat):
    out = run_sql("SELECT a FROM t WHERE a BETWEEN 2 AND 3 ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [2, 3]


def test_union_via_or(cat):
    out = run_sql("SELECT a FROM t WHERE a = 1 OR a = 4 ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [1, 4]


def test_views(cat):
    run_sql("CREATE VIEW big AS SELECT a, b FROM t WHERE a > 2", cat)
    out = run_sql("SELECT a FROM big ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [3, 4]
    run_sql("DROP VIEW big", cat)
    assert not cat.has_view("big")


def test_create_insert_select_drop_table(cat):
    run_sql("CREATE TABLE nt (x int, y string)", cat)
    run_sql("INSERT INTO nt VALUES (1, 'one'), (2, 'two')", cat)
    out = run_sql("SELECT x, y FROM nt ORDER BY x", cat, use_mvcc=True)
    assert out.rows() == [(1, "one"), (2, "two")]
    run_sql("DROP TABLE nt", cat)
    assert not cat.has_table("nt")


def test_show_tables(cat):
    out = run_sql("SHOW TABLES", cat)
    assert sorted(r[0] for r in out.rows()) == ["t", "u"]


def test_prepared_statements(cat):
    run_sql("PREPARE p1 FROM 'SELECT a FROM t WHERE a > ?'", cat)
    out = run_sql("EXECUTE p1 (2)", cat)
    assert sorted(r[0] for r in out.rows()) == [3, 4]
    out = run_sql("EXECUTE p1 (3)", cat)
    assert sorted(r[0] for r in out.rows()) == [4]


def test_groupby_expression(cat):
    out = run_sql("SELECT SUBSTR(s, 1, 1) AS c, COUNT(*) AS n FROM t "
                  "GROUP BY SUBSTR(s, 1, 1) ORDER BY c", cat)
    assert out.rows() == [("x", 2), ("y", 1), ("z", 1)]


def test_quantified_comparisons(cat):
    """ALL/ANY/SOME subquery comparisons (parser rewrite to EXISTS /
    NOT EXISTS; sqlite cannot oracle these, so expectations are explicit).
    t.a = [1,2,3,4]; u.k = [1,2,2,5]."""
    out = run_sql("SELECT a FROM t WHERE a > ALL (SELECT k FROM u WHERE "
                  "k < 3) ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [3, 4]
    # vacuous truth on an empty set
    out = run_sql("SELECT a FROM t WHERE a > ALL (SELECT k FROM u WHERE "
                  "k > 100) ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [1, 2, 3, 4]
    out = run_sql("SELECT a FROM t WHERE a = ANY (SELECT k FROM u) "
                  "ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [1, 2]
    out = run_sql("SELECT a FROM t WHERE a >= SOME (SELECT k FROM u WHERE "
                  "k = 5) ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == []
    out = run_sql("SELECT a FROM t WHERE a <> ALL (SELECT k FROM u) "
                  "ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [3, 4]


def test_not_in_null_semantics(cat):
    """NOT IN against a subquery whose result (or probe key) is NULL —
    JoinMode::AntiNullAsTrue parity (reference types.hpp)."""
    nn = pd.DataFrame({
        "i": pd.array([1, None, 3, None, 8], dtype="Int32"),
        "g": np.array([1, 2, 3, 4, 5], dtype=np.int32)})
    cat.add_table("nn", Table.from_pandas("nn", nn))
    # NULL probe keys are rejected when the build set is non-empty
    out = run_sql("SELECT g FROM nn WHERE i NOT IN (SELECT k FROM u WHERE "
                  "k < 3) ORDER BY g", cat)
    assert [r[0] for r in out.rows()] == [3, 5]
    # ... but NOT IN an EMPTY set is vacuously TRUE even for NULL probes
    out = run_sql("SELECT g FROM nn WHERE i NOT IN (SELECT k FROM u WHERE "
                  "k > 100) ORDER BY g", cat)
    assert [r[0] for r in out.rows()] == [1, 2, 3, 4, 5]
    # a NULL in the build set poisons every row
    out = run_sql("SELECT a FROM t WHERE a NOT IN (SELECT i FROM nn) "
                  "ORDER BY a", cat)
    assert out.rows() == []
    # NOT EXISTS keeps plain ANTI semantics (NULL build keys ignored)
    out = run_sql("SELECT a FROM t WHERE NOT EXISTS (SELECT 1 FROM nn "
                  "WHERE nn.i = t.a) ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [2, 4]
