"""SQL DML through the full pipeline (INSERT/UPDATE/DELETE with MVCC +
auto-commit), mirroring the reference's sql + rw-operator integration."""

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.concurrency.transaction import (MvccData,
                                                reset_default_transaction_manager)
from hyrise_tpu.sql.pipeline import run_sql
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.table import Table


@pytest.fixture
def cat():
    reset_default_transaction_manager()
    c = Catalog()
    t = Table.from_pandas("t", pd.DataFrame({
        "a": np.array([1, 2, 3], dtype=np.int32),
        "s": np.array(["x", "y", "z"], dtype=object),
    }))
    t.mvcc = MvccData.for_new_table(t.num_rows, t.capacity)
    c.add_table("t", t)
    return c


def q(sql, cat):
    return run_sql(sql, cat, use_mvcc=True)


def test_insert_values(cat):
    q("INSERT INTO t VALUES (4, 'w'), (5, 'v')", cat)
    out = q("SELECT a FROM t ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [1, 2, 3, 4, 5]


def test_insert_select(cat):
    q("INSERT INTO t SELECT a + 10, s FROM t WHERE a <= 2", cat)
    out = q("SELECT a FROM t ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [1, 2, 3, 11, 12]


def test_delete(cat):
    q("DELETE FROM t WHERE a = 2", cat)
    out = q("SELECT a FROM t ORDER BY a", cat)
    assert [r[0] for r in out.rows()] == [1, 3]


def test_delete_all(cat):
    q("DELETE FROM t", cat)
    out = q("SELECT COUNT(*) FROM t", cat)
    assert out.rows()[0][0] == 0


def test_update(cat):
    q("UPDATE t SET a = a + 100 WHERE s = 'y'", cat)
    out = q("SELECT a, s FROM t ORDER BY a", cat)
    assert out.rows() == [(1, "x"), (3, "z"), (102, "y")]


def test_update_string_column(cat):
    q("UPDATE t SET s = 'updated' WHERE a = 1", cat)
    out = q("SELECT s FROM t WHERE a = 1", cat)
    assert out.rows() == [("updated",)]


def test_insert_column_subset(cat):
    q("INSERT INTO t (a) VALUES (9)", cat)
    out = q("SELECT a, s FROM t WHERE a = 9", cat)
    assert out.rows()[0][0] == 9
    assert out.rows()[0][1] is None  # unfilled column is NULL


def test_dml_invisible_to_old_snapshot(cat):
    from hyrise_tpu.concurrency.transaction import default_transaction_manager
    tm = default_transaction_manager()
    old = tm.new_transaction_context()
    q("INSERT INTO t VALUES (7, 'q')", cat)
    new_out = q("SELECT COUNT(*) FROM t", cat)
    assert new_out.rows()[0][0] == 4
    old_out = run_sql("SELECT COUNT(*) FROM t", cat, context=old,
                      use_mvcc=True)
    assert old_out.rows()[0][0] == 3
