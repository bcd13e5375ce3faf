"""MVCC / transaction tests.

Mirrors the reference's validate_visibility_test.cpp truth table,
transaction_context_test.cpp, and operators/{insert,delete,update}_test.cpp.
"""

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.concurrency.transaction import (MAX_COMMIT_ID, MvccData,
                                                TransactionConflict,
                                                TransactionManager,
                                                TransactionPhase)
from hyrise_tpu.expression.ast import col, lit
from hyrise_tpu.ops import TableWrapper, execute_plan
from hyrise_tpu.ops.get_table import GetTable
from hyrise_tpu.ops.rw_ops import (AddRowIds, Delete, Insert, Update,
                                   Validate, with_row_ids)
from hyrise_tpu.ops.table_scan import TableScan
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.table import Table


def make_mvcc_table(cat, name="t", values=(1, 2, 3)):
    df = pd.DataFrame({"a": np.array(values, dtype=np.int32)})
    t = Table.from_pandas(name, df)
    t.mvcc = MvccData.for_new_table(t.num_rows, t.capacity)
    cat.add_table(name, t)
    return t


def run(plan, ctx):
    seen = set()

    def walk(op):
        if id(op) in seen:
            return
        seen.add(id(op))
        for i in op.inputs:
            walk(i)
        op.execute(ctx)

    walk(plan)
    return plan.get_output()


def test_validate_sees_committed_rows():
    cat = Catalog()
    make_mvcc_table(cat)
    tm = TransactionManager()
    ctx = tm.new_transaction_context()
    out = run(Validate(GetTable("t", cat)), ctx)
    assert out.num_rows == 3


def test_insert_visibility_and_commit():
    cat = Catalog()
    make_mvcc_table(cat)
    tm = TransactionManager()

    ctx = tm.new_transaction_context()
    vals = Table.from_pandas("v", pd.DataFrame({
        "a": np.array([7, 8], dtype=np.int32)}))
    ins = Insert("t", TableWrapper(vals), cat)
    run(ins, ctx)

    # own transaction sees its insert
    own = run(Validate(GetTable("t", cat)), ctx)
    assert own.num_rows == 5

    # a concurrent transaction does not
    other = tm.new_transaction_context()
    vis = run(Validate(GetTable("t", cat)), other)
    assert vis.num_rows == 3

    ctx.commit()
    assert ctx.phase is TransactionPhase.COMMITTED

    # post-commit snapshot sees it
    later = tm.new_transaction_context()
    vis = run(Validate(GetTable("t", cat)), later)
    assert vis.num_rows == 5
    # old snapshot still does not
    vis = run(Validate(GetTable("t", cat)), other)
    assert vis.num_rows == 3


def test_insert_rollback():
    cat = Catalog()
    make_mvcc_table(cat)
    tm = TransactionManager()
    ctx = tm.new_transaction_context()
    vals = Table.from_pandas("v", pd.DataFrame({
        "a": np.array([7], dtype=np.int32)}))
    run(Insert("t", TableWrapper(vals), cat), ctx)
    ctx.rollback()
    assert ctx.phase is TransactionPhase.ROLLED_BACK
    later = tm.new_transaction_context()
    vis = run(Validate(GetTable("t", cat)), later)
    assert vis.num_rows == 3


def test_delete_and_visibility():
    cat = Catalog()
    make_mvcc_table(cat)
    tm = TransactionManager()
    ctx = tm.new_transaction_context()
    rows = TableScan(Validate(AddRowIds(GetTable("t", cat))),
                     col("a") == lit(2))
    run(Delete("t", rows, cat), ctx)
    ctx.commit()

    later = tm.new_transaction_context()
    vis = run(Validate(GetTable("t", cat)), later)
    assert sorted(r[0] for r in vis.rows()) == [1, 3]


def test_delete_conflict():
    cat = Catalog()
    make_mvcc_table(cat)
    tm = TransactionManager()
    c1 = tm.new_transaction_context()
    c2 = tm.new_transaction_context()
    rows1 = TableScan(Validate(AddRowIds(GetTable("t", cat))),
                      col("a") == lit(2))
    run(Delete("t", rows1, cat), c1)
    rows2 = TableScan(Validate(AddRowIds(GetTable("t", cat))),
                      col("a") == lit(2))
    with pytest.raises(TransactionConflict):
        run(Delete("t", rows2, cat), c2)
    assert c2.phase is TransactionPhase.ABORTED
    c2.rollback()
    c1.commit()


def test_update():
    cat = Catalog()
    make_mvcc_table(cat)
    tm = TransactionManager()
    ctx = tm.new_transaction_context()
    rows = TableScan(Validate(AddRowIds(GetTable("t", cat))),
                     col("a") == lit(3))
    new_vals = Table.from_pandas("v", pd.DataFrame({
        "a": np.array([30], dtype=np.int32)}))
    run(Update("t", rows, TableWrapper(new_vals), cat), ctx)
    ctx.commit()
    later = tm.new_transaction_context()
    vis = run(Validate(GetTable("t", cat)), later)
    assert sorted(r[0] for r in vis.rows()) == [1, 2, 30]


def test_visibility_truth_table():
    """Reference: validate_visibility_test.cpp — direct formula checks."""
    from hyrise_tpu.ops.rw_ops import Validate as V  # noqa: F401
    import jax.numpy as jnp

    def visible(tid, begin, end, our_tid, snapshot):
        snapshot = np.int64(snapshot)
        return bool((snapshot < end)
                    & ((snapshot >= begin) != (tid == our_tid)))

    M = int(MAX_COMMIT_ID)
    # committed row, visible
    assert visible(0, 1, M, our_tid=5, snapshot=3)
    # not yet committed insert by other tx
    assert not visible(7, M, M, our_tid=5, snapshot=3)
    # own uncommitted insert is visible
    assert visible(5, M, M, our_tid=5, snapshot=3)
    # deleted at cid 2, snapshot 3 -> invisible
    assert not visible(0, 1, 2, our_tid=5, snapshot=3)
    # deleted at cid 4, snapshot 3 -> still visible
    assert visible(0, 1, 4, our_tid=5, snapshot=3)


def test_capacity_growth_preserves_pending_delete():
    """A Delete pending while an Insert grows the table past its capacity
    bucket must still commit into the LIVE mvcc arrays (grow is in-place on
    the shared MvccData; a copy would orphan the delete -> lost delete)."""
    cat = Catalog()
    # fill to exactly the minimum capacity bucket so any insert grows
    from hyrise_tpu.types import bucket_capacity
    n = bucket_capacity(1)  # 1024
    make_mvcc_table(cat, values=tuple(range(n)))
    tm = TransactionManager()

    ctx = tm.new_transaction_context()
    # delete rows a < 2 (rows 0 and 1) -- NOT yet committed
    rows = TableScan(Validate(AddRowIds(GetTable("t", cat))),
                     col("a") < lit(2))
    d = Delete("t", rows, cat)
    run(d, ctx)
    # now insert past capacity in the same transaction: table grows
    vals = Table.from_pandas("v", pd.DataFrame(
        {"a": np.array([777], dtype=np.int32)}))
    ins = Insert("t", TableWrapper(vals), cat)
    run(ins, ctx)
    assert cat.get_table("t").capacity > n
    ctx.commit()

    ctx2 = tm.new_transaction_context()
    out = run(Validate(GetTable("t", cat)), ctx2)
    vals_out = sorted(np.asarray(out.column("a").decode(out.num_rows)))
    assert len(vals_out) == n - 2 + 1          # delete survived the growth
    assert 0 not in vals_out and 1 not in vals_out
    assert 777 in vals_out                     # insert visible


def test_commit_publication_is_in_order():
    """last_commit_id must not advance past a still-pending lower cid
    (snapshot isolation: T2's publish cannot expose mid-commit T1)."""
    tm = TransactionManager()
    t1 = tm.new_transaction_context()
    t2 = tm.new_transaction_context()
    cid1 = tm._next_commit_id_locked()
    cid2 = tm._next_commit_id_locked()
    assert int(cid1) == 1 and int(cid2) == 2
    tm._publish_commit_id(cid2)     # T2 finishes first
    assert tm.last_commit_id == 0   # held back: cid1 still writing
    tm._publish_commit_id(cid1)
    assert tm.last_commit_id == 2   # contiguous prefix released
    del t1, t2
