"""Read-write operators + MVCC Validate.

Reference:
- Validate (operators/validate.cpp:16-29): row visible iff
  snapshot_cid < end_cid && ((snapshot_cid >= begin_cid) != (row_tid == our_tid))
  — evaluated here as one vectorized boolean mask over the three MVCC arrays.
- Insert (operators/insert.cpp): appends rows under a mutex, marks them with
  the inserting tid; commit sets begin_cids.
- Delete (operators/delete.cpp): CAS-locks rows via tids (:47), commit sets
  end_cids (:68), rollback resets tids (:92).
- Update (operators/update.cpp): Delete + Insert composition.

Storage difference vs the reference: our device tables are immutable arrays,
so Insert performs copy-on-write growth of the table (bucketed capacities
amortize re-uploads); Delete/commit only touch host-side MVCC numpy arrays.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from hyrise_tpu.concurrency.transaction import (MAX_COMMIT_ID, MvccData,
                                                TransactionConflict)
from hyrise_tpu.ops.base import AbstractOperator
from hyrise_tpu.ops.materialize import filter_table
from hyrise_tpu.storage.catalog import Catalog, default_catalog
from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, bucket_capacity


class Validate(AbstractOperator):
    name = "Validate"

    def _on_execute(self, context) -> Table:
        assert context is not None, "Validate requires a transaction context"
        table = self.input_table(0)
        mvcc: Optional[MvccData] = getattr(table, "mvcc", None)
        if mvcc is None:
            return table  # non-MVCC table: everything visible
        cap = table.capacity
        tids = jnp.asarray(mvcc.tids[:cap])
        begin = jnp.asarray(mvcc.begin_cids[:cap])
        end = jnp.asarray(mvcc.end_cids[:cap])
        snapshot = jnp.int64(context.snapshot_commit_id)
        our_tid = jnp.int64(context.transaction_id)
        visible = (snapshot < end) & ((snapshot >= begin) != (tids == our_tid))
        from hyrise_tpu.ops.materialize import ensure_prefix
        # RW operators address rows positionally via [:num_rows] reads, so
        # Validate always hands them a prefix-layout table
        return ensure_prefix(filter_table(table, visible))


class AbstractReadWriteOperator(AbstractOperator):
    """Reference: abstract_read_write_operator.hpp — adds commit/rollback
    hooks and a failure flag; registers itself with the transaction."""

    def __init__(self, *inputs):
        super().__init__(*inputs)
        self.failed = False

    def execute(self, context=None) -> Table:
        assert context is not None, f"{self.name} requires a transaction context"
        context.register_operator(self)
        return super().execute(context)

    def commit_records(self, commit_id) -> None:
        raise NotImplementedError

    def rollback_records(self) -> None:
        raise NotImplementedError


def _append_rows(target: Table, values: Table, catalog: Catalog) -> Table:
    """Copy-on-write append; returns the (possibly new) target table."""
    n_old, n_new = target.num_rows, values.num_rows
    need = n_old + n_new
    mvcc: MvccData = target.mvcc
    if need > target.capacity:
        new_cap = bucket_capacity(need)
        cols = []
        for c in target.columns:
            data = np.zeros(new_cap, dtype=np.asarray(c.data).dtype)
            data[:target.capacity] = np.asarray(c.data)
            v = None
            if c.validity is not None:
                vv = np.zeros(new_cap, dtype=bool)
                vv[:target.capacity] = np.asarray(c.validity)
                v = jnp.asarray(vv)
            cols.append(Column(c.name, c.dtype, jnp.asarray(data), v,
                               c.dictionary))
        new_table = Table(cols, n_old, name=target.name)
        new_table.mvcc = mvcc.grow(new_cap)
        if getattr(target, "encoding_spec", None) is not None:
            new_table.encoding_spec = target.encoding_spec
        target = new_table
        mvcc = target.mvcc

    # write the new rows (host roundtrip; OLTP ingest path).
    # Columns map POSITIONALLY, like the reference's Insert (insert.cpp):
    # INSERT ... SELECT provides expression columns with arbitrary names.
    assert len(values.columns) == len(target.columns), \
        "INSERT values must cover all target columns"
    cols = []
    for ci, c in enumerate(target.columns):
        data = np.asarray(c.data).copy()
        vc = values.columns[ci]
        if c.dtype is DataType.STRING:
            # re-encode against (possibly extended) dictionary
            vals = vc.decode(n_new)
            merged = np.unique(np.concatenate([c.dictionary,
                                               vals[vals != None]. astype(str)]))  # noqa: E711
            if len(c.dictionary) and (len(merged) != len(c.dictionary)
                                      or not np.array_equal(merged,
                                                            c.dictionary)):
                remap = np.searchsorted(merged, c.dictionary)
                data = remap[np.clip(data, 0, len(c.dictionary) - 1)] \
                    .astype(np.int32)
            codes = np.searchsorted(merged,
                                    np.array([v if v is not None else merged[0]
                                              for v in vals], dtype=str))
            data[n_old:n_old + n_new] = codes
            dictionary = merged
        else:
            data[n_old:n_old + n_new] = np.asarray(vc.data[:n_new]).astype(
                data.dtype)
            dictionary = None
        v = c.validity
        if vc.validity is not None or v is not None:
            vv = (np.asarray(v).copy() if v is not None
                  else np.ones(target.capacity, dtype=bool))
            vv[n_old:n_old + n_new] = (np.asarray(vc.validity[:n_new])
                                       if vc.validity is not None else True)
            v = jnp.asarray(vv)
        cols.append(Column(c.name, c.dtype, jnp.asarray(data), v, dictionary))
    out = Table(cols, need, name=target.name)
    out.mvcc = mvcc
    if getattr(target, "encoding_spec", None) is not None:
        out.encoding_spec = target.encoding_spec
    catalog.replace_table(target.name, out)
    return out


class Insert(AbstractReadWriteOperator):
    name = "Insert"

    def __init__(self, table_name: str, values_op: AbstractOperator,
                 catalog: Optional[Catalog] = None):
        super().__init__(values_op)
        self.table_name = table_name
        self.catalog = catalog
        self._rows: Optional[np.ndarray] = None
        self._mvcc: Optional[MvccData] = None

    def _on_execute(self, context) -> Table:
        cat = self.catalog if self.catalog is not None else default_catalog()
        from hyrise_tpu.ops.materialize import ensure_prefix
        values = ensure_prefix(self.input_table(0))
        target = cat.get_table(self.table_name)
        assert getattr(target, "mvcc", None) is not None, \
            "Insert requires an MVCC table"
        n_old = target.num_rows
        target = _append_rows(target, values, cat)
        rows = np.arange(n_old, n_old + values.num_rows)
        mvcc = target.mvcc
        mvcc.tids[rows] = context.transaction_id
        mvcc.begin_cids[rows] = MAX_COMMIT_ID
        mvcc.end_cids[rows] = MAX_COMMIT_ID
        self._rows, self._mvcc = rows, mvcc
        return target

    def commit_records(self, commit_id) -> None:
        self._mvcc.begin_cids[self._rows] = commit_id
        self._mvcc.tids[self._rows] = 0

    def rollback_records(self) -> None:
        if self._mvcc is None:
            return
        self._mvcc.begin_cids[self._rows] = MAX_COMMIT_ID
        self._mvcc.end_cids[self._rows] = 0  # permanently invisible
        self._mvcc.tids[self._rows] = 0


class Delete(AbstractReadWriteOperator):
    """Input must be a Validate(+scans) result over the target table that
    preserves a `row_id` column produced by with_row_ids()."""

    name = "Delete"

    def __init__(self, table_name: str, rows_op: AbstractOperator,
                 catalog: Optional[Catalog] = None):
        super().__init__(rows_op)
        self.table_name = table_name
        self.catalog = catalog
        self._rows: Optional[np.ndarray] = None
        self._mvcc: Optional[MvccData] = None

    def _on_execute(self, context) -> Table:
        cat = self.catalog if self.catalog is not None else default_catalog()
        target = cat.get_table(self.table_name)
        mvcc: MvccData = target.mvcc
        rows_t = self.input_table(0)
        # mask-aware read: the selection may be in masked layout (fast path)
        rows = np.asarray(rows_t._decode_col(rows_t.column("row_id")))
        # lock rows: CAS tids 0 -> our tid (single host thread: check+set)
        tid = int(context.transaction_id)
        current = mvcc.tids[rows]
        if np.any((current != 0) & (current != tid)):
            self.failed = True
            context.mark_aborted()
            raise TransactionConflict(
                f"rows locked by another transaction in {self.table_name}")
        mvcc.tids[rows] = tid
        self._rows, self._mvcc = rows, mvcc
        return rows_t

    def commit_records(self, commit_id) -> None:
        self._mvcc.end_cids[self._rows] = commit_id
        # keep tid set: visibility flips via end_cid (matches delete.cpp:68)

    def rollback_records(self) -> None:
        if self._mvcc is None:
            return
        self._mvcc.tids[self._rows] = 0


class Update(AbstractReadWriteOperator):
    """Reference update.cpp: Delete + Insert composition."""

    name = "Update"

    def __init__(self, table_name: str, rows_op: AbstractOperator,
                 values_op: AbstractOperator,
                 catalog: Optional[Catalog] = None):
        super().__init__(rows_op, values_op)
        self.table_name = table_name
        self.catalog = catalog
        self._delete: Optional[Delete] = None
        self._insert: Optional[Insert] = None

    def _on_execute(self, context) -> Table:
        self._delete = Delete(self.table_name, self.inputs[0], self.catalog)
        self._insert = Insert(self.table_name, self.inputs[1], self.catalog)
        self._delete.execute(context)
        self._insert.execute(context)
        return self._insert.get_output()

    def commit_records(self, commit_id) -> None:
        pass  # delegated: Delete/Insert registered themselves

    def rollback_records(self) -> None:
        pass


class AddRowIds(AbstractOperator):
    """Operator form of with_row_ids for use inside plans."""

    name = "AddRowIds"

    def _on_execute(self, context) -> Table:
        return with_row_ids(self.input_table(0))


def with_row_ids(table: Table) -> Table:
    """Attach a row_id column (flat index) — the PosList handle RW operators
    need to address rows of the stored table."""
    ids = Column("row_id", DataType.INT32,
                 jnp.arange(table.capacity, dtype=jnp.int32), None, None)
    out = Table(list(table.columns) + [ids], table.num_rows, name=table.name,
                live=table.live)
    out.mvcc = getattr(table, "mvcc", None)
    return out
