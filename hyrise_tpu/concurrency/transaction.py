"""Transactions and MVCC bookkeeping.

Reference: src/lib/concurrency/ —
- TransactionManager (transaction_manager.hpp:48-85): atomic transaction-id /
  commit-id counters, hands out contexts, commit-context chain guaranteeing
  in-order commit-id publication.
- TransactionContext (transaction_context.hpp:37-120): tid + snapshot_cid,
  phase machine Active -> Committing -> Committed / Aborted -> RolledBack,
  registers read-write operators whose commit_records/rollback_records are
  invoked on commit/rollback.

Host-side Python with a lock replaces C++ atomics (OLTP mutation is a
host-path concern; the TPU data plane sees MVCC as three int64 arrays per
table consumed by the vectorized Validate operator, ops/validate.py).

MVCC row metadata (reference: storage/mvcc_columns.hpp:15-46) lives in
mutable numpy arrays on the host (`MvccData`); Validate uploads them to the
device when filtering.
"""

from __future__ import annotations

import dataclasses
import enum
import threading
from typing import List, Optional

import numpy as np

MAX_COMMIT_ID = np.int64(2**62)
INVALID_TID = np.int64(0)


@dataclasses.dataclass
class MvccData:
    """Per-table MVCC arrays (host-resident, mutable).

    tids:       locking/creating transaction id per row (0 = unlocked)
    begin_cids: commit id from which the row is visible
    end_cids:   commit id from which the row is deleted
    """

    tids: np.ndarray
    begin_cids: np.ndarray
    end_cids: np.ndarray

    @staticmethod
    def for_new_table(num_rows: int, capacity: int) -> "MvccData":
        tids = np.zeros(capacity, dtype=np.int64)
        begin = np.full(capacity, MAX_COMMIT_ID, dtype=np.int64)
        begin[:num_rows] = 0  # pre-loaded rows visible from cid 0
        end = np.full(capacity, MAX_COMMIT_ID, dtype=np.int64)
        return MvccData(tids, begin, end)

    def grow(self, new_capacity: int) -> "MvccData":
        """Grow IN PLACE (mutating the shared object) and return self.

        Pending read-write operators hold references to this MvccData; if
        growth returned a fresh object their commit_records would write into
        orphaned arrays (lost deletes / permanently-invisible inserts). The
        reference has no such hazard because its MvccColumns vectors are
        grown in place under the append mutex (chunk.hpp / insert.cpp).
        """
        def _grow(a, fill):
            out = np.full(new_capacity, fill, dtype=np.int64)
            out[:len(a)] = a
            return out
        self.tids = _grow(self.tids, 0)
        self.begin_cids = _grow(self.begin_cids, MAX_COMMIT_ID)
        self.end_cids = _grow(self.end_cids, MAX_COMMIT_ID)
        return self


class TransactionPhase(enum.Enum):
    ACTIVE = "active"
    COMMITTING = "committing"
    COMMITTED = "committed"
    ABORTED = "aborted"
    ROLLED_BACK = "rolled_back"


class TransactionConflict(Exception):
    pass


class TransactionContext:
    def __init__(self, manager: "TransactionManager", tid: int,
                 snapshot_cid: int):
        self.manager = manager
        self.transaction_id = np.int64(tid)
        self.snapshot_commit_id = np.int64(snapshot_cid)
        self.phase = TransactionPhase.ACTIVE
        self.rw_operators: List[object] = []  # AbstractReadWriteOperator-like
        self.commit_id: Optional[np.int64] = None

    def register_operator(self, op) -> None:
        self.rw_operators.append(op)

    def rollback(self) -> None:
        assert self.phase in (TransactionPhase.ACTIVE, TransactionPhase.ABORTED)
        for op in self.rw_operators:
            op.rollback_records()
        self.phase = TransactionPhase.ROLLED_BACK

    def mark_aborted(self) -> None:
        self.phase = TransactionPhase.ABORTED

    def commit(self) -> None:
        assert self.phase is TransactionPhase.ACTIVE, \
            f"cannot commit from phase {self.phase}"
        self.phase = TransactionPhase.COMMITTING
        cid = self.manager._next_commit_id_locked()
        self.commit_id = cid
        for op in self.rw_operators:
            op.commit_records(cid)
        self.manager._publish_commit_id(cid)
        self.phase = TransactionPhase.COMMITTED


class TransactionManager:
    """In-order commit publication via a lock-held id chain (the reference's
    CommitContext linked list collapses to a mutex in host Python)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._next_tid = 1
        self._last_commit_id = 0
        self._next_cid = 1
        self._published: set = set()

    @property
    def last_commit_id(self) -> int:
        return self._last_commit_id

    def new_transaction_context(self) -> TransactionContext:
        with self._lock:
            tid = self._next_tid
            self._next_tid += 1
            return TransactionContext(self, tid, self._last_commit_id)

    def _next_commit_id_locked(self) -> np.int64:
        with self._lock:
            cid = np.int64(self._next_cid)
            self._next_cid += 1
            return cid

    def _publish_commit_id(self, cid: np.int64) -> None:
        """Advance last_commit_id only over a CONTIGUOUS prefix of published
        cids (the reference's CommitContext chain, commit_context.hpp):
        a higher cid finishing first must not expose still-writing lower
        cids to new snapshots."""
        with self._lock:
            self._published.add(int(cid))
            while (self._last_commit_id + 1) in self._published:
                self._published.remove(self._last_commit_id + 1)
                self._last_commit_id += 1

    def reset(self) -> None:
        with self._lock:
            self._next_tid = 1
            self._last_commit_id = 0
            self._next_cid = 1
            self._published.clear()


_default: Optional[TransactionManager] = None


def default_transaction_manager() -> TransactionManager:
    global _default
    if _default is None:
        _default = TransactionManager()
    return _default


def reset_default_transaction_manager() -> None:
    global _default
    _default = None
