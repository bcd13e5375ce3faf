"""Per-block column statistics for scan pruning.

Reference: src/lib/statistics/chunk_statistics/ — per-chunk MinMaxFilter and
RangeFilter with `can_prune(column, value, cond)` (chunk_statistics.hpp:
16-30), consumed by the ChunkPruningRule to set excluded_chunk_ids.

TPU adaptation: the row axis of a table is divided into fixed blocks; per
block we keep min/max (and null-count). A scan consults the stats and
(a) short-circuits to an empty result when EVERY block is prunable — the
common case for range predicates on clustered columns — or (b) exposes a
per-block keep-mask for block-skipping kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from hyrise_tpu.expression import ast
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, PredicateCondition

BLOCK_ROWS = 65536


@dataclasses.dataclass
class ColumnBlockStats:
    mins: np.ndarray   # [n_blocks] numeric (string: dictionary codes)
    maxs: np.ndarray
    has_null: np.ndarray  # [n_blocks] bool


@dataclasses.dataclass
class BlockStatistics:
    n_blocks: int
    block_rows: int
    columns: Dict[str, ColumnBlockStats]

    @staticmethod
    def generate(table: Table, block_rows: int = BLOCK_ROWS
                 ) -> "BlockStatistics":
        n = table.num_rows
        n_blocks = max((n + block_rows - 1) // block_rows, 1)
        cols: Dict[str, ColumnBlockStats] = {}
        for c in table.columns:
            data = np.asarray(c.data[:n])
            valid = (np.asarray(c.validity[:n]) if c.validity is not None
                     else None)
            mins = np.zeros(n_blocks, dtype=np.float64)
            maxs = np.zeros(n_blocks, dtype=np.float64)
            nulls = np.zeros(n_blocks, dtype=bool)
            for b in range(n_blocks):
                seg = data[b * block_rows:(b + 1) * block_rows]
                if valid is not None:
                    vseg = valid[b * block_rows:(b + 1) * block_rows]
                    nulls[b] = bool((~vseg).any())
                    seg = seg[vseg]
                if len(seg) == 0:
                    mins[b], maxs[b] = np.inf, -np.inf
                else:
                    mins[b], maxs[b] = float(seg.min()), float(seg.max())
            cols[c.name] = ColumnBlockStats(mins, maxs, nulls)
        return BlockStatistics(n_blocks, block_rows, cols)

    # -- pruning -------------------------------------------------------------

    def keep_mask(self, table: Table, pred: ast.Expr) -> Optional[np.ndarray]:
        """Per-block bool mask: True = block may contain matches; None =
        cannot prune with this predicate. Conservative (AND over conjuncts,
        everything else keeps)."""
        if isinstance(pred, ast.Logical) and pred.op == "and":
            a = self.keep_mask(table, pred.left)
            b = self.keep_mask(table, pred.right)
            if a is None:
                return b
            if b is None:
                return a
            return a & b
        if isinstance(pred, ast.Between):
            lo = self.keep_mask(table, ast.Comparison(
                PredicateCondition.GREATER_THAN_EQUALS, pred.value, pred.lower))
            hi = self.keep_mask(table, ast.Comparison(
                PredicateCondition.LESS_THAN_EQUALS, pred.value, pred.upper))
            if lo is None or hi is None:
                return lo if hi is None else hi
            return lo & hi
        if not isinstance(pred, ast.Comparison):
            return None
        # col <op> literal (either side)
        if isinstance(pred.left, ast.ColumnRef) and \
                isinstance(pred.right, ast.Literal):
            name, value, cond = pred.left.name, pred.right.value, pred.cond
        elif isinstance(pred.right, ast.ColumnRef) and \
                isinstance(pred.left, ast.Literal):
            name, value, cond = (pred.right.name, pred.left.value,
                                 pred.cond.flipped())
        else:
            return None
        if name not in self.columns or value is None:
            return None
        st = self.columns[name]
        col = table.column(name)
        if col.dtype is DataType.STRING:
            if not isinstance(value, str):
                return None
            # code-space bounds (reference: RangeFilter over dictionary)
            lo_code = float(np.searchsorted(col.dictionary, value, "left"))
            hi_code = float(np.searchsorted(col.dictionary, value, "right"))
            if cond is PredicateCondition.EQUALS:
                if lo_code == hi_code:
                    return np.zeros(self.n_blocks, dtype=bool)
                return (st.mins <= lo_code) & (st.maxs >= lo_code)
            if cond is PredicateCondition.LESS_THAN:
                return st.mins < lo_code
            if cond is PredicateCondition.LESS_THAN_EQUALS:
                return st.mins < hi_code
            if cond is PredicateCondition.GREATER_THAN:
                return st.maxs >= hi_code
            if cond is PredicateCondition.GREATER_THAN_EQUALS:
                return st.maxs >= lo_code
            return None
        if isinstance(value, str):
            return None
        v = float(value)
        if cond is PredicateCondition.EQUALS:
            return (st.mins <= v) & (st.maxs >= v)
        if cond is PredicateCondition.LESS_THAN:
            return st.mins < v
        if cond is PredicateCondition.LESS_THAN_EQUALS:
            return st.mins <= v
        if cond is PredicateCondition.GREATER_THAN:
            return st.maxs > v
        if cond is PredicateCondition.GREATER_THAN_EQUALS:
            return st.maxs >= v
        return None


def attach_block_statistics(table: Table,
                            block_rows: int = BLOCK_ROWS) -> None:
    table.block_stats = BlockStatistics.generate(table, block_rows)
