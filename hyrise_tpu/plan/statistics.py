"""Table/column statistics for cardinality estimation.

Reference: src/lib/statistics/ — Selinger-style selectivity estimation
(table_statistics.hpp:17-60 with its magic default selectivities) generated
by scanning tables (generate_table_statistics.*). Used by the predicate
reordering rule and join-input sizing.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from hyrise_tpu.expression import ast
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, PredicateCondition

# reference magic constants (table_statistics.hpp:20-25)
DEFAULT_SELECTIVITY = 0.5
LIKE_SELECTIVITY = 0.1
OPEN_ENDED_SELECTIVITY = 1.0 / 3.0


@dataclasses.dataclass
class ColumnStatistics:
    distinct_count: float
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    null_fraction: float = 0.0


@dataclasses.dataclass
class TableStatistics:
    row_count: float
    columns: Dict[str, ColumnStatistics]

    def column(self, name: str) -> Optional[ColumnStatistics]:
        cs = self.columns.get(name)
        if cs is None and "." in name:
            # SQL plans qualify columns as "alias.column"
            cs = self.columns.get(name.split(".", 1)[1])
        return cs


def generate_table_statistics(table: Table, sample: int = 65536
                              ) -> TableStatistics:
    """Scan (a sample of) the table for per-column stats."""
    n = table.num_rows
    cols: Dict[str, ColumnStatistics] = {}
    step = max(n // sample, 1)
    for c in table.columns:
        if n == 0:
            cols[c.name] = ColumnStatistics(0.0)
            continue
        data = np.asarray(c.data[:n:step])
        if c.dtype is DataType.STRING:
            distinct = float(len(c.dictionary))
            mn, mx = 0.0, float(max(len(c.dictionary) - 1, 0))
        else:
            uniq = float(len(np.unique(data)))
            if uniq >= 0.9 * len(data):
                # key-like: nearly all sampled values distinct -> extrapolate
                # linearly (sqrt-style scaling badly underestimates keys and
                # misorders joins)
                distinct = uniq * step
            else:
                # low-cardinality: the sample already saw most values
                distinct = uniq
            mn, mx = float(data.min()), float(data.max())
        nulls = 0.0
        if c.validity is not None:
            nulls = 1.0 - float(np.asarray(c.validity[:n:step]).mean())
        cols[c.name] = ColumnStatistics(min(distinct, n), mn, mx, nulls)
    return TableStatistics(float(n), cols)


def export_table_statistics(stats: TableStatistics, path: str) -> None:
    """Write statistics as JSON (reference:
    src/lib/statistics/statistics_import_export.cpp — export_table_statistics
    serializes row count + per-column stats)."""
    import json
    doc = {
        "row_count": stats.row_count,
        "columns": {
            name: {
                "distinct_count": cs.distinct_count,
                "min": cs.min_value,
                "max": cs.max_value,
                "null_fraction": cs.null_fraction,
            } for name, cs in stats.columns.items()
        },
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


def import_table_statistics(path: str) -> TableStatistics:
    """Reference: statistics_import_export.cpp import_table_statistics."""
    import json
    with open(path) as f:
        doc = json.load(f)
    cols = {
        name: ColumnStatistics(c["distinct_count"], c.get("min"),
                               c.get("max"), c.get("null_fraction", 0.0))
        for name, c in doc["columns"].items()
    }
    return TableStatistics(float(doc["row_count"]), cols)


def estimate_predicate_selectivity(stats: Optional[TableStatistics],
                                   pred: ast.Expr) -> float:
    """Selectivity in [0,1] of a predicate expression (reference:
    column_statistics.cpp estimation logic, simplified)."""
    if isinstance(pred, ast.Logical):
        a = estimate_predicate_selectivity(stats, pred.left)
        b = estimate_predicate_selectivity(stats, pred.right)
        return a * b if pred.op == "and" else min(a + b, 1.0)
    if isinstance(pred, ast.Not):
        return 1.0 - estimate_predicate_selectivity(stats, pred.value)
    if isinstance(pred, ast.Between):
        return OPEN_ENDED_SELECTIVITY ** 2 * 2
    if isinstance(pred, ast.Like):
        return 1.0 - LIKE_SELECTIVITY if pred.negate else LIKE_SELECTIVITY
    if isinstance(pred, ast.IsNull):
        return DEFAULT_SELECTIVITY
    if isinstance(pred, ast.InList):
        base = min(len(pred.options) * 0.05, 0.9)
        return 1.0 - base if pred.negate else base
    if isinstance(pred, ast.Comparison):
        col_stats = None
        if stats is not None:
            for side in (pred.left, pred.right):
                if isinstance(side, ast.ColumnRef):
                    cs = stats.column(side.name)
                    if cs is not None:
                        col_stats = cs
                        break
        if pred.cond is PredicateCondition.EQUALS:
            if col_stats and col_stats.distinct_count > 0:
                return 1.0 / col_stats.distinct_count
            return 0.1
        if pred.cond is PredicateCondition.NOT_EQUALS:
            if col_stats and col_stats.distinct_count > 0:
                return 1.0 - 1.0 / col_stats.distinct_count
            return 0.9
        return OPEN_ENDED_SELECTIVITY
    return DEFAULT_SELECTIVITY
