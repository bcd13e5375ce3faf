"""TableScan.

Reference: src/lib/operators/table_scan.cpp:78-164 with per-predicate-kind
impls in operators/table_scan/ (SingleColumnTableScanImpl,
ColumnComparisonTableScanImpl, LikeTableScanImpl, IsNullTableScanImpl).

Here every predicate kind is one compiled expression (expression/evaluator.py
performs the reference's dictionary ValueID rewrite for strings) evaluated
over the whole column set at once; the per-chunk JobTask fan-out becomes a
single vectorized kernel. Output is a compacted materialized table — the
reference's ReferenceColumn output corresponds to the internal
(indices, count) produced by materialize.filter_table.
"""

from __future__ import annotations

from hyrise_tpu.expression.ast import Expr
from hyrise_tpu.expression.evaluator import compile_expression, make_env
from hyrise_tpu.ops.base import AbstractOperator
from hyrise_tpu.ops.materialize import filter_table
from hyrise_tpu.storage.table import Table


class TableScan(AbstractOperator):
    name = "TableScan"

    def __init__(self, input_op: AbstractOperator, predicate: Expr):
        super().__init__(input_op)
        self.predicate = predicate

    def _on_execute(self, context) -> Table:
        table = self.input_table(0)
        # Block pruning (reference: ChunkPruningRule + ChunkStatistics):
        # short-circuit when min/max stats prove no block can match.
        stats = getattr(table, "block_stats", None)
        if stats is not None:
            keep = stats.keep_mask(table, self.predicate)
            if keep is not None and not keep.any():
                self.performance_data.extra["pruned_all_blocks"] = True
                return Table(table.columns, 0, name=table.name)
        ce = compile_expression(self.predicate, table)
        data, validity = ce.fn(make_env(table, ce.required))
        mask = data.astype(bool)
        if validity is not None:
            mask = mask & validity  # NULL predicate result -> row filtered out
        return filter_table(table, mask)

    def describe(self, depth: int = 0) -> str:
        pad = "  " * depth
        lines = [f"{pad}{self.name} {self.predicate} [{self.performance_data}]"]
        for i in self.inputs:
            lines.append(i.describe(depth + 1))
        return "\n".join(lines)
