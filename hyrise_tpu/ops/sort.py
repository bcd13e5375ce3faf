"""Sort operator.

Reference: src/lib/operators/sort.{hpp,cpp} — stable sort on one column with
NULLs-first/last (sort.cpp:161-210); multi-column ORDER BY is realized there
by chained Sort operators. Here multi-column directly via one lexsort
(sort_util.sort_permutation) followed by a gather of all columns.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

from hyrise_tpu.ops.base import AbstractOperator
from hyrise_tpu.ops.materialize import gather_table
from hyrise_tpu.ops.sort_util import sort_permutation
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import SortMode

SortDef = Union[str, Tuple[str, SortMode]]


class Sort(AbstractOperator):
    name = "Sort"

    def __init__(self, input_op: AbstractOperator, sort_defs: Sequence[SortDef]):
        super().__init__(input_op)
        self.sort_defs: list[Tuple[str, SortMode]] = [
            (d, SortMode.ASCENDING) if isinstance(d, str) else d
            for d in sort_defs
        ]

    def _on_execute(self, context) -> Table:
        table = self.input_table(0)
        perm = sort_permutation(table, self.sort_defs)
        return gather_table(table, perm.astype("int32"), table.num_rows)
