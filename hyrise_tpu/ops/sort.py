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
        from hyrise_tpu.kernels import tpu_prims
        table = self.input_table(0)
        if not tpu_prims.fast_path():
            perm = sort_permutation(table, self.sort_defs)
            return gather_table(table, perm.astype("int32"), table.num_rows)
        return self._fast_sort(table)

    def _fast_sort(self, table: Table) -> Table:
        """ONE multi-operand stable sort carrying every column as payload
        (kernels/tpu_prims.py: per-column gathers of a permutation are ~10x
        slower than moving payloads inside the sort on TPU)."""
        import jax
        import jax.numpy as jnp

        from hyrise_tpu.ops.sort_util import _value_key
        from hyrise_tpu.storage.column import Column

        keys = [(~table.live_mask()).astype(jnp.int8)]  # dead rows last
        for name, mode in self.sort_defs:
            c = table.column(name)
            if c.has_validity:
                flag = c.validity.astype(jnp.int8)
                keys.append(flag if mode.nulls_first else 1 - flag)
            keys.append(_value_key(c.data, c.dtype, mode.ascending))
        from hyrise_tpu.kernels.tpu_prims import sort_with_payloads
        payloads, has_v = [], []
        for c in table.columns:
            payloads.append(c.data)
            has_v.append(c.has_validity)
            if c.has_validity:
                payloads.append(c.validity)
        outs = sort_with_payloads(keys, payloads, is_stable=True)
        cols, i = [], 0
        for c, hv in zip(table.columns, has_v):
            data = outs[i]
            i += 1
            validity = None
            if hv:
                validity = outs[i]
                i += 1
            cols.append(Column(c.name, c.dtype, data, validity, c.dictionary,
                               unique=c.unique, val_range=c.val_range))
        return Table(cols, table.num_rows, name=table.name)
