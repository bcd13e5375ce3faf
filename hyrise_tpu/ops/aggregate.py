"""Hash/group aggregate operator.

Reference: src/lib/operators/aggregate.{hpp,cpp} — two-phase hash group-by
(value→dense-group-id maps, then per-chunk unordered_map accumulation with
Min/Max/Sum/Avg/Count/CountDistinct functors, aggregate.cpp:133-608).

TPU-native redesign: group-id assignment is sort-based (cluster rows by the
group key with one stable lexsort, mark boundaries, prefix-sum to dense ids)
and accumulation is a set of segmented reductions (`jax.ops.segment_*`) —
the canonical XLA formulation of group-by. DISTINCT is group-by with no
aggregates (aggregate.cpp:443-472); COUNT(DISTINCT x) re-clusters by
(group, value). Group count is host-synced and bucketed (count-then-allocate,
SURVEY.md §7). Output group order is key-sorted (deterministic), not
hash-order like the reference — SQL semantics are order-free here.

NULL semantics: NULLs form one group per SQL/Hyrise (aggregate.cpp maps NULL
to group ID 0); aggregates skip NULL inputs; SUM/MIN/MAX/AVG of zero valid
rows is NULL; COUNT of zero rows is 0.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.expression.ast import AggregateExpr, Expr
from hyrise_tpu.expression.evaluator import compile_expression, make_env
from hyrise_tpu.ops.base import AbstractOperator
from hyrise_tpu.ops.materialize import gather_table
from hyrise_tpu.ops.sort_util import group_boundaries, group_permutation
from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import (AggregateFunction, DataType, aggregate_result_type,
                              bucket_capacity)


class Aggregate(AbstractOperator):
    name = "Aggregate"

    def __init__(self, input_op: AbstractOperator, groupby: Sequence[str],
                 aggregates: Sequence[Tuple[str, AggregateExpr]]):
        super().__init__(input_op)
        self.groupby = list(groupby)
        self.aggregates = list(aggregates)

    def _on_execute(self, context) -> Table:
        table = self.input_table(0)
        n = table.num_rows
        cap = table.capacity

        from hyrise_tpu.plan.compiler import oracle_capacity

        if self.groupby:
            perm = group_permutation(table, self.groupby)
            flags = group_boundaries(table, self.groupby, perm)
            gid = jnp.cumsum(flags.astype(jnp.int32)) - 1
            last_gid = jnp.take(gid, jnp.maximum(jnp.asarray(n) - 1, 0))
            n_groups_t = jnp.where(jnp.asarray(n) > 0, last_gid + 1, 0)
            n_groups, seg_cap = oracle_capacity(
                n_groups_t, bound=cap, label="aggregate.groups")
        else:
            perm = jnp.arange(cap)
            flags = jnp.zeros(cap, dtype=bool).at[0].set(True)
            gid = jnp.zeros(cap, dtype=jnp.int32)
            n_groups = 1  # global aggregate: always one output row
            seg_cap = bucket_capacity(1)
        live_sorted = jnp.arange(cap) < n
        out_cols: List[Column] = []

        # group-by key columns: representative = first row of each group.
        if self.groupby:
            rep_pos = jnp.nonzero(flags, size=seg_cap, fill_value=0)[0]
            rep_idx = jnp.take(perm, rep_pos, axis=0).astype(jnp.int32)
            rep = gather_table(table, rep_idx, n_groups)
            for name in self.groupby:
                out_cols.append(rep.column(name))

        for out_name, agg in self.aggregates:
            out_cols.append(self._compute_aggregate(
                table, agg, out_name, perm, gid, live_sorted, seg_cap, n_groups))

        if not out_cols:  # DISTINCT with zero aggregates and zero groupby cols
            raise ValueError("Aggregate with no group-by columns and no aggregates")

        return Table(out_cols, n_groups, name=table.name)

    # ------------------------------------------------------------------

    def _compute_aggregate(self, table: Table, agg: AggregateExpr, out_name: str,
                           perm, gid, live_sorted, seg_cap: int,
                           n_groups: int) -> Column:
        fn = agg.fn
        if fn is AggregateFunction.COUNT and agg.arg is None:
            counts = jax.ops.segment_sum(live_sorted.astype(jnp.int64), gid,
                                         num_segments=seg_cap)
            return Column(out_name, DataType.INT64, counts, None, None)

        ce = compile_expression(agg.arg, table)
        data, validity = ce.fn(make_env(table, ce.required))
        in_dt = ce.dtype
        if getattr(ce, "_bool", False):
            data = data.astype(jnp.int32)
        d = jnp.take(data, perm, axis=0)
        v = live_sorted if validity is None else \
            (jnp.take(validity, perm, axis=0) & live_sorted)

        out_dt = aggregate_result_type(fn, in_dt)
        counts = jax.ops.segment_sum(v.astype(jnp.int64), gid,
                                     num_segments=seg_cap)
        nonempty = counts > 0

        if fn is AggregateFunction.COUNT:
            return Column(out_name, DataType.INT64, counts, None, None)

        if fn is AggregateFunction.COUNT_DISTINCT:
            distinct = self._count_distinct(d, v, gid, in_dt, seg_cap)
            return Column(out_name, DataType.INT64, distinct, None, None)

        if fn in (AggregateFunction.SUM, AggregateFunction.AVG):
            acc = d.astype(jnp.float64) if out_dt is DataType.FLOAT64 \
                else d.astype(jnp.int64)
            acc = jnp.where(v, acc, jnp.zeros_like(acc))
            sums = jax.ops.segment_sum(acc, gid, num_segments=seg_cap)
            if fn is AggregateFunction.SUM:
                return Column(out_name, out_dt, sums.astype(out_dt.numpy_dtype),
                              nonempty, None)
            avg = sums.astype(jnp.float64) / jnp.maximum(counts, 1)
            return Column(out_name, DataType.FLOAT64, avg, nonempty, None)

        if fn in (AggregateFunction.MIN, AggregateFunction.MAX):
            if in_dt is DataType.STRING:
                # codes are order-preserving: min/max on codes, keep dictionary
                key = d.astype(jnp.int64)
                out_np = DataType.STRING
            else:
                key = d
                out_np = out_dt
            if fn is AggregateFunction.MIN:
                if key.dtype.kind == "f":
                    sentinel = jnp.array(jnp.inf, dtype=key.dtype)
                else:
                    sentinel = jnp.array(jnp.iinfo(key.dtype).max, dtype=key.dtype)
                masked = jnp.where(v, key, sentinel)
                red = jax.ops.segment_min(masked, gid, num_segments=seg_cap)
            else:
                if key.dtype.kind == "f":
                    sentinel = jnp.array(-jnp.inf, dtype=key.dtype)
                else:
                    sentinel = jnp.array(jnp.iinfo(key.dtype).min, dtype=key.dtype)
                masked = jnp.where(v, key, sentinel)
                red = jax.ops.segment_max(masked, gid, num_segments=seg_cap)
            if in_dt is DataType.STRING:
                return Column(out_name, DataType.STRING,
                              red.astype(jnp.int32), nonempty, ce.dictionary)
            return Column(out_name, out_np, red.astype(out_np.numpy_dtype),
                          nonempty, None)

        raise NotImplementedError(fn)

    @staticmethod
    def _count_distinct(d, v, gid, in_dt: DataType, seg_cap: int):
        # Re-cluster rows by (group, validity, value); count value-change
        # boundaries among valid rows per group.
        key = d.astype(jnp.int64) if (in_dt.is_integral or in_dt is DataType.STRING) \
            else d.astype(jnp.float64)
        invalid = (~v).astype(jnp.int32)
        perm2 = jnp.lexsort([key, invalid, gid])
        g2 = jnp.take(gid, perm2, axis=0)
        k2 = jnp.take(key, perm2, axis=0)
        v2 = jnp.take(v, perm2, axis=0)
        g_prev = jnp.roll(g2, 1)
        k_prev = jnp.roll(k2, 1)
        v_prev = jnp.roll(v2, 1)
        first = jnp.zeros_like(v2).at[0].set(True)
        new_val = v2 & (first | (g2 != g_prev) | (k2 != k_prev) | (~v_prev))
        return jax.ops.segment_sum(new_val.astype(jnp.int64), g2,
                                   num_segments=seg_cap)
