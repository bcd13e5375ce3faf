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
        out = self._execute_impl(context)
        if len(self.groupby) == 1 and out.has_column(self.groupby[0]):
            # each group appears once: a single group-by key is unique in
            # the output (drives the fused lookup join against aggregated
            # subqueries, e.g. Q2/Q15/Q17/Q21 shapes)
            out.column(self.groupby[0]).unique = True
        for name in self.groupby:
            # group keys are a SUBSET of the input column's values, so the
            # ingest range bound survives grouping (keeps the LUT join
            # available when joining back against aggregated subqueries)
            if out.has_column(name) and table.has_column(name):
                out.column(name).val_range = table.column(name).val_range
        return out

    def _execute_impl(self, context) -> Table:
        from hyrise_tpu.kernels import tpu_prims
        from hyrise_tpu.ops.materialize import compact_if_shrunk
        table = self.input_table(0)
        if self.groupby:
            # group-by pays per-capacity sort costs; compact when the live
            # count's bucket shrank (post-join masked layouts)
            table = compact_if_shrunk(table)
        if tpu_prims.fast_path():
            # TPU formulations: scatter-free segmented reductions and ONE
            # multi-operand sort instead of lexsort + per-column gathers
            # (see kernels/tpu_prims.py for the measurements driving this)
            return self._fast_execute(table)
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
            from hyrise_tpu.kernels.tpu_prims import compact_indices
            rep_pos = compact_indices(flags, seg_cap)
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

    # ------------------------------------------------------------------
    # TPU fast path (kernels/tpu_prims.py): no scatter-add segment ops, no
    # per-column gathers — dense per-cell reductions for small group spaces,
    # one multi-operand sort + cumsum/boundary-difference reductions for
    # large ones.

    def _compile_args(self, table: Table):
        compiled = []
        for out_name, agg in self.aggregates:
            if agg.fn is AggregateFunction.COUNT and agg.arg is None:
                compiled.append((out_name, agg.fn, None, None, None, None))
                continue
            ce = compile_expression(agg.arg, table)
            data, validity = ce.fn(make_env(table, ce.required))
            if getattr(ce, "_bool", False):
                data = data.astype(jnp.int32)
            compiled.append((out_name, agg.fn, data, validity, ce.dtype,
                             ce.dictionary))
        return compiled

    @staticmethod
    def _acc(data, in_dt, fn):
        out_dt = aggregate_result_type(fn, in_dt)
        return data.astype(jnp.float64 if out_dt is DataType.FLOAT64
                           else jnp.int64), out_dt

    @staticmethod
    def _sentinel(key, for_min: bool):
        if key.dtype.kind == "f":
            return jnp.array(jnp.inf if for_min else -jnp.inf,
                             dtype=key.dtype)
        info = jnp.iinfo(key.dtype)
        return jnp.array(info.max if for_min else info.min, dtype=key.dtype)

    def _fast_execute(self, table: Table) -> Table:
        live = table.live_mask()
        compiled = self._compile_args(table)
        if not self.groupby:
            return self._fast_scalar(table, live, compiled)
        sizes = self._dense_sizes(table)
        if sizes is not None:
            return self._fast_dense(table, live, compiled, sizes)
        return self._fast_sorted(table, live, compiled)

    # -- scalar (no group-by): global masked blocked reductions -------------

    def _fast_scalar(self, table: Table, live, compiled) -> Table:
        from hyrise_tpu.kernels.tpu_prims import _blocked
        out_cols: List[Column] = []
        for out_name, fn, data, validity, in_dt, dictionary in compiled:
            if fn is AggregateFunction.COUNT and data is None:
                n = jnp.sum(live.astype(jnp.int64))[None]
                out_cols.append(Column(out_name, DataType.INT64, n, None,
                                       None))
                continue
            v = live if validity is None else (live & validity)
            count = jnp.sum(v.astype(jnp.int64))
            nonempty = (count > 0)[None]
            if fn is AggregateFunction.COUNT:
                out_cols.append(Column(out_name, DataType.INT64, count[None],
                                       None, None))
            elif fn in (AggregateFunction.SUM, AggregateFunction.AVG):
                acc, out_dt = self._acc(data, in_dt, fn)
                s = jnp.sum(_blocked(jnp.where(v, acc, jnp.zeros_like(acc))),
                            axis=1).sum()
                if fn is AggregateFunction.SUM:
                    out_cols.append(Column(out_name, out_dt,
                                           s.astype(out_dt.numpy_dtype)[None],
                                           nonempty, None))
                else:
                    avg = s.astype(jnp.float64) / jnp.maximum(count, 1)
                    out_cols.append(Column(out_name, DataType.FLOAT64,
                                           avg[None], nonempty, None))
            elif fn in (AggregateFunction.MIN, AggregateFunction.MAX):
                key = data.astype(jnp.int64) if in_dt is DataType.STRING \
                    else data
                is_min = fn is AggregateFunction.MIN
                masked = jnp.where(v, key, self._sentinel(key, is_min))
                red = (jnp.min if is_min else jnp.max)(masked)
                if in_dt is DataType.STRING:
                    out_cols.append(Column(out_name, DataType.STRING,
                                           red.astype(jnp.int32)[None],
                                           nonempty, dictionary))
                else:
                    out_dt = aggregate_result_type(fn, in_dt)
                    out_cols.append(Column(out_name, out_dt,
                                           red.astype(out_dt.numpy_dtype)[None],
                                           nonempty, None))
            elif fn is AggregateFunction.COUNT_DISTINCT:
                key = data.astype(jnp.int64) if (
                    in_dt.is_integral or in_dt is DataType.STRING) \
                    else data.astype(jnp.float64)
                masked = jnp.where(v, key, self._sentinel(key, True))
                sk, sv = jax.lax.sort((masked, (~v).astype(jnp.int8)),
                                      num_keys=2, is_stable=False)
                v2 = sv == 0
                first = jnp.zeros_like(v2).at[0].set(True)
                new_val = v2 & (first | (sk != jnp.roll(sk, 1))
                                | jnp.roll(~v2, 1))
                d = jnp.sum(new_val.astype(jnp.int64))
                out_cols.append(Column(out_name, DataType.INT64, d[None],
                                       None, None))
            else:
                raise NotImplementedError(fn)
        if not out_cols:
            raise ValueError("Aggregate with no group-by columns and no "
                             "aggregates")
        return Table(out_cols, 1, name=table.name)

    # -- dense cells: group space = product of dictionary domains -----------

    def _dense_sizes(self, table: Table):
        from hyrise_tpu.kernels.tpu_prims import DENSE_CELL_MAX
        if any(agg.fn is AggregateFunction.COUNT_DISTINCT
               for _, agg in self.aggregates):
            return None
        sizes, prod = [], 1
        for name in self.groupby:
            c = table.column(name)
            if c.dtype is not DataType.STRING or c.dictionary is None \
                    or c.has_validity:
                return None
            sizes.append(len(c.dictionary))
            prod *= sizes[-1]
        return sizes if prod <= DENSE_CELL_MAX else None

    def _fast_dense(self, table: Table, live, compiled, sizes) -> Table:
        from hyrise_tpu.kernels.tpu_prims import (compact_indices,
                                                  segment_reduce_cells)
        from hyrise_tpu.plan.compiler import oracle_capacity

        cells = 1
        for s in sizes:
            cells *= s
        cell = jnp.zeros(table.capacity, dtype=jnp.int32)
        for name, size in zip(self.groupby, sizes):
            cell = cell * size + table.column(name).data.astype(jnp.int32)
        cell = jnp.where(live, cell, cells)  # dead rows outside the space

        rows_per_cell = segment_reduce_cells(
            jnp.where(live, 1, 0).astype(jnp.int64), cell, cells, "sum")
        nonempty_cell = rows_per_cell > 0
        n_groups, seg_cap = oracle_capacity(
            jnp.sum(nonempty_cell.astype(jnp.int64)), bound=cells,
            label="aggregate.groups")
        # ascending cell ids == key-sorted group order (codes are
        # order-preserving), identical to the sort-based path
        cell_ids = compact_indices(nonempty_cell, seg_cap)

        out_cols: List[Column] = []
        stride = cells
        for name, size in zip(self.groupby, sizes):
            stride //= size
            codes = (cell_ids // stride) % size
            c = table.column(name)
            out_cols.append(Column(name, DataType.STRING,
                                   codes.astype(jnp.int32), None,
                                   c.dictionary))

        for out_name, fn, data, validity, in_dt, dictionary in compiled:
            if fn is AggregateFunction.COUNT and data is None:
                out_cols.append(Column(
                    out_name, DataType.INT64,
                    jnp.take(rows_per_cell, cell_ids, axis=0), None, None))
                continue
            v = live if validity is None else (live & validity)
            counts = segment_reduce_cells(
                jnp.where(v, 1, 0).astype(jnp.int64), cell, cells, "sum")
            count_g = jnp.take(counts, cell_ids, axis=0)
            nonempty = count_g > 0
            if fn is AggregateFunction.COUNT:
                out_cols.append(Column(out_name, DataType.INT64, count_g,
                                       None, None))
            elif fn in (AggregateFunction.SUM, AggregateFunction.AVG):
                acc, out_dt = self._acc(data, in_dt, fn)
                sums = segment_reduce_cells(
                    jnp.where(v, acc, jnp.zeros_like(acc)), cell, cells,
                    "sum")
                s_g = jnp.take(sums, cell_ids, axis=0)
                if fn is AggregateFunction.SUM:
                    out_cols.append(Column(out_name, out_dt,
                                           s_g.astype(out_dt.numpy_dtype),
                                           nonempty, None))
                else:
                    avg = s_g.astype(jnp.float64) / jnp.maximum(count_g, 1)
                    out_cols.append(Column(out_name, DataType.FLOAT64, avg,
                                           nonempty, None))
            elif fn in (AggregateFunction.MIN, AggregateFunction.MAX):
                key = data.astype(jnp.int64) if in_dt is DataType.STRING \
                    else data
                is_min = fn is AggregateFunction.MIN
                masked = jnp.where(v, key, self._sentinel(key, is_min))
                red = segment_reduce_cells(masked, cell, cells,
                                           "min" if is_min else "max",
                                           sentinel=self._sentinel(key,
                                                                   is_min))
                r_g = jnp.take(red, cell_ids, axis=0)
                if in_dt is DataType.STRING:
                    out_cols.append(Column(out_name, DataType.STRING,
                                           r_g.astype(jnp.int32), nonempty,
                                           dictionary))
                else:
                    out_dt = aggregate_result_type(fn, in_dt)
                    out_cols.append(Column(out_name, out_dt,
                                           r_g.astype(out_dt.numpy_dtype),
                                           nonempty, None))
            else:
                raise NotImplementedError(fn)
        return Table(out_cols, n_groups, name=table.name)

    # -- general group-by: ONE multi-operand sort + run reductions ----------

    # -- order-preserving group-key packing --------------------------------
    # Remote-TPU sort compile time scales ~linearly with operand count
    # (tpu_prims payload packing header); a 7-column GROUP BY (Q10) as one
    # int64 key per column wedged the axon compile helper outright. Host-
    # known metadata makes most keys fixed-width: dictionary codes span
    # ceil(log2(|dict|)) bits, integers with ingest val_range span the
    # range width, and floats become order-preserved int64 bit patterns.
    # Fields concatenate MSB-first into 63-bit words, so lexicographic
    # word order == the original per-column ascending order (NULLs first
    # as a 0 validity bit above each nullable field) and group OUTPUT
    # ORDER is unchanged.

    @staticmethod
    def _packable_width(c) -> Optional[Tuple[int, int]]:
        """(bit width, lo offset) when the column's live values fit a
        host-known non-negative fixed-width field; None -> raw operand."""
        if c.dtype is DataType.STRING and c.dictionary is not None:
            return max(1, (max(len(c.dictionary) - 1, 1)).bit_length()), 0
        if c.dtype.is_integral and c.val_range is not None:
            lo, hi = c.val_range
            w = max(1, int(hi - lo).bit_length())
            return (w, int(lo)) if w <= 62 else None
        return None

    def _group_key_operands(self, gb_cols, live):
        """(key_operands, specs). key_operands[0] = int8 dead flag; specs
        describe how each group column reads (value, validity) back from
        the SORTED operands:
          ("packed", op_idx, shift, width, lo, vshift or None)
          ("raw", value_op_idx, validity_op_idx or None, is_float)
        """
        ops: List[jax.Array] = [(~live).astype(jnp.int8)]
        specs: List[Optional[tuple]] = [None] * len(gb_cols)

        fields = []  # (col_idx, width(+vbit), value_u64, lo)
        for i, c in enumerate(gb_cols):
            pw = self._packable_width(c)
            if pw is None:
                fields.append((i, None, None, None))
                continue
            w, lo = pw
            vals = c.data.astype(jnp.int64) - jnp.int64(lo)
            ok = live
            if c.has_validity:
                ok = ok & c.validity
            vals = jnp.where(ok, vals, jnp.int64(0))
            u = jax.lax.bitcast_convert_type(vals, jnp.uint64)
            total_w = w
            if c.has_validity:
                valid_u = jax.lax.bitcast_convert_type(
                    (live & c.validity).astype(jnp.int64), jnp.uint64)
                u = u | (valid_u << w)
                total_w = w + 1
            fields.append((i, total_w, u, (w, lo)))

        # greedy word fill, preserving column order (word boundaries keep
        # the cross-word lexicographic order equal to the column order)
        word_parts = []   # accumulating (col_idx, total_w, u, (w, lo))
        word_bits = 0

        def flush():
            nonlocal word_parts, word_bits
            if not word_parts:
                return
            acc = None
            shift = word_bits
            op_idx = len(ops)
            for col_idx, total_w, u, (w, lo) in word_parts:
                shift -= total_w
                part = u << shift
                acc = part if acc is None else (acc | part)
                vshift = (shift + w) if total_w == w + 1 else None
                specs[col_idx] = ("packed", op_idx, shift, w, lo, vshift)
            ops.append(jax.lax.bitcast_convert_type(acc, jnp.int64))
            word_parts, word_bits = [], 0

        for i, total_w, u, meta in fields:
            if total_w is None:
                flush()  # raw operand breaks the word to keep key order
                c = gb_cols[i]
                vidx = None
                ok = live
                if c.has_validity:
                    ok = ok & c.validity
                    vidx = len(ops)
                    ops.append(c.validity.astype(jnp.int8))
                is_float = not (c.dtype.is_integral
                                or c.dtype is DataType.STRING)
                if is_float:
                    # float keys stay native f64: the TPU compile helper
                    # DIES on bitcast_convert_type(f64 -> i64) (exit 1 —
                    # the Q10/Q18 failure), while f64-key sorts compile
                    # fine. -0.0 == 0.0 under IEEE compare, so both zeros
                    # land in one group; NaNs sort contiguous and the
                    # NaN-aware boundary check below merges them into ONE
                    # group (all bit patterns)
                    key = jnp.where(ok, c.data.astype(jnp.float64),
                                    jnp.float64(0.0))
                else:
                    key = jnp.where(ok, c.data.astype(jnp.int64),
                                    jnp.int64(0))
                specs[i] = ("raw", len(ops), vidx, is_float)
                ops.append(key)
                continue
            if word_bits + total_w > 63:
                flush()
            word_parts.append((i, total_w, u, meta))
            word_bits += total_w
        flush()
        return ops, specs

    def _fast_sorted(self, table: Table, live, compiled) -> Table:
        from hyrise_tpu.kernels.tpu_prims import (compact_indices,
                                                  segment_sums_sorted)
        from hyrise_tpu.plan.compiler import oracle_capacity

        cap = table.capacity
        n = table.num_rows
        gb_cols = [table.column(name) for name in self.groupby]

        keys, specs = self._group_key_operands(gb_cols, live)
        payloads = []
        for _, fn, data, validity, _, _ in compiled:
            if data is not None:
                payloads.append(data)
            if validity is not None:
                payloads.append(validity)
        from hyrise_tpu.kernels.tpu_prims import sort_keys_payloads
        key_sorted, payload_sorted_all = sort_keys_payloads(
            keys, payloads, is_stable=True)
        live_s = key_sorted[0] == 0

        # group boundaries: any key operand differing from the previous
        # sorted row starts a new group (packed null fields are zeroed, so
        # all NULLs of a column compare equal — one group, NULLs first).
        # Float operands get a NaN-aware compare: lax.sort's total order
        # clusters NaNs contiguously, and NaN != NaN would otherwise start
        # a new group per NaN row — all NaNs form ONE group (SQL grouping
        # treats NaN like a single key; also covers every NaN bit pattern,
        # stronger than the old identical-bits-only grouping)
        flags = jnp.zeros(cap, dtype=bool).at[0].set(n > 0)
        differs = jnp.zeros(cap, dtype=bool)
        for ks in key_sorted[1:]:
            prev = jnp.roll(ks, 1)
            neq = ks != prev
            if jnp.issubdtype(ks.dtype, jnp.floating):
                neq = neq & ~(jnp.isnan(ks) & jnp.isnan(prev))
            differs = differs | neq
        flags = (flags | differs.at[0].set(False)) & live_s

        sorted_gb = []  # (rep value extractor, rep validity extractor)
        for c, spec in zip(gb_cols, specs):
            if spec[0] == "packed":
                _, op_idx, shift, w, lo, vshift = spec
                u = jax.lax.bitcast_convert_type(key_sorted[op_idx],
                                                 jnp.uint64)
                raw = jax.lax.bitcast_convert_type(
                    (u >> shift) & jnp.uint64((1 << w) - 1), jnp.int64)
                v_s = raw + jnp.int64(lo)
                val_s = None if vshift is None else \
                    (jax.lax.bitcast_convert_type(
                        (u >> vshift) & jnp.uint64(1), jnp.int64) == 1)
            else:
                _, vopi, vidx, is_float = spec
                v_s = key_sorted[vopi]
                val_s = None if vidx is None else (key_sorted[vidx] == 1)
            sorted_gb.append((v_s, val_s))

        n_groups, seg_cap = oracle_capacity(
            jnp.sum(flags.astype(jnp.int64)), bound=cap,
            label="aggregate.groups")
        starts = compact_indices(flags, seg_cap)
        g_valid = jnp.arange(seg_cap) < n_groups
        next_start = jnp.where(
            jnp.arange(seg_cap) < n_groups - 1,
            jnp.roll(starts, -1),
            jnp.asarray(n, dtype=jnp.int32) if not isinstance(n, int)
            else jnp.int32(n))
        counts_span = jnp.where(g_valid,
                                next_start.astype(jnp.int64)
                                - starts.astype(jnp.int64), 0)
        # group ids for value re-sorts; dead rows get their OWN id past every
        # group so they can never sit inside a group's run span. MXU prefix
        # count: a flat cumsum at table scale wrecks the remote TPU compile
        # (tpu_prims module header)
        from hyrise_tpu.kernels.tpu_prims import prefix_count_mxu
        gid = prefix_count_mxu(flags) - 1
        gid = jnp.where(live_s, gid, jnp.int32(2**31 - 1))

        out_cols: List[Column] = []
        for name, c, (v_s, val_s) in zip(self.groupby, gb_cols, sorted_gb):
            rep = jnp.take(v_s, starts, axis=0)
            rep_val = None if val_s is None else jnp.take(val_s, starts,
                                                          axis=0)
            if c.dtype is DataType.STRING:
                rep = rep.astype(jnp.int32)
            else:
                rep = rep.astype(c.dtype.numpy_dtype)
            out_cols.append(Column(name, c.dtype, rep, rep_val, c.dictionary))

        pi = 0
        payload_sorted = payload_sorted_all
        for out_name, fn, data, validity, in_dt, dictionary in compiled:
            if data is None:  # COUNT(*)
                out_cols.append(Column(out_name, DataType.INT64, counts_span,
                                       None, None))
                continue
            d_s = payload_sorted[pi]
            pi += 1
            if validity is not None:
                v_s = payload_sorted[pi] & live_s
                pi += 1
            else:
                v_s = live_s
            count_g = segment_sums_sorted(
                jnp.where(v_s, 1, 0).astype(jnp.int64), starts, counts_span,
                n, gid=gid)
            nonempty = count_g > 0
            if fn is AggregateFunction.COUNT:
                out_cols.append(Column(out_name, DataType.INT64, count_g,
                                       None, None))
            elif fn in (AggregateFunction.SUM, AggregateFunction.AVG):
                acc, out_dt = self._acc(d_s, in_dt, fn)
                sums = segment_sums_sorted(
                    jnp.where(v_s, acc, jnp.zeros_like(acc)), starts,
                    counts_span, n, gid=gid)
                if fn is AggregateFunction.SUM:
                    out_cols.append(Column(out_name, out_dt,
                                           sums.astype(out_dt.numpy_dtype),
                                           nonempty, None))
                else:
                    avg = sums.astype(jnp.float64) / jnp.maximum(count_g, 1)
                    out_cols.append(Column(out_name, DataType.FLOAT64, avg,
                                           nonempty, None))
            elif fn in (AggregateFunction.MIN, AggregateFunction.MAX):
                key = d_s.astype(jnp.int64) if in_dt is DataType.STRING \
                    else d_s
                is_min = fn is AggregateFunction.MIN
                masked = jnp.where(v_s, key, self._sentinel(key, is_min))
                # deterministic scatter-min/max by group id: replaces two
                # per-capacity sorts (~50s of remote compile each,
                # tpu_prims module header); dead rows carry an
                # out-of-range gid and drop
                import jax.ops as _jops
                seg = _jops.segment_min if is_min else _jops.segment_max
                r_g = seg(masked, gid, num_segments=int(starts.shape[0]),
                          indices_are_sorted=True)
                if in_dt is DataType.STRING:
                    out_cols.append(Column(out_name, DataType.STRING,
                                           r_g.astype(jnp.int32), nonempty,
                                           dictionary))
                else:
                    out_dt = aggregate_result_type(fn, in_dt)
                    out_cols.append(Column(out_name, out_dt,
                                           r_g.astype(out_dt.numpy_dtype),
                                           nonempty, None))
            elif fn is AggregateFunction.COUNT_DISTINCT:
                key = d_s.astype(jnp.int64) if (
                    in_dt.is_integral or in_dt is DataType.STRING) \
                    else d_s.astype(jnp.float64)
                masked = jnp.where(v_s, key, self._sentinel(key, True))
                g2, iv2, k2 = jax.lax.sort(
                    (gid, (~v_s).astype(jnp.int8), masked), num_keys=3,
                    is_stable=False)
                v2 = iv2 == 0
                first = jnp.zeros_like(v2).at[0].set(True)
                new_val = v2 & (first | (g2 != jnp.roll(g2, 1))
                                | (k2 != jnp.roll(k2, 1))
                                | jnp.roll(~v2, 1))
                d_g = segment_sums_sorted(new_val.astype(jnp.int64), starts,
                                          counts_span, n, gid=g2)
                out_cols.append(Column(out_name, DataType.INT64, d_g, None,
                                       None))
            else:
                raise NotImplementedError(fn)
        return Table(out_cols, n_groups, name=table.name)

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
