"""Fused scan→project→aggregate pipelines.

The XLA-native realization of the reference's JIT operator subsystem
(reference: src/lib/operators/jit_operator/, 6.9k LoC: JitOperatorWrapper
chains JitReadTuples → JitFilter → JitCompute → JitAggregate over a fused
per-tuple loop, specialized at runtime with LLVM ORC). On TPU the equivalent
is: compile the predicate + aggregate-input expressions + masked segmented
reductions into ONE jitted XLA program, so the input columns stream from HBM
exactly once and all elementwise work fuses into that pass. This is the hot
path for TPC-H Q1/Q6 (BASELINE configs 1-2).

`FusedFilterAggregate` is a drop-in replacement for TableScan → Aggregate
when every group-by column is dictionary-encoded (the group domain is the
cross product of dictionary sizes — the Q1 shape: 3×2 cells). The general
high-cardinality path stays in ops/aggregate.py.

The jitted closure is cached on the operator, so repeated executions (bench
loops) re-trace nothing.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.expression.ast import AggregateExpr, Expr
from hyrise_tpu.expression.evaluator import compile_expression, make_env
from hyrise_tpu.ops.base import AbstractOperator
from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import (AggregateFunction, DataType,
                              aggregate_result_type, bucket_capacity)


class FusedFilterAggregate(AbstractOperator):
    name = "FusedFilterAggregate"

    def __init__(self, input_op: AbstractOperator,
                 predicate: Optional[Expr],
                 groupby: Sequence[str],
                 aggregates: Sequence[Tuple[str, AggregateExpr]]):
        super().__init__(input_op)
        self.predicate = predicate
        self.groupby = list(groupby)
        self.aggregates = list(aggregates)
        self._jitted = None
        self._meta = None

    # ------------------------------------------------------------------

    def _build(self, table: Table):
        sizes = []
        for name in self.groupby:
            c = table.column(name)
            if c.dtype is not DataType.STRING:
                raise TypeError("fused group-by requires dictionary columns")
            if c.has_validity:
                # NULL group keys need their own group (the general path's
                # validity-aware clustering); the cell arithmetic here would
                # merge them into dictionary[0] — fall back.
                raise TypeError("fused group-by requires non-NULL group keys")
            sizes.append(max(len(c.dictionary), 1))
        n_cells = int(np.prod(sizes)) if sizes else 1

        for _, agg in self.aggregates:
            if agg.fn is AggregateFunction.COUNT_DISTINCT:
                raise TypeError("COUNT DISTINCT is not fusable")

        pred_ce = (compile_expression(self.predicate, table)
                   if self.predicate is not None else None)
        agg_specs = []  # (out_name, fn, compiled_arg|None, in_dtype)
        for out_name, agg in self.aggregates:
            if agg.arg is None:
                agg_specs.append((out_name, agg.fn, None, DataType.INT64))
            else:
                ce = compile_expression(agg.arg, table)
                if ce.dtype is DataType.STRING and \
                        agg.fn is not AggregateFunction.COUNT:
                    # string MIN/MAX must carry the dictionary through —
                    # handled by the general path only.
                    raise TypeError("fused aggregate on STRING argument")
                agg_specs.append((out_name, agg.fn, ce, ce.dtype))

        required = set(self.groupby)
        if pred_ce is not None:
            required.update(pred_ce.required)
        for _, _, ce, _ in agg_specs:
            if ce is not None:
                required.update(ce.required)
        required = sorted(required)
        if not required:
            # COUNT(*) with a constant/absent predicate references no
            # columns; carry one so the kernel knows the row capacity
            required = [table.columns[0].name]

        groupby = list(self.groupby)

        def compute(env, live):
            # `live` is the table's FULL liveness mask (live_mask()), not a
            # prefix length: post-join masked layouts have live rows
            # scattered through the capacity (the bug class: a prefix
            # assumption here silently aggregated dead rows whenever the
            # input had not been compacted)
            cap = env[required[0]][0].shape[0]
            if pred_ce is not None:
                d, v = pred_ce.fn(env)
                mask = d.astype(bool)
                if v is not None:
                    mask = mask & v
                mask = mask & live
            else:
                mask = live

            if sizes:
                cell = jnp.zeros(cap, dtype=jnp.int32)
                for gname, size in zip(groupby, sizes):
                    cell = cell * size + env[gname][0]
            else:
                cell = jnp.zeros(cap, dtype=jnp.int32)
            seg = n_cells + 1
            cell = jnp.where(mask, cell, n_cells)  # dead rows -> extra segment

            from hyrise_tpu.kernels.tpu_prims import (DENSE_CELL_MAX,
                                                      fast_path,
                                                      segment_reduce_cells)

            def _seg(values, cells_arr, kind, sentinel=None):
                # scatter-add segment ops are 1-2 orders off roofline on TPU
                # (kernels/tpu_prims.py); small cell spaces use dense masked
                # blocked reductions instead
                if fast_path() and n_cells <= DENSE_CELL_MAX:
                    return segment_reduce_cells(values, cells_arr, n_cells,
                                                kind, sentinel)
                if kind == "sum":
                    return jax.ops.segment_sum(values, cells_arr,
                                               num_segments=seg)[:n_cells]
                fn = jax.ops.segment_min if kind == "min" \
                    else jax.ops.segment_max
                return fn(values, cells_arr, num_segments=seg)[:n_cells]

            counts = _seg(jnp.where(mask, 1, 0).astype(jnp.int64), cell,
                          "sum")
            outs = [counts]  # then per aggregate: (result, n_valid_inputs)
            for _, fn, ce, in_dt in agg_specs:
                if ce is None:  # COUNT(*)
                    outs.append((counts, counts))
                    continue
                vals, v = ce.fn(env)
                # integer SUM accumulates in int64 (exact past 2^53, like
                # the general path / aggregate_traits.hpp); floats in f64.
                int_sum = fn is AggregateFunction.SUM and in_dt.is_integral
                vals_acc = vals.astype(jnp.int64 if int_sum else jnp.float64)
                m = mask if v is None else (mask & v)
                cell_m = jnp.where(m, cell, n_cells)
                # per-aggregate valid-input counts: an all-NULL-input group
                # must yield NULL (not 0) for SUM/MIN/MAX/AVG.
                cvalid = _seg(m.astype(jnp.int64), cell_m, "sum")
                if fn is AggregateFunction.SUM:
                    r = _seg(jnp.where(m, vals_acc, jnp.zeros_like(vals_acc)),
                             cell_m, "sum")
                elif fn is AggregateFunction.COUNT:
                    r = cvalid
                elif fn is AggregateFunction.AVG:
                    s = _seg(jnp.where(m, vals_acc, 0.0), cell_m, "sum")
                    r = s / jnp.maximum(cvalid.astype(jnp.float64), 1.0)
                elif fn is AggregateFunction.MIN:
                    r = _seg(jnp.where(m, vals_acc, jnp.inf), cell_m, "min",
                             sentinel=jnp.inf)
                elif fn is AggregateFunction.MAX:
                    r = _seg(jnp.where(m, vals_acc, -jnp.inf), cell_m, "max",
                             sentinel=-jnp.inf)
                else:
                    raise NotImplementedError(fn)
                outs.append((r, cvalid))
            return outs

        self._compute = compute  # raw traceable form for whole-plan compile
        self._jitted = jax.jit(compute)
        self._meta = (sizes, n_cells, agg_specs, required)

    def _fallback(self, table: Table, context) -> Table:
        from hyrise_tpu.ops.aggregate import Aggregate
        from hyrise_tpu.ops.base import execute_plan
        from hyrise_tpu.ops.get_table import TableWrapper
        from hyrise_tpu.ops.table_scan import TableScan

        src: AbstractOperator = TableWrapper(table)
        if self.predicate is not None:
            src = TableScan(src, self.predicate)
        return execute_plan(Aggregate(src, self.groupby, self.aggregates),
                            context)

    # ------------------------------------------------------------------

    def _on_execute(self, context) -> Table:
        table = self.input_table(0)
        # strong table reference + identity check (an id() key can collide
        # after GC reuses the address of a dead table)
        if self._jitted is None or getattr(self, "_built_for_table", None) \
                is not table:
            self._built_for_table = table
            try:
                self._build(table)
            except TypeError:
                # non-dictionary group-by etc.: fall back to the general
                # scan+aggregate pair (reference: JitOperatorWrapper only
                # wraps jittable subplans; others run the normal operators)
                return self._fallback(table, context)
        sizes, n_cells, agg_specs, required = self._meta
        env = make_env(table, required)
        from hyrise_tpu.plan import compiler
        if compiler.active() is not None:
            # inside a whole-plan trace: inline the raw computation (the
            # enclosing program is the jit boundary; num_rows may be traced)
            outs = self._compute(env, table.live_mask())
        else:
            outs = self._jitted(env, table.live_mask())
        counts, aggs = outs[0], outs[1:]

        if sizes:
            nonempty = counts > 0
            n_groups, cap = compiler.oracle_capacity(
                jnp.sum(nonempty), bound=n_cells, label="fused.groups")
            from hyrise_tpu.kernels.tpu_prims import compact_indices
            sel = compact_indices(nonempty, cap)
        else:
            n_groups, cap = 1, 1
            sel = jnp.zeros(1, dtype=jnp.int64)

        cols: List[Column] = []
        stride = n_cells
        for gi, name in enumerate(self.groupby):
            c = table.column(name)
            stride //= sizes[gi]
            codes = (sel // stride) % sizes[gi]
            cols.append(Column(name, DataType.STRING,
                               codes.astype(jnp.int32), None, c.dictionary))
        for (out_name, fn, ce, in_dt), (data, cvalid) in zip(agg_specs, aggs):
            data = jnp.take(data, sel, axis=0)
            out_dt = aggregate_result_type(fn, in_dt)
            valid = None
            if fn is not AggregateFunction.COUNT and ce is not None:
                valid = jnp.take(cvalid, sel, axis=0) > 0
            cols.append(Column(out_name, out_dt,
                               data.astype(out_dt.numpy_dtype), valid, None))
        return Table(cols, n_groups, name=table.name)
