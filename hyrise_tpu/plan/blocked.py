"""Blocked (streaming) whole-plan execution: one fact table processed in
fixed-shape row blocks through ONE compiled program, partial aggregates
merged on the host side.

The reference processes arbitrarily large tables chunk-at-a-time — every
operator iterates Chunks of at most Chunk::MAX_SIZE rows
(reference: src/lib/storage/chunk.hpp:44, table_scan.cpp per-chunk loops,
aggregate.cpp per-chunk maps merged at the end). The whole-plan compiler
(plan/compiler.py) instead materializes each table as ONE device array,
which caps the largest processable scale at device HBM (and at SF10 shapes
the one-program form has wedged the axon remote compile). This module is
the chunk axis for the TPU design:

- the plan's dominant fact table (largest capacity source) becomes the
  STREAM table; every other table stays fully resident (dimension builds),
- the plan is split at its top-level Aggregate: the subtree below runs
  per block with the aggregate converted to its decomposable PARTIAL form
  (SUM/COUNT/MIN/MAX; AVG -> SUM+COUNT — the same decomposition the
  distributed compiler uses for its two-phase aggregates, and the
  reference's per-chunk map -> merge in aggregate.cpp:437-541),
- one fixed block shape means ONE compiled program serves every block
  (XLA never sees the full-table shape), blocks execute sequentially on
  the chip with the capacity oracle shared across blocks,
- partials are concatenated (UnionAll) and finished with an eager final
  aggregate + AVG finisher projection, then the original post-aggregate
  tail (Sort / Projection / Limit / Alias) runs eagerly on the merged
  result.

Reduction-order policy: blocked execution folds block partials in block
order — a coarser documented tree than the single-program blocked-tree
reduction (ARCHITECTURE.md); scripts/reference_compare.py measures both
against the sequential oracle.

Supported shape: root = [tail ops]* -> Aggregate(subtree containing the
stream table exactly once). Anything else raises PlanNotCompilable — the
non-blocked compiler remains the general path.

Soundness: block decomposition is only correct when every output row of the
split subtree derives from exactly ONE stream-table row (row
distributivity). The path from the stream leaf to the split point must
therefore cross only row-distributive edges: filters/projections, and joins
where the stream side's rows are preserved independently of how the OTHER
side is blocked. Streaming the BUILD side of a semi/anti join, the
null-producing side of an outer join, or through a nested Aggregate silently
double- or under-counts (an order with matching lineitems in two blocks
passes a per-block semi join twice). `_validate_distributive` enforces this;
plans that fail it must be decomposed by plan/segmented.py instead.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.plan.compiler import CompiledQuery, PlanNotCompilable, _walk
from hyrise_tpu.types import (AggregateFunction, EXISTENCE_MODES, JoinMode)

# ops that may sit between the root and the split Aggregate; they run
# EAGERLY on the merged result, so a TableScan here is exactly a HAVING
# filter over the finished groups (reference: translated HAVING becomes a
# scan above the aggregate, lqp_translator.cpp predicate chain)
_TAIL_OPS = ("Sort", "Projection", "Limit", "Alias", "TableScan")


def _decompose(aggregates):
    """original (name, AggregateExpr) list ->
    (partial_specs, final_specs, finish_cols) for two-phase execution."""
    from hyrise_tpu.expression.ast import AggregateExpr, col

    partial_specs: List[Tuple[str, object]] = []
    final_specs: List[Tuple[str, object]] = []
    finish_cols: List[object] = []  # str passthrough or (name, expr)
    F = AggregateFunction
    for name, ae in aggregates:
        if getattr(ae, "distinct", False):
            raise PlanNotCompilable(
                f"blocked execution: {name} is DISTINCT (not decomposable)")
        if ae.fn is F.AVG:
            from hyrise_tpu.types import DataType
            s, c = name + "__bsum", name + "__bcnt"
            partial_specs += [(s, AggregateExpr(F.SUM, ae.arg)),
                              (c, AggregateExpr(F.COUNT, ae.arg))]
            final_specs += [(s, AggregateExpr(F.SUM, col(s))),
                            (c, AggregateExpr(F.SUM, col(c)))]
            # AVG is FLOAT64 regardless of input type (aggregate_result_type);
            # without the cast an INT64 sum / INT64 count truncates
            finish_cols.append(
                (name, col(s).cast(DataType.FLOAT64) / col(c)))
        elif ae.fn in (F.SUM, F.COUNT):
            partial_specs.append((name, ae))
            final_specs.append((name, AggregateExpr(F.SUM, col(name))))
            finish_cols.append(name)
        elif ae.fn in (F.MIN, F.MAX):
            partial_specs.append((name, ae))
            final_specs.append((name, AggregateExpr(ae.fn, col(name))))
            finish_cols.append(name)
        else:
            raise PlanNotCompilable(
                f"blocked execution: {ae.fn} not decomposable")
    return partial_specs, final_specs, finish_cols


class BlockedCompiledQuery(CompiledQuery):
    """CompiledQuery over row blocks of one stream table.

    cq = BlockedCompiledQuery(TPCH_PLANS[1](cat), cat, block_rows=1 << 22)
    table = cq.run()   # compiles ONE block-shaped program, loops blocks
    """

    def __init__(self, root, catalog=None, stream_table: Optional[str] = None,
                 block_rows: int = 1 << 22):
        from hyrise_tpu.ops.aggregate import Aggregate
        from hyrise_tpu.ops.misc import Limit
        from hyrise_tpu.ops.sort import Sort

        # locate the decomposable split point under a chain of tail ops:
        # either a top-level Aggregate (partials merge) or a Limit(Sort(..))
        # top-K root (per-block top-K rows merge through one final re-sort —
        # the same K-bounded merge as the distributed top-K,
        # parallel/dist_compiler.py)
        self._orig_root = root
        self._mode = "agg"
        # top-K per-block is only row-distributive when each output row
        # derives from a single stream row: an Aggregate anywhere under the
        # Sort means groups split across blocks would surface as duplicate
        # keys with partial values in the merged top-K (silently wrong) —
        # those roots take the aggregate-split walk below instead
        def _has_aggregate(node):
            return any(isinstance(op, Aggregate) for op in _walk(node))

        if isinstance(root, Limit) and isinstance(root.inputs[0], Sort) \
                and not _has_aggregate(root.inputs[0]):
            self._mode = "topk"
            self._topk_limit = root
            self._topk_sort = root.inputs[0]
            self._tail_parent = None
            super().__init__(root, catalog)
        else:
            parent, node = None, root
            while node.name in _TAIL_OPS and len(node.inputs) == 1:
                parent, node = node, node.inputs[0]
            if not isinstance(node, Aggregate):
                raise PlanNotCompilable(
                    "blocked execution needs a top-level Aggregate or "
                    f"Limit(Sort(..)) root (found {node.name})")
            self._tail_parent = parent
            self._orig_agg = node
            (partial_specs, self._final_specs,
             self._finish_cols) = _decompose(node.aggregates)
            self._groupby = list(node.groupby)
            partial_agg = Aggregate(node.inputs[0], node.groupby,
                                    partial_specs)
            super().__init__(partial_agg, catalog)

        # pick the stream table: the largest source, referenced exactly once
        from hyrise_tpu.ops.get_table import GetTable, TableWrapper
        if stream_table is not None:
            cands = [t for t in self._sources if t.name == stream_table]
            if not cands:
                raise PlanNotCompilable(f"no source named {stream_table}")
            self._stream = cands[0]
        else:
            self._stream = max(self._sources, key=lambda t: t.capacity)
        refs = 0
        for op in self.ops:
            if isinstance(op, GetTable) and \
                    op.table_name == self._stream.name:
                refs += 1
            elif isinstance(op, TableWrapper) and op.table is self._stream:
                refs += 1
        if refs != 1:
            raise PlanNotCompilable(
                f"stream table {self._stream.name} referenced {refs} times "
                "(blocked execution is only row-distributive over a single "
                "occurrence)")
        self._validate_distributive()
        self.block_rows = min(block_rows, self._stream.capacity)
        if self._stream.capacity % self.block_rows:
            raise PlanNotCompilable(
                "block_rows must divide the stream capacity "
                f"({self._stream.capacity} % {self.block_rows})")
        self._block_lo = 0
        self._block_live = self.block_rows
        self.n_blocks = -(-self._stream.num_rows // self.block_rows)

    # -- soundness ---------------------------------------------------------

    def _validate_distributive(self) -> None:
        from hyrise_tpu.ops.get_table import GetTable, TableWrapper

        leaf = None
        for op in self.ops:
            if (isinstance(op, GetTable)
                    and op.table_name == self._stream.name) or \
                    (isinstance(op, TableWrapper)
                     and op.table is self._stream):
                leaf = op
        terminal = () if self._mode == "agg" \
            else (self._topk_sort, self._topk_limit)
        validate_stream_path(self.ops, leaf, self.root, terminal)

    # -- per-block argument slicing ---------------------------------------

    def _flat_args(self):
        # FULL device arrays for every source (the stream table included) —
        # the block window is cut INSIDE the compiled program with
        # dynamic_slice on a traced offset. Eager per-column lax.slice here
        # would cost one tunnel dispatch per column per block on the remote
        # TPU (~25ms each) and make every block offset its own program.
        args = []
        for t in self._sources:
            for c in t.columns:
                args.append(c.encoded.codes if self._narrow_encoded(c)
                            else c.data)
                if c.has_validity:
                    args.append(c.validity)
        # two traced scalars keep every block on the SAME compiled program:
        # the block's start offset and its live row count (last block is
        # partial)
        args.append(jnp.asarray(self._block_lo, dtype=jnp.int64))
        args.append(jnp.asarray(self._block_live, dtype=jnp.int64))
        return args

    def _rebuild_tables(self, flat, ctx):
        from hyrise_tpu.storage.column import Column
        from hyrise_tpu.storage.table import Table

        lo = flat[-2]
        n_stream = flat[-1]
        B = self.block_rows
        bounds = self._col_bounds()
        it = iter(flat[:-2])
        for src in self._sources:
            stream = src is self._stream
            cols = []
            for c in src.columns:
                data = next(it)
                validity = next(it) if c.has_validity else None
                if stream:
                    if validity is not None:
                        validity = jax.lax.dynamic_slice_in_dim(
                            validity, lo, B)
                vr = c.val_range if c.val_range is not None \
                    else bounds.get(c.name)
                if self._narrow_encoded(c):
                    cap = B if stream else int(data.shape[0])
                    if stream:
                        data = (lambda d=data, o=lo:
                                jax.lax.dynamic_slice_in_dim(d, o, B)
                                .astype(jnp.int32))
                    else:
                        data = (lambda d=data: d.astype(jnp.int32))
                    cols.append(Column(c.name, c.dtype, data, validity,
                                       c.dictionary, capacity_hint=cap,
                                       unique=c.unique, val_range=vr))
                    continue
                if stream:
                    data = jax.lax.dynamic_slice_in_dim(data, lo, B)
                cols.append(Column(c.name, c.dtype, data, validity,
                                   c.dictionary, unique=c.unique,
                                   val_range=vr))
            n = n_stream if stream else src.num_rows
            ctx.table_subst[id(src)] = Table(cols, n, name=src.name)

    # -- blocked run -------------------------------------------------------

    def run(self, tighten: bool = False):
        """Run every block through ONE shared compiled partial program,
        dispatched back-to-back WITHOUT host syncs between blocks, then
        merge + finish through a cached compiled merge program.

        Device pipeline per run: n_blocks async dispatches of the partial
        program, ONE stacked device->host read of every block's control
        word (overflow check + live counts), one dispatch of the merge
        program, one read of its control word. On the remote-TPU tunnel
        (~25ms per device->host read, CLAUDE.md) that is ~2 reads per run
        where the previous form paid one read per block PLUS an eager
        per-operator merge chain (hundreds of dispatches at SF10 —
        VERDICT r4: Q3 SF10 at 91s steady vs 0.42s at SF1). `tighten` is
        forced off for the block program so the capacity vector stays
        monotone across blocks (a tighten from a sparse block would force
        a retrace on the next dense one); the merge program tightens
        normally."""
        import os
        import sys
        import time
        from hyrise_tpu.storage.table import Table
        from hyrise_tpu.types import bucket_capacity

        profile = os.environ.get("HYRISE_TPU_PROFILE", "") == "1"
        n = self._stream.num_rows
        B = self.block_rows
        self.n_blocks = max(-(-n // B), 1)
        self._col_bounds()  # host-side bounds OUTSIDE the trace
        self.last_retries = 0
        for _ in range(self.MAX_RETRIES):
            t0 = time.perf_counter()
            fn, caps_list = self._get_jitted()
            sig_at_build = self._gather_sig()
            outs = []
            for b in range(self.n_blocks):
                self._block_lo = b * B
                self._block_live = max(min(B, n - b * B), 0)
                self._salt += 1
                outs.append(fn(self._flat_args(), jnp.int32(self._salt)))
            self.caps = list(caps_list)
            self._jit_cache[(tuple(self.caps), sig_at_build)] = \
                (fn, caps_list)
            self._gather_known_upto = len(self.gather_used)
            if profile:
                t_dispatch = time.perf_counter() - t0
            # ONE packed device->host read for every block's control word
            counts_mat = np.asarray(jnp.stack([o[2] for o in outs]))
            if profile:
                print(f"    blocks: dispatch {t_dispatch * 1e3:.1f}ms, "
                      f"+sync {(time.perf_counter() - t0 - t_dispatch) * 1e3:.1f}ms "
                      f"({self.n_blocks} blocks)", file=sys.stderr, flush=True)
                t0 = time.perf_counter()
            site_max = counts_mat[:, :-1].max(axis=0) \
                if counts_mat.shape[1] > 1 else np.zeros(0, np.int64)
            overflow = [i for i in range(min(len(site_max), len(self.caps)))
                        if site_max[i] > self.caps[i]]
            if overflow:
                for i in overflow:
                    self.caps[i] = bucket_capacity(max(int(site_max[i]), 1))
                self.last_retries += 1
                continue
            # tighten to the ACROSS-BLOCK max: the first-trace estimates
            # (e.g. join expand = probe capacity) never shrink on their own
            # with per-block tightening off, so a selective filter+join
            # chain would sort 90%+ dead rows in every block's partial
            # aggregate forever (Q3 SF10: 1.9s/block -> the capacity the
            # data actually needs). The NEXT run retraces once with
            # right-sized buffers; block-to-block variance is absorbed by
            # the bucket and, worst case, the overflow retry.
            for i in range(min(len(site_max), len(self.caps))):
                tight = bucket_capacity(max(int(site_max[i]), 1))
                if tight < self.caps[i]:
                    self.caps[i] = tight
            partials = [Table(self._make_columns(o[0], o[1]), int(row[-1]))
                        for o, row in zip(outs, counts_mat)]
            if self._mode == "topk":
                return self._merge_topk(partials)
            res = self._merge_and_finish(partials)
            if profile:
                print(f"    merge: {(time.perf_counter() - t0) * 1e3:.1f}ms",
                      file=sys.stderr, flush=True)
            return res
        raise RuntimeError("capacity retry limit exceeded: " +
                           str(list(zip(self._labels, self.caps))))

    def _merge_topk(self, partial_tables):
        """Per-block top-K tables (each the full root applied to one block)
        -> concat (<= K * n_blocks rows) -> one final re-sort + limit."""
        from hyrise_tpu.ops.base import execute_plan
        from hyrise_tpu.ops.get_table import TableWrapper
        from hyrise_tpu.ops.misc import Limit, UnionAll
        from hyrise_tpu.ops.sort import Sort

        from hyrise_tpu.storage.column import Column
        from hyrise_tpu.storage.table import Table
        from hyrise_tpu.types import bucket_capacity

        def shrink(t):
            # each partial holds <= K live prefix rows in block-capacity
            # arrays; slice to the K bucket so the merge concatenates
            # K * n_blocks rows, not n_blocks full blocks
            cap = bucket_capacity(max(int(self._topk_limit.n), 1))
            if cap >= t.capacity:
                return t
            cols = [Column(c.name, c.dtype, c.data[:cap],
                           None if c.validity is None else c.validity[:cap],
                           c.dictionary, unique=c.unique,
                           val_range=c.val_range) for c in t.columns]
            return Table(cols, t.num_rows, name=t.name)

        node = _union_tree([TableWrapper(shrink(t))
                            for t in partial_tables])
        root = Limit(Sort(node, list(self._topk_sort.sort_defs)),
                     self._topk_limit.n)
        for op in _walk(root):
            op.clear_output()
        return execute_plan(root)

    def _merge_and_finish(self, partial_tables):
        """Merge partial aggregates through ONE cached compiled program:
        UnionAll chain -> final aggregate -> AVG-finisher projection ->
        the original tail ops. The merge CompiledQuery pins the first
        run's partial tables as jit sources; later runs splice the new
        block outputs into those SAME Table objects (shapes are identical
        — the same partial program produced them), so steady state reuses
        the compiled merge with zero retraces. Changed partial counts
        (stream data changed between runs) rebuild the merge program."""
        from hyrise_tpu.ops.aggregate import Aggregate
        from hyrise_tpu.ops.get_table import TableWrapper
        from hyrise_tpu.ops.misc import UnionAll
        from hyrise_tpu.ops.projection import Projection

        counts = [int(t.num_rows) for t in partial_tables]
        pinned = getattr(self, "_merge_pinned", None)
        if pinned is not None:
            ok = (len(pinned) == len(partial_tables)
                  and [int(t.num_rows) for t in pinned] == counts
                  and all(a.capacity == b.capacity for a, b in
                          zip(pinned, partial_tables)))
            if not ok:
                pinned = None
        if pinned is not None:
            for dst, srct in zip(pinned, partial_tables):
                for a, b in zip(dst.columns, srct.columns):
                    a._data = b._data
                    a._validity = b._validity
        graft = self._tail_parent is not None
        if graft:
            orig_child = self._tail_parent.inputs[0]
        try:
            if pinned is None:
                self._merge_pinned = list(partial_tables)
                node = _union_tree([TableWrapper(t)
                                    for t in partial_tables])
                final = Aggregate(node, self._groupby, self._final_specs)
                self._merge_node = Projection(
                    final, list(self._groupby) + self._finish_cols)
                if graft:
                    self._tail_parent.inputs[0] = self._merge_node
                self._merge_cq = CompiledQuery(
                    self._orig_root if graft else self._merge_node)
                seed = getattr(self, "merge_seed", None)
                if seed:
                    self._merge_cq.caps[:] = [int(c)
                                              for c in seed.get("caps", [])]
                    if seed.get("gathers"):
                        self._merge_cq.seed_gathers(seed["gathers"])
            elif graft:
                self._tail_parent.inputs[0] = self._merge_node
            return self._merge_cq.run()
        finally:
            if graft:
                self._tail_parent.inputs[0] = orig_child
                for op in _walk(self._orig_root):
                    op.clear_output()


def _union_tree(nodes):
    """Balanced-tree UnionAll fold. A left-deep chain compounds capacity
    bounds EXPONENTIALLY on the first trace: each union's static bound is
    prev_capacity + block_capacity, and bucket_capacity rounds that up a
    full power of two when prev is already a power of two — 15 chained
    4M-cap partials inflate to a 2^36 bound (int32 overflow + a would-be
    64M-row first-trace sort). The tree's bounds are exact pairwise sums:
    bucket(n_blocks * partial_cap) at the root, log2 depth."""
    from hyrise_tpu.ops.misc import UnionAll

    while len(nodes) > 1:
        nxt = [UnionAll(nodes[i], nodes[i + 1])
               for i in range(0, len(nodes) - 1, 2)]
        if len(nodes) % 2:
            nxt.append(nodes[-1])
        nodes = nxt
    return nodes[0]


# single-input ops whose every output row derives from exactly one input
# row (filters / column rewrites): always safe to stream through
_ROW_DISTRIBUTIVE_1IN = ("TableScan", "Projection", "Alias", "Validate",
                         "Materialize")


def validate_stream_path(ops, leaf, stop, terminal_nodes=()) -> None:
    """Refuse decompositions where blocking the stream table changes the
    result: the path from the stream leaf `leaf` up to the split point
    `stop` must cross only row-distributive edges (module docstring). The
    reference has no analogue — its chunk loops always see the WHOLE other
    side (join_hash.cpp builds over all chunks); here the split subtree
    sees one block at a time, so e.g. a per-block semi join against a
    blocked build side would re-emit a probe row for every block it
    matches. `terminal_nodes` are additionally treated as part of the
    decomposition point (the top-K root's Sort/Limit pair)."""
    from hyrise_tpu.ops.join import Join, Product

    parents = {}
    for op in ops:
        for inp in op.inputs:
            parents.setdefault(id(inp), []).append(op)
    node = leaf
    while node is not stop and node not in terminal_nodes:
        ps = parents.get(id(node), [])
        if len(ps) != 1:
            raise PlanNotCompilable(
                f"blocked execution: stream-path node {node.name} has "
                f"{len(ps)} consumers (a shared stream subtree would "
                "pair rows only within a block)")
        p = ps[0]
        if p is stop or p in terminal_nodes:
            node = p
            continue
        if p.name in _ROW_DISTRIBUTIVE_1IN or p.name == "UnionAll":
            node = p
            continue
        if isinstance(p, Product):
            node = p
            continue
        if isinstance(p, Join):
            side = 0 if p.inputs[0] is node else 1
            mode = p.mode
            ok = (mode in (JoinMode.INNER,)
                  or (mode is JoinMode.LEFT and side == 0)
                  or (mode is JoinMode.RIGHT and side == 1)
                  or (mode in EXISTENCE_MODES and side == 0))
            if not ok:
                raise PlanNotCompilable(
                    "blocked execution: the stream table feeds the "
                    f"{'build' if side else 'preserved'} side of a "
                    f"{mode.value} join — per-block {mode.value} against "
                    "a blocked side is not row-distributive (would over/"
                    "under-count matches)")
            node = p
            continue
        raise PlanNotCompilable(
            f"blocked execution: {p.name} on the stream path is not "
            "row-distributive (each output row must derive from exactly "
            "one stream row)")
