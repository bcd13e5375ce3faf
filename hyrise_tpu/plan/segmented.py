"""Segmented streaming execution: the general chunk axis for plans the
single-segment blocked compiler (plan/blocked.py) cannot stream.

The reference runs EVERY operator chunk-at-a-time over arbitrarily large
tables (reference: src/lib/storage/chunk.hpp:44 Chunk::MAX_SIZE,
src/lib/operators/table_scan.cpp:92-159 per-chunk jobs,
aggregate.cpp:437-541 per-chunk maps merged at the end), so a query that
references the fact table several times, nests aggregates, or roots at a
join still scales past device memory. BlockedCompiledQuery streams exactly
one shape: tail* -> decomposable Aggregate over a single distributive
stream occurrence. This module decomposes everything else into STAGES of
that shape:

1.  large sources — tables whose capacity exceeds `resident_rows` — must be
    streamed; everything else stays device-resident,
2.  a rewrite pass wraps the build side of semi/anti joins containing a
    large ref in a DISTINCT-key Aggregate (same join semantics: existence
    joins only consult key presence, and one surviving NULL key row
    preserves NULL/NOT IN behavior) so the large ref sits under a
    decomposable aggregate,
3.  extraction repeatedly picks a lowest Aggregate whose subtree holds
    exactly ONE large ref on a row-distributive path, extends it upward
    through cheap single-input tail ops (HAVING scans / projections /
    aliases), cuts it out of the plan as a stage, and substitutes a
    TableWrapper placeholder that will receive the materialized result,
4.  the final stage is the remaining root: blocked if a large ref remains,
    a plain whole-plan CompiledQuery otherwise.

Stages run in dependency order; each stage's CompiledQuery object is cached
across run() calls, and repeated runs rebind the new result arrays into the
SAME placeholder Table (downstream programs pinned the placeholder as a jit
argument) so steady-state reruns stay retrace-free.

TPC-H at SF10 (64M-row lineitem, resident_rows=2^24): Q4/Q13/Q15/Q17/Q18/
Q20/Q21 decompose into 1-3 lineitem-streaming stages + a resident finish;
the single-segment queries pass through unchanged as one blocked stage.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

from hyrise_tpu.plan.blocked import (BlockedCompiledQuery, _decompose,
                                     validate_stream_path)
from hyrise_tpu.plan.compiler import (CompiledQuery, PlanNotCompilable,
                                      _walk)
from hyrise_tpu.types import EXISTENCE_MODES

# single-input tail ops a segment is extended through after its split
# aggregate (a HAVING scan shrinks the materialized result; projections/
# aliases are free) — Sort/Limit stay in the residual plan
_SEGMENT_TAIL_OPS = ("TableScan", "Projection", "Alias")


def _make_prune_op():
    from hyrise_tpu.ops.base import AbstractOperator
    from hyrise_tpu.storage.table import Table

    class _PruneTo(AbstractOperator):
        """Keep-list projection for hoisted-stage outputs: drops columns
        no operator outside the subtree mentions, so materialization only
        pays gathers for columns the plan actually reads. Row-preserving;
        the keep set intersects with the actual schema at execution."""

        name = "Materialize"

        def __init__(self, input_op, keep):
            super().__init__(input_op)
            self.keep = set(keep)

        def _on_execute(self, context) -> Table:
            t = self.input_table(0)
            cols = [c for c in t.columns if c.name in self.keep]
            if not cols:
                return t
            return Table(cols, t.num_rows, name=t.name, live=t.live)

    return _PruneTo


_PruneTo = _make_prune_op()


@dataclasses.dataclass
class _Stage:
    top: object                      # subplan root this stage materializes
    wrapper: Optional[object]        # placeholder receiving the result
    stream: Optional[str]            # stream table name (None: compiled)
    cq: object = None                # cached (Blocked)CompiledQuery
    seed: Optional[dict] = None      # pre-learned caps/gathers


class SegmentedQuery:
    """Decompose-and-stream driver over an operator DAG.

    sq = SegmentedQuery(TPCH_PLANS[18](cat), cat, block_rows=1 << 22)
    table = sq.run()

    The plan is rewritten in place (existence-build DISTINCT wrap, segment
    cut-out): SegmentedQuery takes ownership of the DAG passed in.
    """

    def __init__(self, root, catalog=None, block_rows: int = 1 << 22,
                 resident_rows: int = 1 << 24,
                 stream_tables: Optional[List[str]] = None,
                 hoist_min_rows: int = 1 << 18):
        self.root = root
        self.catalog = catalog
        self.block_rows = block_rows
        self.resident_rows = resident_rows
        self._stream_tables = stream_tables
        self.hoist_min_rows = hoist_min_rows
        self._rewrite_existence_builds()
        self.stages: List[_Stage] = self._extract()
        self._hoist_stream_free()

    # -- plan analysis -----------------------------------------------------

    def _leaf_table(self, op):
        from hyrise_tpu.ops.get_table import GetTable, TableWrapper
        if isinstance(op, GetTable):
            cat = op.catalog
            if cat is None:
                from hyrise_tpu.storage.catalog import default_catalog
                cat = default_catalog()
            return cat.get_table(op.table_name)
        if isinstance(op, TableWrapper):
            return op.table
        return None

    def _is_large(self, op) -> bool:
        t = self._leaf_table(op)
        if t is None or t.capacity is None:
            return False
        if self._stream_tables is not None:
            return t.name in self._stream_tables
        return t.capacity > self.resident_rows

    def _large_leaves(self, sub_root):
        return [op for op in _walk(sub_root) if self._is_large(op)]

    def _refs_of(self, sub_root, table) -> int:
        from hyrise_tpu.ops.get_table import GetTable, TableWrapper
        n = 0
        for op in _walk(sub_root):
            if isinstance(op, GetTable) and op.table_name == table.name:
                n += 1
            elif isinstance(op, TableWrapper) and op.table is table:
                n += 1
        return n

    def _is_root_split(self, op, parents) -> bool:
        """True when `op` hangs under the root through BlockedCompiledQuery
        tail ops only — i.e. the final blocked stage would split exactly
        here, so extracting it as a separate stage is pure overhead."""
        node = op
        while True:
            if node is self.root:
                return True
            ps = parents.get(id(node), [])
            if len(ps) != 1 or len(ps[0].inputs) != 1 or \
                    ps[0].name not in ("Sort", "Projection", "Limit",
                                       "Alias", "TableScan"):
                return False
            node = ps[0]

    # -- rewrite: existence-join builds ------------------------------------

    def _rewrite_existence_builds(self) -> None:
        """SEMI/ANTI joins only consult build-key PRESENCE, so a large build
        subtree can always be reduced through a DISTINCT-key aggregate —
        which extraction can then stream. Key multiplicity is irrelevant;
        a NULL key group survives as one row, preserving the NULL-never-
        matches / NOT-IN-poisoning semantics (ops/join.py NULL rules)."""
        from hyrise_tpu.expression.ast import col, count_
        from hyrise_tpu.ops.aggregate import Aggregate
        from hyrise_tpu.ops.join import Join

        for op in _walk(self.root):
            if isinstance(op, Join) and op.mode in EXISTENCE_MODES:
                build = op.inputs[1]
                if isinstance(build, Aggregate):
                    continue
                if not self._large_leaves(build):
                    continue
                distinct = Aggregate(build, [op.right_col],
                                     [("__exists_cnt", count_())])
                op.inputs[1] = distinct

    # -- extraction --------------------------------------------------------

    def _extract(self) -> List[_Stage]:
        from hyrise_tpu.ops.aggregate import Aggregate
        from hyrise_tpu.ops.get_table import TableWrapper

        stages: List[_Stage] = []
        while True:
            large = self._large_leaves(self.root)
            if not large:
                break
            parents: Dict[int, list] = {}
            for op in _walk(self.root):
                for inp in op.inputs:
                    parents.setdefault(id(inp), []).append(op)
            chosen = None
            for op in _walk(self.root):  # post-order: lowest first
                if not isinstance(op, Aggregate) or op is self.root:
                    continue
                sub_ops = _walk(op)
                in_sub = [l for l in large if l in sub_ops]
                if len(in_sub) != 1:
                    continue
                leaf = in_sub[0]
                if self._refs_of(op, self._leaf_table(leaf)) != 1:
                    continue
                try:
                    _decompose(op.aggregates)
                    validate_stream_path(sub_ops, leaf, op)
                except PlanNotCompilable:
                    continue
                if self._is_root_split(op, parents):
                    # this aggregate IS the final blocked stage's split
                    # point: leave it in place (one blocked pass beats
                    # segment + compiled-tail stage)
                    continue
                chosen = (op, leaf)
                break
            if chosen is None:
                break  # let the final stage handle (or refuse) the rest
            node, leaf = chosen
            # extend upward through cheap single-consumer tail ops
            while True:
                ps = parents.get(id(node), [])
                if len(ps) == 1 and ps[0] is not self.root \
                        and ps[0].name in _SEGMENT_TAIL_OPS \
                        and len(ps[0].inputs) == 1:
                    node = ps[0]
                    continue
                break
            if node is self.root or not parents.get(id(node)):
                break  # the remaining plan IS the segment: final stage
            wrapper = TableWrapper(None)
            for p in parents[id(node)]:
                p.inputs = [wrapper if i is node else i for i in p.inputs]
            stages.append(_Stage(node, wrapper,
                                 self._leaf_table(leaf).name))
        rest_large = self._large_leaves(self.root)
        final_stream = None
        if rest_large:
            final_stream = max((self._leaf_table(l) for l in rest_large),
                               key=lambda t: t.capacity).name
        stages.append(_Stage(self.root, None, final_stream))
        return stages

    # -- hoisting: stream-independent subtrees -----------------------------

    @staticmethod
    def _referenced_columns(op):
        """Column names this operator reads from its inputs, or None when
        the set cannot be determined statically (consume-everything ops:
        UnionAll/UnionPositions/Difference/Print)."""
        names = set()
        n = op.name
        if n == "TableScan":
            names |= set(op.predicate.columns())
        elif n == "Projection":
            for spec in op.outputs:
                if isinstance(spec, str):
                    names.add(spec)
                else:
                    names |= set(spec[1].columns())
        elif n == "Sort":
            names |= {c for c, _ in op.sort_defs}
        elif n in ("Join", "JoinHash", "JoinSortMerge", "JoinIndex",
                   "JoinMPSM", "JoinNestedLoop"):
            names |= {op.left_col, op.right_col}
        elif n == "Alias":
            if op.sources is not None:
                names |= set(op.sources)
            # sources=None renames positionally: consumes every column,
            # but by POSITION — pruning would shift them; treat as unknown
            else:
                return None
        elif n == "Aggregate":
            names |= set(op.groupby)
            for _, agg in op.aggregates:
                if agg.arg is not None:
                    names |= set(agg.arg.columns())
        elif n in ("Limit", "Materialize", "Validate", "GetTable",
                   "TableWrapper", "Product"):
            pass  # row ops / leaves: no per-name reads (Product keeps all
            # columns but a pruned hoisted side simply carries fewer —
            # only sound when the prune set covers downstream readers,
            # which the global mentioned-set guarantees)
        else:
            return None
        return names

    def _mentioned_outside(self, exclude_ops) -> Optional[set]:
        """Union of every column name read by any operator of any stage
        OUTSIDE `exclude_ops` — the safe keep-set for pruning a hoisted
        subtree's materialized output. None if any such operator's reads
        are not statically known (pruning is then skipped)."""
        excl = {id(o) for o in exclude_ops}
        mentioned: set = set()
        roots = [s.top for s in self.stages] + [self.root]
        seen = set()
        for r in roots:
            for op in _walk(r):
                if id(op) in excl or id(op) in seen:
                    continue
                seen.add(id(op))
                names = self._referenced_columns(op)
                if names is None:
                    return None
                mentioned |= names
        return mentioned

    def _hoist_stream_free(self) -> None:
        """A blocked stage's compiled program re-executes its ENTIRE
        subtree per block — including subplans that never touch the stream
        table (the reference's per-chunk jobs share one build side across
        all chunks, join_hash.cpp:204-355: the build is done ONCE). Cut
        every stream-free subtree off the stream path into its own
        compiled stage, materialized once per run and fed to the block
        program as a resident source. Gated on the subtree touching at
        least one table of `hoist_min_rows` capacity: hoisting a 25-row
        nation scan would COST a dispatch+read round trip per run for
        nothing."""
        from hyrise_tpu.ops.get_table import GetTable, TableWrapper

        out: List[_Stage] = []
        for stage in self.stages:
            if stage.stream is None:
                out.append(stage)
                continue
            subs = _walk(stage.top)
            leaf = None
            for op in subs:
                t = self._leaf_table(op)
                if t is not None and t.name == stage.stream:
                    leaf = op
            if leaf is None:
                out.append(stage)
                continue
            parents: Dict[int, list] = {}
            for op in subs:
                for inp in op.inputs:
                    parents.setdefault(id(inp), []).append(op)
            path = {id(leaf)}
            node = leaf
            while node is not stage.top:
                ps = parents.get(id(node), [])
                if len(ps) != 1:
                    break
                node = ps[0]
                path.add(id(node))
            hoisted: Dict[int, object] = {}  # id(subtree) -> wrapper
            for op in subs:
                if id(op) not in path:
                    continue
                for i, inp in enumerate(op.inputs):
                    if id(inp) in path:
                        continue
                    if isinstance(inp, (GetTable, TableWrapper)):
                        continue  # already resident
                    caps = [t.capacity for l in _walk(inp)
                            for t in (self._leaf_table(l),)
                            if t is not None]
                    if not caps or max(caps) < self.hoist_min_rows:
                        continue
                    w = hoisted.get(id(inp))
                    if w is None:
                        w = TableWrapper(None)
                        hoisted[id(inp)] = w
                        top = self._maybe_prune(inp, stage.top)
                        out.append(_Stage(top, w, None))
                    op.inputs[i] = w
            out.append(stage)
        self.stages = out

    def _maybe_prune(self, sub_root, stage_top):
        """Materializing a hoisted subtree gathers EVERY output column
        (comments, addresses) even when the consuming block program reads
        three of them — for Q3's orders x customer that is most of the
        hoisted stage's time. Wrap the subtree in a keep-list projection of
        every column name any operator outside it mentions, but only when
        (a) all outside reads are statically known and (b) every path from
        the consuming wrapper to its stage root crosses a column-
        enumerating op (Aggregate / Projection / source-named Alias), so
        pruned columns can never silently vanish from a final result."""
        sub_ops = _walk(sub_root)
        mentioned = self._mentioned_outside(sub_ops)
        if mentioned is None:
            return sub_root
        parents: Dict[int, list] = {}
        for op in _walk(stage_top):
            for inp in op.inputs:
                parents.setdefault(id(inp), []).append(op)

        def enumerating(op):
            return (op.name in ("Aggregate",)
                    or op.name == "Projection"
                    or (op.name == "Alias" and op.sources is not None))

        frontier, seen = [sub_root], set()
        while frontier:
            node = frontier.pop()
            for p in parents.get(id(node), []):
                if id(p) in seen:
                    continue
                seen.add(id(p))
                if enumerating(p):
                    continue
                if p is stage_top:
                    return sub_root  # schema-carrying path: don't prune
                frontier.append(p)
        return _PruneTo(sub_root, mentioned)

    # -- execution ---------------------------------------------------------

    def _build_cq(self, stage: _Stage):
        if stage.stream is not None:
            cq = BlockedCompiledQuery(stage.top, self.catalog,
                                      stream_table=stage.stream,
                                      block_rows=self.block_rows)
        else:
            cq = CompiledQuery(stage.top, self.catalog)
        if stage.seed:
            cq.caps[:] = [int(c) for c in stage.seed.get("caps", [])]
            if stage.seed.get("gathers"):
                cq.seed_gathers(stage.seed["gathers"])
            if stage.seed.get("merge"):
                cq.merge_seed = stage.seed["merge"]
        return cq

    def _bind(self, stage: _Stage, result) -> None:
        """Attach a stage result to its placeholder. First run: adopt the
        table object (downstream stages will pin it as a jit source).
        Later runs: splice the new arrays into the SAME object in place so
        downstream compiled programs keep their argument identity; a
        capacity change (data changed between runs) invalidates the cached
        downstream programs instead."""
        from hyrise_tpu.ops.materialize import ensure_prefix
        result = ensure_prefix(result)
        dst = stage.wrapper.table
        if dst is None:
            stage.wrapper.table = result
            return
        # num_rows is host-known and BAKED into downstream traces (live-mask
        # iota bounds), so a changed count is a shape change too
        same_shape = (dst.capacity == result.capacity
                      and dst.num_rows == int(result.num_rows)
                      and len(dst.columns) == len(result.columns)
                      and all(a.dtype is b.dtype for a, b in
                              zip(dst.columns, result.columns)))
        if not same_shape:
            i = self.stages.index(stage)
            for later in self.stages[i + 1:]:
                later.cq = None
            stage.wrapper.table = result
            return
        for a, b in zip(dst.columns, result.columns):
            a._data = b.data
            a._validity = b._validity
            a.dictionary = b.dictionary
            a.val_range = b.val_range
            a.unique = b.unique
            a.encoded = b.encoded
        dst.live = result.live

    def run(self):
        import os
        import sys
        import time
        profile = os.environ.get("HYRISE_TPU_PROFILE", "") == "1"
        out = None
        for i, stage in enumerate(self.stages):
            t0 = time.perf_counter()
            if stage.cq is None:
                stage.cq = self._build_cq(stage)
            out = stage.cq.run()
            if stage.wrapper is not None:
                self._bind(stage, out)
            if profile:
                kind = f"blocked[{stage.stream}]" if stage.stream \
                    else "compiled"
                print(f"  stage {i} {kind} root={stage.top.name}: "
                      f"{(time.perf_counter() - t0) * 1e3:.1f}ms",
                      file=sys.stderr, flush=True)
        return out

    # -- capacity/gather seeding (scripts/tpch_bench.py --cap-cache) -------

    def dump_seed(self) -> List[dict]:
        out = []
        for s in self.stages:
            if s.cq is None:
                continue
            d = {"caps": list(s.cq.caps),
                 "gathers": [sorted(g) for g in s.cq.gather_used]}
            m = getattr(s.cq, "_merge_cq", None)
            if m is not None:
                d["merge"] = {"caps": list(m.caps),
                              "gathers": [sorted(g) for g in m.gather_used]}
            out.append(d)
        return out

    def load_seed(self, seed: List[dict]) -> None:
        if not seed or len(seed) != len(self.stages):
            return
        for s, sd in zip(self.stages, seed):
            s.seed = sd

    def describe(self) -> str:
        lines = []
        for i, s in enumerate(self.stages):
            kind = f"blocked[{s.stream}]" if s.stream else "compiled"
            role = "final" if s.wrapper is None else "segment"
            lines.append(f"stage {i}: {role} {kind} root={s.top.name}")
        return "\n".join(lines)
