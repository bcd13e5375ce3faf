"""Whole-plan compilation: run an entire physical operator DAG as ONE jitted
XLA program.

This is the TPU-native realization of the reference's JIT operator subsystem
(reference: src/lib/operators/jit_operator/ — JitOperatorWrapper chains
jittable operators into a fused per-tuple loop, specialized at runtime by
JitCodeSpecializer, jit_code_specializer.hpp:29-46; JitAwareLQPTranslator
finds maximal jittable subplans). Where the reference needs 6.9k LoC of LLVM
machinery, XLA *is* the specializing compiler — what remains is making the
operator graph traceable end-to-end.

The blocker is variable-size intermediates: the eager path host-syncs every
output count (count → bucket_capacity → allocate), one ~25 ms device→host
round trip per operator on a remote TPU. Here those sites route through a
**capacity oracle**:

- Eager mode (no active context): `oracle_capacity` host-syncs the count,
  exactly as before.
- Compiled mode: the count stays a traced scalar; the oracle hands out a
  SPECULATIVE static capacity for this call site (first trace: a provable
  bound or an estimate; later traces: the learned exact count) and records
  the traced count as a program output. After execution the host compares
  counts against capacities; any overflow bumps that site's capacity to the
  now-known exact count and re-traces. Once capacities are learned, repeated
  executions run sync-free: one device program, one host read of the result.

`CompiledQuery` wraps an operator DAG: it pins the base tables (jit
arguments), traces `execute_plan` under the oracle, manages the capacity
vector + retry loop, and rebuilds a host `Table` from the outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.types import DataType, bucket_capacity

# ---------------------------------------------------------------------------
# capacity oracle

_ACTIVE: Optional["CompileContext"] = None

# Pre-learned capacity vectors / gather-site consumed-column sets keyed by
# SQL text (the fixpoint depends on the data, not the device — learn on CPU
# with HYRISE_TPU_FASTPATH=1 so the site sequences match the TPU, then seed
# remote-TPU runs so each query compiles exactly once; see
# scripts/tpch_bench.py --cap-cache).
CAP_SEEDS: Dict[str, List[int]] = {}
GATHER_SEEDS: Dict[str, List[List[str]]] = {}


def active() -> Optional["CompileContext"]:
    return _ACTIVE


class CompileContext:
    """Per-trace state: speculative capacities (by call-site sequence number)
    and the traced actual counts.

    Gather sites (the join/materialization column gathers) are tracked the
    same way: by call-site sequence number. A site's CONSUMED column set is
    recorded by the lazy column thunks as they fire during the trace; on the
    next trace the set is complete ("known") and the site gathers those
    columns together in ONE sort-based multi-column gather
    (kernels/tpu_prims.gather_columns_via_sort) instead of one serialized
    XLA gather per column. Like capacities, the sets depend on the plan and
    data, not the device — learn them on CPU, seed remote-TPU runs.
    """

    def __init__(self, caps: List[int], gather_used: Optional[List[set]] = None,
                 gather_known_upto: int = 0,
                 col_bounds: Optional[Dict[str, Tuple[int, int]]] = None):
        self.caps = caps          # shared, persistent across retraces
        # host-known (min, max) VALUE bounds per unambiguous base-column
        # name: join keys never transform values, so a derived key column's
        # range is its base column's range — this sizes the static LUT of
        # the direct-address equi-join probe (kernels/tpu_prims
        # lookup_last_eq_lut) without any per-plan metadata propagation
        self.col_bounds = col_bounds or {}
        self.site = 0
        self.counts: List[jax.Array] = []
        self.bounds: List[Optional[int]] = []
        self.labels: List[str] = []
        self.table_subst: Dict[int, object] = {}  # id(source Table) -> traced
        # shared, persistent across retraces (like caps)
        self.gather_used = gather_used if gather_used is not None else []
        self.gather_known_upto = gather_known_upto
        self.gather_seq = 0

    def gather_site(self) -> int:
        i = self.gather_seq
        self.gather_seq += 1
        while len(self.gather_used) <= i:
            self.gather_used.append(set())
        return i

    def gather_known(self, site: int) -> Optional[set]:
        """The consumed-column tag set for this site, or None if this site
        has not yet lived through a complete trace."""
        if site < self.gather_known_upto:
            return self.gather_used[site]
        return None

    def record_gather(self, site: int, tag: str) -> None:
        self.gather_used[site].add(tag)

    def capacity(self, count, bound: Optional[int], estimate: Optional[int],
                 label: str) -> int:
        i = self.site
        self.site += 1
        self.counts.append(jnp.asarray(count, dtype=jnp.int64))
        self.bounds.append(bound)
        self.labels.append(label)
        if i < len(self.caps):
            return self.caps[i]
        if estimate is None:
            estimate = bound
        assert estimate is not None, \
            f"oracle site {label!r} needs a bound or an estimate"
        if bound is not None:
            estimate = min(estimate, bound)
        cap = bucket_capacity(max(int(estimate), 1))
        self.caps.append(cap)
        return cap


class _Activation:
    def __init__(self, ctx: CompileContext):
        self.ctx = ctx

    def __enter__(self):
        global _ACTIVE
        assert _ACTIVE is None, "nested plan compilation is not supported"
        _ACTIVE = self.ctx
        return self.ctx

    def __exit__(self, *exc):
        global _ACTIVE
        _ACTIVE = None
        return False


def oracle_capacity(count, *, bound: Optional[int] = None,
                    estimate: Optional[int] = None, label: str = ""):
    """(count, static capacity) for a variable-size output.

    Eager: host-syncs `count` (one device→host round trip) and buckets it.
    Compiled: keeps `count` traced; returns this site's speculative capacity.
    """
    ctx = _ACTIVE
    if ctx is None:
        c = int(count)
        return c, bucket_capacity(max(c, 1))
    cap = ctx.capacity(count, bound, estimate, label)
    # Clamp the count the plan continues with: if this site overflowed, the
    # run is wrong anyway (the host retries), but an unclamped num_rows >
    # capacity would feed out-of-bounds gathers downstream, poisoning the
    # OTHER sites' recorded counts with jnp.take fill values.
    return jnp.minimum(jnp.asarray(count, dtype=jnp.int64), cap), cap


def tracing() -> bool:
    return _ACTIVE is not None


# ---------------------------------------------------------------------------
# compiled query


@dataclasses.dataclass
class _ColMeta:
    name: str
    dtype: object
    dictionary: Optional[np.ndarray]
    has_validity: bool
    # host-known provenance metadata captured at trace time: carrying these
    # onto materialized results keeps the LUT-join fast path available when
    # a compiled stage's output feeds another compiled stage
    # (plan/segmented.py): without them every downstream join of a
    # materialized aggregate falls back to the sort engine
    unique: bool = False
    val_range: Optional[Tuple[int, int]] = None


class PlanNotCompilable(Exception):
    """Raised when the plan contains operators with no traceable form
    (read-write / MVCC operators, imports, prints)."""


_UNCOMPILABLE = ("Insert", "Delete", "Update", "ImportCsv", "ImportBinary",
                 "ExportCsv", "ExportBinary", "Print")


def _walk(root):
    seen, order = set(), []

    def rec(op):
        if id(op) in seen:
            return
        seen.add(id(op))
        for i in op.inputs:
            rec(i)
        order.append(op)

    rec(root)
    return order


class CompiledQuery:
    """Compile + execute an operator DAG as one jitted program.

    Usage:
        cq = CompiledQuery(root_op)
        table = cq.run()       # first call: trace/compile (+ possible
                               # overflow retries); later calls: sync-free
    """

    MAX_RETRIES = 12

    def __init__(self, root, catalog=None):
        from hyrise_tpu.ops.get_table import GetTable, TableWrapper

        self.root = root
        self.ops = _walk(root)
        for op in self.ops:
            if op.name in _UNCOMPILABLE:
                raise PlanNotCompilable(op.name)
        # pin base tables (jit arguments), dedup by identity
        self._sources: List[object] = []
        src_ids = set()
        for op in self.ops:
            t = None
            if isinstance(op, GetTable):
                cat = op.catalog
                if cat is None:
                    from hyrise_tpu.storage.catalog import default_catalog
                    cat = default_catalog()
                t = cat.get_table(op.table_name)
            elif isinstance(op, TableWrapper):
                t = op.table
            if t is not None and id(t) not in src_ids:
                if getattr(t, "mvcc", None) is not None:
                    raise PlanNotCompilable("MVCC table " + t.name)
                src_ids.add(id(t))
                self._sources.append(t)
        if not self._sources:
            raise PlanNotCompilable("no base tables")
        self.caps: List[int] = []
        self.gather_used: List[set] = []
        self._gather_known_upto = 0
        self._jit_cache: Dict[Tuple, object] = {}
        self._out_meta: Optional[List[_ColMeta]] = None
        self._labels: List[str] = []
        self.last_retries = 0
        self._salt = 0

    def seed_gathers(self, sets: Sequence[Sequence[str]]) -> None:
        """Pre-learned consumed-column sets per gather site (from a CPU run
        with the same HYRISE_TPU_FASTPATH setting as the target device):
        the first trace then batches gathers immediately — no learning
        retrace."""
        self.gather_used = [set(s) for s in sets]
        self._gather_known_upto = len(self.gather_used)

    def _gather_sig(self) -> Tuple:
        return (self._gather_known_upto,
                tuple(tuple(sorted(s))
                      for s in self.gather_used[:self._gather_known_upto]))

    # -- argument marshalling -------------------------------------------------

    @staticmethod
    def _narrow_encoded(c) -> bool:
        """Column whose at-rest form is a narrow code vector with an
        astype-only decode (storage/encoding.py NarrowCodes without a value
        dictionary — string columns): the compiled program takes the NARROW
        array as its argument and upcasts in-program, so the at-rest HBM
        footprint and scan bandwidth shrink to the encoded width."""
        enc = getattr(c, "encoded", None)
        if enc is None:
            return False
        from hyrise_tpu.storage.encoding import NarrowCodes
        return isinstance(enc, NarrowCodes) and enc.dictionary is None

    def _col_bounds(self) -> Dict[str, Tuple[int, int]]:
        """Host-known (min, max) value bounds of every integer/code base
        column, keyed by column name (names claimed by MORE than one source
        column are dropped as ambiguous). Computed ONCE from the concrete
        source tables — join keys never transform values, so any derived
        key column keeps its base range. Sizes the direct-address LUT join
        (tpu_prims.lookup_last_eq_lut: scatter+take, ~1s compile, vs ~50s
        per sort on the remote TPU)."""
        cached = getattr(self, "_col_bounds_cache", None)
        if cached is not None:
            return cached
        import numpy as np
        bounds: Dict[str, Tuple[int, int]] = {}
        seen = set()
        pend = []  # (name, lo_dev, hi_dev) device reductions, ONE sync below
        for t in self._sources:
            cols = getattr(t, "columns", None)
            if cols is None or not isinstance(t.num_rows, int):
                continue  # exotic sources: no bounds, sort probe
            # Sharded sources contribute INGEST metadata only: a device
            # min/max over their [n_shards, cap] arrays outside shard_map
            # triggers an out-of-band collective rendezvous that deadlocks
            # the mesh (round-3 regression). The table-global val_range is
            # a valid (conservative) bound for every shard.
            sharded = getattr(t, "is_sharded", False)
            n = t.num_rows
            for c in cols:
                name = c.name
                if name in seen:
                    bounds.pop(name, None)
                    pend = [pp for pp in pend if pp[0] != name]
                    continue
                seen.add(name)
                if n == 0:
                    continue
                if c.dtype is DataType.STRING:
                    bounds[name] = (0, max(len(c.dictionary) - 1, 0))
                elif c.dtype.is_integral:
                    if c.val_range is not None:  # ingest-computed, free
                        bounds[name] = c.val_range
                        continue
                    if sharded:
                        continue  # no metadata → no bound; never device-read
                    d = c.data[:n]
                    if c.validity is not None:
                        v = c.validity[:n]
                        lo = jnp.min(jnp.where(v, d, jnp.iinfo(d.dtype).max))
                        hi = jnp.max(jnp.where(v, d, jnp.iinfo(d.dtype).min))
                    else:
                        lo, hi = jnp.min(d), jnp.max(d)
                    pend.append((name, lo, hi))
        if pend:
            # one packed device->host read for ALL remaining reductions
            # (each scalar int() costs a full tunnel round trip + compile)
            flat = np.asarray(jnp.stack(
                [jnp.asarray(x, jnp.int64) for _, lo, hi in pend
                 for x in (lo, hi)]))
            for i, (name, _, _) in enumerate(pend):
                lo, hi = int(flat[2 * i]), int(flat[2 * i + 1])
                if lo <= hi:
                    bounds[name] = (lo, hi)
        self._col_bounds_cache = bounds
        return bounds

    def _flat_args(self) -> List[jax.Array]:
        args = []
        for t in self._sources:
            for c in t.columns:
                args.append(c.encoded.codes if self._narrow_encoded(c)
                            else c.data)
                if c.has_validity:
                    args.append(c.validity)
        return args

    def _rebuild_tables(self, flat: Sequence[jax.Array], ctx: CompileContext):
        from hyrise_tpu.storage.column import Column
        from hyrise_tpu.storage.table import Table

        bounds = self._col_bounds()
        it = iter(flat)
        for src in self._sources:
            cols = []
            for c in src.columns:
                data = next(it)
                validity = next(it) if c.has_validity else None
                # provenance-carried value bound: ingest metadata, or the
                # (unambiguous-name) host-computed bound — travels on the
                # Column through passthrough ops so the LUT join only ever
                # sees bounds for verifiably untransformed base columns
                vr = c.val_range if c.val_range is not None \
                    else bounds.get(c.name)
                if self._narrow_encoded(c):
                    # decode-in-program: lazy astype so untouched columns
                    # cost nothing; XLA fuses the upcast into consumers
                    cap = int(data.shape[0])
                    data = (lambda d=data: d.astype(jnp.int32))
                    cols.append(Column(c.name, c.dtype, data, validity,
                                       c.dictionary, capacity_hint=cap,
                                       unique=c.unique, val_range=vr))
                    continue
                cols.append(Column(c.name, c.dtype, data, validity,
                                   c.dictionary, unique=c.unique,
                                   val_range=vr))
            t = Table(cols, src.num_rows, name=src.name)
            ctx.table_subst[id(src)] = t

    # -- tracing --------------------------------------------------------------

    def _traced_fn(self, flat_args, salt, caps: List[int]):
        from hyrise_tpu.ops.base import execute_plan

        ctx = CompileContext(caps, self.gather_used, self._gather_known_upto,
                             col_bounds=self._col_bounds())
        self._rebuild_tables(flat_args, ctx)
        for op in self.ops:
            op.clear_output()
        with _Activation(ctx):
            out = execute_plan(self.root)
            from hyrise_tpu.ops.materialize import ensure_prefix
            out = ensure_prefix(out)
        datas, valids, meta = [], [], []
        for c in out.columns:
            datas.append(c.data)
            valids.append(c.validity)
            vr = c.val_range if isinstance(c.val_range, tuple) else None
            meta.append(_ColMeta(c.name, c.dtype, c.dictionary,
                                 c.validity is not None,
                                 unique=bool(c.unique), val_range=vr))
        self._out_meta = meta
        self._labels = ctx.labels
        n_rows = jnp.asarray(out.num_rows, dtype=jnp.int64)
        # ONE control output: [site counts..., n_rows] — the host's overflow
        # check and row count cost a single device->host read (the remote
        # tunnel charges ~25ms per read)
        counts = jnp.stack(ctx.counts + [n_rows]) if ctx.counts \
            else n_rows[None]
        # echo the salt so the argument survives DCE: distinct args per call
        # defeat transport-level result caching of identical dispatches
        return tuple(datas), tuple(valids), counts, salt

    def _get_jitted(self):
        key = (tuple(self.caps), self._gather_sig())
        entry = self._jit_cache.get(key)
        if entry is None:
            # Each capacity assignment needs its OWN function identity:
            # jax.jit conflates equal-comparing bound methods, so a retrace
            # after a capacity change would silently reuse the stale program.
            caps_list = list(self.caps)

            def run_plan(flat_args, salt, _caps=caps_list):
                return self._traced_fn(flat_args, salt, _caps)

            entry = (jax.jit(run_plan), caps_list)
            self._jit_cache[key] = entry
        return entry

    def lowered_text(self) -> str:
        """StableHLO of the current steady-state program (diagnostics: op
        census / program-size budgeting for remote TPU compiles)."""
        self._col_bounds()  # force host-side bounds OUTSIDE the trace
        fn, _ = self._get_jitted()
        self._salt += 1
        return fn.lower(self._flat_args(), jnp.int32(self._salt)).as_text()

    # -- execution ------------------------------------------------------------

    def run(self, tighten: bool = True):
        """Execute; on capacity overflow, grow to the exact observed count and
        re-trace. With `tighten`, loose capacities (first-trace bounds) are
        shrunk to the observed counts for the NEXT run."""
        from hyrise_tpu.storage.table import Table

        flat = self._flat_args()
        self._col_bounds()  # force host-side bounds OUTSIDE the trace
        self.last_retries = 0
        seeded_n = len(self.caps) if self._out_meta is None else None
        for _ in range(self.MAX_RETRIES):
            fn, caps_list = self._get_jitted()
            sig_at_build = self._gather_sig()
            self._salt += 1
            datas, valids, counts, _ = fn(flat, jnp.int32(self._salt))
            # the first trace appends capacities for newly-seen sites;
            # adopt them and register the entry under the full vector too
            self.caps = list(caps_list)
            self._jit_cache[(tuple(self.caps), sig_at_build)] = (fn, caps_list)
            # the trace is complete, so every gather site's consumed-column
            # set is now fully recorded: later (re)traces batch them
            self._gather_known_upto = len(self.gather_used)
            if seeded_n and seeded_n != len(self.caps):
                import warnings
                warnings.warn(
                    f"capacity seed has {seeded_n} sites but the plan "
                    f"traced {len(self.caps)}: the seed was harvested "
                    f"under a different HYRISE_TPU_FASTPATH setting and "
                    f"every tighten will RETRACE+RECOMPILE (minutes each "
                    f"on the remote TPU). Regenerate with tpch_bench.py "
                    f"--cpu --fastpath matching the target device.")
                seeded_n = None
            counts_all = self._counts_host(counts)  # [...sites, n_rows]
            counts_h, n = counts_all[:-1], int(counts_all[-1])
            overflow = [i for i, c in enumerate(counts_h)
                        if i < len(self.caps) and c > self.caps[i]]
            if not overflow:
                if tighten:
                    self._tighten(counts_h)
                cols = self._make_columns(datas, valids)
                return Table(cols, n)
            for i in overflow:
                self.caps[i] = bucket_capacity(max(int(counts_h[i]), 1))
            self.last_retries += 1
        raise RuntimeError("capacity retry limit exceeded: " +
                           str(list(zip(self._labels, self.caps))))

    def _counts_host(self, counts) -> np.ndarray:
        """Per-site observed counts for the overflow check (subclasses with
        sharded counts reduce across shards here)."""
        return np.asarray(counts)

    def _tighten(self, counts_h: np.ndarray) -> None:
        for i, c in enumerate(counts_h):
            if i >= len(self.caps):
                break
            tight = bucket_capacity(max(int(c), 1))
            if tight < self.caps[i]:
                self.caps[i] = tight

    def _make_columns(self, datas, valids):
        from hyrise_tpu.storage.column import Column

        cols = []
        for m, d, v in zip(self._out_meta, datas, valids):
            cols.append(Column(m.name, m.dtype, d, v, m.dictionary,
                               unique=m.unique, val_range=m.val_range))
        return cols
