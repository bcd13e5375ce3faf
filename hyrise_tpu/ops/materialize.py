"""Selection materialization — the PosList / ReferenceColumn equivalent.

Reference: src/lib/storage/reference_column.hpp:19-51 and PosList
(types.hpp:138). A selection over a table is a dense int32 gather-index array
plus a host-known count; tails are filled with index 0 (harmless — rows past
`count` are dead). Counting forces one device→host sync per variable-size
operator, matching the reference's per-operator barrier
(CurrentScheduler::wait_for_tasks), and capacities are bucketed to powers of
two so XLA compiles a bounded shape set.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import bucket_capacity


def mask_to_indices(mask: jax.Array) -> Tuple[jax.Array, object]:
    """Compact a boolean mask into (indices, count).

    Eager: one host sync (the reference's per-operator barrier). Compiled:
    the count stays traced and the capacity is the oracle's speculative
    static size (bounded by the mask length — a filter cannot grow)."""
    from hyrise_tpu.kernels.tpu_prims import compact_indices
    from hyrise_tpu.plan.compiler import oracle_capacity
    count, cap = oracle_capacity(jnp.sum(mask), bound=int(mask.shape[0]),
                                 label="filter")
    return compact_indices(mask, cap), count


@jax.jit
def _take(a, indices):
    return jnp.take(a, indices, axis=0)


def _recording(ctx, site: int, tag: str, fn):
    """Lazy thunk that tells the compile context which columns a gather
    site actually materializes (the consumed set drives batching on the
    next trace)."""
    if ctx is None:
        return fn

    def thunk():
        ctx.record_gather(site, tag)
        return fn()

    return thunk


def gather_columns_at(table: Table, indices: jax.Array,
                      extra_valid: Optional[jax.Array] = None,
                      preserve_unique: bool = False) -> list:
    """Columns of table[indices] — the shared join/materialization gather.

    Late materialization (the ReferenceColumn idea, reference
    src/lib/storage/reference_column.hpp:19-51): each output column holds a
    lazy thunk; only columns read downstream pay their gather. Under plan
    compilation, the set of columns a site actually materializes is
    recorded on the first trace; subsequent traces gather the whole set in
    ONE sort-based multi-column pass (tpu_prims.gather_columns_via_sort) —
    XLA's per-column gathers serialize (~20 ms / 1M rows on v5e) while one
    multi-payload sort moves every column near roofline.

    extra_valid (aligned with indices) marks rows forced NULL (outer-join
    padding)."""
    from hyrise_tpu.kernels import tpu_prims
    from hyrise_tpu.plan.compiler import active
    from hyrise_tpu.utils.asserts import assert_indices_in_range

    assert_indices_in_range(indices, table.capacity, "gather.indices")
    cap = int(indices.shape[0])
    ctx = active()
    site = ctx.gather_site() if ctx is not None else None
    known = ctx.gather_known(site) if ctx is not None else None
    got = {}
    import os
    batch_on = os.environ.get("HYRISE_TPU_BATCH_GATHER", "1") not in (
        "0", "false", "no")
    if known and batch_on and tpu_prims.fast_path():
        arrays, tags = [], []
        for c in table.columns:
            dtag, vtag = c.name + ":d", c.name + ":v"
            if dtag in known:
                arrays.append(c.data)
                tags.append(dtag)
            if c.has_validity and vtag in known:
                arrays.append(c.validity)
                tags.append(vtag)
        if arrays:
            outs = tpu_prims.gather_columns_via_sort(arrays, indices)
            got = dict(zip(tags, outs))
    cols = []
    for c in table.columns:
        dtag, vtag = c.name + ":d", c.name + ":v"
        if dtag in got:
            data = got[dtag]
        else:
            data = _recording(ctx, site, dtag,
                              lambda col=c: _take(col.data, indices))
        if c.has_validity:
            if vtag in got:
                v = (got[vtag] & extra_valid if extra_valid is not None
                     else got[vtag])
            elif extra_valid is not None:
                v = _recording(ctx, site, vtag,
                               lambda col=c: _take(col.validity, indices)
                               & extra_valid)
            else:
                v = _recording(ctx, site, vtag,
                               lambda col=c: _take(col.validity, indices))
        else:
            v = extra_valid
        # gathered values are a subset of the source's live values, so the
        # ingest range bound stays valid (val_range is conservative)
        cols.append(Column(c.name, c.dtype, data, v, c.dictionary,
                           capacity_hint=cap,
                           unique=c.unique and preserve_unique,
                           val_range=c.val_range))
    return cols


def gather_table(table: Table, indices: jax.Array, count: int,
                 name: Optional[str] = None, lazy: bool = True,
                 preserve_unique: bool = False) -> Table:
    """table[indices[:count]] as a new table (see gather_columns_at).
    preserve_unique: set only when `indices` are pairwise distinct
    (filter compactions), so unique flags survive the row subset."""
    if lazy:
        cols = gather_columns_at(table, indices,
                                 preserve_unique=preserve_unique)
    else:
        from hyrise_tpu.utils.asserts import assert_indices_in_range
        assert_indices_in_range(indices, table.capacity,
                                "gather_table.indices")
        cols = [Column(c.name, c.dtype, _take(c.data, indices),
                       _take(c.validity, indices) if c.has_validity else None,
                       c.dictionary, unique=c.unique and preserve_unique,
                       val_range=c.val_range)
                for c in table.columns]
    return Table(cols, count, name=name if name is not None else table.name)


def filter_table(table: Table, mask: jax.Array) -> Table:
    """mask (capacity,) → filtered table. Mask is ANDed with live rows.

    TPU fast path: a filter costs NOTHING — the output is the same columns
    with a live MASK (Table masked layout); downstream mask-consuming
    operators (scans, joins, aggregates) read live_mask() unchanged, and
    only prefix-requiring operators pay a compaction (ensure_prefix). CPU
    keeps the compact-and-lazily-gather form (late materialization)."""
    from hyrise_tpu.kernels import tpu_prims
    mask = mask & table.live_mask()
    if not tpu_prims.fast_path():
        indices, count = mask_to_indices(mask)
        return gather_table(table, indices, count, preserve_unique=True)
    from hyrise_tpu.plan.compiler import tracing
    count_t = jnp.sum(mask)
    count = count_t if tracing() else int(count_t)
    return Table(table.columns, count, name=table.name, live=mask)


def ensure_prefix(table: Table) -> Table:
    """Materialize a masked-layout table into prefix layout (rows [0, n)
    live): ONE multi-operand stable sort moves every column (32-bit columns
    packed pairwise — kernels/tpu_prims.py). No-op for prefix tables."""
    if table.live is None:
        return table
    from hyrise_tpu.kernels import tpu_prims
    from hyrise_tpu.plan.compiler import oracle_capacity
    mask = table.live
    count, cap = oracle_capacity(jnp.sum(mask), bound=int(mask.shape[0]),
                                 label="materialize")
    arrays, has_v = [], []
    for c in table.columns:
        arrays.append(c.data)
        has_v.append(c.has_validity)
        if c.has_validity:
            arrays.append(c.validity)
    outs = tpu_prims.compact(mask, arrays, cap)
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
    t = Table(cols, count, name=table.name)
    t.mvcc = table.mvcc
    return t


def compact_if_shrunk(table: Table) -> Table:
    """Masked-layout table → prefix layout WHEN the learned live count's
    capacity bucket is smaller than the current capacity.

    Rationale: the masked layout makes filters free, but every sort-based
    consumer downstream (joins, group-bys) then pays per-CAPACITY sort
    costs. When the oracle has learned that far fewer rows are live, one
    compaction pays for itself across all downstream sorts. Implemented as
    compact_indices + a lazy gather (NOT a whole-row compact sort) so only
    the columns actually consumed downstream are moved — the gather-site
    learning batches them into one multi-column sort-gather on later
    traces. First trace (capacity-bound speculative cap): keeps the masked
    layout; after tightening/seeding the bucket shrinks and the compacted
    program is traced.
    """
    if table.live is None:
        return table
    cached = getattr(table, "_prefix_cache", None)
    if cached is not None:
        return cached
    from hyrise_tpu.kernels.tpu_prims import compact_indices
    from hyrise_tpu.plan.compiler import oracle_capacity
    mask = table.live
    count, cap = oracle_capacity(jnp.sum(mask), bound=int(mask.shape[0]),
                                 label="compact")
    if cap >= table.capacity:
        result = table
    else:
        idx = compact_indices(mask, cap)
        result = gather_table(table, idx, count, preserve_unique=True)
        result.mvcc = table.mvcc
    table._prefix_cache = result
    return result
