"""TPU-tuned primitive formulations for the irregular-memory operations.

Two generations of measurements (v5e behind the axon remote-compile tunnel)
shape this module:

Round 2 (RUNTIME, differenced chains at 1M rows): XLA's gather/scatter/
binary-search lowerings sat 1-2 orders off roofline while sort ran near it,
so everything pointer-ish became sorts + scans.

Round 3 (COMPILE time at TPC-H SF1 shapes, 8.4M rows): the remote compile
helper is the real constraint —

    flat cumsum/cummax/associative_scan : 300s+ compile; two table-scale
        cumulative ops in one program OOM-kill the helper (SIGKILL)
    lax.sort (2 operands, 10.5M)        : ~50s compile, ~10ms run
    jnp.take / scatter (8.4M)           : ~1s compile, ~60ms run
    triangular-matmul prefix sums       : ~3s compile, MXU-rate run

and a re-measured native take costs ~7ns/row — 3x better than the round-2
number and output-size-proportional. The production tier is therefore
COMPILE-LEAN: direct-address LUT probes (scatter+take) for bounded integer
equi-joins, native takes for all materialization (they run at OUTPUT size
after compaction), exact MXU triangular-matmul prefix sums/counts for every
rank/offset/segment computation, and deterministic scatter-add/min/max for
segmented reductions. lax.sort remains ONLY where ordering is semantic
(Sort operator, group-by run detection, the merged-sort probe fallback for
unbounded/float keys).

Every primitive keeps a reference implementation (the plain XLA lowering)
used on CPU; the choice is `fast_path()`, overridable with
HYRISE_TPU_FASTPATH=0/1 so tests exercise both on the CPU mesh.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def fast_path() -> bool:
    env = os.environ.get("HYRISE_TPU_FASTPATH")
    if env is not None:
        return env not in ("0", "false", "no")
    return jax.default_backend() != "cpu"


# ---------------------------------------------------------------------------
# payload packing: remote-TPU sort COMPILE time scales ~linearly with the
# operand count (~25s per payload at 1M rows, measured), so pairs of 32-bit
# payloads ride in one int64 lane and 8-bit payloads in int32 quads.


def _pack_payloads(arrays: Sequence[jax.Array]):
    """Returns (packed_list, recipe) where recipe rebuilds the originals."""
    small = []   # (index, array as int32) for 32-bit operands
    plan = {}    # original index -> ("64", packed_pos) | ("hi"/"lo", pos)
    packed: List[jax.Array] = []
    metas: List[Tuple] = []
    for i, a in enumerate(arrays):
        if a.dtype == jnp.bool_:
            small.append((i, a.astype(jnp.int32)))
            metas.append((i, "bool"))
        elif a.dtype.itemsize == 4:
            v = a
            if a.dtype.kind == "f":
                v = jax.lax.bitcast_convert_type(a, jnp.int32)
            small.append((i, v))
            metas.append((i, str(a.dtype)))
        elif a.dtype.itemsize < 4:
            small.append((i, a.astype(jnp.int32)))
            metas.append((i, str(a.dtype)))
        else:
            plan[i] = ("64", len(packed))
            packed.append(a)
            metas.append((i, None))
    meta_by_idx = dict(metas)
    for j in range(0, len(small), 2):
        i_hi, hi = small[j]
        if j + 1 < len(small):
            i_lo, lo = small[j + 1]
        else:
            i_lo, lo = None, None
        h = hi.astype(jnp.uint32).astype(jnp.uint64) << jnp.uint64(32)
        if lo is not None:
            h = h | lo.astype(jnp.uint32).astype(jnp.uint64)
        pos = len(packed)
        packed.append(jax.lax.bitcast_convert_type(h, jnp.int64))
        plan[i_hi] = ("hi", pos)
        if i_lo is not None:
            plan[i_lo] = ("lo", pos)
    return packed, (plan, meta_by_idx, len(arrays))


def _unpack_payloads(packed: Sequence[jax.Array], recipe):
    plan, meta, n = recipe
    out = [None] * n
    for i in range(n):
        kind, pos = plan[i]
        if kind == "64":
            out[i] = packed[pos]
            continue
        u = jax.lax.bitcast_convert_type(packed[pos], jnp.uint64)
        word = (u >> jnp.uint64(32) if kind == "hi"
                else u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        w32 = jax.lax.bitcast_convert_type(word, jnp.int32)  # original bits
        dt = meta[i]
        if dt == "bool":
            out[i] = w32.astype(jnp.bool_)
        elif dt == "float32":
            out[i] = jax.lax.bitcast_convert_type(w32, jnp.float32)
        elif dt == "int32":
            out[i] = w32
        else:
            out[i] = w32.astype(dt)
    return out


def sort_keys_payloads(keys: Sequence[jax.Array],
                       payloads: Sequence[jax.Array],
                       is_stable: bool = True
                       ) -> Tuple[List[jax.Array], List[jax.Array]]:
    """lax.sort by `keys` carrying `payloads`, with 32-bit payloads packed
    pairwise into int64 lanes (halves the sort's operand count — the remote
    compile cost driver). Returns (sorted_keys, sorted_payloads)."""
    packed, recipe = _pack_payloads(list(payloads))
    outs = jax.lax.sort(tuple(keys) + tuple(packed), num_keys=len(keys),
                        is_stable=is_stable)
    return list(outs[:len(keys)]), _unpack_payloads(outs[len(keys):], recipe)


def sort_with_payloads(keys: Sequence[jax.Array],
                       payloads: Sequence[jax.Array],
                       is_stable: bool = True) -> List[jax.Array]:
    return sort_keys_payloads(keys, payloads, is_stable)[1]


# ---------------------------------------------------------------------------
# compaction


def compact_indices(mask: jax.Array, cap: int) -> jax.Array:
    """Indices of True positions, in order, padded arbitrarily to cap
    (equivalent to jnp.nonzero(mask, size=cap)[0] for the first count
    entries; the tail is dead and masked by the caller's count)."""
    if not fast_path():
        return jnp.nonzero(mask, size=cap, fill_value=0)[0].astype(jnp.int32)
    # scatter form: a 2-lane stable sort costs ~50s of remote compile at
    # 8.4M rows; prefix_count + scatter compiles in seconds (module header)
    return positions_of_true(mask, cap)


def _fit(a: jax.Array, cap: int) -> jax.Array:
    """First cap entries (capacity buckets can round ABOVE the input length;
    the tail is dead and masked by the caller's count)."""
    n = a.shape[0]
    if cap <= n:
        return jax.lax.slice_in_dim(a, 0, cap)
    return jnp.pad(a, [(0, cap - n)] + [(0, 0)] * (a.ndim - 1))


def compact(mask: jax.Array, arrays: Sequence[jax.Array],
            cap: int) -> List[jax.Array]:
    """Compact every array to the True rows of `mask` (stable), truncated /
    padded to cap. compact_indices + output-sized takes: the round-2
    multi-operand sort form cost ~50s of remote compile per site; the
    takes compile in ~1s and touch only cap rows per column."""
    sel = compact_indices(mask, cap)
    return [jnp.take(a, sel, axis=0) for a in arrays]


# ---------------------------------------------------------------------------
# prefix counts (MXU triangular-matmul formulation)
#
# Remote-TPU compile cost measurements (v5e behind the axon tunnel, 8.4M
# rows) that shape EVERYTHING below:
#   flat jnp.cumsum / cummax / associative_scan : 300s+ compile, and two in
#       one program OOM-kill the remote compile helper (SIGKILL/SIGSEGV)
#   blocked (n/512, 512) two-level scans        : ~75-150s compile each
#   jax.lax.sort (2 operands)                   : ~50s compile, ~10ms run
#   jnp.take / scatter                          : ~1s compile, ~7ns/row run
#   triangular-matmul prefix sum (below)        : ~3s compile, MXU-rate run
# Cumulative ops must therefore NEVER appear at table scale in a compiled
# program; flag-counting prefix sums run on the MXU instead.

_PFX_BLOCK = 512


def prefix_count_mxu(flags: jax.Array) -> jax.Array:
    """Inclusive prefix sum of a 0/1 (bool/int) vector, exact, as two
    lower-triangular f32 matmuls + a tiny float64 block-carry cumsum.
    Within-block sums are <= 512 (exact in f32); block carries accumulate
    in f64 (exact below 2^53 rows). Returns int32."""
    n = int(flags.shape[0])
    nb = -(-n // _PFX_BLOCK)
    pad = nb * _PFX_BLOCK - n
    x = jnp.pad(flags.astype(jnp.float32), (0, pad)).reshape(nb, _PFX_BLOCK)
    L = jnp.triu(jnp.ones((_PFX_BLOCK, _PFX_BLOCK), jnp.float32))
    within = jax.lax.dot_general(x, L, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
    totals = within[:, -1].astype(jnp.float64)
    carry = jnp.concatenate([jnp.zeros((1,), jnp.float64),
                             jnp.cumsum(totals)[:-1]])  # tiny: n/512 elems
    out = (within.astype(jnp.float64) + carry[:, None]).reshape(-1)[:n]
    return out.astype(jnp.int32)


def prefix_sum_i32_mxu(values: jax.Array) -> jax.Array:
    """Inclusive prefix sum of non-negative int32 values — exact for the
    FULL int32 range, compile-lean: each value splits into three 12-bit
    limbs, each limb's within-block prefix runs as an f32 triangular
    matmul (512 * 2^12 = 2^21 < 2^24 stays f32-exact; the top limb holds
    bits 24..30, so 512 * 2^7 is far below that), limbs recombine in
    int64, and the tiny block-carry cumsum runs in int64. Returns int64.
    (Two limbs capped inputs at 2^24 — a skewed join with one probe key
    matching >=16.7M build rows silently corrupted segment offsets.)"""
    n = int(values.shape[0])
    nb = -(-n // _PFX_BLOCK)
    pad = nb * _PFX_BLOCK - n
    v = jnp.pad(values.astype(jnp.int32), (0, pad)).reshape(nb, _PFX_BLOCK)
    L = jnp.triu(jnp.ones((_PFX_BLOCK, _PFX_BLOCK), jnp.float32))

    def tri(x):
        return jax.lax.dot_general(x.astype(jnp.float32), L,
                                   (((1,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST)

    lo12 = tri(v & 0xFFF)
    mid12 = tri((v >> 12) & 0xFFF)
    hi12 = tri(v >> 24)
    within = (lo12.astype(jnp.int64)
              + (mid12.astype(jnp.int64) << 12)
              + (hi12.astype(jnp.int64) << 24))
    totals = within[:, -1]
    carry = jnp.concatenate([jnp.zeros((1,), jnp.int64),
                             jnp.cumsum(totals)[:-1]])  # tiny: n/512
    return (within + carry[:, None]).reshape(-1)[:n]


def positions_of_true(mask: jax.Array, cap: int) -> jax.Array:
    """Indices of True positions in order, padded to cap (scatter form of
    compact_indices: compile-cheap where a sort costs ~50s remotely)."""
    c = prefix_count_mxu(mask)
    pos = jnp.arange(mask.shape[0], dtype=jnp.int32)
    tgt = jnp.where(mask, c - 1, jnp.int32(cap))  # OOB rows drop
    return jnp.zeros(cap, jnp.int32).at[tgt].set(
        pos, mode="drop", unique_indices=True)


# ---------------------------------------------------------------------------
# gather (jnp.take replacement — the join-materialization hot path)


def gather_columns_via_sort(sources: Sequence[jax.Array],
                            indices: jax.Array) -> List[jax.Array]:
    """out[j][i] = sources[j][indices[i]] for every source column.

    HISTORY: round 2 formulated this as merge-sort + forward-fill +
    back-sort because an eager jnp.take then measured ~20ms per 1M rows.
    Round-3 remeasurement through the salted-chain protocol puts a native
    take at ~7ns/row with a ~1s compile, while the sort+scan form costs
    two ~50s-compile sorts plus a cumulative scan that OOM-kills the
    remote compile helper at 8.4M rows (module header). Since every
    caller gathers at OUTPUT size (post-compaction), native takes win on
    both axes; the name survives for its call sites."""
    idx = indices.astype(jnp.int32)
    return [jnp.take(s, idx, axis=0) for s in sources]


def take_1d(a: jax.Array, indices: jax.Array) -> jax.Array:
    """Single-column a[indices] (native take; see gather_columns_via_sort)."""
    return jnp.take(a, indices.astype(jnp.int32), axis=0)


# ---------------------------------------------------------------------------
# sorted probe (searchsorted replacement)


def rank_in_sorted(sorted_keys: jax.Array, queries: jax.Array,
                   side: str) -> jax.Array:
    """For each query, its insertion rank in sorted_keys (== jnp.searchsorted
    (sorted_keys, queries, side=side)), formulated as two sorts."""
    if not fast_path():
        return jnp.searchsorted(sorted_keys, queries, side=side) \
            .astype(jnp.int32)
    nb = sorted_keys.shape[0]
    nq = queries.shape[0]
    keys = jnp.concatenate([sorted_keys, queries])
    # packed (tag | qid) secondary key — see ranks_lo_hi for rationale
    build_tag = jnp.int64(1 if side == "left" else 0) << 40
    query_tag = jnp.int64(0 if side == "left" else 1) << 40
    tq = jnp.concatenate([build_tag + jnp.arange(nb, dtype=jnp.int64),
                          query_tag + jnp.arange(nq, dtype=jnp.int64)])
    _, stq = jax.lax.sort((keys, tq), num_keys=2, is_stable=False)
    is_q = (stq >> 40) == (query_tag >> 40)
    q_upto = prefix_count_mxu(is_q)  # queries among first i+1
    rank = jnp.arange(1, nb + nq + 1, dtype=jnp.int32) - q_upto
    qid = jnp.where(is_q, stq & jnp.int64((1 << 40) - 1),
                    jnp.int64(nq) + jnp.arange(nb + nq, dtype=jnp.int64))
    packed = (qid << 32) | rank.astype(jnp.int64)
    spk = jax.lax.sort((packed,), num_keys=1, is_stable=False)[0]
    rank_by_q = (spk & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)
    return jax.lax.slice_in_dim(rank_by_q, 0, nq)


def ranks_lo_hi(sorted_keys: jax.Array,
                queries: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(searchsorted left, searchsorted right) for every query, from ONE
    merged sort: two copies of the query keys carry different tie-break
    tags (before / after equal build keys). Halves the sort count of the
    equi-join probe vs two rank_in_sorted calls — big query programs are
    compile-time-bound by their sort ops on the remote TPU."""
    if not fast_path():
        return (jnp.searchsorted(sorted_keys, queries, side="left")
                .astype(jnp.int32),
                jnp.searchsorted(sorted_keys, queries, side="right")
                .astype(jnp.int32))
    nb = sorted_keys.shape[0]
    nq = queries.shape[0]
    keys = jnp.concatenate([sorted_keys, queries, queries])
    # tag ⧺ qid packed into ONE secondary int64: tag in the high bits gives
    # the tie-break (lo copies < build < hi copies), qid rides below it.
    # Sort operand count is the remote compile-time driver, so every lane
    # saved here matters (see module docstring).
    iq = jnp.arange(nq, dtype=jnp.int64)
    tq = jnp.concatenate([
        (jnp.int64(1) << 40) + jnp.arange(nb, dtype=jnp.int64),  # build
        iq,                                                      # lo: before
        (jnp.int64(2) << 40) + iq])                              # hi: after
    _, stq = jax.lax.sort((keys, tq), num_keys=2, is_stable=False)
    is_q = (stq >> 40) != 1
    q_upto = prefix_count_mxu(is_q)
    rank = jnp.arange(1, nb + 2 * nq + 1, dtype=jnp.int32) - q_upto
    # recover per-query order: qid' = 0..2nq-1 for queries, big for build
    qid = jnp.where(is_q,
                    (stq & jnp.int64((1 << 40) - 1))
                    + jnp.where(stq >> 40 == 2, nq, 0),
                    jnp.int64(2 * nq) + jnp.arange(nb + 2 * nq,
                                                   dtype=jnp.int64))
    packed = (qid << 32) | rank.astype(jnp.int64)
    spk = jax.lax.sort((packed,), num_keys=1, is_stable=False)[0]
    rank_by_q = (spk & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)
    lo = jax.lax.slice_in_dim(rank_by_q, 0, nq)
    hi = jax.lax.slice_in_dim(rank_by_q, nq, 2 * nq)
    return lo, hi


# direct-address LUTs beyond this many entries cost more HBM than they save
LUT_MAX_ENTRIES = 1 << 25


def lookup_last_eq_lut(build_keys: jax.Array, build_valid: jax.Array,
                       probe_keys: jax.Array, key_lo: int, key_hi: int
                       ) -> Tuple[jax.Array, jax.Array]:
    """Direct-address equi-join probe for integer keys with host-known
    bounds: scatter-max the build row ids into a dense [key_lo, key_hi]
    LUT, then one take per probe row. `matched` says some valid build row
    carries the key; the returned row id is the LAST (highest) such row —
    identical semantics to lookup_last_eq.

    This is the compile-lean TPU form: scatter + take compile in ~1s where
    each lax.sort costs ~50s and any table-scale cumulative op kills the
    remote compile helper (module header). All TPC-H equi-join keys are
    dense bounded ints, so this is the production probe; the merged-sort
    form remains for unbounded/float keys."""
    size = int(key_hi) - int(key_lo) + 1
    assert 0 < size <= LUT_MAX_ENTRIES, size
    nb = build_keys.shape[0]
    bidx = (build_keys.astype(jnp.int64) - key_lo)
    tgt = jnp.where(build_valid & (bidx >= 0) & (bidx < size),
                    bidx, jnp.int64(size)).astype(jnp.int32)
    rows = jnp.arange(nb, dtype=jnp.int32)
    lut = jnp.full(size, -1, jnp.int32).at[tgt].max(rows, mode="drop")
    p = probe_keys.astype(jnp.int64) - key_lo
    inb = (p >= 0) & (p < size)
    bid = jnp.take(lut, jnp.clip(p, 0, size - 1).astype(jnp.int32), axis=0)
    matched = inb & (bid >= 0)
    return matched, jnp.where(matched, bid, 0)


def lookup_last_eq(build_keys: jax.Array, build_valid: jax.Array,
                   probe_keys: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """For each probe key: (matched, build_row_id) where `matched` says some
    valid build row carries an equal key and `build_row_id` is the LAST such
    row (highest original id). The fused equi-join probe for unique build
    keys / semi-anti existence checks (ops/join.py lookup path): ONE merged
    2-operand sort + associative scan + ONE 1-operand back-sort, replacing
    build-sort + ranks_lo_hi + pair expansion + perm gather (~5 sorts).

    Formulation: concatenate (sentinel-masked) build keys and probe keys,
    sort by (key, tag|id) with tag order valid-build(0) < probe(1) <
    invalid-build(2), forward-fill each build row's (key, id) onto the
    probe rows behind it, compare the filled key to the probe key, and
    back-sort probe entries to request order by a single packed
    (qid | matched | build_id) int64 lane.
    """
    nb = build_keys.shape[0]
    nq = probe_keys.shape[0]
    if build_keys.dtype.kind == "f":
        sentinel = jnp.array(jnp.inf, dtype=build_keys.dtype)
    else:
        sentinel = jnp.array(jnp.iinfo(build_keys.dtype).max,
                             dtype=build_keys.dtype)
    masked = jnp.where(build_valid, build_keys, sentinel)
    if not fast_path():
        # CPU lowering: binary search + gathers are cheap there
        pos = jnp.arange(nb, dtype=jnp.int32)
        _, _, perm = jax.lax.sort(
            (masked, (~build_valid).astype(jnp.int8), pos), num_keys=2,
            is_stable=True)
        sk = jnp.sort(masked)
        lo = jnp.searchsorted(sk, probe_keys, side="left").astype(jnp.int32)
        hi = jnp.searchsorted(sk, probe_keys, side="right").astype(jnp.int32)
        hi = jnp.minimum(hi, jnp.sum(build_valid).astype(jnp.int32))
        matched = hi > lo
        bid = jnp.take(perm, jnp.clip(hi - 1, 0, max(nb - 1, 0)))
        return matched, jnp.where(matched, bid, 0).astype(jnp.int32)
    TAG = jnp.int64(1) << 40
    keys = jnp.concatenate([masked, probe_keys])
    sec = jnp.concatenate([
        jnp.where(build_valid, jnp.int64(0), 2 * TAG)
        + jnp.arange(nb, dtype=jnp.int64),
        TAG + jnp.arange(nq, dtype=jnp.int64)])
    k_s, sec_s = jax.lax.sort((keys, sec), num_keys=2, is_stable=False)
    tag_s = sec_s >> 40
    is_build = tag_s == 0
    bid_s = (sec_s & (TAG - 1)).astype(jnp.int32)

    # scan-free fill: the c-th build row in merged order (c = MXU prefix
    # count) is the c-th entry of the densely-compacted build lanes; a
    # probe matches iff the nearest preceding build key equals its own.
    # take/scatter everywhere — no cumulative op, ONE sort total (module
    # header compile economics).
    c = prefix_count_mxu(is_build)
    bpos = positions_of_true(is_build, nb if nb else 1)
    bk_dense = jnp.take(k_s, bpos, axis=0)
    bid_dense = jnp.take(bid_s, bpos, axis=0)
    ci = jnp.clip(c - 1, 0, max(nb - 1, 0))
    fk = jnp.take(bk_dense, ci, axis=0)
    fi = jnp.take(bid_dense, ci, axis=0)
    matched_s = (tag_s == 1) & (c > 0) & (fk == k_s)
    qid = jnp.where(tag_s == 1, sec_s & (TAG - 1), jnp.int64(nq))
    pack = (matched_s.astype(jnp.int64) << 32) | fi.astype(jnp.int64)
    out = jnp.zeros(nq, jnp.int64).at[qid.astype(jnp.int32)].set(
        pack, mode="drop")
    matched = ((out >> 32) & 1).astype(jnp.bool_)
    bid = (out & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)
    return matched, jnp.where(matched, bid, 0)


# ---------------------------------------------------------------------------
# segmented reductions


# group spaces at most this large use dense per-cell masked reductions
DENSE_CELL_MAX = 64
_BLOCK = 512


def _blocked(x: jax.Array) -> jax.Array:
    n = x.shape[0]
    pad = (-n) % _BLOCK
    if pad:
        x = jnp.pad(x, (0, pad))
    return x.reshape(-1, _BLOCK)


def segment_reduce_cells(values: jax.Array, cell: jax.Array, n_cells: int,
                         kind: str, sentinel=None) -> jax.Array:
    """Segmented reduce into a SMALL static cell space [n_cells].
    kind: 'sum' | 'min' | 'max' | 'count'. `values` dtype is preserved for
    min/max; sums accumulate in the values dtype (callers pre-promote).
    Rows with cell outside [0, n_cells) are ignored."""
    if not fast_path():
        if kind == "sum" or kind == "count":
            return jax.ops.segment_sum(values, cell, num_segments=n_cells)
        fn = jax.ops.segment_min if kind == "min" else jax.ops.segment_max
        return fn(values, cell, num_segments=n_cells)
    outs = []
    for c in range(n_cells):
        m = cell == c
        if kind in ("sum", "count"):
            x = jnp.where(m, values, jnp.zeros((), dtype=values.dtype))
            outs.append(jnp.sum(_blocked(x), axis=1).sum())
        else:
            x = jnp.where(m, values, sentinel)
            red = jnp.min if kind == "min" else jnp.max
            outs.append(red(x))
    return jnp.stack(outs)


def segment_sums_sorted(values: jax.Array, starts: jax.Array,
                        counts: jax.Array, total_rows,
                        gid: Optional[jax.Array] = None) -> jax.Array:
    """Per-group sums where rows are already GROUP-SORTED: group g spans rows
    [starts[g], starts[g] + counts[g]). starts/counts have static length =
    group capacity; rows past total_rows must be zero in `values`.

    With `gid` (per-row group ids, out-of-range for dead rows): a
    deterministic sorted scatter-add — exact per-element f64/int64
    accumulation, ~1s compile. Without gid: cumsum + boundary differences
    (exact for ints; float error bounded by eps * running total) — but a
    table-scale cumsum costs minutes of remote TPU compile (module
    header), so every fast-path caller passes gid."""
    if gid is not None and fast_path():
        import jax.ops
        return jax.ops.segment_sum(values, gid,
                                   num_segments=int(starts.shape[0]),
                                   indices_are_sorted=True)
    cs = jnp.cumsum(values)
    n = values.shape[0]
    ends = starts + counts - 1
    has = counts > 0
    end_v = jnp.take(cs, jnp.clip(ends, 0, n - 1), axis=0)
    start_prev = jnp.where(starts > 0,
                           jnp.take(cs, jnp.clip(starts - 1, 0, n - 1),
                                    axis=0),
                           jnp.zeros((), dtype=cs.dtype))
    seg = jnp.where(has, end_v - start_prev, jnp.zeros((), dtype=cs.dtype))
    return seg
