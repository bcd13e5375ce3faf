"""TPU-tuned primitive formulations for the irregular-memory operations.

Measured on a TPU v5e (differenced-chain protocol, 1M rows; see bench notes
in ARCHITECTURE.md): XLA's direct lowerings of gather/scatter/binary-search
are 1-2 orders of magnitude off roofline, while SORT is near roofline —
the opposite of CPU intuition:

    jnp.searchsorted(1M in 1M)       473 ms     lax.sort (2M, 3 operands)  ~4 ms
    jnp.nonzero(1M)                   73 ms     lax.sort multi-payload     ~2 ms
    jax.ops.segment_sum f64->8        69 ms     masked blocked f64 sums    ~0 ms
    jnp.take(1M random)               20 ms     (per gathered column)

So on TPU every "pointer-ish" primitive is reformulated as sorts + scans +
dense blocked reductions (the canonical vector-machine treatment — sorting
networks map onto the VPU; gathers serialize):

- `compact`: selection compaction (the PosList materialization) as ONE
  multi-operand stable sort moving all payload columns together, instead of
  nonzero + per-column gathers.
- `rank_in_sorted`: the sorted-build probe (reference JoinHash probe /
  searchsorted) as a merged sort of build+probe keys: a probe row's rank
  among build keys = its merged position minus its probe-rank, recovered in
  probe order by a second sort (no scatter).
- `segment_reduce_cells`: few-group segmented reduction (group-by with a
  small group space) as per-cell masked blocked reductions — exact f64, no
  scatter.
- `segment_sums_sorted`: many-group segmented sums over group-sorted rows as
  cumsum + boundary differences (exact for ints; for floats the error is
  bounded by eps * total, documented) instead of 64-bit scatter-add.

Every primitive keeps a reference implementation (the plain XLA lowering)
used on CPU, where gathers are cheap and sorts are the expensive path; the
choice is `fast_path()`, overridable with HYRISE_TPU_FASTPATH=0/1 so tests
exercise both on the CPU mesh.
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
    key = (~mask).astype(jnp.int8)
    pos = jnp.arange(mask.shape[0], dtype=jnp.int32)
    _, sel = jax.lax.sort((key, pos), num_keys=1, is_stable=True)
    return _fit(sel, cap)


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
    padded to cap. ONE multi-operand sort moves all payloads together."""
    if not fast_path():
        sel = jnp.nonzero(mask, size=cap, fill_value=0)[0].astype(jnp.int32)
        return [jnp.take(a, sel, axis=0) for a in arrays]
    key = (~mask).astype(jnp.int8)
    outs = sort_with_payloads((key,), arrays, is_stable=True)
    return [_fit(o, cap) for o in outs]


# ---------------------------------------------------------------------------
# gather (jnp.take replacement — the join-materialization hot path)


def gather_columns_via_sort(sources: Sequence[jax.Array],
                            indices: jax.Array) -> List[jax.Array]:
    """out[j][i] = sources[j][indices[i]] for every source column (all
    share `indices`), with NO XLA gather: merge-sort + forward-fill +
    back-sort.

    XLA's gather lowering serializes (~20 ms per 1M-row column on v5e,
    module docstring) while sorts run near roofline, so the k-column
    materialization of a join output is reformulated as:

      1. ONE sort of the merged (source positions, query indices) keys —
         packed (key<<1 | is_query) int64 so source row k lands
         immediately before the queries asking for k; all k source
         columns ride as pairwise-packed payload lanes (zeros for query
         rows).
      2. A forward fill (associative scan) propagating each source row's
         payload onto the query rows behind it.
      3. ONE back-sort by query id restoring request order (source rows
         carry qid = M and fall off the tail).

    Cost is ~2 sorts + 1 scan of (N+M) rows TOTAL for all k columns,
    vs k serialized gathers. Requires indices in [0, N); callers keep
    dead-row indices at 0 (in range) per the capacity-bucket convention.
    """
    if not fast_path():
        return [jnp.take(s, indices, axis=0) for s in sources]
    n = int(sources[0].shape[0])
    m = int(indices.shape[0])
    pk = jnp.concatenate([
        jnp.arange(n, dtype=jnp.int64) << 1,
        (indices.astype(jnp.int64) << 1) | jnp.int64(1)])
    qid = jnp.concatenate([jnp.full((n,), m, dtype=jnp.int32),
                           jnp.arange(m, dtype=jnp.int32)])
    payloads = [jnp.concatenate([s, jnp.zeros((m,), dtype=s.dtype)])
                for s in sources]
    packed, recipe = _pack_payloads(payloads)
    outs = jax.lax.sort((pk, qid) + tuple(packed), num_keys=1,
                        is_stable=False)
    spk, sqid, slanes = outs[0], outs[1], outs[2:]
    is_source = (spk & jnp.int64(1)) == 0

    def combine(a, b):
        av, al = a[0], a[1:]
        bv, bl = b[0], b[1:]
        return (av | bv,) + tuple(
            jnp.where(bv, bx, ax) for ax, bx in zip(al, bl))

    filled = jax.lax.associative_scan(combine, (is_source,) + tuple(slanes))
    back = jax.lax.sort((sqid,) + tuple(filled[1:]), num_keys=1,
                        is_stable=False)
    lanes_m = [jax.lax.slice_in_dim(o, 0, m) for o in back[1:]]
    return _unpack_payloads(lanes_m, recipe)


def take_1d(a: jax.Array, indices: jax.Array) -> jax.Array:
    """Single-column a[indices]; sort-formulated on the TPU fast path."""
    if not fast_path():
        return jnp.take(a, indices, axis=0)
    return gather_columns_via_sort([a], indices)[0]


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
    q_upto = jnp.cumsum(is_q.astype(jnp.int32))  # queries among first i+1
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
    q_upto = jnp.cumsum(is_q.astype(jnp.int32))
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

    def comb(a, b):
        af, ak, ai = a
        bf, bk, bi = b
        return (af | bf, jnp.where(bf, bk, ak), jnp.where(bf, bi, ai))

    ff, fk, fi = jax.lax.associative_scan(
        comb, (is_build, k_s, jnp.where(is_build, bid_s, 0)))
    matched_s = (tag_s == 1) & ff & (fk == k_s)
    qid = jnp.where(tag_s == 1, sec_s & (TAG - 1), jnp.int64(nq))
    pack = ((qid << 33) | (matched_s.astype(jnp.int64) << 32)
            | fi.astype(jnp.int64))
    out = jax.lax.sort((pack,), num_keys=1, is_stable=False)[0]
    out = jax.lax.slice_in_dim(out, 0, nq)
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
                        counts: jax.Array, total_rows) -> jax.Array:
    """Per-group sums where rows are already GROUP-SORTED: group g spans rows
    [starts[g], starts[g] + counts[g]). Uses cumsum + boundary differences
    (exact for integer dtypes; float error bounded by eps * running total).
    starts/counts have static length = group capacity; rows past total_rows
    must be zero in `values`."""
    if not fast_path():
        # reference lowering: scatter-add via segment ids is how the caller
        # would do it; reconstruct with cumsum anyway for API parity on CPU
        pass
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
