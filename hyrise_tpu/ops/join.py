"""Join operators.

Reference operators covered here:
- JoinHash (src/lib/operators/join_hash.cpp, 861 LoC): radix hash join,
  equi-only, build side = smaller input, modes Inner/Left/Right/Outer/Semi/
  Anti.
- JoinSortMerge (join_sort_merge.cpp): sort-merge, supports <, <=, >, >=, !=.
- JoinNestedLoop (join_nested_loop.cpp): O(n·m) fallback, any predicate.
- Product (product.cpp): cross join.
- JoinIndex (join_index.cpp): probe side uses an index — our sorted build
  side IS the index, so JoinIndex aliases the main path.

TPU-native redesign (single chip; the distributed all-to-all variant lives in
parallel/): pointer-chasing hash tables don't vectorize on TPU, so the ONE
engine is sort-based:

  1. promote both key columns to a common key space (hash_traits.hpp
     analogue; strings via merged dictionaries),
  2. sort the build side ONCE (keys, with invalid/dead rows pushed past
     n_valid by a (key, invalid) lexsort),
  3. for every probe row, its matches are a CONTIGUOUS RANGE [lo, hi) of the
     sorted build side, for equality AND all range conditions (< <= > >=);
     != is the union of two ranges. lo/hi come from two vectorized
     searchsorted calls — no per-row control flow,
  4. count-then-allocate: total match count is host-synced, bucketed, and the
     (probe_idx, build_idx) pairs are expanded with jnp.repeat(...,
     total_repeat_length) + prefix-sum rank arithmetic — all static shapes.

Join-key NULL semantics match the reference (join_hash.cpp probe/
probe_semi_anti): NULL keys never match; LEFT/RIGHT/OUTER emit them with
NULL right/left sides; ANTI keeps them.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.ops.base import AbstractOperator
from hyrise_tpu.storage.column import Column, merge_dictionaries
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import (ANTI_MODES, DataType, EXISTENCE_MODES, JoinMode,
                              PredicateCondition, bucket_capacity)


def _join_key_arrays(lt: Table, rt: Table, left_col: str, right_col: str):
    """Promote both key columns into one comparable key space (the reference's
    JoinHash hash_traits HashedType promotion for mixed int/float keys).

    Returns (lk, lv, rk, rv, remap_len): remap_len is None unless the keys
    are string columns with UNEQUAL dictionaries, in which case the codes
    were rewritten into a merged dictionary space and remap_len is its size.
    Callers consulting ingest-time value bounds (the LUT join) MUST use
    (0, remap_len - 1) then — ctx.col_bounds is in original code space and
    silently drops build keys whose merged code exceeds it (r3 advisor)."""
    lc, rc = lt.column(left_col), rt.column(right_col)
    if (lc.dtype is DataType.STRING) != (rc.dtype is DataType.STRING):
        raise TypeError("cannot join string with non-string column")
    remap_len = None
    if lc.dtype is DataType.STRING:
        same = lc.dictionary is rc.dictionary or np.array_equal(
            lc.dictionary, rc.dictionary)
        if same:
            lk, rk = lc.data.astype(jnp.int64), rc.data.astype(jnp.int64)
        else:
            merged, rl, rr = merge_dictionaries(lc.dictionary, rc.dictionary)
            lk = jnp.asarray(rl)[lc.data].astype(jnp.int64)
            rk = jnp.asarray(rr)[rc.data].astype(jnp.int64)
            remap_len = len(merged)
    elif lc.dtype.is_integral and rc.dtype.is_integral:
        lk, rk = lc.data.astype(jnp.int64), rc.data.astype(jnp.int64)
    else:
        lk, rk = lc.data.astype(jnp.float64), rc.data.astype(jnp.float64)
    lv = lc.validity if lc.validity is not None else None
    rv = rc.validity if rc.validity is not None else None
    return lk, lv, rk, rv, remap_len


@jax.jit
def _build_side(keys: jax.Array, valid: jax.Array):
    """Sort build side: returns (sorted_keys, perm, n_valid).

    Invalid/dead rows get their key replaced by the dtype max sentinel so the
    array is globally sorted; the (key, invalid) sort puts REAL max-valued
    rows before sentinel rows on ties, and probe ranges clamp hi to n_valid,
    so sentinel rows can never match. ONE sort carries the permutation as a
    payload and returns the sorted keys directly (a take(perm) gather costs
    ~20ms/1M rows on TPU)."""
    if keys.dtype.kind == "f":
        sentinel = jnp.array(jnp.inf, dtype=keys.dtype)
    else:
        sentinel = jnp.array(jnp.iinfo(keys.dtype).max, dtype=keys.dtype)
    masked = jnp.where(valid, keys, sentinel)
    pos = jnp.arange(keys.shape[0], dtype=jnp.int32)
    sorted_keys, _, perm = jax.lax.sort(
        (masked, (~valid).astype(jnp.int8), pos), num_keys=2, is_stable=True)
    n_valid = jnp.sum(valid)
    return sorted_keys, perm, n_valid


@partial(jax.jit, static_argnames=("cond",))
def _probe_ranges(sorted_keys, n_valid, probe_keys, probe_valid, cond):
    """Per-probe-row contiguous match range [lo, hi) in the sorted build.
    Ranks come from merged sorts (kernels/tpu_prims.py): jnp.searchsorted's
    binary search is gather-bound on TPU (~100x slower than sort)."""
    from hyrise_tpu.kernels.tpu_prims import rank_in_sorted, ranks_lo_hi
    if cond is PredicateCondition.EQUALS:
        left_pos, right_pos = ranks_lo_hi(sorted_keys, probe_keys)
        lo, hi = left_pos, right_pos
    elif cond in (PredicateCondition.LESS_THAN,
                  PredicateCondition.GREATER_THAN_EQUALS):
        right_pos = rank_in_sorted(sorted_keys, probe_keys, "right")
        left_pos = jnp.zeros_like(right_pos)
    else:
        left_pos = rank_in_sorted(sorted_keys, probe_keys, "left")
        right_pos = left_pos  # unused by the branches below
    if cond is PredicateCondition.EQUALS:
        pass
    elif cond is PredicateCondition.LESS_THAN:        # probe < build
        lo, hi = right_pos, n_valid
    elif cond is PredicateCondition.LESS_THAN_EQUALS:
        lo, hi = left_pos, n_valid
    elif cond is PredicateCondition.GREATER_THAN:     # probe > build
        lo, hi = jnp.zeros_like(left_pos), left_pos
    elif cond is PredicateCondition.GREATER_THAN_EQUALS:
        lo, hi = jnp.zeros_like(left_pos), right_pos
    else:
        raise ValueError(cond)
    lo = jnp.minimum(lo, n_valid)
    hi = jnp.minimum(hi, n_valid)
    counts = jnp.where(probe_valid, jnp.maximum(hi - lo, 0), 0)
    return lo.astype(jnp.int32), counts.astype(jnp.int32)


@partial(jax.jit, static_argnames=("out_cap",))
def _expand_pairs(lo, counts, build_perm, out_cap):
    """Expand per-probe ranges into flat (probe_idx, build_idx) pair arrays."""
    from hyrise_tpu.kernels import tpu_prims as tp

    cap = counts.shape[0]
    probe_ids = jnp.arange(cap, dtype=jnp.int32)
    if not tp.fast_path():
        offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
        probe_out = jnp.repeat(probe_ids, counts,
                               total_repeat_length=out_cap)
        rank = (jnp.arange(out_cap, dtype=jnp.int32)
                - jnp.repeat(offsets, counts, total_repeat_length=out_cap))
        pos = jnp.repeat(lo, counts, total_repeat_length=out_cap) + rank
        pos = jnp.clip(pos, 0, build_perm.shape[0] - 1)
        build_out = tp.take_1d(build_perm, pos).astype(jnp.int32)
        return probe_out, build_out
    # compile-lean expansion: jnp.repeat/cumsum lower to table-scale
    # cumulative ops that kill the remote TPU compile (tpu_prims module
    # header). Instead: exact MXU prefix sums place each probe's segment,
    # segment starts scatter into the output, and an MXU prefix COUNT
    # recovers the owning segment per output position.
    c32 = counts.astype(jnp.int32)
    ends = tp.prefix_sum_i32_mxu(c32)               # inclusive
    starts = ends - c32                              # exclusive
    nonzero = c32 > 0
    tgt = jnp.where(nonzero & (starts < out_cap), starts,
                    jnp.int64(out_cap)).astype(jnp.int32)
    flags = jnp.zeros(out_cap, jnp.bool_).at[tgt].set(True, mode="drop")
    seg = tp.prefix_count_mxu(flags) - 1             # owning segment ordinal
    seg = jnp.clip(seg, 0, cap - 1)
    pid_dense = tp.positions_of_true(nonzero, cap)   # ordinal -> probe row
    probe_out = jnp.take(pid_dense, seg, axis=0)
    seg_start = jnp.take(starts, probe_out, axis=0).astype(jnp.int32)
    rank = jnp.arange(out_cap, dtype=jnp.int32) - seg_start
    pos = jnp.take(lo, probe_out, axis=0) + rank
    pos = jnp.clip(pos, 0, build_perm.shape[0] - 1)
    build_out = jnp.take(build_perm, pos, axis=0).astype(jnp.int32)
    return probe_out, build_out


def _gather_columns(table: Table, indices: jax.Array,
                    extra_valid: Optional[jax.Array]) -> List[Column]:
    """Gather columns at indices — late materialization with per-site
    batched sort-gather under plan compilation (materialize.py)."""
    from hyrise_tpu.ops.materialize import gather_columns_at
    return gather_columns_at(table, indices, extra_valid)


class Join(AbstractOperator):
    """Unified sorted-range join engine (see module docstring)."""

    name = "Join"

    def __init__(self, left: AbstractOperator, right: AbstractOperator,
                 mode: JoinMode, column_pair: Tuple[str, str],
                 cond: PredicateCondition = PredicateCondition.EQUALS):
        super().__init__(left, right)
        self.mode = mode
        self.left_col, self.right_col = column_pair
        self.cond = cond

    # -- core: probe left against sorted right -------------------------------

    def _probe(self, lt: Table, rt: Table, cond: PredicateCondition):
        lk, lv, rk, rv, _ = _join_key_arrays(lt, rt,
                                             self.left_col, self.right_col)
        l_live = lt.live_mask()
        r_live = rt.live_mask()
        probe_valid = l_live if lv is None else (l_live & lv)
        build_valid = r_live if rv is None else (r_live & rv)
        prebuilt = self._prebuilt_build(lt, rt, rk.dtype)
        if prebuilt is not None:
            sorted_keys, perm, n_valid = prebuilt
        else:
            sorted_keys, perm, n_valid = _build_side(rk, build_valid)

        if cond is PredicateCondition.NOT_EQUALS:
            lo1, c1 = _probe_ranges(sorted_keys, n_valid, lk, probe_valid,
                                    PredicateCondition.GREATER_THAN)
            lo2, c2 = _probe_ranges(sorted_keys, n_valid, lk, probe_valid,
                                    PredicateCondition.LESS_THAN)
            return [(lo1, c1), (lo2, c2)], perm, probe_valid
        lo, counts = _probe_ranges(sorted_keys, n_valid, lk, probe_valid, cond)
        return [(lo, counts)], perm, probe_valid

    def _prebuilt_build(self, lt: Table, rt: Table, key_dtype):
        """Hook: a pre-sorted build side (sorted_keys, perm, n_valid), or
        None to sort now. Base Join always sorts; JoinIndex consults the
        table's SortedIndex."""
        return None

    # -- fused lookup path (unique build keys / existence joins) -------------

    def _lookup_applicable(self, build_t: Table, build_col: str,
                           mode: JoinMode) -> bool:
        """The merged-lookup probe (tpu_prims.lookup_last_eq) is exact when
        every probe row has at most one match: SEMI/ANTI need existence only
        (any build side), INNER/LEFT need a unique build key column."""
        if self.cond is not PredicateCondition.EQUALS:
            return False
        if mode in EXISTENCE_MODES:
            return True
        if mode in (JoinMode.INNER, JoinMode.LEFT):
            try:
                return bool(build_t.column(build_col).unique)
            except KeyError:
                return False
        return False

    def _lookup_execute(self, probe_t: Table, build_t: Table,
                        probe_col: str, build_col: str, mode: JoinMode,
                        swap_output: bool = False) -> Table:
        """Fused equi-join: per-probe (matched, build_row) from ONE merged
        sort; output keeps the probe table's capacity with a live MASK —
        probe columns pass through untouched (and keep their unique flags),
        so join chains never re-materialize the probe side."""
        from hyrise_tpu.kernels.tpu_prims import (LUT_MAX_ENTRIES, fast_path,
                                                  lookup_last_eq,
                                                  lookup_last_eq_lut)
        from hyrise_tpu.plan.compiler import tracing

        lk, lv, rk, rv, remap_len = _join_key_arrays(probe_t, build_t,
                                                     probe_col, build_col)
        live = probe_t.live_mask()
        probe_valid = live if lv is None else (live & lv)
        b_live = build_t.live_mask()
        build_valid = b_live if rv is None else (b_live & rv)
        # direct-address probe when the build key's VALUE range is
        # host-known and LUT-sized: compile-lean (scatter+take) vs the
        # merged-sort probe (tpu_prims module header). Bounds are carried
        # ON the column (ingest val_range, preserved only by value-
        # untransformed passthroughs), so a derived column shadowing a base
        # column's name can never inherit the base bound; string codes are
        # bounded by their dictionary by construction, and a merged-
        # dictionary rewrite supersedes both (r3 advisor findings).
        bounds = None
        if fast_path() and rk.dtype.kind == "i":
            bc = build_t.column(build_col)
            if remap_len is not None:
                bounds = (0, remap_len - 1)
            elif bc.dtype is DataType.STRING:
                bounds = (0, max(len(bc.dictionary) - 1, 0))
            else:
                bounds = bc.val_range
                if bounds is None and not tracing():
                    # eager fallback: exact bounds from the concrete arrays
                    import numpy as np
                    bv_h = np.asarray(build_valid)
                    if bv_h.any():
                        rk_h = np.asarray(rk)[bv_h]
                        bounds = (int(rk_h.min()), int(rk_h.max()))
            if bounds is not None \
                    and not (0 < bounds[1] - bounds[0] + 1
                             <= LUT_MAX_ENTRIES):
                bounds = None
        if bounds is not None:
            matched, bid = lookup_last_eq_lut(rk, build_valid, lk,
                                              bounds[0], bounds[1])
            self.performance_data.extra["lut_join"] = True
        else:
            matched, bid = lookup_last_eq(rk, build_valid, lk)
        matched = matched & probe_valid
        self.performance_data.extra["lookup_join"] = True
        if mode in EXISTENCE_MODES:
            keep = matched if mode is JoinMode.SEMI else (live & ~matched)
            if mode is JoinMode.ANTI_NULL_AS_TRUE:
                # NOT IN semantics (reference JoinMode::AntiNullAsTrue,
                # types.hpp): a NULL probe key matches nothing provably
                # (unless the set is empty — vacuous truth), and any NULL
                # in the build set poisons every probe row
                if lv is not None:
                    keep = keep & (lv | ~jnp.any(b_live))
                if rv is not None:
                    keep = keep & ~jnp.any(b_live & ~rv)
            cnt = jnp.sum(keep)
            return Table(probe_t.columns, cnt if tracing() else int(cnt),
                         name=probe_t.name, live=keep)
        out_live = matched if mode is JoinMode.INNER else live
        extra_valid = matched if mode is JoinMode.LEFT else None
        build_cols = _gather_columns(build_t, bid, extra_valid)
        cols = (build_cols + probe_t.columns) if swap_output \
            else (probe_t.columns + build_cols)
        cnt = jnp.sum(out_live)
        return Table(cols, cnt if tracing() else int(cnt),
                     name=probe_t.name, live=out_live)

    def _on_execute(self, context) -> Table:
        from hyrise_tpu.ops.materialize import compact_if_shrunk
        mode = self.mode
        lt = compact_if_shrunk(self.input_table(0))
        rt = compact_if_shrunk(self.input_table(1))

        if mode is JoinMode.RIGHT:
            # swapped: probe = right table, build = left table
            if self._lookup_applicable(lt, self.left_col, JoinMode.LEFT):
                return self._lookup_execute(rt, lt, self.right_col,
                                            self.left_col, JoinMode.LEFT,
                                            swap_output=True)
        elif self._lookup_applicable(rt, self.right_col, mode):
            return self._lookup_execute(lt, rt, self.left_col,
                                        self.right_col, mode)

        if mode is JoinMode.RIGHT:
            # RIGHT = LEFT with sides swapped (reference join_hash.cpp:55-76),
            # output column order restored below. type(self) keeps subclass
            # hooks (JoinIndex's prebuilt build side) on the swapped probe.
            inner = Join.__new__(type(self))
            AbstractOperator.__init__(inner)
            inner.mode = JoinMode.LEFT
            inner.left_col, inner.right_col = self.right_col, self.left_col
            inner.cond = self.cond.flipped()
            pairs, perm, probe_valid = inner._probe(rt, lt, inner.cond)
            return self._emit(rt, lt, pairs, perm, probe_valid,
                              JoinMode.LEFT, swap_output=True)

        pairs, perm, probe_valid = self._probe(lt, rt, self.cond)
        return self._emit(lt, rt, pairs, perm, probe_valid, mode)

    # -- output emission ------------------------------------------------------

    def _emit(self, probe_t: Table, build_t: Table, range_lists, build_perm,
              probe_valid, mode: JoinMode, swap_output: bool = False) -> Table:
        total_counts = range_lists[0][1]
        for _, c in range_lists[1:]:
            total_counts = total_counts + c

        from hyrise_tpu.plan.compiler import oracle_capacity, tracing

        if mode in EXISTENCE_MODES:
            live = probe_t.live_mask()
            if mode is JoinMode.SEMI:
                keep = (total_counts > 0) & live
            elif mode is JoinMode.ANTI:
                keep = (total_counts == 0) & live  # NULL keys kept (no match)
            else:  # ANTI_NULL_AS_TRUE (NOT IN): NULL probe keys rejected
                # against a non-empty set, any NULL build key empties the
                # result (types.hpp parity)
                b_live = build_t.live_mask()
                keep = (total_counts == 0) \
                    & jnp.where(jnp.any(b_live), probe_valid, live)
                bcol = build_t.column(self.right_col)
                if bcol.validity is not None:
                    keep = keep & ~jnp.any(b_live & ~bcol.validity)
            from hyrise_tpu.ops.materialize import filter_table
            return filter_table(probe_t, keep)

        probe_cap = int(total_counts.shape[0])

        segments = []  # (probe_idx, build_idx, seg_total, out_cap) pieces
        for lo, counts in range_lists:
            # speculative expansion capacity: estimate one match per probe
            # row (exact for FK equi joins); the oracle's overflow retry
            # corrects fan-out > 1. Eagerly this is the count host sync.
            seg_total, out_cap = oracle_capacity(
                jnp.sum(counts), estimate=probe_cap, label="join.expand")
            if not tracing() and seg_total == 0 and len(range_lists) > 1:
                continue
            p_idx, b_idx = _expand_pairs(lo, counts, build_perm, out_cap)
            segments.append((p_idx[:out_cap], b_idx, seg_total, out_cap))

        probe_parts, build_parts, flags_parts, counts_rows = [], [], [], 0
        for p_idx, b_idx, seg_total, out_cap in segments:
            probe_parts.append(p_idx)
            build_parts.append(b_idx)
            flags_parts.append(jnp.ones(out_cap, dtype=bool))
            counts_rows = counts_rows + seg_total

        # Unmatched probe rows for LEFT / OUTER.
        n_unmatched = 0
        if mode in (JoinMode.LEFT, JoinMode.OUTER):
            live = probe_t.live_mask()
            unmatched = (total_counts == 0) & live
            n_unmatched, u_cap = oracle_capacity(
                jnp.sum(unmatched), bound=probe_cap, label="join.unmatched")
            from hyrise_tpu.kernels.tpu_prims import compact_indices
            u_idx = compact_indices(unmatched, u_cap)
            probe_parts.append(u_idx)
            build_parts.append(jnp.zeros(u_cap, dtype=jnp.int32))
            flags_parts.append(jnp.zeros(u_cap, dtype=bool))

        # Unmatched build rows for OUTER.
        n_build_unmatched = 0
        if mode is JoinMode.OUTER:
            matched = jnp.zeros(build_t.capacity, dtype=bool)
            for p_idx, b_idx, seg_total, out_cap in segments:
                sel = jnp.arange(out_cap) < seg_total
                scatter_idx = jnp.where(sel, b_idx, build_t.capacity)
                matched = matched.at[scatter_idx].set(True, mode="drop")
            b_live = build_t.live_mask()
            b_unmatched = (~matched) & b_live
            n_build_unmatched, bu_cap = oracle_capacity(
                jnp.sum(b_unmatched), bound=int(build_t.capacity),
                label="join.build_unmatched")
            from hyrise_tpu.kernels.tpu_prims import compact_indices
            bu_idx = compact_indices(b_unmatched, bu_cap)
            probe_parts.append(jnp.zeros(bu_cap, dtype=jnp.int32))
            build_parts.append(bu_idx)
            # flag False means "NULL-pad the OTHER side": we need per-side
            # flags; handled below via two flag arrays.
            flags_parts.append(jnp.full(bu_cap, 2, dtype=jnp.int32))

        # Assemble flat index arrays. flag semantics: 1 = both real,
        # 0 = build side NULL, 2 = probe side NULL.
        flat_flags = jnp.concatenate(
            [f.astype(jnp.int32) if f.dtype != jnp.int32 else f
             for f in flags_parts])
        flat_probe = jnp.concatenate(probe_parts)
        flat_build = jnp.concatenate(build_parts)

        # Compact away the per-segment capacity padding.
        keep = jnp.zeros(flat_flags.shape[0], dtype=bool)
        pos = 0
        for (_, _, seg_total, out_cap) in segments:
            keep = keep.at[pos:pos + out_cap].set(
                jnp.arange(out_cap) < seg_total)
            pos += out_cap
        if mode in (JoinMode.LEFT, JoinMode.OUTER):
            u_cap = probe_parts[len(segments)].shape[0]
            keep = keep.at[pos:pos + u_cap].set(jnp.arange(u_cap) < n_unmatched)
            pos += u_cap
        if mode is JoinMode.OUTER:
            bu_cap = probe_parts[-1].shape[0]
            keep = keep.at[pos:pos + bu_cap].set(
                jnp.arange(bu_cap) < n_build_unmatched)
            pos += bu_cap

        n_out, out_cap = oracle_capacity(
            jnp.asarray(counts_rows + n_unmatched + n_build_unmatched),
            bound=int(flat_flags.shape[0]), label="join.out")
        from hyrise_tpu.kernels.tpu_prims import compact
        probe_idx, build_idx, flags = compact(
            keep, (flat_probe, flat_build, flat_flags), out_cap)

        probe_ok = flags != 2
        build_ok = flags >= 1  # 1 = both real, 2 = build real / probe NULL
        probe_cols = _gather_columns(
            probe_t, probe_idx,
            probe_ok if mode is JoinMode.OUTER else None)
        build_cols = _gather_columns(
            build_t, build_idx,
            build_ok if mode in (JoinMode.LEFT, JoinMode.OUTER) else None)

        if swap_output:
            cols = build_cols + probe_cols
        else:
            cols = probe_cols + build_cols
        return Table(cols, n_out, name=probe_t.name)


class JoinHash(Join):
    """Equi-join entry point (reference JoinHash). Same engine; asserts
    equi/!= hashable conditions like join_hash.cpp does."""

    name = "JoinHash"

    def __init__(self, left, right, mode, column_pair,
                 cond=PredicateCondition.EQUALS):
        assert cond is PredicateCondition.EQUALS, "JoinHash supports equi only"
        super().__init__(left, right, mode, column_pair, cond)


class JoinSortMerge(Join):
    """Reference JoinSortMerge: equi and non-equi conditions."""

    name = "JoinSortMerge"


class JoinIndex(Join):
    """Reference JoinIndex (join_index.cpp: the probe side walks the build
    chunk's index instead of building a hash table; performance data counts
    chunks scanned with/without an index). Here the table's SortedIndex IS
    the join's sorted build side: when the build input carries an index on
    the join column, the build-phase sort is skipped and the index
    permutation is probed directly."""

    name = "JoinIndex"

    def _lookup_applicable(self, build_t, build_col, mode):
        # JoinIndex's point is consuming the table's prebuilt SortedIndex
        # (general path, _prebuilt_build); the fused lookup would bypass it.
        return False

    def _prebuilt_build(self, lt: Table, rt: Table, key_dtype):
        from hyrise_tpu.storage.index import get_index
        idx = get_index(rt, self.right_col)
        used = False
        result = None
        if idx is not None:
            lc, rc = lt.column(self.left_col), rt.column(self.right_col)
            remapped = (rc.dtype is DataType.STRING
                        and rc.dictionary is not lc.dictionary
                        and not np.array_equal(lc.dictionary, rc.dictionary))
            if not remapped:
                # any plain dtype cast is monotone, so the index's sorted
                # order survives promotion; dictionary-remapped string codes
                # would not (the merged code space reorders nothing, but the
                # sentinel code is out of the remap's domain)
                sorted_keys = idx.sorted_values.astype(key_dtype)
                result = (sorted_keys, idx.perm, idx.n_valid)
                used = True
        # reference join_index.hpp PerformanceData: chunks_scanned_with_index
        self.performance_data.extra["index_used"] = used
        return result


class JoinMPSM(Join):
    """Reference JoinMPSM (NUMA-aware massively-parallel sort-merge,
    join_mpsm.cpp:537 + join_mpsm/radix_cluster_sort_numa.hpp).

    Distributed execution is a DISTINCT strategy: the distributed compiler
    routes JoinMPSM through VALUE-range clustering (quantile splitters of
    the probe key's distribution; each shard ≈ one NUMA node receives one
    contiguous key range of BOTH sides and merges it locally —
    parallel/dist_compiler.py `decision == "mpsm"`), versus the hash
    all_to_all of the default shuffle strategy. Single-chip execution is
    the shared sorted engine (a one-cluster sort-merge)."""

    name = "JoinMPSM"


class JoinNestedLoop(AbstractOperator):
    """True O(n·m) fallback with arbitrary row-pair predicate, evaluated as a
    dense pair-mask matrix (reference join_nested_loop.cpp:294 — all modes,
    all predicates). Used for correctness cross-checks, exotic predicates,
    and non-equi outer joins the sorted-range engine does not cover."""

    name = "JoinNestedLoop"

    def __init__(self, left, right, mode: JoinMode, column_pair,
                 cond: PredicateCondition = PredicateCondition.EQUALS):
        super().__init__(left, right)
        self.mode = mode
        self.left_col, self.right_col = column_pair
        self.cond = cond

    def _on_execute(self, context) -> Table:
        mode = self.mode
        lt, rt = self.input_table(0), self.input_table(1)
        lk, lv, rk, rv, _ = _join_key_arrays(lt, rt,
                                             self.left_col, self.right_col)
        lval = lt.live_mask() if lv is None else (lt.live_mask() & lv)
        rval = rt.live_mask() if rv is None else (rt.live_mask() & rv)
        from hyrise_tpu.expression.evaluator import _apply_cmp
        from hyrise_tpu.ops.materialize import filter_table
        from hyrise_tpu.plan.compiler import oracle_capacity
        pair = _apply_cmp(self.cond, lk[:, None], rk[None, :])
        pair = pair & lval[:, None] & rval[None, :]
        l_counts = jnp.sum(pair, axis=1)

        if mode in EXISTENCE_MODES:
            keep = ((l_counts > 0) if mode is JoinMode.SEMI
                    else (l_counts == 0)) & lt.live_mask()
            if mode is JoinMode.ANTI_NULL_AS_TRUE:  # NOT IN (types.hpp)
                if lv is not None:
                    keep = keep & (lv | ~jnp.any(rt.live_mask()))
                if rv is not None:
                    keep = keep & ~jnp.any(rt.live_mask() & ~rv)
            return filter_table(lt, keep)

        # matched pairs, flat left-major (deterministic output order)
        n_pairs, pair_cap = oracle_capacity(
            jnp.sum(l_counts), estimate=4 * max(lt.capacity, rt.capacity),
            bound=lt.capacity * rt.capacity, label="join_nl.out")
        sel = jnp.nonzero(pair.reshape(-1), size=pair_cap, fill_value=0)[0]
        if mode is JoinMode.INNER:
            # nonzero output is already a compacted prefix
            cols = _gather_columns(lt, (sel // rt.capacity).astype(jnp.int32),
                                   None) + \
                _gather_columns(rt, (sel % rt.capacity).astype(jnp.int32),
                                None)
            return Table(cols, n_pairs, name=lt.name)
        probe_parts = [(sel // rt.capacity).astype(jnp.int32)]
        build_parts = [(sel % rt.capacity).astype(jnp.int32)]
        flags_parts = [jnp.ones(pair_cap, dtype=jnp.int32)]
        keeps = [jnp.arange(pair_cap) < n_pairs]
        total = jnp.asarray(n_pairs)

        if mode in (JoinMode.LEFT, JoinMode.OUTER):
            unmatched = (l_counts == 0) & lt.live_mask()
            n_u, u_cap = oracle_capacity(jnp.sum(unmatched),
                                         bound=int(lt.capacity),
                                         label="join_nl.unmatched_l")
            u_idx = jnp.nonzero(unmatched, size=u_cap,
                                fill_value=0)[0].astype(jnp.int32)
            probe_parts.append(u_idx)
            build_parts.append(jnp.zeros(u_cap, dtype=jnp.int32))
            flags_parts.append(jnp.zeros(u_cap, dtype=jnp.int32))
            keeps.append(jnp.arange(u_cap) < n_u)
            total = total + n_u
        if mode in (JoinMode.RIGHT, JoinMode.OUTER):
            r_counts = jnp.sum(pair, axis=0)
            unmatched = (r_counts == 0) & rt.live_mask()
            n_u, u_cap = oracle_capacity(jnp.sum(unmatched),
                                         bound=int(rt.capacity),
                                         label="join_nl.unmatched_r")
            u_idx = jnp.nonzero(unmatched, size=u_cap,
                                fill_value=0)[0].astype(jnp.int32)
            probe_parts.append(jnp.zeros(u_cap, dtype=jnp.int32))
            build_parts.append(u_idx)
            flags_parts.append(jnp.full(u_cap, 2, dtype=jnp.int32))
            keeps.append(jnp.arange(u_cap) < n_u)
            total = total + n_u

        n_out, out_cap = oracle_capacity(
            total, bound=int(sum(k.shape[0] for k in keeps)),
            label="join_nl.final")
        keep = jnp.concatenate(keeps)
        from hyrise_tpu.kernels.tpu_prims import compact
        probe_idx, build_idx, flags = compact(
            keep, [jnp.concatenate(probe_parts),
                   jnp.concatenate(build_parts),
                   jnp.concatenate(flags_parts)], out_cap)

        probe_ok = flags != 2   # 2 = left side NULL-padded
        build_ok = flags != 0   # 0 = right side NULL-padded
        probe_cols = _gather_columns(
            lt, probe_idx,
            probe_ok if mode in (JoinMode.RIGHT, JoinMode.OUTER) else None)
        build_cols = _gather_columns(
            rt, build_idx,
            build_ok if mode in (JoinMode.LEFT, JoinMode.OUTER) else None)
        return Table(probe_cols + build_cols, n_out, name=lt.name)


class Product(AbstractOperator):
    """Cross join (reference product.cpp): PosList repetition becomes
    broadcasted index generation."""

    name = "Product"

    def __init__(self, left, right):
        super().__init__(left, right)

    def _on_execute(self, context) -> Table:
        from hyrise_tpu.ops.materialize import ensure_prefix
        from hyrise_tpu.plan.compiler import oracle_capacity
        lt = ensure_prefix(self.input_table(0))
        rt = ensure_prefix(self.input_table(1))
        n, m = lt.num_rows, rt.num_rows
        total, out_cap = oracle_capacity(
            jnp.asarray(n) * jnp.asarray(m),
            bound=lt.capacity * rt.capacity, label="product.out")
        m_safe = jnp.maximum(jnp.asarray(m, dtype=jnp.int32), 1)
        idx = jnp.arange(out_cap, dtype=jnp.int32)
        probe_idx = jnp.clip(idx // m_safe, 0, lt.capacity - 1)
        build_idx = jnp.clip(idx % m_safe, 0, rt.capacity - 1)
        cols = _gather_columns(lt, probe_idx, None) + \
            _gather_columns(rt, build_idx, None)
        return Table(cols, total, name=lt.name)
