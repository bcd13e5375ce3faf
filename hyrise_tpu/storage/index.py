"""Column indexes.

Reference: src/lib/storage/index/ — per-chunk GroupKey /
CompositeGroupKey / AdaptiveRadixTree / BTree indexes over dictionary
columns (base_index.hpp:36+), consumed by IndexScan and JoinIndex.

TPU-native form: pointer-based trees don't vectorize, so ONE index shape
serves all four roles — the sorted permutation of a column ("GroupKey" over
the whole column): `perm` (row ids ordered by value) + `sorted_values`.
Lookups are binary searches (jnp.searchsorted) returning contiguous PosList
ranges — the same contiguous-range property the join engine exploits.

Multi-column indexes (reference CompositeGroupKey,
src/lib/storage/index/composite_group_key/*): the permutation is
lexicographic over the column list; a prefix-equality lookup narrows the
range level by level (each level's values are sorted WITHIN the equal
prefix above it). JoinIndex reuses the single-column permutation as the
join's pre-sorted build side (ops/join.py)."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType


@dataclasses.dataclass
class SortedIndex:
    column: str
    perm: jax.Array           # int32 row ids, ordered by column value
    sorted_values: jax.Array  # column data in sorted order (codes for strings)
    n_valid: int              # live & non-null rows covered

    def lookup_range(self, lo_value, hi_value, lo_side="left",
                     hi_side="right") -> Tuple[int, int]:
        """Host binary search -> [start, end) positions into perm."""
        start = int(jnp.searchsorted(self.sorted_values, lo_value,
                                     side=lo_side))
        end = int(jnp.searchsorted(self.sorted_values, hi_value,
                                   side=hi_side))
        return min(start, self.n_valid), min(end, self.n_valid)


@dataclasses.dataclass
class GroupKeyIndex(SortedIndex):
    """Dictionary-offset index (reference GroupKeyIndex,
    src/lib/storage/index/group_key/group_key_index.hpp): codes are dense
    in [0, n_codes), so a host-resident offsets array gives O(1) lookups
    with ZERO device reads — where the base SortedIndex pays two
    device searchsorted round trips (~25 ms each on the axon tunnel) per
    range lookup. postings for code v = perm[offsets[v]:offsets[v+1]]."""

    offsets: np.ndarray = None  # host int64, len n_codes+1; [-1] = n_valid

    def lookup_range(self, lo_value, hi_value, lo_side="left",
                     hi_side="right") -> Tuple[int, int]:
        nc = len(self.offsets) - 1

        def pos(v, side):
            v = int(v)
            if side == "right":
                v += 1
            return int(self.offsets[max(min(v, nc), 0)])

        start = pos(lo_value, lo_side)
        end = pos(hi_value, hi_side)
        return min(start, self.n_valid), min(end, self.n_valid)


def _masked(c, valid):
    if c.data.dtype.kind == "f":
        sentinel = jnp.array(jnp.inf, dtype=c.data.dtype)
    else:
        sentinel = jnp.array(jnp.iinfo(c.data.dtype).max, dtype=c.data.dtype)
    return jnp.where(valid, c.data, sentinel)


def create_index(table: Table,
                 column: Union[str, Sequence[str]]) -> "SortedIndex":
    if not isinstance(column, str):
        cols = tuple(column)
        if len(cols) > 1:
            return create_composite_index(table, cols)
        column = cols[0]
    c = table.column(column)
    live = table.live_mask()
    valid = live if c.validity is None else (live & c.validity)
    masked = _masked(c, valid)
    perm = jnp.lexsort([(~valid).astype(jnp.int32), masked]).astype(jnp.int32)
    sorted_values = jnp.take(masked, perm, axis=0)
    n_valid = int(jnp.sum(valid))
    if c.dtype is DataType.STRING and c.dictionary is not None:
        # dictionary column: dense code domain -> host offsets, O(1) lookups
        nc = len(c.dictionary)
        host_codes = np.asarray(sorted_values[:n_valid])
        offsets = np.searchsorted(host_codes, np.arange(nc + 1),
                                  side="left").astype(np.int64)
        idx: SortedIndex = GroupKeyIndex(column, perm, sorted_values,
                                         n_valid, offsets)
    else:
        idx = SortedIndex(column, perm, sorted_values, n_valid)
    if not hasattr(table, "indexes"):
        table.indexes = {}
    table.indexes[column] = idx
    return idx


@dataclasses.dataclass
class CompositeSortedIndex:
    """Lexicographic sorted permutation over several columns (reference
    CompositeGroupKeyIndex, composite_group_key_index.hpp: concatenated
    variable-length keys; here the levels stay separate arrays and lookups
    narrow a [start, end) range per level)."""

    columns: Tuple[str, ...]
    perm: jax.Array                     # int32 row ids, lex-ordered
    sorted_values: List[jax.Array]      # per level, in perm order
    n_valid: int                        # rows with every level non-null

    def lookup_equals(self, values: Sequence) -> Tuple[int, int]:
        """[start, end) of rows equal to the given key PREFIX (host binary
        searches, one per level). len(values) <= len(columns)."""
        assert len(values) <= len(self.columns)
        start, end = 0, self.n_valid
        for level, v in enumerate(values):
            sv = self.sorted_values[level]
            seg = jax.lax.slice_in_dim(sv, start, max(end, start))
            lo = int(jnp.searchsorted(seg, v, side="left"))
            hi = int(jnp.searchsorted(seg, v, side="right"))
            start, end = start + lo, start + hi
            if start >= end:
                return start, start
        return start, end


def create_composite_index(table: Table,
                           columns: Sequence[str]) -> CompositeSortedIndex:
    cols = [table.column(name) for name in columns]
    valid = table.live_mask()
    for c in cols:
        if c.validity is not None:
            valid = valid & c.validity
    masked = [_masked(c, valid) for c in cols]
    # jnp.lexsort sorts by the LAST key as primary; we want primary =
    # validity (NULL/dead rows past n_valid), then columns[0], columns[1]...
    keys = list(reversed(masked)) + [(~valid).astype(jnp.int32)]
    perm = jnp.lexsort(keys).astype(jnp.int32)
    sorted_values = [jnp.take(m, perm, axis=0) for m in masked]
    idx = CompositeSortedIndex(tuple(columns), perm, sorted_values,
                               int(jnp.sum(valid)))
    if not hasattr(table, "indexes"):
        table.indexes = {}
    table.indexes[tuple(columns)] = idx
    return idx


def get_index(table: Table, column: Union[str, Sequence[str]]):
    key = column if isinstance(column, str) else tuple(column)
    return getattr(table, "indexes", {}).get(key)


def find_composite_index(table: Table, columns: Sequence[str]
                         ) -> Optional[CompositeSortedIndex]:
    """A composite index whose column list STARTS WITH `columns` (any
    prefix-covering index serves an equality lookup on the prefix)."""
    want = tuple(columns)
    for key, idx in getattr(table, "indexes", {}).items():
        if isinstance(key, tuple) and key[:len(want)] == want:
            return idx
    return None
