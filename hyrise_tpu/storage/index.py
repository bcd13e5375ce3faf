"""Column indexes.

Reference: src/lib/storage/index/ — per-chunk GroupKey /
CompositeGroupKey / AdaptiveRadixTree / BTree indexes over dictionary
columns (base_index.hpp:36+), consumed by IndexScan and JoinIndex.

TPU-native form: pointer-based trees don't vectorize, so ONE index shape
serves all four roles — the sorted permutation of a column ("GroupKey" over
the whole column): `perm` (row ids ordered by value) + `sorted_values`.
Lookups are binary searches (jnp.searchsorted) returning contiguous PosList
ranges — the same contiguous-range property the join engine exploits.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

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


def create_index(table: Table, column: str) -> SortedIndex:
    c = table.column(column)
    n = table.num_rows
    live = table.live_mask()
    valid = live if c.validity is None else (live & c.validity)
    if c.data.dtype.kind == "f":
        sentinel = jnp.array(jnp.inf, dtype=c.data.dtype)
    else:
        sentinel = jnp.array(jnp.iinfo(c.data.dtype).max, dtype=c.data.dtype)
    masked = jnp.where(valid, c.data, sentinel)
    perm = jnp.lexsort([(~valid).astype(jnp.int32), masked]).astype(jnp.int32)
    sorted_values = jnp.take(masked, perm, axis=0)
    n_valid = int(jnp.sum(valid))
    idx = SortedIndex(column, perm, sorted_values, n_valid)
    if not hasattr(table, "indexes"):
        table.indexes = {}
    table.indexes[column] = idx
    return idx


def get_index(table: Table, column: str) -> Optional[SortedIndex]:
    return getattr(table, "indexes", {}).get(column)
