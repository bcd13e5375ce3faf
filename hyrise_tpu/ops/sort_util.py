"""Multi-key stable sort machinery shared by Sort, Aggregate and the
sort-merge join path.

Reference: src/lib/operators/sort.cpp materializes (RowID, value) pairs and
std::stable_sorts them (sort.cpp:180-210), chaining operators for multi-column
ORDER BY. Here: one `jnp.lexsort` over (value, null-flag, dead-flag) key
arrays — XLA lowers this to a sequence of stable device sorts.

Conventions:
- dead rows (>= num_rows) always sort last;
- NULL ordering per SortMode (Hyrise default: NULLs first, types.hpp
  OrderByMode);
- strings sort by their order-preserving dictionary codes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, SortMode


def _value_key(data: jax.Array, dtype: DataType, ascending: bool) -> jax.Array:
    if dtype.is_integral or dtype is DataType.STRING:
        key = data.astype(jnp.int64)
    else:
        key = data.astype(jnp.float64)
    return key if ascending else -key


def sort_permutation(table: Table,
                     sort_defs: Sequence[Tuple[str, SortMode]]) -> jax.Array:
    """Stable permutation ordering live rows by sort_defs, dead rows last."""
    keys: List[jax.Array] = []
    # lexsort: LAST key is primary; we append from least to most significant.
    for name, mode in reversed(list(sort_defs)):
        c = table.column(name)
        keys.append(_value_key(c.data, c.dtype, mode.ascending))
        if c.validity is not None:
            # null-flag outranks the value. nulls_first: NULL -> 0 else 1.
            if mode.nulls_first:
                keys.append(c.validity.astype(jnp.int32))
            else:
                keys.append((~c.validity).astype(jnp.int32))
    keys.append((~table.live_mask()).astype(jnp.int32))
    return jnp.lexsort(keys)


def group_permutation(table: Table, groupby: Sequence[str]) -> jax.Array:
    """Permutation clustering equal group keys (NULLs are one group)."""
    defs = [(name, SortMode.ASCENDING) for name in groupby]
    return sort_permutation(table, defs)


def group_boundaries(table: Table, groupby: Sequence[str],
                     perm: jax.Array) -> jax.Array:
    """Bool flags over the permuted row order: True where a new group starts.

    Only meaningful for live rows; flag[0] is True when num_rows > 0.
    """
    cap = table.capacity
    flags = jnp.zeros(cap, dtype=bool)
    flags = flags.at[0].set(table.num_rows > 0)
    for name in groupby:
        c = table.column(name)
        v = jnp.take(c.data, perm, axis=0)
        prev = jnp.roll(v, 1)
        differs = v != prev
        if jnp.issubdtype(v.dtype, jnp.floating):
            # the sort clusters NaNs contiguously; NaN != NaN would start a
            # new group per NaN row — SQL grouping puts all NaNs in ONE
            differs = differs & ~(jnp.isnan(v) & jnp.isnan(prev))
        if c.validity is not None:
            val = jnp.take(c.validity, perm, axis=0)
            val_prev = jnp.roll(val, 1)
            differs = (differs & val & val_prev) | (val != val_prev)
        differs = differs.at[0].set(False)
        flags = flags | differs
    return flags
