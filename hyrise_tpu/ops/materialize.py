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


@partial(jax.jit, static_argnames=("capacity",))
def _nonzero_indices(mask: jax.Array, capacity: int) -> jax.Array:
    return jnp.nonzero(mask, size=capacity, fill_value=0)[0].astype(jnp.int32)


def mask_to_indices(mask: jax.Array) -> Tuple[jax.Array, int]:
    """Compact a boolean mask into (indices, count). One host sync."""
    count = int(jnp.sum(mask))
    cap = bucket_capacity(count)
    return _nonzero_indices(mask, cap), count


@jax.jit
def _gather_arrays(arrays, indices):
    return jax.tree.map(lambda a: jnp.take(a, indices, axis=0), arrays)


def gather_table(table: Table, indices: jax.Array, count: int,
                 name: Optional[str] = None) -> Table:
    """Materialize table[indices[:count]] into a new dense table."""
    datas = [c.data for c in table.columns]
    vals = [c.validity for c in table.columns if c.validity is not None]
    g_datas = _gather_arrays(datas, indices)
    g_vals = iter(_gather_arrays(vals, indices)) if vals else iter(())
    cols = []
    for c, gd in zip(table.columns, g_datas):
        gv = next(g_vals) if c.validity is not None else None
        cols.append(Column(name=c.name, dtype=c.dtype, data=gd, validity=gv,
                           dictionary=c.dictionary))
    return Table(cols, count, name=name if name is not None else table.name)


def filter_table(table: Table, mask: jax.Array) -> Table:
    """mask (capacity,) → compacted table. Mask is ANDed with live rows."""
    mask = mask & table.live_mask()
    indices, count = mask_to_indices(mask)
    return gather_table(table, indices, count)
