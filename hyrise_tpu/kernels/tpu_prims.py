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
    casted = []
    bools = []
    for a in arrays:
        if a.dtype == jnp.bool_:
            bools.append(True)
            casted.append(a.astype(jnp.int8))
        else:
            bools.append(False)
            casted.append(a)
    outs = jax.lax.sort((key,) + tuple(casted), num_keys=1, is_stable=True)
    res = []
    for o, b in zip(outs[1:], bools):
        o = _fit(o, cap)
        res.append(o.astype(jnp.bool_) if b else o)
    return res


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
    if side == "left":   # queries sort BEFORE equal build keys
        tag = jnp.concatenate([jnp.ones(nb, jnp.int8),
                               jnp.zeros(nq, jnp.int8)])
    else:                # right: queries after equal build keys
        tag = jnp.concatenate([jnp.zeros(nb, jnp.int8),
                               jnp.ones(nq, jnp.int8)])
    # query ids first (0..nq-1), build pushed after (nq..) so a final sort by
    # qid recovers per-query ranks as a prefix — no scatter
    qid = jnp.concatenate([nq + jnp.arange(nb, dtype=jnp.int32),
                           jnp.arange(nq, dtype=jnp.int32)])
    _, _, sq = jax.lax.sort((keys, tag, qid), num_keys=2, is_stable=False)
    is_q = sq < nq
    q_upto = jnp.cumsum(is_q.astype(jnp.int32))  # queries among first i+1
    rank = jnp.arange(1, nb + nq + 1, dtype=jnp.int32) - q_upto
    _, rank_by_q = jax.lax.sort((sq, rank), num_keys=1, is_stable=False)
    return jax.lax.slice_in_dim(rank_by_q, 0, nq)


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
