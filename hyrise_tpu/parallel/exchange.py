"""Collective exchange layer — the genuinely new first-class component vs the
reference (SURVEY.md §2.3: Hyrise has no distributed backend; TBB queues and
NUMA-local memory become ICI/DCN collectives here).

All functions here run INSIDE `shard_map` over a 1-D device mesh:

- `repartition_by_key`: the all-to-all shuffle at the heart of distributed
  hash joins and group-bys (the reference's radix-partition scatter,
  join_hash.cpp:288-355, lifted to the cross-device axis). Static shapes:
  each device routes its rows into an [n_shards, cap] send buffer by
  hash(key) % n_shards, exchanges with `jax.lax.all_to_all`, and returns the
  received rows + validity mask (no host syncs inside the program).
- `local_join_inner`: per-shard sorted-range equi join with a fixed output
  capacity (mask-carrying, same algorithm as ops/join.py but sync-free).
- `dist_filter_aggregate`: local fused filter+segmented-reduce, `psum` to
  combine group cells across shards (distributed Q1/Q6).
- `dist_join_aggregate_step`: one full distributed query step
  (shuffle → co-partitioned join → partial aggregate → psum), the
  flagship multi-chip program used by __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from hyrise_tpu.parallel.mesh import SHARD_AXIS

HASH_MULT = 0x9E3779B97F4A7C15


def partition_hash(key: jax.Array, n_shards: int) -> jax.Array:
    """Must match partition.hash_partition's host-side placement."""
    h = key.astype(jnp.uint64) * jnp.uint64(HASH_MULT)
    return ((h >> jnp.uint64(1)) % jnp.uint64(n_shards)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# all-to-all repartition (runs inside shard_map)


def repartition_by_key(arrays: Tuple[jax.Array, ...], key: jax.Array,
                       valid: jax.Array, n_shards: int, axis: str = SHARD_AXIS,
                       target: Optional[jax.Array] = None):
    """Shuffle local rows to the shard owning hash(key).

    arrays: per-column 1-D local arrays (cap,), key: (cap,) int, valid: (cap,)
    Returns (recv_arrays, recv_key, recv_valid) with shape (n_shards*cap,).

    `target` overrides the per-row destination (skew-aware routing: hot keys
    spread round-robin instead of by hash — parallel/skew.py's salted split,
    the NUMAPlacementManager-migration analogue); invalid rows are dropped
    regardless.
    """
    cap = key.shape[0]
    if target is None:
        target = partition_hash(key, n_shards)
    target = jnp.where(valid, target, n_shards)

    # stable sort by target clusters rows per destination
    order = jnp.lexsort([target])
    t_sorted = jnp.take(target, order, axis=0)
    counts = jax.ops.segment_sum(jnp.ones(cap, dtype=jnp.int32), t_sorted,
                                 num_segments=n_shards + 1)[:n_shards]
    offsets = jnp.cumsum(counts) - counts  # exclusive
    rank = jnp.arange(cap, dtype=jnp.int32) - jnp.take(
        jnp.append(offsets, 0), jnp.minimum(t_sorted, n_shards), axis=0)
    # send-buffer slot for each sorted row; invalid rows dropped
    slot = jnp.where(t_sorted < n_shards,
                     t_sorted * cap + rank, n_shards * cap)

    def scatter(a):
        a_sorted = jnp.take(a, order, axis=0)
        buf = jnp.zeros((n_shards * cap,) + a.shape[1:], dtype=a.dtype)
        buf = buf.at[slot].set(a_sorted, mode="drop")
        return buf.reshape((n_shards, cap) + a.shape[1:])

    send = [scatter(a) for a in arrays]
    send_key = scatter(key)

    def a2a(x):
        return jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=0,
                                  tiled=True)

    recv = [a2a(x).reshape((n_shards * cap,) + x.shape[2:]) for x in send]
    recv_key = a2a(send_key).reshape(n_shards * cap)
    recv_counts = jax.lax.all_to_all(counts, axis, split_axis=0,
                                     concat_axis=0, tiled=True)  # [n_shards]
    recv_valid = (jnp.arange(cap, dtype=jnp.int32)[None, :]
                  < recv_counts[:, None]).reshape(n_shards * cap)
    return recv, recv_key, recv_valid


# ---------------------------------------------------------------------------
# per-shard sorted join (sync-free, fixed output capacity)


def local_join_inner(lk, l_valid, rk, r_valid, out_cap: int):
    """Per-shard inner equi join. Returns (l_idx, r_idx, pair_valid, total)
    with arrays of length out_cap; total may exceed out_cap (overflow check
    is the caller's job on host)."""
    if rk.dtype.kind == "f":
        sentinel = jnp.array(jnp.inf, dtype=rk.dtype)
    else:
        sentinel = jnp.array(jnp.iinfo(rk.dtype).max, dtype=rk.dtype)
    masked = jnp.where(r_valid, rk, sentinel)
    perm = jnp.lexsort([(~r_valid).astype(jnp.int32), masked])
    sorted_keys = jnp.take(masked, perm, axis=0)
    n_valid = jnp.sum(r_valid)

    lo = jnp.searchsorted(sorted_keys, lk, side="left")
    hi = jnp.searchsorted(sorted_keys, lk, side="right")
    lo = jnp.minimum(lo, n_valid)
    hi = jnp.minimum(hi, n_valid)
    counts = jnp.where(l_valid, jnp.maximum(hi - lo, 0), 0).astype(jnp.int32)
    total = jnp.sum(counts)

    cap = counts.shape[0]
    probe_ids = jnp.arange(cap, dtype=jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    probe_out = jnp.repeat(probe_ids, counts, total_repeat_length=out_cap)
    rank = (jnp.arange(out_cap, dtype=jnp.int32)
            - jnp.repeat(offsets.astype(jnp.int32), counts,
                         total_repeat_length=out_cap))
    pos = jnp.repeat(lo.astype(jnp.int32), counts,
                     total_repeat_length=out_cap) + rank
    pos = jnp.clip(pos, 0, rk.shape[0] - 1)
    build_out = jnp.take(perm, pos, axis=0).astype(jnp.int32)
    pair_valid = jnp.arange(out_cap, dtype=jnp.int32) < jnp.minimum(total,
                                                                    out_cap)
    return probe_out, build_out, pair_valid, total


# ---------------------------------------------------------------------------
# distributed pipelines


def dist_filter_aggregate(mesh: Mesh, compute_local, out_cells: int):
    """Wrap a local (env -> [out_cells] partials) computation into a sharded
    program with a psum combine. compute_local takes per-shard arrays."""

    def program(*args):
        partials = compute_local(*args)
        return jax.tree.map(lambda x: jax.lax.psum(x, SHARD_AXIS), partials)

    spec = P(SHARD_AXIS)
    return shard_map(program, mesh=mesh,
                     in_specs=spec, out_specs=P(),
                     check_vma=False)


def broadcast_join_inner(lk, l_valid, rk_local, r_valid_local,
                         out_cap: int, axis: str = SHARD_AXIS):
    """Broadcast join: all_gather the (small) build side to every shard and
    join locally — the distributed analogue of the reference's build-side
    swap rule (join_hash.cpp:55-76 picks the smaller input; here a small
    build side skips the all_to_all entirely). Runs inside shard_map."""
    rk = jax.lax.all_gather(rk_local, axis, tiled=True)
    rv = jax.lax.all_gather(r_valid_local, axis, tiled=True)
    return local_join_inner(lk, l_valid, rk, rv, out_cap)


def dist_join_aggregate_step(mesh: Mesh, n_shards: int,
                             expansion: int = 2):
    """Build the flagship distributed step:

    lineitem (sharded arbitrarily) ⋈ orders (sharded by o_orderkey) →
    SUM(l_extendedprice * (1 - l_discount)) via:
    all_to_all shuffle of lineitem by l_orderkey → local sorted join →
    local partial sum → psum.

    Returns a jittable fn(l_orderkey, l_price, l_discount, l_valid,
    o_orderkey, o_valid) -> (revenue scalar, match_total) operating on
    [n_shards, cap] sharded arrays.
    """

    def local_step(l_ok, l_price, l_disc, l_valid, o_ok, o_valid):
        # shard_map gives [1, cap] blocks on a 1-D mesh; flatten
        l_ok, l_price, l_disc, l_valid, o_ok, o_valid = (
            x.reshape(x.shape[-1]) for x in
            (l_ok, l_price, l_disc, l_valid, o_ok, o_valid))
        (r_price, r_disc), r_key, r_valid = repartition_by_key(
            (l_price, l_disc), l_ok, l_valid, n_shards)
        out_cap = r_key.shape[0] * expansion
        li_idx, o_idx, pair_valid, total = local_join_inner(
            r_key, r_valid, o_ok, o_valid, out_cap)
        price = jnp.take(r_price, li_idx, axis=0)
        disc = jnp.take(r_disc, li_idx, axis=0)
        rev = jnp.where(pair_valid,
                        price.astype(jnp.float64) * (1.0 - disc), 0.0)
        partial_rev = jnp.sum(rev)
        revenue = jax.lax.psum(partial_rev, SHARD_AXIS)
        matches = jax.lax.psum(total, SHARD_AXIS)
        return revenue, matches

    spec = P(SHARD_AXIS)
    fn = shard_map(local_step, mesh=mesh,
                   in_specs=(spec,) * 6, out_specs=(P(), P()),
                   check_vma=False)
    return jax.jit(fn)
