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

    With HYRISE_TPU_RING_EXCHANGE=1 the exchange runs as a ppermute ring
    (ring_repartition_by_key) instead of one all_to_all — same outputs,
    overlap-capable schedule.
    """
    if ring_exchange_enabled() and n_shards > 1:
        return ring_repartition_by_key(arrays, key, valid, n_shards, axis,
                                       target)
    cap = key.shape[0]
    send, send_key, counts = _send_buckets(arrays, key, valid, n_shards,
                                           target)

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
# ppermute ring exchange — all_to_all split into n-1 independent hops so
# XLA's latency-hiding scheduler overlaps hop k+1's communication with the
# compute consuming hop k (the double-buffered exchange of SURVEY §2.3;
# reference analogue: join_hash.cpp:288-355's partition-phase pipelining
# across scheduler workers).


def _send_buckets(arrays, key, valid, n_shards, target=None):
    """Cluster local rows into per-destination send buckets
    ([n_shards, cap] per array) + per-destination counts. Shared by the
    all_to_all and ring exchanges."""
    cap = key.shape[0]
    if target is None:
        target = partition_hash(key, n_shards)
    target = jnp.where(valid, target, n_shards)
    order = jnp.lexsort([target])
    t_sorted = jnp.take(target, order, axis=0)
    counts = jax.ops.segment_sum(jnp.ones(cap, dtype=jnp.int32), t_sorted,
                                 num_segments=n_shards + 1)[:n_shards]
    offsets = jnp.cumsum(counts) - counts  # exclusive
    rank = jnp.arange(cap, dtype=jnp.int32) - jnp.take(
        jnp.append(offsets, 0), jnp.minimum(t_sorted, n_shards), axis=0)
    slot = jnp.where(t_sorted < n_shards,
                     t_sorted * cap + rank, n_shards * cap)

    def scatter(a):
        a_sorted = jnp.take(a, order, axis=0)
        buf = jnp.zeros((n_shards * cap,) + a.shape[1:], dtype=a.dtype)
        buf = buf.at[slot].set(a_sorted, mode="drop")
        return buf.reshape((n_shards, cap) + a.shape[1:])

    return [scatter(a) for a in arrays], scatter(key), counts


def ring_repartition_by_key(arrays: Tuple[jax.Array, ...], key: jax.Array,
                            valid: jax.Array, n_shards: int,
                            axis: str = SHARD_AXIS,
                            target: Optional[jax.Array] = None):
    """repartition_by_key with the exchange as a ppermute ring.

    Identical contract/output layout to repartition_by_key. Step k
    (k = 1..n_shards-1) sends each shard's bucket for the shard k positions
    ahead directly there via one collective-permute; the n-1 hops are
    mutually independent, so each received chunk's placement (and any
    downstream per-chunk compute) overlaps the next hop's transfer instead
    of waiting on one monolithic all_to_all barrier. Step 0 is the local
    bucket (no communication)."""
    cap = key.shape[0]
    send, send_key, counts = _send_buckets(arrays, key, valid, n_shards,
                                           target)
    me = jax.lax.axis_index(axis)
    all_send = send + [send_key]

    def chunk_for(k):
        """(chunks addressed k ahead, their row count) — what I send."""
        d = (me + k) % n_shards
        return ([jax.lax.dynamic_index_in_dim(s, d, axis=0, keepdims=False)
                 for s in all_send],
                jax.lax.dynamic_index_in_dim(counts, d, keepdims=False))

    recv_store = [jnp.zeros((n_shards, cap) + s.shape[2:], s.dtype)
                  for s in all_send]
    recv_counts = jnp.zeros((n_shards,), counts.dtype)

    def place(store, cnts, chunks, cnt, src):
        store = [jax.lax.dynamic_update_index_in_dim(b, c, src, axis=0)
                 for b, c in zip(store, chunks)]
        return store, jax.lax.dynamic_update_index_in_dim(
            cnts, cnt, src, axis=0)

    own, own_cnt = chunk_for(0)
    recv_store, recv_counts = place(recv_store, recv_counts, own, own_cnt, me)
    for k in range(1, n_shards):
        perm = [(i, (i + k) % n_shards) for i in range(n_shards)]
        chunks, cnt = chunk_for(k)
        got = [jax.lax.ppermute(c, axis, perm) for c in chunks]
        got_cnt = jax.lax.ppermute(cnt, axis, perm)
        src = (me - k) % n_shards
        recv_store, recv_counts = place(recv_store, recv_counts,
                                        got, got_cnt, src)

    recv = [b.reshape((n_shards * cap,) + b.shape[2:])
            for b in recv_store[:-1]]
    recv_key = recv_store[-1].reshape(n_shards * cap)
    recv_valid = (jnp.arange(cap, dtype=jnp.int32)[None, :]
                  < recv_counts[:, None]).reshape(n_shards * cap)
    return recv, recv_key, recv_valid


def ring_exchange_enabled() -> bool:
    import os
    return os.environ.get("HYRISE_TPU_RING_EXCHANGE", "0") not in (
        "0", "false", "no")


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


def ring_join_aggregate_step(mesh: Mesh, n_shards: int):
    """dist_join_aggregate_step with the shuffle fully OVERLAPPED with the
    probe compute: the build side (orders, co-partitioned) is sorted once,
    then each hop of the ppermute ring delivers one source shard's probe
    chunk, which is searchsorted-probed and reduced IMMEDIATELY — hop k+1's
    transfer has no data dependency on hop k's probe, so XLA pipelines
    communication under compute instead of a shuffle barrier followed by a
    monolithic join. Value-identical to dist_join_aggregate_step (same
    f64 per-chunk-then-psum reduction tree, chunk order fixed by source
    shard). Reference analogue: join_hash.cpp:288-355 overlapping the
    radix-partition scatter with per-partition builds across workers."""

    def probe_chunk(sorted_keys, n_valid, keys, price, disc, cnt):
        valid = jnp.arange(keys.shape[0], dtype=jnp.int32) < cnt
        lo = jnp.searchsorted(sorted_keys, keys, side="left")
        hi = jnp.searchsorted(sorted_keys, keys, side="right")
        lo = jnp.minimum(lo, n_valid)
        hi = jnp.minimum(hi, n_valid)
        matches = jnp.where(valid, jnp.maximum(hi - lo, 0), 0)
        rev = jnp.where(valid & (matches > 0),
                        price.astype(jnp.float64) * (1.0 - disc),
                        0.0) * matches  # unique orderkeys -> matches in {0,1}
        return jnp.sum(rev), jnp.sum(matches)

    def local_step(l_ok, l_price, l_disc, l_valid, o_ok, o_valid):
        l_ok, l_price, l_disc, l_valid, o_ok, o_valid = (
            x.reshape(x.shape[-1]) for x in
            (l_ok, l_price, l_disc, l_valid, o_ok, o_valid))
        # build once (local, before the ring starts)
        if o_ok.dtype.kind == "f":
            sentinel = jnp.array(jnp.inf, dtype=o_ok.dtype)
        else:
            sentinel = jnp.array(jnp.iinfo(o_ok.dtype).max, dtype=o_ok.dtype)
        sorted_keys = jnp.sort(jnp.where(o_valid, o_ok, sentinel))
        n_valid = jnp.sum(o_valid)

        send, send_key, counts = _send_buckets(
            (l_price, l_disc), l_ok, l_valid, n_shards)
        me = jax.lax.axis_index(SHARD_AXIS)
        all_send = send + [send_key]

        def chunk_for(k):
            d = (me + k) % n_shards
            return ([jax.lax.dynamic_index_in_dim(s, d, axis=0,
                                                  keepdims=False)
                     for s in all_send],
                    jax.lax.dynamic_index_in_dim(counts, d, keepdims=False))

        rev = jnp.float64(0.0)
        matches = jnp.int32(0)
        (price0, disc0, key0), cnt0 = chunk_for(0)
        r, m = probe_chunk(sorted_keys, n_valid, key0, price0, disc0, cnt0)
        rev += r
        matches += m
        for k in range(1, n_shards):
            perm = [(i, (i + k) % n_shards) for i in range(n_shards)]
            chunks, cnt = chunk_for(k)
            price_k, disc_k, key_k = [jax.lax.ppermute(c, SHARD_AXIS, perm)
                                      for c in chunks]
            cnt_k = jax.lax.ppermute(cnt, SHARD_AXIS, perm)
            r, m = probe_chunk(sorted_keys, n_valid, key_k, price_k,
                               disc_k, cnt_k)
            rev += r
            matches += m
        return (jax.lax.psum(rev, SHARD_AXIS),
                jax.lax.psum(matches, SHARD_AXIS))

    spec = P(SHARD_AXIS)
    fn = shard_map(local_step, mesh=mesh,
                   in_specs=(spec,) * 6, out_specs=(P(), P()),
                   check_vma=False)
    return jax.jit(fn)
