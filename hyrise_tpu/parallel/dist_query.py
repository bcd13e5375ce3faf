"""Distributed query execution over hash-partitioned tables.

BASELINE configs 4-5: tables hash-partitioned across hosts/chips
(parallel/partition.py), queries executed as ONE sharded jitted program per
pipeline stage with collectives for the exchange:

- `dist_q6`: embarrassingly parallel scan+reduce, `psum` combine.
- `dist_q1`: local fused group-cells + `psum` over the (tiny) cell space.
- `dist_q3_step`: the 3-way join pipeline (customer ⋈ orders ⋈ lineitem →
  group by orderkey) with an all_to_all shuffle for the non-co-partitioned
  side — the full distributed-join recipe of SURVEY §7 step 6.

Skew handling (the NUMAPlacementManager successor): `shard_histogram` +
`detect_skew` expose per-shard row counts so ingest can re-salt hot keys
(parallel/skew.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hyrise_tpu.parallel.exchange import (local_join_inner, partition_hash,
                                          repartition_by_key)
from hyrise_tpu.parallel.mesh import SHARD_AXIS
from hyrise_tpu.parallel.partition import ShardedTable


def _shard_masks(st: ShardedTable) -> jax.Array:
    cap = st.shard_capacity
    return (jnp.arange(cap, dtype=jnp.int32)[None, :] < st.counts[:, None])


def dist_q6(mesh: Mesh, lineitem: ShardedTable, date_lo: int, date_hi: int):
    """Distributed TPC-H Q6: local fused scan+reduce, psum."""

    def local(ship, disc, qty, price, live):
        ship, disc, qty, price, live = (
            x.reshape(x.shape[-1]) for x in (ship, disc, qty, price, live))
        mask = (live & (ship >= date_lo) & (ship < date_hi)
                & (disc >= jnp.float32(0.05))
                & (disc <= jnp.float32(0.07001))
                & (qty < jnp.float32(24.0)))
        rev = jnp.where(mask, price * disc, jnp.float32(0.0))
        partials = jnp.sum(rev.reshape(-1, 512), axis=1)
        mine = jnp.sum(partials.astype(jnp.float64))
        return jax.lax.psum(mine, SHARD_AXIS)

    spec = P(SHARD_AXIS)
    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,) * 5,
                           out_specs=P(), check_vma=False))
    return fn(lineitem.column("l_shipdate").data,
              lineitem.column("l_discount").data,
              lineitem.column("l_quantity").data,
              lineitem.column("l_extendedprice").data,
              _shard_masks(lineitem))


def dist_q1(mesh: Mesh, lineitem: ShardedTable, date_hi_code: int):
    """Distributed TPC-H Q1: per-shard segment sums over the returnflag ×
    linestatus cell space, psum combine. Returns dense per-cell arrays
    (n_rf * n_ls): counts, sum_qty, sum_base, sum_disc_price, sum_charge,
    sum_disc."""
    n_rf = len(lineitem.column("l_returnflag").dictionary)
    n_ls = len(lineitem.column("l_linestatus").dictionary)
    cells = n_rf * n_ls

    def local(ship, rf, ls, qty, price, disc, tax, live):
        ship, rf, ls, qty, price, disc, tax, live = (
            x.reshape(x.shape[-1])
            for x in (ship, rf, ls, qty, price, disc, tax, live))
        mask = live & (ship <= date_hi_code)
        cell = jnp.where(mask, rf * n_ls + ls, cells)
        qty64 = qty.astype(jnp.float64)
        price64 = price.astype(jnp.float64)
        disc64 = disc.astype(jnp.float64)
        disc_price = price64 * (1.0 - disc64)
        charge = disc_price * (1.0 + tax.astype(jnp.float64))

        def seg(v):
            return jax.ops.segment_sum(jnp.where(mask, v, 0.0), cell,
                                       num_segments=cells + 1)[:cells]

        outs = (jax.ops.segment_sum(mask.astype(jnp.int64), cell,
                                    num_segments=cells + 1)[:cells],
                seg(qty64), seg(price64), seg(disc_price), seg(charge),
                seg(disc64))
        return jax.tree.map(lambda x: jax.lax.psum(x, SHARD_AXIS), outs)

    spec = P(SHARD_AXIS)
    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,) * 8,
                           out_specs=(P(),) * 6, check_vma=False))
    return fn(lineitem.column("l_shipdate").data,
              lineitem.column("l_returnflag").data,
              lineitem.column("l_linestatus").data,
              lineitem.column("l_quantity").data,
              lineitem.column("l_extendedprice").data,
              lineitem.column("l_discount").data,
              lineitem.column("l_tax").data,
              _shard_masks(lineitem))


def _local_sum_by_key(keys, values, valid):
    """Sync-free per-shard sum-by-key: sort-cluster, segment-sum with
    num_segments = capacity (a group count upper bound), return dense
    (group_keys, group_sums, group_valid) arrays of the same capacity."""
    cap = keys.shape[0]
    if keys.dtype.kind == "f":
        sentinel = jnp.array(jnp.inf, dtype=keys.dtype)
    else:
        sentinel = jnp.array(jnp.iinfo(keys.dtype).max, dtype=keys.dtype)
    masked = jnp.where(valid, keys, sentinel)
    perm = jnp.lexsort([(~valid).astype(jnp.int32), masked])
    k = jnp.take(masked, perm, axis=0)
    v = jnp.take(jnp.where(valid, values, 0), perm, axis=0)
    val = jnp.take(valid, perm, axis=0)
    first = jnp.zeros(cap, dtype=bool).at[0].set(True)
    new_group = val & (first | (k != jnp.roll(k, 1)))
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1
    gid = jnp.where(val, gid, cap)
    sums = jax.ops.segment_sum(v, gid, num_segments=cap + 1)[:cap]
    # representative key per group
    rep_pos = jnp.where(new_group, jnp.arange(cap), cap)
    rep_sorted = jnp.sort(rep_pos)[:cap]
    g_keys = jnp.take(k, jnp.clip(rep_sorted, 0, cap - 1), axis=0)
    n_groups = jnp.sum(new_group.astype(jnp.int32))
    g_valid = jnp.arange(cap) < n_groups
    return g_keys, sums, g_valid


def dist_aggregate_sum_by_key(mesh: Mesh, n_shards: int):
    """Two-phase distributed SUM-by-high-cardinality-key (SURVEY §7 step 6:
    local partial aggregates -> all_to_all by key hash -> final combine).
    Robust to key skew: a hot key contributes at most ONE partial per source
    shard to the exchange, regardless of its row count.

    Returns jitted fn(keys [n,cap], values [n,cap], valid [n,cap]) ->
    (group_keys, group_sums, group_valid) sharded arrays: each shard holds
    the final sums for the keys it owns by hash."""

    def local(keys, values, valid):
        keys, values, valid = (x.reshape(x.shape[-1])
                               for x in (keys, values, valid))
        # phase 1: local partials
        g_keys, g_sums, g_valid = _local_sum_by_key(keys, values, valid)
        # exchange partials by key hash
        (r_sums,), r_keys, r_valid = repartition_by_key(
            (g_sums,), g_keys, g_valid, n_shards)
        # phase 2: combine partials
        f_keys, f_sums, f_valid = _local_sum_by_key(r_keys, r_sums, r_valid)
        return (f_keys[None, :], f_sums[None, :], f_valid[None, :])

    spec = P(SHARD_AXIS)
    return jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,) * 3,
                             out_specs=(spec,) * 3, check_vma=False))


def dist_q3_step(mesh: Mesh, n_shards: int, customer: ShardedTable,
                 orders: ShardedTable, lineitem: ShardedTable,
                 segment_code: int, date_lo_code: int, expansion: int = 2):
    """Distributed Q3 core: customer(BUILDING) ⋈ orders(date<) ⋈ lineitem
    (shipdate>) → SUM(revenue). Partitioning contract: customer by custkey,
    orders by custkey (co-partitioned with customer), lineitem by partkey
    (NOT orderkey) → the lineitem side is shuffled by l_orderkey via
    all_to_all inside the program. Returns (revenue_f64, match_count)."""

    def local(c_ck, c_seg, c_live,
              o_ck, o_ok, o_date, o_live,
              l_ok, l_ship, l_price, l_disc, l_live):
        (c_ck, c_seg, c_live, o_ck, o_ok, o_date, o_live,
         l_ok, l_ship, l_price, l_disc, l_live) = (
            x.reshape(x.shape[-1]) for x in
            (c_ck, c_seg, c_live, o_ck, o_ok, o_date, o_live,
             l_ok, l_ship, l_price, l_disc, l_live))

        # local filters
        c_valid = c_live & (c_seg == segment_code)
        o_valid = o_live & (o_date < date_lo_code)
        l_valid = l_live & (l_ship > date_lo_code)

        # customer ⋈ orders: co-partitioned on custkey -> local join
        o_idx, c_idx, pair_valid, _ = local_join_inner(
            o_ck, o_valid, c_ck, c_valid, o_ck.shape[0])
        # orders that survived the customer join
        o_sel_ok = jnp.take(o_ok, o_idx, axis=0)
        o_sel_valid = pair_valid

        # shuffle lineitem by orderkey to the shard owning hash(o_orderkey)?
        # orders are partitioned by custkey, so BOTH sides shuffle by
        # orderkey into a common orderkey space.
        (o2_dummy,), o2_key, o2_valid = repartition_by_key(
            (o_sel_ok,), o_sel_ok, o_sel_valid, n_shards)
        (l_price2, l_disc2), l_key2, l_valid2 = repartition_by_key(
            (l_price, l_disc), l_ok, l_valid, n_shards)

        out_cap = l_key2.shape[0] * expansion
        li_idx, o_idx2, pv, total = local_join_inner(
            l_key2, l_valid2, o2_key, o2_valid, out_cap)
        price = jnp.take(l_price2, li_idx, axis=0).astype(jnp.float64)
        disc = jnp.take(l_disc2, li_idx, axis=0).astype(jnp.float64)
        rev = jnp.where(pv, price * (1.0 - disc), 0.0)
        revenue = jax.lax.psum(jnp.sum(rev), SHARD_AXIS)
        matches = jax.lax.psum(total, SHARD_AXIS)
        return revenue, matches

    spec = P(SHARD_AXIS)
    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,) * 12,
                           out_specs=(P(), P()), check_vma=False))
    return fn(customer.column("c_custkey").data,
              customer.column("c_mktsegment").data,
              _shard_masks(customer),
              orders.column("o_custkey").data,
              orders.column("o_orderkey").data,
              orders.column("o_orderdate").data,
              _shard_masks(orders),
              lineitem.column("l_orderkey").data,
              lineitem.column("l_shipdate").data,
              lineitem.column("l_extendedprice").data,
              lineitem.column("l_discount").data,
              _shard_masks(lineitem))
