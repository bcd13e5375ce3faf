"""ppermute ring exchange (parallel/exchange.py ring_repartition_by_key /
ring_join_aggregate_step): the all_to_all shuffle split into n-1 independent
collective-permute hops so communication overlaps the consuming compute
(SURVEY §2.3's double-buffered exchange; BASELINE config 5 "exchange
overlapped with compute"). Reference analogue: the partition-phase
pipelining across scheduler workers in join_hash.cpp:288-355.

Correctness contract: identical outputs to the all_to_all path."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from hyrise_tpu.parallel.exchange import (dist_join_aggregate_step,
                                          repartition_by_key,
                                          ring_join_aggregate_step,
                                          ring_repartition_by_key)
from hyrise_tpu.parallel.mesh import SHARD_AXIS, make_mesh
from hyrise_tpu.parallel.partition import hash_partition
from hyrise_tpu.storage.table import Table

N_SHARDS = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(N_SHARDS)


def _sharded_inputs(rng, cap=64):
    key = rng.integers(0, 200, size=(N_SHARDS, cap)).astype(np.int64)
    val = (rng.random((N_SHARDS, cap)) * 100).astype(np.float32)
    aux = rng.integers(0, 1 << 30, size=(N_SHARDS, cap)).astype(np.int32)
    valid = rng.random((N_SHARDS, cap)) < 0.8
    return key, val, aux, valid


def _run_repartition(mesh, fn, key, val, aux, valid):
    def local(k, v, a, m):
        k, v, a, m = (x.reshape(x.shape[-1]) for x in (k, v, a, m))
        recv, recv_key, recv_valid = fn((v, a), k, m, N_SHARDS)
        return recv[0], recv[1], recv_key, recv_valid

    spec = P(SHARD_AXIS)
    prog = shard_map(local, mesh=mesh, in_specs=(spec,) * 4,
                     out_specs=(spec,) * 4, check_vma=False)
    return [np.asarray(x) for x in jax.jit(prog)(key, val, aux, valid)]


def test_ring_matches_all_to_all_exactly(mesh):
    rng = np.random.default_rng(5)
    key, val, aux, valid = _sharded_inputs(rng)
    a2a = _run_repartition(mesh, repartition_by_key, key, val, aux, valid)
    ring = _run_repartition(mesh, ring_repartition_by_key,
                            key, val, aux, valid)
    for got, ref, name in zip(ring, a2a, ("val", "aux", "key", "valid")):
        # identical layout: chunk from source shard s lands in row s
        np.testing.assert_array_equal(got, ref, err_msg=name)


def test_ring_schedule_is_n_minus_1_permutes(mesh):
    """Structural: the ring program must contain n-1 independent
    collective-permutes (the overlap-capable schedule), where the a2a
    program contains all-to-all and no permutes."""
    rng = np.random.default_rng(6)
    key, val, aux, valid = _sharded_inputs(rng, cap=32)

    def build(fn):
        def local(k, v, a, m):
            k, v, a, m = (x.reshape(x.shape[-1]) for x in (k, v, a, m))
            recv, recv_key, recv_valid = fn((v, a), k, m, N_SHARDS)
            return recv[0], recv_key, recv_valid

        spec = P(SHARD_AXIS)
        prog = shard_map(local, mesh=mesh, in_specs=(spec,) * 4,
                         out_specs=(spec,) * 3, check_vma=False)
        return jax.jit(prog).lower(key, val, aux, valid).as_text()

    ring_hlo = build(ring_repartition_by_key)
    a2a_hlo = build(repartition_by_key)
    # one collective_permute per hop, one per ppermuted operand set; at
    # minimum the n-1 hop structure must be visible
    assert ring_hlo.count("collective_permute") >= N_SHARDS - 1
    assert "all_to_all" not in ring_hlo
    assert "all_to_all" in a2a_hlo
    assert "collective_permute" not in a2a_hlo


def test_ring_join_aggregate_matches_barrier_step(mesh):
    rng = np.random.default_rng(3)
    n_orders, n_li = 64, 256
    orders = Table.from_pandas("orders", pd.DataFrame({
        "o_orderkey": np.arange(1, n_orders + 1, dtype=np.int32)}))
    li = Table.from_pandas("lineitem", pd.DataFrame({
        "l_orderkey": rng.integers(1, n_orders + 1,
                                   size=n_li).astype(np.int32),
        "l_price": (rng.random(n_li) * 100).astype(np.float32),
        "l_discount": (rng.integers(0, 11, size=n_li) / 100
                       ).astype(np.float32),
    }))
    so = hash_partition(orders, "o_orderkey", mesh)
    sl = hash_partition(li, "l_orderkey", mesh)

    def masks(st):
        return (jnp.arange(st.shard_capacity, dtype=jnp.int32)[None, :]
                < st.counts[:, None])

    args = (sl.column("l_orderkey").data, sl.column("l_price").data,
            sl.column("l_discount").data, masks(sl),
            so.column("o_orderkey").data, masks(so))
    rev_ref, m_ref = dist_join_aggregate_step(mesh, N_SHARDS)(*args)
    rev_ring, m_ring = ring_join_aggregate_step(mesh, N_SHARDS)(*args)
    assert int(m_ring) == int(m_ref) == n_li
    np.testing.assert_allclose(float(rev_ring), float(rev_ref), rtol=1e-12)
    # host oracle
    j = li.to_pandas().merge(orders.to_pandas(), left_on="l_orderkey",
                             right_on="o_orderkey")
    expect = float((j.l_price.astype(np.float64)
                    * (1.0 - j.l_discount)).sum())
    np.testing.assert_allclose(float(rev_ring), expect, rtol=1e-6)


def test_dist_tpch_query_with_ring_exchange(mesh, monkeypatch):
    """A full distributed TPC-H query (shuffle-join class) through the plan
    compiler with the ring exchange enabled must stay value-exact vs the
    single-node engine."""
    monkeypatch.setenv("HYRISE_TPU_RING_EXCHANGE", "1")
    from hyrise_tpu.ops.base import execute_plan
    from hyrise_tpu.parallel.dist_compiler import (DistributedCompiledQuery,
                                                   shard_tpch)
    from hyrise_tpu.storage.catalog import Catalog
    from hyrise_tpu.tpch.dbgen import generate_tables
    from hyrise_tpu.tpch.queries import TPCH_PLANS
    from hyrise_tpu.utils.table_eq import assert_tables_equal

    tables = generate_tables(0.002)
    cat = Catalog()
    for name, t in tables.items():
        cat.add_table(name, t)
    sc = shard_tpch(cat, mesh)
    for qid in (3, 12):  # join-heavy: repartition exchanges on the path
        ref = execute_plan(TPCH_PLANS[qid](cat))
        got = DistributedCompiledQuery(TPCH_PLANS[qid](cat), sc).run()
        assert_tables_equal(got.rows(), ref.rows(), ordered=True,
                            rel_tol=1e-6)
