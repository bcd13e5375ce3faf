"""Blocked x distributed composition (parallel/blocked_dist.py).

The SF100 feasibility axis (r4 VERDICT missing #2): a sharded fact table
streams in fixed row blocks THROUGH the shard_map program, so per-device
intermediate capacities are block-bounded instead of shard-bounded —
chunks x NUMA, the reference's scale product (numa_placement_manager.hpp
distributes chunks; every operator iterates chunks, chunk.hpp:44)."""

import numpy as np
import pytest

from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.parallel.blocked_dist import BlockedDistributedQuery
from hyrise_tpu.parallel.dist_compiler import shard_tpch
from hyrise_tpu.parallel.mesh import make_mesh
from hyrise_tpu.plan.compiler import PlanNotCompilable
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.tpch.dbgen import generate_tables
from hyrise_tpu.tpch.queries import TPCH_PLANS
from hyrise_tpu.utils.table_eq import assert_tables_equal

SF = 0.02
_state = {}


def _env():
    if "env" not in _state:
        tables = generate_tables(SF)
        cat = Catalog()
        for name, t in tables.items():
            cat.add_table(name, t)
        mesh = make_mesh(8)
        sc = shard_tpch(cat, mesh)
        _state["env"] = (cat, sc)
    return _state["env"]


@pytest.mark.parametrize("qid", [1, 3, 6])
def test_blocked_distributed_matches_single_node(qid):
    cat, sc = _env()
    ref = execute_plan(TPCH_PLANS[qid](cat))
    stream = sc.get("lineitem")
    block = max(stream.shard_capacity // 4, 512)
    dq = BlockedDistributedQuery(TPCH_PLANS[qid](cat), sc,
                                 block_rows=block)
    assert dq.n_blocks >= 2
    out = dq.run()
    assert_tables_equal(out.rows(), ref.rows(), ordered=True, rel_tol=1e-6)
    # bounded footprint: every learned capacity is BLOCK-scale — at most
    # bucket(n_shards * block) for the final result gather, independent of
    # the shard row count — the structural claim that makes SF100-per-pod
    # feasible (a shard-scale site would grow with the table)
    from hyrise_tpu.types import bucket_capacity
    assert dq.caps, "no capacity sites traced"
    n_shards = sc.mesh.devices.size
    assert max(dq.caps) <= bucket_capacity(n_shards * block), \
        list(zip(dq._labels, dq.caps))
    pre_gather = [c for lbl, c in zip(dq._labels, dq.caps)
                  if lbl in ("filter", "join.expand")]
    if pre_gather:  # pre-exchange sites are strictly single-block scale
        assert max(pre_gather) <= bucket_capacity(2 * block), \
            list(zip(dq._labels, dq.caps))
    # steady state: rerun with no retries, same values
    out2 = dq.run()
    assert dq.last_retries == 0
    assert_tables_equal(out2.rows(), ref.rows(), ordered=True, rel_tol=1e-6)


def test_blocked_distributed_rejects_multi_ref():
    cat, sc = _env()
    with pytest.raises(PlanNotCompilable):
        BlockedDistributedQuery(TPCH_PLANS[18](cat), sc,
                                stream_table="lineitem", block_rows=512)
