"""All 22 distributed TPC-H queries under the ppermute RING exchange.

r4 VERDICT weak #4: the ring path (parallel/exchange.py
ring_repartition_by_key / ring_join_aggregate_step) was validated only in
isolation (test_ring_exchange.py); the full distributed query mix never
ran with HYRISE_TPU_RING_EXCHANGE=1, so the overlap schedule was unproven
against real plans. This sweep runs the complete distributed suite with
the ring on and requires exact single-node results plus capacity-stable
reruns — the same bar as tests/test_dist_compiler.py."""

import os

import pytest

from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.parallel.dist_compiler import (DistributedCompiledQuery,
                                               shard_tpch)
from hyrise_tpu.parallel.mesh import make_mesh
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.tpch.dbgen import generate_tables
from hyrise_tpu.tpch.queries import TPCH_PLANS
from hyrise_tpu.utils.table_eq import assert_tables_equal

SF = 0.01


@pytest.fixture(scope="module")
def ring_env():
    old = os.environ.get("HYRISE_TPU_RING_EXCHANGE")
    os.environ["HYRISE_TPU_RING_EXCHANGE"] = "1"
    tables = generate_tables(SF)
    cat = Catalog()
    for name, t in tables.items():
        cat.add_table(name, t)
    mesh = make_mesh(8)
    sc = shard_tpch(cat, mesh)
    yield cat, sc
    if old is None:
        os.environ.pop("HYRISE_TPU_RING_EXCHANGE", None)
    else:
        os.environ["HYRISE_TPU_RING_EXCHANGE"] = old


@pytest.mark.parametrize("qid", sorted(TPCH_PLANS))
def test_tpch_distributed_ring_matches_single_node(ring_env, qid):
    cat, sc = ring_env
    ref = execute_plan(TPCH_PLANS[qid](cat))
    dq = DistributedCompiledQuery(TPCH_PLANS[qid](cat), sc)
    got = dq.run()
    assert got.column_names == ref.column_names
    assert_tables_equal(got.rows(), ref.rows(), ordered=True, rel_tol=1e-6)
    got2 = dq.run()
    assert dq.last_retries == 0
    assert_tables_equal(got2.rows(), ref.rows(), ordered=True, rel_tol=1e-6)
