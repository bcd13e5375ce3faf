"""Blocked (streaming) whole-plan execution — plan/blocked.py.

The chunk-axis capability (reference: chunk.hpp:44 Chunk::MAX_SIZE,
aggregate.cpp per-chunk maps merged at the end): the fact table runs
through ONE block-shaped compiled program, partial aggregates merge on the
host. Correctness oracle: the plain eager engine on the same data."""

import numpy as np
import pytest

from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.plan.blocked import BlockedCompiledQuery
from hyrise_tpu.plan.compiler import PlanNotCompilable
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.tpch.dbgen import generate_tables
from hyrise_tpu.tpch.queries import TPCH_PLANS
from hyrise_tpu.utils.table_eq import assert_tables_equal

SF = 0.02
_state = {}


def _cat():
    if "cat" not in _state:
        tables = generate_tables(SF)
        cat = Catalog()
        for name, t in tables.items():
            cat.add_table(name, t)
        _state["cat"] = cat
    return _state["cat"]


@pytest.mark.parametrize("qid", [1, 3, 6, 14])
def test_blocked_matches_eager(qid):
    cat = _cat()
    ref = execute_plan(TPCH_PLANS[qid](cat))
    cap = cat.get_table("lineitem").capacity
    block = max(cap // 4, 1 << 14)  # force multiple blocks
    bq = BlockedCompiledQuery(TPCH_PLANS[qid](cat), cat, block_rows=block)
    assert bq.n_blocks >= 2 or cap <= block
    out = bq.run()
    assert_tables_equal(out.rows(), ref.rows(), ordered=True, rel_tol=1e-6)
    # steady state: a second full pass reuses the compiled block program
    out2 = bq.run()
    assert bq.last_retries == 0
    assert_tables_equal(out2.rows(), ref.rows(), ordered=True, rel_tol=1e-6)


def test_blocked_rejects_self_join():
    cat = _cat()
    # Q18 references lineitem twice (HAVING subquery self-join): not
    # row-distributive over one stream occurrence
    with pytest.raises(PlanNotCompilable):
        BlockedCompiledQuery(TPCH_PLANS[18](cat), cat,
                             stream_table="lineitem", block_rows=1 << 14)


def test_blocked_rejects_no_aggregate():
    cat = _cat()
    with pytest.raises(PlanNotCompilable):
        BlockedCompiledQuery(TPCH_PLANS[2](cat), cat, block_rows=1 << 14)
