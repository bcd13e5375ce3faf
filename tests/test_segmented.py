"""Segmented streaming execution — plan/segmented.py.

The general chunk axis (reference: chunk.hpp:44 — every operator runs
chunk-at-a-time over arbitrarily large tables): plans the single-segment
blocked compiler refuses (multi-occurrence stream tables, nested
aggregates, existence-join builds, join-rooted residuals) decompose into
stages of blocked-streamable shape. Oracle: the plain eager engine on the
same data, with the resident threshold forced far below lineitem so every
query actually exercises streaming at SF0.02."""

import numpy as np
import pytest

from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.plan.segmented import SegmentedQuery
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.tpch.dbgen import generate_tables
from hyrise_tpu.tpch.queries import TPCH_PLANS
from hyrise_tpu.utils.table_eq import assert_tables_equal

SF = 0.02
_state = {}

# queries whose plans the single-segment blocked compiler cannot stream:
# the segmented driver must decompose them into >= 2 stages (or a compiled
# stage when nothing is large)
MULTI_STAGE = {4, 15, 17, 18, 20, 21}


def _cat():
    if "cat" not in _state:
        tables = generate_tables(SF)
        cat = Catalog()
        for name, t in tables.items():
            cat.add_table(name, t)
        _state["cat"] = cat
    return _state["cat"]


@pytest.mark.parametrize("qid", sorted(TPCH_PLANS))
def test_segmented_matches_eager(qid):
    cat = _cat()
    ref = execute_plan(TPCH_PLANS[qid](cat))
    # hoist_min_rows forced low so stream-free subtrees (dimension joins)
    # are cut into their own compiled stages, as they are at SF>=10
    sq = SegmentedQuery(TPCH_PLANS[qid](cat), cat,
                        block_rows=1 << 14, resident_rows=1 << 15,
                        hoist_min_rows=1 << 11)
    if qid in MULTI_STAGE:
        assert len(sq.stages) >= 2, sq.describe()
    out = sq.run()
    assert_tables_equal(out.rows(), ref.rows(), ordered=True, rel_tol=1e-6)
    # steady state: rerun through the cached per-stage programs with the
    # new results rebound in place — no retraces, same values
    out2 = sq.run()
    assert_tables_equal(out2.rows(), ref.rows(), ordered=True, rel_tol=1e-6)
    for s in sq.stages:
        assert s.cq is not None and s.cq.last_retries == 0


def test_segmented_existence_build_rewrite():
    """A semi join against a large build subtree gets a DISTINCT-key
    aggregate wrapped around the build (presence-only semantics), making
    the large ref streamable. Q4 shape."""
    cat = _cat()
    sq = SegmentedQuery(TPCH_PLANS[4](cat), cat,
                        block_rows=1 << 14, resident_rows=1 << 15)
    kinds = [(("final" if s.wrapper is None else "segment"), s.stream)
             for s in sq.stages]
    assert kinds == [("segment", "lineitem"), ("final", None)], sq.describe()


def test_segmented_seed_roundtrip():
    """Capacity/gather seeds dump after a run and reload into a fresh
    driver so the remote TPU compiles each stage exactly once."""
    cat = _cat()
    sq = SegmentedQuery(TPCH_PLANS[18](cat), cat,
                        block_rows=1 << 14, resident_rows=1 << 15)
    ref = sq.run()
    seed = sq.dump_seed()
    assert len(seed) == len(sq.stages) and all(s["caps"] for s in seed)
    sq2 = SegmentedQuery(TPCH_PLANS[18](cat), cat,
                         block_rows=1 << 14, resident_rows=1 << 15)
    sq2.load_seed(seed)
    out = sq2.run()
    assert_tables_equal(out.rows(), ref.rows(), ordered=True, rel_tol=1e-9)
    for s, sd in zip(sq2.stages, seed):
        assert list(s.cq.caps) == [int(c) for c in sd["caps"]]


def test_segmented_no_large_tables_is_plain_compiled():
    cat = _cat()
    sq = SegmentedQuery(TPCH_PLANS[6](cat), cat, block_rows=1 << 14,
                        resident_rows=1 << 30)
    assert len(sq.stages) == 1 and sq.stages[0].stream is None
    ref = execute_plan(TPCH_PLANS[6](cat))
    assert_tables_equal(sq.run().rows(), ref.rows(), ordered=True,
                        rel_tol=1e-9)
