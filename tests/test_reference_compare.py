"""Pin the sequential-order oracle in scripts/reference_compare.py.

The artifact's claim rests on two properties checked here:
1. np.add.accumulate-based left_fold_sum IS the C++ sequential loop
   (`for (v : xs) acc += v` in double) — pinned against a pure-Python fold.
2. The generic addend-SQL + float32-expression machinery reproduces the
   engine's aggregate cells (int cells exact, float cells within a few
   ULP) on real queries at tiny scale.
"""

import numpy as np
import pytest


def test_left_fold_matches_python_loop():
    from scripts.reference_compare import left_fold_sum

    rng = np.random.default_rng(7)
    xs = (rng.random(10_000) * 1e5).astype(np.float32)
    acc = np.float64(0.0)
    for v in xs:
        acc += np.float64(v)
    assert left_fold_sum(xs) == float(acc)
    assert left_fold_sum(np.asarray([], dtype=np.float32)) == 0.0


def test_f32_product_exact_through_float64():
    """float32*float32 has <= 48 mantissa bits: the float64 intermediate is
    exact, so fl32(f64_product) == the float32-computed product — the
    property that lets addends flow through SQLite doubles."""
    rng = np.random.default_rng(11)
    a = (rng.random(100_000) * 1e5).astype(np.float32)
    b = (rng.random(100_000)).astype(np.float32)
    via64 = (a.astype(np.float64) * b.astype(np.float64)).astype(np.float32)
    assert np.array_equal(via64, a * b)


@pytest.mark.parametrize("qid", [1, 6, 11, 22])
def test_compare_query_tiny(qid):
    from scripts.reference_compare import SPECS, compare_query
    from hyrise_tpu.plan.compiler import CompiledQuery
    from hyrise_tpu.storage.catalog import Catalog
    from hyrise_tpu.tpch.dbgen import generate_tables
    from hyrise_tpu.tpch.queries import TPCH_PLANS
    from hyrise_tpu.utils.sqlite_oracle import SqliteOracle

    tables = generate_tables(0.01)
    cat = Catalog()
    for name, t in tables.items():
        cat.add_table(name, t)
    oracle = SqliteOracle(tables)
    cq = CompiledQuery(TPCH_PLANS[qid](cat), cat)
    prev = None
    for _ in range(6):
        out = cq.run()
        state = (tuple(cq.caps), cq._gather_sig())
        if prev == state:
            break
        prev = state
    res = compare_query(qid, out.rows(), oracle, SPECS[qid])
    assert res["int_exact"], res
    assert res["float_cells"] > 0
    # at tiny scale the engine's blocked-tree reduction should sit within
    # a few ULP of the sequential fold
    assert res["max_ulp"] <= 4.0, res
