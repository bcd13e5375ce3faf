"""Query-plan cache eviction policies + statistics JSON round-trip.

Reference: sql/lru_cache.hpp, lru_k_cache.hpp, gds_cache.hpp, gdfs_cache.hpp,
random_cache.hpp; statistics/statistics_import_export.cpp."""

import numpy as np
import pandas as pd

from hyrise_tpu.plan.statistics import (export_table_statistics,
                                        generate_table_statistics,
                                        import_table_statistics)
from hyrise_tpu.sql.pipeline import SQLQueryCache
from hyrise_tpu.storage.table import Table


def test_lru_evicts_least_recent():
    c = SQLQueryCache(capacity=2, policy="lru")
    c.put("a", 1)
    c.put("b", 2)
    c.get("a")
    c.put("c", 3)  # evicts b
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3


def test_lru_k_prefers_frequently_reused():
    c = SQLQueryCache(capacity=2, policy="lru_k")
    c.put("hot", 1)
    c.get("hot")          # 2 accesses -> full history
    c.put("cold", 2)      # 1 access
    c.put("new", 3)       # evicts cold (short history), keeps hot
    assert c.get("hot") == 1
    assert c.get("cold") is None


def test_gds_evicts_cheapest():
    c = SQLQueryCache(capacity=2, policy="gds")
    c.put("cheap", 1, cost=1.0)
    c.put("pricey", 2, cost=100.0)
    c.put("x", 3, cost=1.0)  # evicts cheap (lowest priority)
    assert c.get("pricey") == 2
    assert c.get("cheap") is None
    # aging: after eviction the clock rises, so new cheap entries can beat
    # stale pricey ones eventually
    assert c._clock > 0


def test_gdfs_frequency_beats_recency():
    c = SQLQueryCache(capacity=2, policy="gdfs")
    c.put("freq", 1)
    for _ in range(5):
        c.get("freq")
    c.put("one", 2)
    c.put("two", 3)  # evicts one (freq=1 < 6)
    assert c.get("freq") == 1
    assert c.get("one") is None


def test_random_respects_capacity():
    c = SQLQueryCache(capacity=3, policy="random")
    for i in range(10):
        c.put(i, i)
    assert len(c._d) == 3


def test_statistics_json_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    t = Table.from_pandas("t", pd.DataFrame({
        "a": rng.integers(0, 50, 300).astype(np.int64),
        "s": np.array([f"v{i % 7}" for i in range(300)], dtype=object)}))
    stats = generate_table_statistics(t)
    path = str(tmp_path / "stats.json")
    export_table_statistics(stats, path)
    back = import_table_statistics(path)
    assert back.row_count == stats.row_count
    assert set(back.columns) == set(stats.columns)
    for name, cs in stats.columns.items():
        bc = back.columns[name]
        assert bc.distinct_count == cs.distinct_count
        assert bc.min_value == cs.min_value
        assert bc.max_value == cs.max_value
        assert bc.null_fraction == cs.null_fraction
