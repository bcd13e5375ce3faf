"""Timer/format utils, cost model, cache policies."""

import numpy as np
import pandas as pd

from hyrise_tpu.plan.cost_model import CostModelLogical
from hyrise_tpu.plan.lqp import (AggregateNode, JoinNode, PredicateNode,
                                 StoredTableNode)
from hyrise_tpu.plan.statistics import generate_table_statistics
from hyrise_tpu.sql.pipeline import SQLQueryCache
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import JoinMode
from hyrise_tpu.expression.ast import col, lit
from hyrise_tpu.utils.timer import (Timer, format_bytes, format_duration,
                                    performance_warning,
                                    reset_performance_warnings)


def test_format_bytes():
    assert format_bytes(512) == "512B"
    assert format_bytes(2048) == "2.00KiB"
    assert format_bytes(3 * 1024**3) == "3.00GiB"


def test_format_duration():
    assert format_duration(5e-7).endswith("ns")
    assert format_duration(0.5).endswith("ms")
    assert format_duration(75).startswith("1m")


def test_timer():
    t = Timer()
    assert t.lap() >= 0
    assert isinstance(t.lap_formatted(), str)


def test_performance_warning_one_shot(capsys):
    reset_performance_warnings()
    performance_warning("slow path X")
    performance_warning("slow path X")
    err = capsys.readouterr().err
    assert err.count("slow path X") == 1


def test_cost_model_orders_plans_sensibly():
    t = Table.from_pandas("t", pd.DataFrame({
        "a": np.arange(1000, dtype=np.int32)}))
    stats = {"t": generate_table_statistics(t)}
    cm = CostModelLogical(stats)
    cheap = PredicateNode(col("a") == lit(1), StoredTableNode("t"))
    expensive = JoinNode(JoinMode.CROSS, StoredTableNode("t"),
                         StoredTableNode("t"))
    assert cm.estimate_plan_cost(cheap) < cm.estimate_plan_cost(expensive)
    assert cm.estimate_cardinality(cheap) < 1000


def test_cache_policies():
    for policy in ("lru", "gdfs", "random"):
        c = SQLQueryCache(capacity=2, policy=policy)
        c.put("a", 1)
        c.put("b", 2)
        assert c.get("a") == 1
        c.put("c", 3)
        present = sum(c.get(k) is not None for k in ("a", "b", "c"))
        assert present == 2  # one evicted
    # LRU specifics: 'b' is the cold entry
    c = SQLQueryCache(capacity=2, policy="lru")
    c.put("a", 1)
    c.put("b", 2)
    c.get("a")
    c.put("c", 3)
    assert c.get("b") is None and c.get("a") == 1


def test_value_aware_selectivity():
    """Range predicates against literals interpolate min/max (numerics) or
    dictionary-rank quantiles (strings) instead of the 1/3 magic constant
    (reference: column_statistics.cpp estimate_range_selectivity)."""
    from hyrise_tpu.expression import ast
    from hyrise_tpu.plan.statistics import estimate_predicate_selectivity

    dates = np.array([f"1995-{m:02d}-01" for m in range(1, 13)])
    t = Table.from_pandas("t", pd.DataFrame({
        "v": np.arange(1000, dtype=np.int32),
        "d": dates[np.arange(1000) % 12],
    }))
    stats = generate_table_statistics(t)

    # numeric: v < 100 over [0, 999] ~ 10%
    sel = estimate_predicate_selectivity(stats, col("v") < lit(100))
    assert 0.05 < sel < 0.15
    # flipped literal side: 100 > v is the same predicate
    sel2 = estimate_predicate_selectivity(stats, lit(100) > col("v"))
    assert abs(sel2 - sel) < 1e-9
    # numeric BETWEEN: [250, 500) ~ 25%
    selb = estimate_predicate_selectivity(
        stats, ast.Between(col("v"), lit(250), lit(500)))
    assert 0.15 < selb < 0.35
    # string (dictionary ranks): d < '1995-07-01' ~ half the dictionary
    sels = estimate_predicate_selectivity(stats, col("d") < lit("1995-07-01"))
    assert 0.3 < sels < 0.7
    # string far below the range -> near zero
    sel0 = estimate_predicate_selectivity(stats, col("d") < lit("1990-01-01"))
    assert sel0 <= 0.01


def test_statistics_json_roundtrip_quantiles(tmp_path):
    from hyrise_tpu.plan.statistics import (export_table_statistics,
                                            import_table_statistics)

    t = Table.from_pandas("t", pd.DataFrame({
        "s": np.array(["a", "b", "c", "d"] * 5)}))
    stats = generate_table_statistics(t)
    p = str(tmp_path / "stats.json")
    export_table_statistics(stats, p)
    back = import_table_statistics(p)
    assert back.columns["s"].quantiles == stats.columns["s"].quantiles
    assert back.columns["s"].fraction_below("c") == \
        stats.columns["s"].fraction_below("c")


def test_jit_cache_gating(tmp_path, monkeypatch):
    """Persistent compilation cache: off on CPU by default (XLA:CPU AOT
    machine-feature reload warnings), on when forced, off when disabled."""
    from hyrise_tpu.utils.jit_cache import enable_persistent_cache

    # conftest forces jax_platforms=cpu -> default off
    monkeypatch.delenv("HYRISE_TPU_JIT_CACHE", raising=False)
    assert enable_persistent_cache(str(tmp_path / "c1")) is None
    monkeypatch.setenv("HYRISE_TPU_JIT_CACHE", "0")
    assert enable_persistent_cache(str(tmp_path / "c2")) is None
    monkeypatch.setenv("HYRISE_TPU_JIT_CACHE", "1")
    try:
        assert enable_persistent_cache(str(tmp_path / "c3")) == \
            str(tmp_path / "c3")
    finally:  # don't leave a tmp cache dir configured for later tests
        import jax
        jax.config.update("jax_compilation_cache_dir", None)
