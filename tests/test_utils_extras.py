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
