"""Operator microbenchmarks.

Reference: src/benchmark/operators/*.cpp (google-benchmark fixtures for
TableScan / JoinHash / JoinSortMerge / Aggregate / Sort / Projection /
UnionAll / Difference and SQL parse+translate, ~1.5k LoC) and
src/benchmark/benchmark_main.cpp.

Each micro builds a small physical plan over synthetic tables
(table_generator.cpp analogue), compiles it whole-plan (plan/compiler.py) so
the measurement is ONE device program, and reports:

- median wall ms per execution (salted calls -> no transport result-cache)
- rows/s of the driving input
- bytes touched (dense input columns read once) and the implied GB/s vs the
  device HBM peak — the per-operator speed-of-light roofline BASELINE.md's
  reporting obligations ask for.

Run: python -m hyrise_tpu.bench.micro [--rows 4194304] [--runs 9]
     [--cpu] [--out micro_report.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Callable, Dict, List, Tuple

import numpy as np

HBM_PEAK_GBPS = {"TPU v5 lite": 819.0}  # v5e; CPU runs report no roofline


def _hbm_peak() -> float:
    import jax
    d = str(jax.devices()[0])
    for k, v in HBM_PEAK_GBPS.items():
        if k in d:
            return v
    return 0.0


def build_micros(rows: int):
    """name -> (plan_factory, driving_rows, bytes_touched)."""
    import pandas as pd

    from hyrise_tpu.expression.ast import avg_, col, count_, lit, sum_
    from hyrise_tpu.ops.aggregate import Aggregate
    from hyrise_tpu.ops.get_table import GetTable
    from hyrise_tpu.ops.join import Join
    from hyrise_tpu.ops.misc import Difference, UnionAll
    from hyrise_tpu.ops.projection import Projection
    from hyrise_tpu.ops.sort import Sort
    from hyrise_tpu.ops.table_scan import TableScan
    from hyrise_tpu.storage.catalog import Catalog
    from hyrise_tpu.storage.table import Table
    from hyrise_tpu.types import JoinMode

    rng = np.random.default_rng(42)
    cat = Catalog()
    n = rows
    m = max(rows // 8, 1024)
    cat.add_table("big", Table.from_pandas("big", pd.DataFrame({
        "k": rng.integers(0, m, n).astype(np.int32),
        "v": rng.integers(0, 10_000, n).astype(np.int32),
        "x": rng.random(n).astype(np.float32),
        "g": rng.integers(0, 64, n).astype(np.int32),
    })))
    cat.add_table("dim", Table.from_pandas("dim", pd.DataFrame({
        "dk": np.arange(m, dtype=np.int32),
        "dv": rng.random(m).astype(np.float32),
    })))
    cat.add_table("big2", Table.from_pandas("big2", pd.DataFrame({
        "k": rng.integers(0, m, n).astype(np.int32),
        "v": rng.integers(0, 10_000, n).astype(np.int32),
    })))

    i32, f32 = 4, 4
    micros: Dict[str, Tuple[Callable, int, int]] = {
        # name: (plan factory, driving rows, bytes touched per pass)
        "table_scan": (
            lambda: TableScan(GetTable("big", cat), col("v") < lit(1000)),
            n, n * i32),
        "projection": (
            lambda: Projection(GetTable("big", cat),
                               [("y", col("x") * col("x") + lit(1.0))]),
            n, n * f32),
        "aggregate_64_groups": (
            lambda: Aggregate(GetTable("big", cat), ["g"],
                              [("c", count_()), ("s", sum_(col("x"))),
                               ("a", avg_(col("v")))]),
            n, n * (i32 + f32 + i32)),
        "aggregate_high_card": (
            lambda: Aggregate(GetTable("big", cat), ["k"],
                              [("s", sum_(col("x")))]),
            n, n * (i32 + f32)),
        "sort": (
            lambda: Sort(GetTable("big", cat), ["v", "k"]),
            n, n * 2 * i32),
        "join_fk": (
            lambda: Join(GetTable("big", cat), GetTable("dim", cat),
                         JoinMode.INNER, ("k", "dk")),
            n, n * i32 + m * i32),
        "join_semi": (
            lambda: Join(GetTable("big", cat),
                         TableScan(GetTable("dim", cat),
                                   col("dk") < lit(m // 2)),
                         JoinMode.SEMI, ("k", "dk")),
            n, n * i32 + m * i32),
        "union_all": (
            lambda: UnionAll(GetTable("big", cat), GetTable("big", cat)),
            2 * n, 2 * n * (3 * i32 + f32)),
        "difference": (
            lambda: Difference(Projection(GetTable("big", cat), ["k", "v"]),
                               Projection(GetTable("big2", cat), ["k", "v"])),
            n, 2 * n * 2 * i32),
    }
    return micros


def bench_sql_frontend(runs: int) -> List[dict]:
    """SQL parse + translate micro (host-side; reference
    src/benchmark/sql_benchmark.cpp)."""
    from hyrise_tpu.sql import parser as P
    from hyrise_tpu.tpch.queries import TPCH_SQL

    sql = TPCH_SQL[3]
    times = []
    for _ in range(max(runs, 20)):
        t0 = time.perf_counter()
        P.parse_sql(sql)
        times.append(time.perf_counter() - t0)
    return [{
        "name": "sql_parse_q3",
        "real_time_ms": float(np.median(times) * 1e3),
        "iterations": len(times),
    }]


def bench_dbgen(sf: float = 0.1) -> List[dict]:
    """TPC-H generator throughput (host-side; reference
    src/benchmark/tpch_db_generator_benchmark.cpp)."""
    from hyrise_tpu.tpch.dbgen import generate_tables

    t0 = time.perf_counter()
    tables = generate_tables(sf)
    dt = time.perf_counter() - t0
    rows = sum(t.num_rows for t in tables.values())
    return [{
        "name": f"tpch_dbgen_sf{sf:g}",
        "real_time_ms": dt * 1e3,
        "iterations": 1,
        "rows_per_second": rows / dt,
    }]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 22)
    ap.add_argument("--runs", type=int, default=9)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="micro_report.json")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from hyrise_tpu.plan.compiler import CompiledQuery

    # transport floor: each run() costs one device->host read (~25ms on the
    # axon tunnel). Measure a salted null program and report both raw and
    # RTT-adjusted times — the adjusted number is the device-side cost.
    @jax.jit
    def _null(s):
        return s + 1

    float(_null(jnp.int32(0)))
    null_times = []
    for i in range(max(args.runs, 7)):
        t0 = time.perf_counter()
        float(_null(jnp.int32(i)))  # salted: no transport result-cache
        null_times.append(time.perf_counter() - t0)
    null_ms = float(np.median(null_times) * 1e3)
    print(f"null round trip: {null_ms:.3f}ms", file=sys.stderr)

    peak = _hbm_peak()
    results = []
    for name, (factory, drive_rows, touched) in build_micros(args.rows).items():
        cq = CompiledQuery(factory())
        for _ in range(args.warmup):
            out = cq.run()
        times = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            out = cq.run()
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        adj = max(med - null_ms / 1e3, 1e-6)  # device-side cost
        entry = {
            "name": name,
            "real_time_ms": med * 1e3,
            "adjusted_ms": adj * 1e3,
            "iterations": len(times),
            "rows_per_second": drive_rows / adj,
            "bytes_touched": touched,
            "effective_gbps": touched / adj / 1e9,
        }
        if peak:
            entry["pct_hbm_roofline"] = 100.0 * entry["effective_gbps"] / peak
        results.append(entry)
        print(f"{name:22s} {med * 1e3:9.3f}ms ({adj * 1e3:8.3f}ms adj)  "
              f"{drive_rows / adj / 1e9:7.3f}B rows/s  "
              f"{touched / adj / 1e9:7.1f}GB/s", file=sys.stderr)

    results += bench_sql_frontend(args.runs)
    results += bench_dbgen()
    report = {
        "context": {
            "devices": [str(d) for d in jax.devices()],
            "rows": args.rows,
            "hbm_peak_gbps": peak,
            "null_roundtrip_ms": null_ms,
            "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        },
        "benchmarks": results,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
