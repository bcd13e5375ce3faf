"""Operator microbenchmarks.

Reference: src/benchmark/operators/*.cpp (google-benchmark fixtures for
TableScan / JoinHash / JoinSortMerge / Aggregate / Sort / Projection /
UnionAll / Difference and SQL parse+translate, ~1.5k LoC) and
src/benchmark/benchmark_main.cpp.

Each micro builds a small physical plan over synthetic tables
(table_generator.cpp analogue), compiles it whole-plan (plan/compiler.py),
and measures DEVICE time with bench.py's validated chain protocol — the r4
report measured eager wall-clock minus one RTT, which collapsed into
512%-of-roofline (transport result-cache) and 0.003%-of-roofline (tunnel
overhead) rows (r4 VERDICT weak #2):

- the plan body runs k times inside ONE fori_loop program; an int32 LCG
  carried across iterations perturbs a driving input column INSIDE the
  comparison/key path (non-separable — XLA cannot factor or hoist it) and
  is re-seeded from each iteration's output, serializing the chain,
- every output column is reduced into the carry so none of the plan is
  dead code,
- execution count is VALIDATED: the summed site counts must scale ~k
  between k=1 and k=mid before any number is reported,
- per-iteration ms is the least-squares slope of median wall time over
  three chain lengths (the transport round trip cancels in the slope),
  with a pairwise-slope linearity check,
- the implied GB/s is reported against the device HBM peak only when it
  is physically possible; rows above 100% of the documented peak publish
  `withheld: true` instead of a roofline figure (the measurement, not the
  law of physics, is then suspect).

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
    micros: Dict[str, Tuple[Callable, int, int, str]] = {
        # name: (plan factory, driving rows, bytes touched per pass,
        #        perturbed driving column — fed through the predicate/key
        #        path so the LCG perturbation is non-separable)
        "table_scan": (
            lambda: TableScan(GetTable("big", cat), col("v") < lit(1000)),
            n, n * i32, "big.v"),
        "projection": (
            lambda: Projection(GetTable("big", cat),
                               [("y", col("x") * col("x") + lit(1.0))]),
            n, n * f32, "big.x"),
        "aggregate_64_groups": (
            lambda: Aggregate(GetTable("big", cat), ["g"],
                              [("c", count_()), ("s", sum_(col("x"))),
                               ("a", avg_(col("v")))]),
            n, n * (i32 + f32 + i32), "big.v"),
        "aggregate_high_card": (
            lambda: Aggregate(GetTable("big", cat), ["k"],
                              [("s", sum_(col("x")))]),
            n, n * (i32 + f32), "big.x"),
        "sort": (
            lambda: Sort(GetTable("big", cat), ["v", "k"]),
            n, n * 2 * i32, "big.v"),
        "join_fk": (
            lambda: Join(GetTable("big", cat), GetTable("dim", cat),
                         JoinMode.INNER, ("k", "dk")),
            n, n * i32 + m * i32, "big.v"),
        "join_semi": (
            lambda: Join(GetTable("big", cat),
                         TableScan(GetTable("dim", cat),
                                   col("dk") < lit(m // 2)),
                         JoinMode.SEMI, ("k", "dk")),
            n, n * i32 + m * i32, "big.v"),
        "union_all": (
            lambda: UnionAll(GetTable("big", cat), GetTable("big", cat)),
            2 * n, 2 * n * (3 * i32 + f32), "big.v"),
        "difference": (
            lambda: Difference(Projection(GetTable("big", cat), ["k", "v"]),
                               Projection(GetTable("big2", cat), ["k", "v"])),
            n, 2 * n * 2 * i32, "big.v"),
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


def _flat_index_of(cq, qualified: str) -> int:
    """Flat-argument index of `table.column` in the compiled plan's
    argument list (CompiledQuery._flat_args order)."""
    tname, cname = qualified.split(".")
    i = 0
    for t in cq._sources:
        for c in t.columns:
            if t.name == tname and c.name == cname:
                return i
            i += 1
            if c.has_validity:
                i += 1
    raise KeyError(qualified)


def make_chain(cq, perturb: str):
    """One jitted program running the converged plan body k times.

    An int32 LCG carried across iterations (a) perturbs the driving
    column by 0/1 (0/2^-20 for floats) INSIDE the fused predicate/key
    path — non-separable, so XLA cannot factor the reduction or hoist
    any iteration — and (b) is re-seeded from each iteration's summed
    site counts and output reductions, making iteration i+1 data-depend
    on iteration i. Returns (counts_total, lcg) so the caller can
    validate counts_total(k)/counts_total(1) ~ k."""
    import jax
    import jax.numpy as jnp

    caps = list(cq.caps)
    pidx = _flat_index_of(cq, perturb)

    def chain(flat_args, seed, k):
        def body(_, carry):
            lcg, acc = carry
            lcg = lcg * jnp.uint32(1664525) + jnp.uint32(1013904223)
            bit = (lcg >> jnp.uint32(16)) & jnp.uint32(1)
            args = list(flat_args)
            base = args[pidx]
            if jnp.issubdtype(base.dtype, jnp.floating):
                delta = bit.astype(base.dtype) * base.dtype.type(2.0 ** -20)
            else:
                delta = bit.astype(base.dtype)
            args[pidx] = base + delta
            datas, valids, counts, _ = cq._traced_fn(args, jnp.int32(0),
                                                     caps)
            csum = jnp.sum(counts)
            # reduce EVERY output column into the carry: no dead code
            osum = jnp.float64(0)
            for d in datas:
                osum = osum + jnp.sum(d.astype(jnp.float64))
            mix = jnp.where(jnp.isfinite(osum), osum, 0.0)
            lcg = lcg ^ csum.astype(jnp.uint32) \
                ^ mix.astype(jnp.int64).astype(jnp.uint32)
            return (lcg, acc + csum)

        lcg, acc = jax.lax.fori_loop(0, k, body,
                                     (seed, jnp.int64(0)))
        return acc, lcg

    return jax.jit(chain)


def chain_slope(run_fn, label, ks=(1, 17, 65), n=5):
    """Per-iteration ms from a least-squares fit of median(t) vs k
    (bench.py protocol: the transport round trip is the intercept and
    cancels; pairwise slopes must agree within 25% or the fit retries
    once and is flagged)."""
    def med_time(k):
        ts = []
        for _ in range(n):
            t1 = time.perf_counter()
            run_fn(k)
            ts.append((time.perf_counter() - t1) * 1e3)
        return sorted(ts)[len(ts) // 2]

    run_fn(ks[0]); run_fn(ks[0])  # warm transport
    lin_ok = False
    for attempt in range(2):
        meds = [med_time(k) for k in ks]
        kbar = sum(ks) / len(ks)
        tbar = sum(meds) / len(meds)
        slope = (sum((k - kbar) * (t - tbar) for k, t in zip(ks, meds))
                 / sum((k - kbar) ** 2 for k in ks))
        s01 = (meds[1] - meds[0]) / (ks[1] - ks[0])
        s12 = (meds[2] - meds[1]) / (ks[2] - ks[1])
        lin_ok = (min(s01, s12) > 0
                  and abs(s01 - s12) / max(s01, s12) < 0.25)
        print(f"{label} chain fit: meds={[round(t, 2) for t in meds]}ms "
              f"at k={list(ks)}; slope={slope:.4f}ms/iter "
              f"({'linear' if lin_ok else 'NON-LINEAR'})", file=sys.stderr)
        if lin_ok:
            break
    return max(slope, 1e-6), lin_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 22)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="micro_report.json")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    peak = _hbm_peak()
    results = []
    for name, (factory, drive_rows, touched, perturb) in \
            build_micros(args.rows).items():
        from hyrise_tpu.plan.compiler import CompiledQuery

        t0 = time.perf_counter()
        cq = CompiledQuery(factory())
        prev = None
        for _ in range(6):  # capacity/gather fixpoint
            cq.run()
            state = (tuple(cq.caps), cq._gather_sig())
            if prev == state:
                break
            prev = state
        chain = make_chain(cq, perturb)
        flat = cq._flat_args()
        salt = [0]

        def run_chain(k, _chain=chain, _flat=flat, _salt=salt):
            _salt[0] += 1
            acc, _ = _chain(_flat, jnp.uint32(_salt[0]), jnp.int32(k))
            return int(acc)

        v1 = run_chain(1)
        compile_s = time.perf_counter() - t0
        # execution-count validation: summed site counts scale ~k (the
        # 0/1 LCG perturbation moves counts by well under 1%)
        KMID = 17
        vm = run_chain(KMID)
        ratio = vm / max(v1, 1)
        count_valid = (KMID * 0.97) < ratio < (KMID * 1.03)
        slope_ms, lin_ok = chain_slope(run_chain, name, n=args.runs)
        entry = {
            "name": name,
            "chain_ms_per_iter": round(slope_ms, 4),
            "count_validation_ratio": round(ratio, 3),
            "count_valid": bool(count_valid),
            "linear_fit": bool(lin_ok),
            "compile_s": round(compile_s, 1),
            "rows_per_second": drive_rows / (slope_ms / 1e3),
            "bytes_touched": touched,
            "effective_gbps": touched / (slope_ms / 1e3) / 1e9,
        }
        status = ""
        if not (count_valid and lin_ok):
            # the measurement failed its own integrity checks: publish the
            # raw fit flagged invalid, never a roofline claim
            entry["withheld"] = True
            entry.pop("rows_per_second")
            entry.pop("effective_gbps")
            status = "  [WITHHELD: integrity checks failed]"
        elif peak:
            pct = 100.0 * entry["effective_gbps"] / peak
            if pct > 100.0:
                entry["withheld"] = True
                entry["withheld_reason"] = (
                    f"implied {entry['effective_gbps']:.0f}GB/s exceeds "
                    f"the documented {peak:.0f}GB/s peak")
                status = f"  [WITHHELD: {pct:.0f}% of documented peak]"
            else:
                entry["pct_hbm_roofline"] = round(pct, 2)
                status = f"  {pct:5.1f}% of HBM roofline"
        results.append(entry)
        print(f"{name:22s} {slope_ms:9.3f}ms/iter  "
              f"{drive_rows / (slope_ms / 1e3) / 1e9:7.3f}B rows/s  "
              f"{touched / (slope_ms / 1e3) / 1e9:7.1f}GB/s"
              f"  v({KMID})/v(1)={ratio:.2f}{status}", file=sys.stderr)

    results += bench_sql_frontend(args.runs)
    results += bench_dbgen()
    report = {
        "context": {
            "devices": [str(d) for d in jax.devices()],
            "rows": args.rows,
            "hbm_peak_gbps": peak,
            "protocol": "fori_loop chain, LCG-perturbed inputs, "
                        "count-validated, slope fit over k=(1,17,65)",
            "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        },
        "benchmarks": results,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
