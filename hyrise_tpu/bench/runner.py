"""Benchmark harness.

Reference: src/benchmarklib/benchmark_runner.{hpp,cpp} — modes
IndividualQueries (each query repeatedly) / PermutedQuerySets (whole set in
random order), stop on max runs or duration, warmup, google-benchmark-style
JSON report with per-query durations and a context block (build info,
encoding, chunk size -> here: device, scale factor).

Also: TableGenerator (src/benchmarklib/table_generator.*) for synthetic
uniform tables.
"""

from __future__ import annotations

import dataclasses
import json
import platform
import time
from typing import Callable, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class BenchmarkConfig:
    """Reference: BenchmarkConfig (benchmark_utils.hpp:99-140)."""

    mode: str = "individual"          # individual | permuted
    max_runs: int = 10
    max_duration_s: float = 30.0
    warmup_runs: int = 1
    verbose: bool = False
    scale_factor: float = 1.0
    # write the (partial) report after EVERY query so a killed long run
    # still leaves its completed measurements on disk
    report_path: str = ""


class BenchmarkRunner:
    def __init__(self, config: BenchmarkConfig,
                 queries: Dict[str, Callable[[], object]]):
        """queries: name -> zero-arg callable executing the query once and
        returning the result table (or anything)."""
        self.config = config
        self.queries = queries
        self.results: Dict[str, List[float]] = {name: [] for name in queries}

    def _run_one(self, name: str) -> float:
        t0 = time.perf_counter()
        out = self.queries[name]()
        # force device completion if the result is one of our tables; ONE
        # block suffices — all output columns come from the same program,
        # and each block costs a ~25ms round trip on a remote TPU tunnel
        cols = getattr(out, "columns", None)
        if cols:
            getattr(cols[0].data, "block_until_ready", lambda: None)()
        return time.perf_counter() - t0

    def run(self) -> None:
        cfg = self.config
        if cfg.mode == "individual":
            for name in self.queries:
                try:
                    for _ in range(cfg.warmup_runs):
                        self._run_one(name)
                    t_start = time.time()
                    for _ in range(cfg.max_runs):
                        if time.time() - t_start > cfg.max_duration_s:
                            break
                        self.results[name].append(self._run_one(name))
                except Exception as e:  # one query must not kill the suite
                    # (the axon remote-compile helper can die mid-suite;
                    # the merged report keeps whatever finished)
                    self.results[name].clear()
                    print(f"{name}: FAILED {type(e).__name__}: "
                          f"{str(e)[:200]}")
                    continue
                if cfg.verbose:
                    m = np.median(self.results[name]) * 1e3
                    print(f"{name}: median {m:.2f}ms over "
                          f"{len(self.results[name])} runs")
                if cfg.report_path:
                    self.write_report(cfg.report_path)
        elif cfg.mode == "permuted":
            rng = np.random.default_rng(0)
            names = list(self.queries)
            for _ in range(cfg.warmup_runs):
                for name in names:
                    self._run_one(name)
            t_start = time.time()
            for _ in range(cfg.max_runs):
                if time.time() - t_start > cfg.max_duration_s:
                    break
                order = rng.permutation(len(names))
                for i in order:
                    self.results[names[i]].append(self._run_one(names[i]))
        else:
            raise ValueError(f"unknown mode {cfg.mode!r}")

    def report(self) -> dict:
        """google-benchmark-like JSON report (reference:
        benchmark_runner.cpp JSON output)."""
        import jax

        benchmarks = []
        for name, times in self.results.items():
            if not times:
                continue
            benchmarks.append({
                "name": name,
                "iterations": len(times),
                "real_time_ms": float(np.median(times) * 1e3),
                "min_time_ms": float(np.min(times) * 1e3),
                "max_time_ms": float(np.max(times) * 1e3),
                "items_per_second": float(1.0 / np.median(times)),
            })
        return {
            "context": {
                "date": time.strftime("%Y-%m-%d %H:%M:%S"),
                "host": platform.node(),
                "devices": [str(d) for d in jax.devices()],
                "mode": self.config.mode,
                "scale_factor": self.config.scale_factor,
            },
            "benchmarks": benchmarks,
        }

    def write_report(self, path: str) -> None:
        """Merge-by-query-name with any existing report at `path`: fresh
        measurements win per query, but queries only present in the old file
        survive. A partial re-run can therefore never shrink the artifact
        (a full-suite run through a fragile remote tunnel may die midway)."""
        report = self.report()
        try:
            with open(path) as f:
                old = json.load(f)
            merged = {b["name"]: b for b in old.get("benchmarks", [])}
        except (OSError, ValueError):
            merged = {}
        merged.update({b["name"]: b for b in report["benchmarks"]})
        report["benchmarks"] = [merged[k] for k in sorted(merged)]
        with open(path, "w") as f:
            json.dump(report, f, indent=2)


def generate_synthetic_table(num_rows: int, num_columns: int,
                             max_value: int = 10000, seed: int = 0):
    """Reference: table_generator.cpp — uniform random int table."""
    from hyrise_tpu.storage.table import Table, TableColumnDefinition
    from hyrise_tpu.types import DataType

    rng = np.random.default_rng(seed)
    defs = [TableColumnDefinition(f"column_{i}", DataType.INT32)
            for i in range(num_columns)]
    arrays = [rng.integers(0, max_value, num_rows).astype(np.int32)
              for _ in range(num_columns)]
    return Table.from_arrays("benchmark_table", defs, arrays)
