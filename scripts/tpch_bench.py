"""Run the full 22-query TPC-H suite on the available device and write a
google-benchmark-style JSON report (reference: hyriseBenchmarkTPCH binary,
src/benchmark/tpch_benchmark.cpp).

Usage: python scripts/tpch_bench.py [--sf 1.0] [--runs 3] [--out tpch_report.json]

Note (axon remote TPU): per-operator host syncs cost a ~25ms tunnel round
trip each, so absolute times here are transport-dominated; they are still
the honest end-to-end wall clock of the current eager operator path.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--out", default="tpch_report.json")
    ap.add_argument("--queries", default=None,
                    help="comma-separated query ids (default: all 22)")
    ap.add_argument("--via", choices=("plans", "sql", "compiled",
                                      "sql-compiled", "blocked", "segmented"),
                    default="plans",
                    help="hand-built physical plans (eager), the full SQL "
                         "pipeline, whole-plan jit compilation "
                         "(plan/compiler.py: ONE device program per query), "
                         "blocked streaming execution (plan/blocked.py: "
                         "the fact table in fixed row blocks through one "
                         "block-shaped program), or segmented streaming "
                         "(plan/segmented.py: multi-stage decomposition — "
                         "the general SF>=10 chunk axis, all 22 queries)")
    ap.add_argument("--block-rows", type=int, default=1 << 22,
                    help="rows per stream block for --via blocked/segmented")
    ap.add_argument("--resident-rows", type=int, default=1 << 24,
                    help="tables with capacity above this stream block-wise "
                         "under --via segmented; everything else stays "
                         "device-resident")
    ap.add_argument("--cpu", action="store_true",
                    help="force the host CPU backend (the axon TPU tunnel "
                         "makes eager per-op dispatch compile-bound)")
    ap.add_argument("--fastpath", choices=("0", "1"), default=None,
                    help="force HYRISE_TPU_FASTPATH (sort-based gather/"
                         "compaction kernels). Capacity/gather seed files "
                         "are STRUCTURE-SPECIFIC to this setting: harvest "
                         "seeds on CPU with --fastpath 1 when they will "
                         "seed a TPU run (kernels/tpu_prims.py fast_path).")
    ap.add_argument("--encoding", choices=("none", "dictionary",
                                           "run_length", "for"),
                    default="none",
                    help="at-rest encoding applied to every compatible "
                         "column at ingest (EncodingConfig analogue, "
                         "reference benchmark_utils.hpp:69-96). "
                         "'dictionary' narrows string-code vectors to "
                         "int8/int16 (astype-only decode, fused by XLA).")
    ap.add_argument("--cap-cache", default=None,
                    help="JSON file of learned capacity vectors per query "
                         "(plan/compiler.py oracle sites). The capacity "
                         "fixpoint depends on the data, not the device: "
                         "generate it once with --cpu (fast local compiles) "
                         "and seed the TPU run with it, so each query "
                         "needs exactly ONE remote compile instead of a "
                         "retrace per capacity tightening.")
    args = ap.parse_args()

    if args.fastpath is not None:
        os.environ["HYRISE_TPU_FASTPATH"] = args.fastpath

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from hyrise_tpu.utils.jit_cache import enable_persistent_cache
    cache_dir = enable_persistent_cache()
    if cache_dir:
        print(f"persistent XLA cache: {cache_dir}", file=sys.stderr)

    from hyrise_tpu.bench.runner import BenchmarkConfig, BenchmarkRunner
    from hyrise_tpu.ops.base import execute_plan
    from hyrise_tpu.storage.catalog import Catalog
    from hyrise_tpu.tpch.dbgen import generate_tables
    from hyrise_tpu.tpch.queries import TPCH_PLANS

    t0 = time.time()
    tables = generate_tables(args.sf)
    if args.encoding != "none":
        from hyrise_tpu.storage.encoding import ChunkEncoder, EncodingType
        spec = {"dictionary": EncodingType.DICTIONARY,
                "run_length": EncodingType.RUN_LENGTH,
                "for": EncodingType.FRAME_OF_REFERENCE}[args.encoding]
        tables = {name: ChunkEncoder.encode_table(t, spec)
                  for name, t in tables.items()}
        print(f"encoded all tables at rest: {args.encoding}",
              file=sys.stderr)
    cat = Catalog()
    for name, t in tables.items():
        cat.add_table(name, t)
    print(f"generated SF{args.sf} in {time.time() - t0:.1f}s", file=sys.stderr)

    qids = ([int(q) for q in args.queries.split(",")] if args.queries
            else sorted(TPCH_PLANS))

    if args.via == "sql":
        from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
        from hyrise_tpu.tpch.queries import TPCH_SQL

        def make_query(qid):
            def run():
                return (SQLPipelineBuilder(TPCH_SQL[qid]).with_catalog(cat)
                        .create_pipeline().get_result_table())
            return run
    elif args.via == "sql-compiled":
        from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
        from hyrise_tpu.tpch.queries import TPCH_SQL

        from hyrise_tpu.plan.compiler import CAP_SEEDS, GATHER_SEEDS

        cap_cache = {}
        if args.cap_cache and os.path.exists(args.cap_cache):
            with open(args.cap_cache) as f:
                cap_cache = {int(k): v for k, v in json.load(f).items()}
            for qid, seed in cap_cache.items():
                if isinstance(seed, dict):  # v2: caps + gather sets
                    CAP_SEEDS[TPCH_SQL[qid]] = [int(c)
                                                for c in seed.get("caps", [])]
                    GATHER_SEEDS[TPCH_SQL[qid]] = seed.get("gathers", [])
                else:
                    CAP_SEEDS[TPCH_SQL[qid]] = [int(c) for c in seed]
            print(f"seeded capacities for {sorted(cap_cache)} from "
                  f"{args.cap_cache}", file=sys.stderr)
        pipelines = {}

        def make_query(qid):
            def run():
                pl = pipelines.get(qid)
                if pl is None:
                    pl = (SQLPipelineBuilder(TPCH_SQL[qid]).with_catalog(cat)
                          .with_compiled_execution().create_pipeline())
                    pipelines[qid] = pl
                res = pl.get_result_table()
                if args.cap_cache:  # harvest learned capacities + gathers
                    for ps in pl.pipeline_statements:
                        plan = getattr(ps, "last_plan", None)
                        cq = getattr(plan, "_compiled_query", None) \
                            if plan is not None else None
                        if cq is not None and cq.caps:
                            cap_cache[qid] = {
                                "caps": list(cq.caps),
                                "gathers": [sorted(s)
                                            for s in cq.gather_used]}
                    with open(args.cap_cache, "w") as f:
                        json.dump(cap_cache, f)
                return res
            return run
    elif args.via in ("compiled", "blocked", "segmented"):
        if args.via == "segmented":
            from hyrise_tpu.plan.segmented import SegmentedQuery

            def make_cq(qid):
                return SegmentedQuery(TPCH_PLANS[qid](cat), cat,
                                      block_rows=args.block_rows,
                                      resident_rows=args.resident_rows)
        elif args.via == "blocked":
            from hyrise_tpu.plan.blocked import BlockedCompiledQuery \
                as CompiledQuery

            def make_cq(qid):
                return CompiledQuery(TPCH_PLANS[qid](cat), cat,
                                     block_rows=args.block_rows)
        else:
            from hyrise_tpu.plan.compiler import CompiledQuery

            def make_cq(qid):
                return CompiledQuery(TPCH_PLANS[qid](cat), cat)

        cqs = {}
        cap_cache = {}
        if args.cap_cache and os.path.exists(args.cap_cache):
            with open(args.cap_cache) as f:
                cap_cache = {int(k): v for k, v in json.load(f).items()}
            print(f"seeded capacities for {sorted(cap_cache)} from "
                  f"{args.cap_cache}", file=sys.stderr)

        def _state_of(cq):
            if args.via == "segmented":
                return tuple((tuple(s.cq.caps), s.cq._gather_sig())
                             for s in cq.stages if s.cq is not None)
            return (tuple(cq.caps), cq._gather_sig())

        def make_query(qid):
            def run():
                cq = cqs.get(qid)
                if cq is None:
                    cq = make_cq(qid)
                    seed = cap_cache.get(qid)
                    if args.via == "segmented":
                        if isinstance(seed, dict) and "stages" in seed:
                            cq.load_seed(seed["stages"])
                    elif isinstance(seed, dict):  # v2: caps + gather sets
                        cq.caps[:] = [int(c) for c in seed.get("caps", [])]
                        cq.seed_gathers(seed.get("gathers", []))
                    elif seed:
                        cq.caps[:] = [int(c) for c in seed]
                    cqs[qid] = cq
                    # warm to the capacity/gather fixpoint so the TIMED runs
                    # never retrace (tightening or gather-set learning
                    # changes the program); the warmup run the harness
                    # performs then hits the jit cache. With seeded caches
                    # this reaches the fixpoint on the first pass -> ONE
                    # compile per query.
                    # HYRISE_TPU_WARM_PASSES caps the fixpoint loop: seed
                    # HARVESTS need only 2 passes (pass 1 observes exact
                    # counts and tightens; pass 2 confirms), while timed
                    # runs default to full convergence
                    prev = None
                    for _ in range(int(os.environ.get(
                            "HYRISE_TPU_WARM_PASSES", "6"))):
                        cq.run()
                        state = _state_of(cq)
                        if prev == state:
                            break
                        prev = state
                    if args.cap_cache:
                        if args.via == "segmented":
                            cap_cache[qid] = {"stages": cq.dump_seed()}
                        else:
                            cap_cache[qid] = {
                                "caps": list(cq.caps),
                                "gathers": [sorted(s)
                                            for s in cq.gather_used]}
                        with open(args.cap_cache, "w") as f:
                            json.dump(cap_cache, f)
                return cq.run()
            return run
    else:
        def make_query(qid):
            def run():
                return execute_plan(TPCH_PLANS[qid](cat))
            return run

    queries = {f"TPC-H {qid:02d}": make_query(qid) for qid in qids}
    runner = BenchmarkRunner(
        BenchmarkConfig(mode="individual", max_runs=args.runs,
                        warmup_runs=args.warmup, max_duration_s=600.0,
                        verbose=True, scale_factor=args.sf,
                        report_path=args.out),
        queries)
    runner.run()
    runner.write_report(args.out)
    rep = runner.report()
    total = sum(b["real_time_ms"] for b in rep["benchmarks"])
    print(f"total (sum of medians): {total:.0f}ms across "
          f"{len(rep['benchmarks'])} queries -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
