"""Per-operator attribution for the join-heavy TPC-H queries on the chip.

Round-2 verdict: Q7 1123.9ms / Q5 495.9ms / Q3 336.3ms at SF1 vs a
~25-30ms steady-state floor, with no committed breakdown of WHERE the time
goes. The engine's joins are sort-cascades (kernels/tpu_prims.py), so the
natural attribution is: how much of each query's wall time is XLA sort?

Method (reference cost model to beat: the probe loop in
src/lib/operators/join_hash.cpp:363-527):
1. compile each query to its steady state (capacity seeds, one program),
2. census the StableHLO: count stablehlo.sort ops and the bytes their
   operand lists touch (a TPU sort is multiple bitonic passes over its
   operands, so cost scales super-linearly in n — we measure, not model),
3. measure standalone XLA sort time for the same (n_rows, n_operands)
   shapes with a salted on-device chain (no transport in the differenced
   cost),
4. predicted_sort_ms = sum over census; attribution = predicted / measured.

Writes JOIN_ROOFLINE.json. Run on the TPU (default backend) after
harvesting capacity seeds on CPU.

Usage: python scripts/join_roofline.py [--sf 1] [--queries 1,3,5,6,7]
           [--cap-cache tpch_caps_sf1.json] [--out JOIN_ROOFLINE.json]
"""

import argparse
import json
import os
import re
import sys
import time
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DT_BYTES = {"f64": 8, "f32": 4, "i64": 8, "i32": 4, "i16": 2, "i8": 1,
             "ui8": 1, "i1": 1, "bf16": 2}


def sort_census(hlo: str):
    """(count, [(n_rows, n_operands, operand_bytes), ...]) of stablehlo.sort
    ops, parsed from the signature line's operand type list."""
    sorts = []
    # signature form: "stablehlo.sort"(%a, %b, ...) <{...}> ({ ... }) :
    #                 (tensor<Nxf32>, tensor<Nxi32>, ...) -> (...)
    for m in re.finditer(
            r'stablehlo\.sort.*?:\s*\(((?:tensor<[^>]+>(?:,\s*)?)+)\)', hlo):
        ops = re.findall(r'tensor<([0-9x]*)x?([a-z0-9]+)>', m.group(1))
        n_rows = 0
        total = 0
        for dims, dt in ops:
            n = 1
            for d in dims.split("x"):
                if d:
                    n *= int(d)
            n_rows = max(n_rows, n)
            total += n * _DT_BYTES.get(dt, 4)
        sorts.append((n_rows, len(ops), total))
    return sorts


def op_histogram(hlo: str, top: int = 12):
    ops = Counter(re.findall(r'(?:stablehlo|chlo|mhlo)\.([a-z_]+)', hlo))
    return dict(ops.most_common(top))


def measure_sort_ms(shapes, runs=5):
    """Median on-device ms for one salted sort of each (n, n_ops) shape.
    A fori_loop chain of K sorts with a data dependence between iterations
    cancels the transport round trip: ms = (t(K) - t(1)) / (K - 1)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("n", "n_ops", "k_static"))
    def chain(salt, k, n, n_ops, k_static=None):
        key = jnp.uint32(salt)
        base = (jnp.arange(n, dtype=jnp.int32) * jnp.int32(2654435761)
                + jnp.int32(salt))

        def body(i, carry):
            key_col = carry[0] + i
            operands = [key_col] + [jnp.asarray(c, jnp.int32) + i
                                    for c in carry[1:]]
            res = jax.lax.sort(operands, num_keys=1)
            return tuple(res)

        init = tuple(base + jnp.int32(j) for j in range(n_ops))
        out = jax.lax.fori_loop(0, k, body, init)
        return out[0][0]

    results = {}
    for n, n_ops in shapes:
        def run(k):
            run.salt += 1
            return int(chain(jnp.int32(run.salt), jnp.int32(k), n=n,
                             n_ops=n_ops))
        run.salt = 0
        run(1)  # compile
        K = 33 if n >= 1 << 22 else 129

        def med(k):
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                run(k)
                ts.append((time.perf_counter() - t0) * 1e3)
            return sorted(ts)[len(ts) // 2]

        med(1)
        t1, tk = med(1), med(K)
        results[(n, n_ops)] = max((tk - t1) / (K - 1), 1e-6)
        print(f"  sort n={n} ops={n_ops}: {results[(n, n_ops)]:.3f}ms",
              file=sys.stderr)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--queries", default="1,3,5,6,7,8")
    ap.add_argument("--cap-cache", default="tpch_caps_sf1.json")
    ap.add_argument("--out", default="JOIN_ROOFLINE.json")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from hyrise_tpu.plan.compiler import CompiledQuery
    from hyrise_tpu.storage.catalog import Catalog
    from hyrise_tpu.tpch.dbgen import generate_tables
    from hyrise_tpu.tpch.queries import TPCH_PLANS
    from hyrise_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    qids = [int(q) for q in args.queries.split(",")]

    t0 = time.time()
    tables = generate_tables(args.sf)
    cat = Catalog()
    for name, t in tables.items():
        cat.add_table(name, t)
    print(f"dbgen SF{args.sf}: {time.time() - t0:.1f}s", file=sys.stderr)

    cap_cache = {}
    if args.cap_cache and os.path.exists(args.cap_cache):
        with open(args.cap_cache) as f:
            cap_cache = {int(k): v for k, v in json.load(f).items()}

    report = {"sf": args.sf, "backend": jax.default_backend(),
              "queries": {}}
    all_shapes = set()
    censuses = {}
    for qid in qids:
        t0 = time.time()
        cq = CompiledQuery(TPCH_PLANS[qid](cat), cat)
        seed = cap_cache.get(qid)
        if isinstance(seed, dict):
            cq.caps[:] = [int(c) for c in seed.get("caps", [])]
            cq.seed_gathers(seed.get("gathers", []))
        prev = None
        for _ in range(6):
            cq.run()
            state = (tuple(cq.caps), cq._gather_sig())
            if prev == state:
                break
            prev = state
        compile_s = time.time() - t0
        hlo = cq.lowered_text()
        sorts = sort_census(hlo)
        censuses[qid] = (cq, sorts, op_histogram(hlo), compile_s)
        for n, n_ops, _ in sorts:
            if n >= 1 << 16:  # tiny dimension-table sorts are noise
                all_shapes.add((n, n_ops))
        print(f"q{qid}: {len(sorts)} sorts, "
              f"largest={max((s[0] for s in sorts), default=0)} rows, "
              f"compile+fixpoint {compile_s:.1f}s", file=sys.stderr)

    print("measuring standalone sort costs...", file=sys.stderr)
    sort_ms = measure_sort_ms(sorted(all_shapes), runs=args.runs)

    for qid in qids:
        cq, sorts, ops, compile_s = censuses[qid]

        def med_run():
            ts = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                cq.run()
                ts.append((time.perf_counter() - t0) * 1e3)
            return sorted(ts)[len(ts) // 2]

        measured = med_run()
        pred = sum(sort_ms.get((n, n_ops), 0.0) for n, n_ops, _ in sorts)
        big = [s for s in sorts if s[0] >= 1 << 16]
        report["queries"][f"q{qid}"] = {
            "measured_ms": round(measured, 1),
            "compile_s": round(compile_s, 1),
            "n_sorts": len(sorts),
            "n_big_sorts": len(big),
            "sort_rows_max": max((s[0] for s in sorts), default=0),
            "sort_bytes_total_mb": round(sum(s[2] for s in sorts) / 1e6, 1),
            "predicted_sort_ms": round(pred, 1),
            "sort_share_pct": round(100 * pred / measured, 1)
            if measured else None,
            "op_histogram": ops,
        }
        print(f"q{qid}: measured {measured:.1f}ms, predicted sort "
              f"{pred:.1f}ms ({100 * pred / max(measured, 1e-9):.0f}%), "
              f"{len(sorts)} sorts", file=sys.stderr)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({q: {k: v for k, v in d.items()
                          if k in ("measured_ms", "predicted_sort_ms",
                                   "sort_share_pct", "n_sorts")}
                      for q, d in report["queries"].items()}))


if __name__ == "__main__":
    main()
