"""Scaling-efficiency measurement: the same distributed-compiled TPC-H
queries over 1 / 2 / 4 / 8 mesh devices, reporting rows/s and parallel
efficiency vs the 1-device run.

BASELINE.md's reporting obligations ask for "rows/s scaling efficiency at
1 chip / 1 host / N>=2 hosts". Real multi-chip hardware is not available in
this environment (one v5e chip behind the axon tunnel), so this measures the
same code path — parallel/dist_compiler.py's shard_map programs with their
all_to_all / all_gather / psum exchanges — on the simulated N-device CPU
mesh (tests/conftest.py's fake-topology analogue, reference
src/lib/scheduler/topology.hpp:81). CPU-mesh timings exercise the real
collective structure but not ICI bandwidth; treat the efficiency curve as a
communication-structure check, not a hardware number.

Usage: python scripts/scaling_bench.py [--sf 0.2] [--runs 5]
       [--queries 1,3,6,12] [--out scaling_report.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.2)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--queries", default="1,3,6,12")
    ap.add_argument("--meshes", default="1,2,4,8")
    ap.add_argument("--out", default="scaling_report.json")
    args = ap.parse_args()

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from hyrise_tpu.parallel.dist_compiler import (DistributedCompiledQuery,
                                                   shard_tpch)
    from hyrise_tpu.parallel.mesh import make_mesh
    from hyrise_tpu.storage.catalog import Catalog
    from hyrise_tpu.tpch.dbgen import generate_tables
    from hyrise_tpu.tpch.queries import TPCH_PLANS

    qids = [int(q) for q in args.queries.split(",")]
    mesh_sizes = [int(m) for m in args.meshes.split(",")]

    t0 = time.time()
    tables = generate_tables(args.sf)
    cat = Catalog()
    for name, t in tables.items():
        cat.add_table(name, t)
    driving_rows = int(tables["lineitem"].num_rows)
    print(f"generated SF{args.sf} ({driving_rows} lineitem rows) "
          f"in {time.time() - t0:.1f}s", file=sys.stderr)

    report = {"context": {"sf": args.sf, "driving_rows": driving_rows,
                          "backend": jax.default_backend(),
                          "note": "simulated N-device CPU mesh; exercises "
                                  "the collective structure, not ICI"},
              "queries": {}}

    for qid in qids:
        per_mesh = {}
        base = None
        for n in mesh_sizes:
            mesh = make_mesh(n)
            shard_cat = shard_tpch(cat, mesh)
            dq = DistributedCompiledQuery(TPCH_PLANS[qid](cat), shard_cat)
            prev = None
            for _ in range(8):  # warm to the capacity/gather fixpoint
                dq.run()
                state = (tuple(dq.caps), dq._gather_sig())
                if prev == state:
                    break
                prev = state
            times = []
            for _ in range(args.runs):
                t1 = time.time()
                dq.run()
                times.append(time.time() - t1)
            med = sorted(times)[len(times) // 2]
            rows_s = driving_rows / med
            eff = None
            if base is None:
                base = rows_s
            else:
                eff = rows_s / (base * n)
            per_mesh[n] = {"median_ms": med * 1e3, "rows_per_s": rows_s,
                           "efficiency_vs_1dev": eff}
            print(f"Q{qid:02d} n={n}: {med * 1e3:8.1f} ms  "
                  f"{rows_s / 1e6:7.2f} Mrows/s"
                  + (f"  eff={eff:.2f}" if eff is not None else ""),
                  file=sys.stderr)
        report["queries"][qid] = per_mesh

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
