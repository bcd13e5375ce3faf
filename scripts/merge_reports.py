"""Merge benchmark-runner JSON reports (google-benchmark-like format,
bench/runner.py): later files win per query name; context comes from the
last file. Used to stitch partial TPC-H suite runs (the axon remote compile
budget makes one-shot 22-query runs fragile).

Usage: python scripts/merge_reports.py OUT IN1 IN2 [IN3 ...]
"""

import json
import sys


def main():
    out, ins = sys.argv[1], sys.argv[2:]
    merged = {}
    context = None
    for path in ins:
        with open(path) as f:
            rep = json.load(f)
        context = rep.get("context", context)
        for b in rep.get("benchmarks", []):
            merged[b["name"]] = b
    report = {"context": context,
              "benchmarks": [merged[k] for k in sorted(merged)]}
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    total = sum(b["real_time_ms"] for b in report["benchmarks"])
    print(f"{out}: {len(report['benchmarks'])} queries, "
          f"total {total:.0f}ms")


if __name__ == "__main__":
    main()
