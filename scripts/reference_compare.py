"""Deterministic-reduction comparison against a sequential-order oracle —
ALL 22 TPC-H queries.

BASELINE.md asks for bit-exact row comparison vs a locally built reference
Hyrise. The reference CANNOT be built in this environment: it hard-requires
boost >= 1.65 (boost::hana drives its core type dispatch, resolve_type.hpp;
boost::variant is AllTypeVariant itself), no boost is installed, and the
environment has no network or package installation. See
REFERENCE_COMPARISON.md for the full account.

What CAN be established without the binary is the part of bit-exactness
that is actually at stake: float aggregation order. The reference
accumulates aggregates SEQUENTIALLY in row order (per-chunk loops into an
unordered_map, src/lib/operators/aggregate.cpp:437-541, C++ doubles) over
per-row values computed in COLUMN precision (float32 columns). For every
query this script:

1. runs the query through the engine (whole-plan compiled on the current
   backend, capacity seeds honored — run on the TPU for the policy
   artifact),
2. re-derives every FLOAT AGGREGATE cell with a strict sequential float64
   left-fold over float32 addends in dbgen row order. Addends come from a
   per-query "addend query" against the SQLite oracle: since float32
   values are exactly representable in float64, fetching the raw operand
   columns through SQLite and evaluating the scalar expression in numpy
   float32 reproduces the engine's column-precision products bit-exactly
   (a float32*float32 product has <= 48 mantissa bits, so the float64
   intermediate is exact and the float32 rounding matches),
3. compares every NON-aggregate cell (keys, strings, counts, raw column
   values) EXACTLY against the full SQLite result (hard requirement), and
   reports the ULP distance of each float aggregate cell under the
   engine's documented blocked-tree reduction policy (ARCHITECTURE.md).

Ordering policy: the sequential order is the fact table's dbgen row order
(ORDER BY <fact>.rowid). The reference's true accumulation order for
joined rows depends on its hash-join iteration order, which is not
canonical; dbgen row order is the documented stand-in (same policy as
round 2).

Usage: python scripts/reference_compare.py [--sf 1.0]
           [--cap-cache tpch_caps_sf1.json] [--queries 1,3,6]
           [--out REFERENCE_COMPARISON.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

F32 = np.float32


def left_fold_sum(values32) -> float:
    """Strict sequential float64 accumulation (C++ `for (v : xs) acc += v`).

    np.add.accumulate on float64 is elementwise-sequential (no pairwise
    blocking, unlike np.sum), so it reproduces the C++ loop exactly;
    tests/test_reference_compare.py pins this against a pure-Python fold.
    """
    a = np.asarray(values32, dtype=np.float64)
    if a.size == 0:
        return 0.0
    return float(np.add.accumulate(a)[-1])


def ulp_distance(a: float, b: float) -> float:
    if a == b:
        return 0.0
    return float(abs(a - b) / np.spacing(max(abs(a), abs(b), 1e-300)))


def vol(ops):
    """l_extendedprice * (1 - l_discount) in column (float32) precision."""
    return F32(ops["ep"]) * (F32(1) - F32(ops["disc"]))


# ---------------------------------------------------------------------------
# Per-query specs.
#   key:     output column indices that identify a row (group key)
#   addends: (sql, n_group_cols, [operand names]) — sql returns the group
#            columns then the operands, ordered by the fact table's rowid
#   folds:   {out_col_index: cell}
#            cell = ("sum", expr) | ("avg", expr)
#                 | ("ratio", numer_expr, denom_expr, scale)
#                 | ("sumdiv", expr, divisor)
# Queries absent from ADDENDS have no float-aggregate cells: every cell is
# compared exactly (ints, strings, raw float column values).
# ---------------------------------------------------------------------------

_IN7 = "('13','31','23','29','30','18','17')"

SPECS = {
    1: dict(
        key=(0, 1),
        addends=("SELECT l_returnflag, l_linestatus, l_quantity,"
                 " l_extendedprice, l_discount, l_tax FROM lineitem"
                 " WHERE l_shipdate <= '1998-12-01' ORDER BY rowid",
                 2, ["qty", "ep", "disc", "tax"]),
        folds={
            2: ("sum", lambda o: F32(o["qty"])),
            3: ("sum", lambda o: F32(o["ep"])),
            4: ("sum", vol),
            5: ("sum", lambda o: vol(o) * (F32(1) + F32(o["tax"]))),
            6: ("avg", lambda o: F32(o["qty"])),
            7: ("avg", lambda o: F32(o["ep"])),
            8: ("avg", lambda o: F32(o["disc"])),
        }),
    2: dict(key=(3, 1)),  # p_partkey, s_name
    3: dict(
        key=(0,),
        addends=("SELECT l_orderkey, l_extendedprice, l_discount"
                 " FROM customer, orders, lineitem"
                 " WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey"
                 " AND l_orderkey = o_orderkey"
                 " AND o_orderdate < '1995-03-15'"
                 " AND l_shipdate > '1995-03-15' ORDER BY lineitem.rowid",
                 1, ["ep", "disc"]),
        folds={1: ("sum", vol)}),
    4: dict(key=(0,)),
    5: dict(
        key=(0,),
        addends=("SELECT n_name, l_extendedprice, l_discount"
                 " FROM customer, orders, lineitem, supplier, nation, region"
                 " WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey"
                 " AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey"
                 " AND s_nationkey = n_nationkey"
                 " AND n_regionkey = r_regionkey AND r_name = 'AMERICA'"
                 " AND o_orderdate >= '1994-01-01'"
                 " AND o_orderdate < '1995-01-01' ORDER BY lineitem.rowid",
                 1, ["ep", "disc"]),
        folds={1: ("sum", vol)}),
    6: dict(
        key=(),
        addends=("SELECT l_extendedprice, l_discount FROM lineitem"
                 " WHERE l_shipdate >= '1994-01-01'"
                 " AND l_shipdate < '1995-01-01'"
                 " AND l_discount BETWEEN .06 - 0.01 AND .06 + 0.01001"
                 " AND l_quantity < 24 ORDER BY rowid",
                 0, ["ep", "disc"]),
        folds={0: ("sum", lambda o: F32(o["ep"]) * F32(o["disc"]))}),
    7: dict(
        key=(0, 1, 2),
        addends=("SELECT n1.n_name, n2.n_name, SUBSTR(l_shipdate, 1, 4),"
                 " l_extendedprice, l_discount"
                 " FROM supplier, lineitem, orders, customer,"
                 " nation n1, nation n2"
                 " WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey"
                 " AND c_custkey = o_custkey"
                 " AND s_nationkey = n1.n_nationkey"
                 " AND c_nationkey = n2.n_nationkey"
                 " AND ((n1.n_name = 'IRAN' AND n2.n_name = 'IRAQ') OR"
                 "      (n1.n_name = 'IRAQ' AND n2.n_name = 'IRAN'))"
                 " AND l_shipdate BETWEEN '1995-01-01' AND '1996-12-31'"
                 " ORDER BY lineitem.rowid",
                 3, ["ep", "disc"]),
        folds={3: ("sum", vol)}),
    8: dict(
        key=(0,),
        addends=("SELECT SUBSTR(o_orderdate, 1, 4), n2.n_name,"
                 " l_extendedprice, l_discount"
                 " FROM part, supplier, lineitem, orders, customer,"
                 " nation n1, nation n2, region"
                 " WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey"
                 " AND l_orderkey = o_orderkey AND o_custkey = c_custkey"
                 " AND c_nationkey = n1.n_nationkey"
                 " AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'"
                 " AND s_nationkey = n2.n_nationkey"
                 " AND o_orderdate between '1995-01-01' AND '1996-12-31'"
                 " AND p_type = 'ECONOMY ANODIZED STEEL'"
                 " ORDER BY lineitem.rowid",
                 1, ["nation", "ep", "disc"]),
        folds={1: ("ratio",
                   lambda o: np.where(o["nation"] == "BRAZIL", vol(o), F32(0)),
                   vol, 1.0)}),
    9: dict(
        key=(0, 1),
        addends=("SELECT n_name, SUBSTR(o_orderdate, 1, 4),"
                 " l_extendedprice, l_discount, ps_supplycost, l_quantity"
                 " FROM supplier, lineitem, partsupp, orders, nation, part"
                 " WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey"
                 " AND ps_partkey = l_partkey AND p_partkey = l_partkey"
                 " AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey"
                 " AND p_name like '%green%' ORDER BY lineitem.rowid",
                 2, ["ep", "disc", "sc", "qty"]),
        folds={2: ("sum",
                   lambda o: vol(o) - F32(o["sc"]) * F32(o["qty"]))}),
    10: dict(
        key=(0,),
        addends=("SELECT c_custkey, l_extendedprice, l_discount"
                 " FROM customer, orders, lineitem"
                 " WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey"
                 " AND o_orderdate >= '1993-10-01'"
                 " AND o_orderdate < '1994-01-01' AND l_returnflag = 'R'"
                 " ORDER BY lineitem.rowid",
                 1, ["ep", "disc"]),
        folds={2: ("sum", vol)}),
    11: dict(
        key=(0,),
        addends=("SELECT ps_partkey, ps_supplycost, ps_availqty"
                 " FROM partsupp, supplier, nation"
                 " WHERE ps_suppkey = s_suppkey"
                 " AND s_nationkey = n_nationkey AND n_name = 'GERMANY'"
                 " ORDER BY partsupp.rowid",
                 1, ["sc", "aq"]),
        folds={1: ("sum", lambda o: F32(o["sc"]) * F32(o["aq"]))}),
    12: dict(key=(0,)),
    13: dict(key=(0,)),
    14: dict(
        key=(),
        addends=("SELECT p_type, l_extendedprice, l_discount"
                 " FROM lineitem, part WHERE l_partkey = p_partkey"
                 " AND l_shipdate >= '1995-09-01'"
                 " AND l_shipdate < '1995-10-01' ORDER BY lineitem.rowid",
                 0, ["ptype", "ep", "disc"]),
        folds={0: ("ratio",
                   lambda o: np.where(
                       np.char.startswith(o["ptype"].astype(str), "PROMO"),
                       vol(o), F32(0)),
                   vol, 100.0)}),
    15: dict(
        key=(0,),
        addends=("SELECT l_suppkey, l_extendedprice, l_discount"
                 " FROM lineitem WHERE l_shipdate >= '1993-05-13'"
                 " AND l_shipdate < '1993-08-13' ORDER BY rowid",
                 1, ["ep", "disc"]),
        folds={4: ("sum", vol)}),
    16: dict(key=(0, 1, 2)),
    17: dict(
        key=(),
        addends=("SELECT l.l_extendedprice FROM lineitem l, part"
                 " WHERE p_partkey = l.l_partkey AND p_brand = 'Brand#23'"
                 " AND p_container = 'MED BOX'"
                 " AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)"
                 "   FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"
                 " ORDER BY l.rowid",
                 0, ["ep"]),
        folds={0: ("sumdiv", lambda o: F32(o["ep"]), 7.0)}),
    18: dict(
        key=(2,),
        addends=("SELECT l_orderkey, l_quantity FROM lineitem"
                 " WHERE l_orderkey in (SELECT l_orderkey FROM lineitem"
                 "   GROUP BY l_orderkey having SUM(l_quantity) > 300)"
                 " ORDER BY rowid",
                 1, ["qty"]),
        folds={5: ("sum", lambda o: F32(o["qty"]))}),
    19: dict(
        key=(),
        addends=("SELECT l_extendedprice, l_discount FROM lineitem, part"
                 " WHERE p_partkey = l_partkey AND (("
                 " p_brand = 'Brand#12' AND p_container in"
                 " ('SM CASE','SM BOX','SM PACK','SM PKG')"
                 " AND l_quantity >= 1 AND l_quantity <= 1 + 10"
                 " AND p_size between 1 AND 5"
                 " AND l_shipmode in ('AIR', 'AIR REG')"
                 " AND l_shipinstruct = 'DELIVER IN PERSON')"
                 " or (p_brand = 'Brand#23' AND p_container in"
                 " ('MED BAG','MED BOX','MED PKG','MED PACK')"
                 " AND l_quantity >= 10 AND l_quantity <= 10 + 10"
                 " AND p_size between 1 AND 10"
                 " AND l_shipmode in ('AIR', 'AIR REG')"
                 " AND l_shipinstruct = 'DELIVER IN PERSON')"
                 " or (p_brand = 'Brand#34' AND p_container in"
                 " ('LG CASE','LG BOX','LG PACK','LG PKG')"
                 " AND l_quantity >= 20 AND l_quantity <= 20 + 10"
                 " AND p_size between 1 AND 15"
                 " AND l_shipmode in ('AIR', 'AIR REG')"
                 " AND l_shipinstruct = 'DELIVER IN PERSON'))"
                 " ORDER BY lineitem.rowid",
                 0, ["ep", "disc"]),
        folds={0: ("sum", vol)}),
    20: dict(key=(0,)),
    21: dict(key=(0,)),
    22: dict(
        key=(0,),
        addends=("SELECT SUBSTR(c_phone,1,2) AS cc, c_acctbal FROM customer"
                 f" WHERE SUBSTR(c_phone,1,2) IN {_IN7}"
                 " AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer"
                 "   WHERE c_acctbal > 0.00"
                 f"   AND SUBSTR(c_phone,1,2) IN {_IN7})"
                 " AND NOT EXISTS (SELECT * FROM orders"
                 "   WHERE o_custkey = c_custkey) ORDER BY customer.rowid",
                 1, ["bal"]),
        folds={2: ("sum", lambda o: F32(o["bal"]))}),
}


def fold_cell(cell, ops, count):
    kind = cell[0]
    if kind == "sum":
        return left_fold_sum(cell[1](ops))
    if kind == "avg":
        return left_fold_sum(cell[1](ops)) / count
    if kind == "sumdiv":
        return left_fold_sum(cell[1](ops)) / cell[2]
    if kind == "ratio":
        num = left_fold_sum(cell[1](ops))
        den = left_fold_sum(cell[2](ops))
        return cell[3] * num / den
    raise ValueError(kind)


def norm_key(v):
    if isinstance(v, (np.integer, int, bool)):
        return int(v)
    if isinstance(v, (np.floating, float)):
        return float(v)
    return str(v)


def compare_query(qid, engine_rows, oracle, spec):
    key_idx = spec["key"]
    folds = spec.get("folds", {})
    res = {"rows": len(engine_rows)}

    # --- exact cells vs the full sqlite result --------------------------
    from hyrise_tpu.tpch.queries import TPCH_SQL
    sq_rows = oracle.query(TPCH_SQL[qid])
    res["oracle_rows"] = len(sq_rows)
    sq_by_key = {tuple(norm_key(r[i]) for i in key_idx): r for r in sq_rows}
    exact_bad = 0
    checked = 0
    for row in engine_rows:
        k = tuple(norm_key(row[i]) for i in key_idx)
        ref = sq_by_key.get(k)
        if ref is None:
            exact_bad += 1
            continue
        for ci, (a, b) in enumerate(zip(row, ref)):
            if ci in folds:
                continue
            checked += 1
            if isinstance(a, float) or isinstance(b, float):
                ok = float(a) == float(b)
            else:
                ok = norm_key(a) == norm_key(b)
            exact_bad += 0 if ok else 1
    res["exact_cells"] = checked
    res["exact_mismatches"] = exact_bad
    res["row_count_match"] = len(engine_rows) == len(sq_rows)
    res["int_exact"] = exact_bad == 0 and res["row_count_match"]

    # --- float aggregate cells vs the sequential fold -------------------
    if folds:
        sql, ngk, names = spec["addends"]
        rows = oracle.query(sql)
        groups = {}
        for r in rows:
            gk = tuple(norm_key(v) for v in r[:ngk])
            groups.setdefault(gk, []).append(r[ngk:])
        max_ulp = 0.0
        n_cells = 0
        missing_groups = 0
        per_cell = {}
        for row in engine_rows:
            gk = tuple(norm_key(row[i]) for i in key_idx)
            g = groups.get(gk)
            if g is None:
                missing_groups += 1
                continue
            cols = list(zip(*g))
            ops = {}
            for name, col in zip(names, cols):
                arr = np.asarray(col)
                ops[name] = arr if arr.dtype == object or \
                    arr.dtype.kind in "US" else arr.astype(np.float64)
            for ci, cell in folds.items():
                oracle_val = fold_cell(cell, ops, len(g))
                u = ulp_distance(float(row[ci]), oracle_val)
                n_cells += 1
                max_ulp = max(max_ulp, u)
                per_cell[str(ci)] = max(per_cell.get(str(ci), 0.0), u)
        res["float_cells"] = n_cells
        res["max_ulp"] = max_ulp
        res["per_cell_max_ulp"] = per_cell
        if missing_groups:
            res["missing_groups"] = missing_groups
    else:
        res["float_cells"] = 0
        res["max_ulp"] = 0.0
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--queries", default=None,
                    help="comma-separated qids (default: all 22)")
    ap.add_argument("--cap-cache", default=None,
                    help="capacity seed file for the compiled engine runs")
    ap.add_argument("--out", default="REFERENCE_COMPARISON.json")
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
    from hyrise_tpu.utils.sqlite_oracle import SqliteOracle

    enable_persistent_cache()
    import jax
    backend = jax.default_backend()
    qids = ([int(q) for q in args.queries.split(",")] if args.queries
            else sorted(TPCH_PLANS))

    t0 = time.time()
    tables = generate_tables(args.sf)
    cat = Catalog()
    for name, t in tables.items():
        cat.add_table(name, t)
    print(f"dbgen SF{args.sf}: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    oracle = SqliteOracle(tables)
    for ddl in [
        "CREATE INDEX idx_l_ok ON lineitem(l_orderkey)",
        "CREATE INDEX idx_l_pk ON lineitem(l_partkey)",
        "CREATE INDEX idx_l_ps ON lineitem(l_partkey, l_suppkey)",
        "CREATE INDEX idx_o_ck ON orders(o_custkey)",
        "CREATE INDEX idx_o_ok ON orders(o_orderkey)",
        "CREATE INDEX idx_ps_pk ON partsupp(ps_partkey)",
        "CREATE INDEX idx_ps_sk ON partsupp(ps_suppkey)",
    ]:
        oracle.conn.execute(ddl)
    print(f"sqlite load+index: {time.time() - t0:.1f}s", file=sys.stderr)

    cap_cache = {}
    if args.cap_cache and os.path.exists(args.cap_cache):
        with open(args.cap_cache) as f:
            cap_cache = {int(k): v for k, v in json.load(f).items()}

    report = {"sf": args.sf, "backend": backend, "queries": {}}
    if os.path.exists(args.out):  # merge: never shrink the artifact
        try:
            with open(args.out) as f:
                prev = json.load(f)
            if prev.get("sf") == args.sf:
                report["queries"].update(prev.get("queries", {}))
        except Exception:
            pass

    for qid in qids:
        t0 = time.time()
        cq = CompiledQuery(TPCH_PLANS[qid](cat), cat)
        seed = cap_cache.get(qid)
        if isinstance(seed, dict):
            cq.caps[:] = [int(c) for c in seed.get("caps", [])]
            cq.seed_gathers(seed.get("gathers", []))
        prev_state = None
        for _ in range(6):
            out = cq.run()
            state = (tuple(cq.caps), cq._gather_sig())
            if prev_state == state:
                break
            prev_state = state
        engine_rows = out.rows()
        t_engine = time.time() - t0
        t0 = time.time()
        res = compare_query(qid, engine_rows, oracle, SPECS[qid])
        res["engine_s"] = round(t_engine, 1)
        res["oracle_s"] = round(time.time() - t0, 1)
        report["queries"][f"q{qid}"] = res
        print(f"q{qid}: rows={res['rows']} int_exact={res['int_exact']} "
              f"float_cells={res['float_cells']} max_ulp={res['max_ulp']:.1f}"
              f" (engine {t_engine:.1f}s, oracle {res['oracle_s']:.1f}s)",
              file=sys.stderr)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    summary = {
        "queries": len(report["queries"]),
        "all_int_exact": all(q["int_exact"]
                             for q in report["queries"].values()),
        "max_ulp": max((q["max_ulp"] for q in report["queries"].values()),
                       default=0.0),
    }
    report["summary"] = summary
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
