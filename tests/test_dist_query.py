"""Distributed TPC-H pipelines on the 8-device CPU mesh vs single-node
plans (configs 4-5 groundwork)."""

import numpy as np

from hyrise_tpu.parallel.dist_query import dist_q1, dist_q3_step, dist_q6
from hyrise_tpu.parallel.mesh import make_mesh
from hyrise_tpu.parallel.partition import hash_partition
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.tpch.dbgen import generate_tables
from hyrise_tpu.tpch.queries import TPCH_PLANS
from hyrise_tpu.ops.base import execute_plan

_state = {}


def _setup():
    if _state:
        return _state["cat"], _state["tables"], _state["mesh"]
    tables = generate_tables(0.01)
    cat = Catalog()
    for name, t in tables.items():
        cat.add_table(name, t)
    _state.update(cat=cat, tables=tables, mesh=make_mesh(8))
    return cat, tables, _state["mesh"]


def test_dist_q6_matches_single_node():
    cat, tables, mesh = _setup()
    li = tables["lineitem"]
    sharded = hash_partition(li, "l_orderkey", mesh)
    d = li.column("l_shipdate")
    lo = int(np.searchsorted(d.dictionary, "1994-01-01"))
    hi = int(np.searchsorted(d.dictionary, "1995-01-01"))
    revenue = float(dist_q6(mesh, sharded, lo, hi))
    single = execute_plan(TPCH_PLANS[6](cat)).rows()[0][0]
    assert abs(revenue - single) / max(abs(single), 1) < 1e-6


def test_dist_q1_matches_single_node():
    cat, tables, mesh = _setup()
    li = tables["lineitem"]
    sharded = hash_partition(li, "l_orderkey", mesh)
    d = li.column("l_shipdate")
    hi = int(np.searchsorted(d.dictionary, "1998-12-01", side="right")) - 1
    counts, sum_qty, sum_base, sum_dp, sum_ch, sum_disc = dist_q1(
        mesh, sharded, hi)
    single = execute_plan(TPCH_PLANS[1](cat))
    rf_dict = li.column("l_returnflag").dictionary
    ls_dict = li.column("l_linestatus").dictionary
    n_ls = len(ls_dict)
    for row in single.rows():
        rf, ls = row[0], row[1]
        cell = int(np.searchsorted(rf_dict, rf)) * n_ls + \
            int(np.searchsorted(ls_dict, ls))
        assert int(counts[cell]) == row[9]          # count_order
        assert abs(float(sum_qty[cell]) - row[2]) < 1e-3
        assert abs(float(sum_dp[cell]) - row[4]) / max(abs(row[4]), 1) < 1e-6


def test_dist_q3_revenue_matches():
    cat, tables, mesh = _setup()
    cust = hash_partition(tables["customer"], "c_custkey", mesh)
    orders = hash_partition(tables["orders"], "o_custkey", mesh)
    li = hash_partition(tables["lineitem"], "l_partkey", mesh)  # mismatched
    seg = tables["customer"].column("c_mktsegment")
    seg_code = seg.code_for("BUILDING")
    d = tables["orders"].column("o_orderdate")
    date_code = int(np.searchsorted(d.dictionary, "1995-03-15"))
    revenue, matches = dist_q3_step(mesh, 8, cust, orders, li, seg_code,
                                    date_code)
    # single-node reference: total revenue over the Q3 join (no group-by)
    single = execute_plan(TPCH_PLANS[3](cat))
    expected = sum(r[1] for r in single.rows())
    assert abs(float(revenue) - expected) / max(abs(expected), 1) < 1e-6
