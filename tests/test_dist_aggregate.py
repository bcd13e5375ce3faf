"""Two-phase distributed aggregate (BASELINE config 4 groundwork): high
cardinality group-by over the mesh, correct under heavy key skew."""

import jax.numpy as jnp
import numpy as np
import pandas as pd

from hyrise_tpu.parallel.dist_query import dist_aggregate_sum_by_key
from hyrise_tpu.parallel.mesh import make_mesh
from hyrise_tpu.parallel.partition import hash_partition
from hyrise_tpu.storage.table import Table


def _run(df):
    mesh = make_mesh(8)
    t = Table.from_pandas("t", df)
    st = hash_partition(t, "k", mesh)  # arbitrary placement; fn reshuffles
    masks = (jnp.arange(st.shard_capacity, dtype=jnp.int32)[None, :]
             < st.counts[:, None])
    fn = dist_aggregate_sum_by_key(mesh, 8)
    g_keys, g_sums, g_valid = fn(st.column("k").data,
                                 st.column("v").data.astype(jnp.float64),
                                 masks)
    keys = np.asarray(g_keys).reshape(-1)
    sums = np.asarray(g_sums).reshape(-1)
    valid = np.asarray(g_valid).reshape(-1)
    got = {}
    for k, s, ok in zip(keys, sums, valid):
        if ok:
            assert int(k) not in got, "key owned by two shards"
            got[int(k)] = s
    return got


def test_dist_sum_by_key_uniform():
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "k": rng.integers(1, 500, 5000).astype(np.int32),
        "v": rng.random(5000).astype(np.float32),
    })
    got = _run(df)
    exp = df.groupby("k")["v"].sum()
    assert set(got) == set(int(k) for k in exp.index)
    for k, s in exp.items():
        assert abs(got[int(k)] - s) < 1e-4


def test_dist_sum_by_key_skewed():
    rng = np.random.default_rng(1)
    # 80% of all rows share key 7 (the Q18/Q5 skew scenario)
    k = np.where(rng.random(8000) < 0.8, 7,
                 rng.integers(1, 1000, 8000)).astype(np.int32)
    df = pd.DataFrame({"k": k, "v": np.ones(8000, dtype=np.float32)})
    got = _run(df)
    exp = df.groupby("k")["v"].sum()
    assert len(got) == len(exp)
    assert abs(got[7] - exp.loc[7]) < 1e-6


def test_dist_q18_inner_subquery():
    # orders with sum(l_quantity) > threshold — the Q18 HAVING filter
    from hyrise_tpu.storage.catalog import Catalog
    from hyrise_tpu.tpch.dbgen import generate_tables

    tables = generate_tables(0.01)
    li = tables["lineitem"].to_pandas()[["l_orderkey", "l_quantity"]]
    df = pd.DataFrame({"k": li["l_orderkey"].astype(np.int32),
                       "v": li["l_quantity"].astype(np.float32)})
    got = _run(df)
    exp = df.groupby("k")["v"].sum()
    big_got = {k for k, s in got.items() if s > 150}
    big_exp = {int(k) for k, s in exp.items() if s > 150}
    assert big_got == big_exp
    assert len(big_exp) > 0
