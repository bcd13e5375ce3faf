"""Distributed layer tests on the simulated 8-device CPU mesh (the
reference's fake-NUMA-topology trick, scheduler_test.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from hyrise_tpu.parallel.mesh import make_mesh
from hyrise_tpu.parallel.partition import hash_partition
from hyrise_tpu.parallel.exchange import dist_join_aggregate_step
from hyrise_tpu.storage.table import Table


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_hash_partition_roundtrip():
    mesh = make_mesh(8)
    df = pd.DataFrame({
        "k": np.arange(1, 5001, dtype=np.int32),
        "v": np.arange(5000, dtype=np.float32),
    })
    t = Table.from_pandas("t", df)
    st = hash_partition(t, "k", mesh)
    assert st.n_shards == 8
    counts = np.asarray(st.counts)
    assert counts.sum() == 5000
    # every row lands exactly once, on the shard its hash dictates
    all_k = []
    data = np.asarray(st.column("k").data)
    for s in range(8):
        all_k.append(data[s, :counts[s]])
    got = np.sort(np.concatenate(all_k))
    np.testing.assert_array_equal(got, df["k"].to_numpy())


def test_dist_join_aggregate_matches_pandas():
    mesh = make_mesh(8)
    rng = np.random.default_rng(7)
    n_orders = 800
    n_li = 3000
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, n_orders + 1, dtype=np.int32)})
    li = pd.DataFrame({
        "l_orderkey": rng.integers(1, n_orders * 2, size=n_li).astype(np.int32),
        "l_price": rng.random(n_li).astype(np.float32) * 1000,
        "l_discount": (rng.integers(0, 11, size=n_li) / 100).astype(np.float32),
    })
    ot = Table.from_pandas("orders", orders)
    lt = Table.from_pandas("lineitem", li)
    # orders partitioned by orderkey; lineitem partitioned by a DIFFERENT key
    # (price order) so the step must shuffle
    so = hash_partition(ot, "o_orderkey", mesh)
    sl = hash_partition(lt, "l_orderkey", mesh)  # placement irrelevant: step reshuffles

    def masks(st):
        cap = st.shard_capacity
        return (jnp.arange(cap, dtype=jnp.int32)[None, :]
                < st.counts[:, None])

    step = dist_join_aggregate_step(mesh, 8)
    revenue, matches = step(
        sl.column("l_orderkey").data, sl.column("l_price").data,
        sl.column("l_discount").data, masks(sl),
        so.column("o_orderkey").data, masks(so))

    merged = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    expected = float((merged["l_price"].astype(np.float64)
                      * (1 - merged["l_discount"])).sum())
    assert int(matches) == len(merged)
    assert abs(float(revenue) - expected) / max(expected, 1) < 1e-9


def test_schedule_plan_drains_intermediates():
    """Reference: operator_task.cpp:100-117 clear_output — a drained
    predecessor's output Table is dropped as soon as its last consumer
    executed, so a long chain holds only the root result in device
    memory."""
    import numpy as np
    import pandas as pd

    from hyrise_tpu.expression import ast
    from hyrise_tpu.ops.get_table import TableWrapper
    from hyrise_tpu.ops.projection import Projection
    from hyrise_tpu.ops.table_scan import TableScan
    from hyrise_tpu.parallel.scheduler import schedule_plan
    from hyrise_tpu.storage.table import Table

    t = Table.from_pandas("t", pd.DataFrame(
        {"a": np.arange(4096, dtype=np.int64)}))
    src = TableWrapper(t)
    chain = src
    mids = []
    for i in range(5):
        chain = Projection(TableScan(chain, ast.col("a") >= ast.lit(i)),
                           [("a", ast.col("a") + ast.lit(1))])
        mids.extend([chain.inputs[0], chain])
    out = schedule_plan(chain)
    assert out is not None and out.num_rows == 4096
    # every intermediate released; only the root kept its output
    for op in mids[:-1]:
        assert op.get_output() is None, op.name
    assert chain.get_output() is out
    # a rerun works from scratch (cleared ops re-execute)
    out2 = schedule_plan(chain, drain=False)
    assert out2.num_rows == out.num_rows
    assert mids[0].get_output() is not None  # drain=False keeps them
