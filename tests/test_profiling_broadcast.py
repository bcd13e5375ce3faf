import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from jax import shard_map
from jax.sharding import PartitionSpec as P

from hyrise_tpu.expression.ast import col, lit, sum_
from hyrise_tpu.ops import GetTable, TableWrapper, execute_plan
from hyrise_tpu.ops.aggregate import Aggregate
from hyrise_tpu.ops.table_scan import TableScan
from hyrise_tpu.parallel.exchange import broadcast_join_inner
from hyrise_tpu.parallel.mesh import SHARD_AXIS, make_mesh
from hyrise_tpu.parallel.partition import hash_partition
from hyrise_tpu.parallel.multihost import initialize_from_env, process_info
from hyrise_tpu.storage.table import Table
from hyrise_tpu.utils.profiling import format_profile, plan_profile


def test_plan_profile():
    t = Table.from_pandas("t", pd.DataFrame({
        "a": np.arange(100, dtype=np.int32)}))
    plan = Aggregate(TableScan(TableWrapper(t), col("a") > lit(10)), [],
                     [("s", sum_(col("a")))])
    execute_plan(plan)
    rows = plan_profile(plan)
    assert [r["operator"] for r in rows] == ["TableWrapper", "TableScan",
                                            "Aggregate"]
    assert all(r["walltime_s"] >= 0 for r in rows)
    out = format_profile(plan)
    assert "TOTAL" in out and "Aggregate" in out


def test_multihost_noop_in_single_process():
    assert initialize_from_env() is False
    info = process_info()
    assert info["process_count"] == 1


def test_broadcast_join_matches_shuffle_free_result():
    mesh = make_mesh(8)
    rng = np.random.default_rng(2)
    probe = pd.DataFrame({"k": rng.integers(1, 50, 2000).astype(np.int32)})
    build = pd.DataFrame({"bk": np.arange(1, 33, dtype=np.int32)})  # small
    sp = hash_partition(Table.from_pandas("p", probe), "k", mesh)
    sb = hash_partition(Table.from_pandas("b", build), "bk", mesh)

    def local(pk, p_mask, bk, b_mask):
        pk, p_mask, bk, b_mask = (x.reshape(x.shape[-1])
                                  for x in (pk, p_mask, bk, b_mask))
        _, _, pair_valid, total = broadcast_join_inner(
            pk, p_mask, bk, b_mask, pk.shape[0] * 2)
        return jax.lax.psum(total, SHARD_AXIS)

    def masks(st):
        return (jnp.arange(st.shard_capacity, dtype=jnp.int32)[None, :]
                < st.counts[:, None])

    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(P(SHARD_AXIS),) * 4,
                           out_specs=P(), check_vma=False))
    total = int(fn(sp.column("k").data, masks(sp),
                   sb.column("bk").data, masks(sb)))
    expected = int(probe["k"].isin(build["bk"]).sum())
    assert total == expected
