"""SQL pipeline -> distributed execution: full SQL texts run over a
ShardedCatalog as one shard_map program per query on the 8-device mesh,
checked against the single-node SQL results (and transitively the sqlite
oracle, which covers the same SQL texts in test_tpch_sql.py)."""

import pytest

from hyrise_tpu.parallel.dist_compiler import shard_tpch
from hyrise_tpu.parallel.mesh import make_mesh
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.tpch.dbgen import generate_tables
from hyrise_tpu.tpch.queries import TPCH_SQL
from hyrise_tpu.utils.table_eq import assert_tables_equal

# a representative slice: scan+agg (1, 6), joins (3, 5, 10), fused-aggregate
# shapes (14), semi/anti + distinct (4, 16), group-by HAVING (18)
QIDS = [1, 3, 4, 5, 6, 10, 14, 16, 18]


@pytest.fixture(scope="module")
def env():
    tables = generate_tables(0.01)
    cat = Catalog()
    for name, t in tables.items():
        cat.add_table(name, t)
    sc = shard_tpch(cat, make_mesh(8))
    return cat, sc


@pytest.mark.parametrize("qid", QIDS)
def test_sql_distributed_matches_single_node(env, qid):
    cat, sc = env
    sql = TPCH_SQL[qid]
    ref = (SQLPipelineBuilder(sql).with_catalog(cat)
           .dont_cache_query_plans().create_pipeline().get_result_table())
    got = (SQLPipelineBuilder(sql).with_catalog(cat)
           .with_distributed_execution(sc)
           .dont_cache_query_plans().create_pipeline().get_result_table())
    assert got.column_names == ref.column_names
    assert_tables_equal(got.rows(), ref.rows(), ordered=True, rel_tol=1e-6)
