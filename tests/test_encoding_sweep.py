"""Operator correctness swept across column encodings.

Reference: operator tests are parameterized over every EncodingType so each
scan/join/aggregate runs against Unencoded/Dictionary/RunLength/FoR columns
(src/test/base_test.hpp:33-42 and the param lists in table_scan_test.cpp).
Here encodings are at-rest device representations with lazy decode-to-dense
(storage/encoding.py), so the SAME operator code must produce identical
results over every encoding."""

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.expression import ast
from hyrise_tpu.ops import TableWrapper, execute_plan
from hyrise_tpu.ops.aggregate import Aggregate
from hyrise_tpu.ops.join import Join
from hyrise_tpu.ops.sort import Sort
from hyrise_tpu.ops.table_scan import TableScan
from hyrise_tpu.storage.encoding import (ChunkEncoder, EncodingType,
                                         encoded_memory_bytes)
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import JoinMode
from hyrise_tpu.utils.table_eq import assert_tables_equal

ENCODINGS = [EncodingType.UNENCODED, EncodingType.DICTIONARY,
             EncodingType.RUN_LENGTH, EncodingType.FRAME_OF_REFERENCE]


def _base_table(n=800, seed=7):
    rng = np.random.default_rng(seed)
    # sorted-ish int column compresses well under RLE/FoR
    k = np.sort(rng.integers(1000, 1040, size=n)).astype(np.int64)
    v = rng.integers(0, 50, size=n).astype(np.int32)
    s = np.array([f"g{x:02d}" for x in rng.integers(0, 9, size=n)],
                 dtype=object)
    f = rng.normal(size=n)
    return Table.from_pandas("t", pd.DataFrame(
        {"k": k, "v": v, "s": s, "f": f}))


@pytest.fixture(scope="module")
def plain():
    return _base_table()


def _encoded(plain, enc):
    return ChunkEncoder.encode_table(plain, enc)


@pytest.mark.parametrize("enc", ENCODINGS)
def test_scan_over_encoding(plain, enc):
    t = _encoded(plain, enc)
    ref = execute_plan(TableScan(TableWrapper(plain),
                                 (ast.col("k") > ast.lit(1010))
                                 & (ast.col("s") != ast.lit("g03"))))
    got = execute_plan(TableScan(TableWrapper(t),
                                 (ast.col("k") > ast.lit(1010))
                                 & (ast.col("s") != ast.lit("g03"))))
    assert_tables_equal(got.rows(), ref.rows(), ordered=True)


@pytest.mark.parametrize("enc", ENCODINGS)
def test_join_over_encoding(plain, enc):
    t = _encoded(plain, enc)
    dim = Table.from_pandas("d", pd.DataFrame({
        "k": np.arange(1000, 1040, dtype=np.int64),
        "label": [f"L{i}" for i in range(40)]}))
    ref = execute_plan(Sort(Join(TableWrapper(plain), TableWrapper(dim),
                                 JoinMode.INNER, ("k", "k")), ["k", "f"]))
    got = execute_plan(Sort(Join(TableWrapper(t), TableWrapper(dim),
                                 JoinMode.INNER, ("k", "k")), ["k", "f"]))
    assert_tables_equal(got.rows(), ref.rows(), ordered=True)


@pytest.mark.parametrize("enc", ENCODINGS)
def test_aggregate_over_encoding(plain, enc):
    t = _encoded(plain, enc)
    aggs = [("s_v", ast.sum_(ast.col("v"))), ("n", ast.count_()),
            ("mx", ast.max_(ast.col("k")))]
    ref = execute_plan(Sort(Aggregate(TableWrapper(plain), ["s"], aggs),
                            ["s"]))
    got = execute_plan(Sort(Aggregate(TableWrapper(t), ["s"], aggs), ["s"]))
    assert_tables_equal(got.rows(), ref.rows(), ordered=True)


def test_encodings_compress_at_rest(plain):
    base = sum(encoded_memory_bytes(c) for c in plain.columns)
    rle = _encoded(plain, EncodingType.RUN_LENGTH)
    forc = _encoded(plain, EncodingType.FRAME_OF_REFERENCE)
    ndict = _encoded(plain, EncodingType.DICTIONARY)
    assert encoded_memory_bytes(rle.column("k")) < \
        encoded_memory_bytes(plain.column("k"))
    assert encoded_memory_bytes(forc.column("k")) < \
        encoded_memory_bytes(plain.column("k"))
    assert sum(encoded_memory_bytes(c) for c in ndict.columns) < base


def test_encoded_table_through_sql():
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
    from hyrise_tpu.storage.catalog import Catalog
    plain = _base_table()
    cat = Catalog()
    cat.add_table("t", ChunkEncoder.encode_table(plain,
                                                 EncodingType.RUN_LENGTH))
    catp = Catalog()
    catp.add_table("t", plain)
    sql = ("SELECT s, SUM(v) AS sv FROM t WHERE k BETWEEN 1005 AND 1035 "
           "GROUP BY s ORDER BY s")
    got = (SQLPipelineBuilder(sql).with_catalog(cat).create_pipeline()
           .get_result_table())
    ref = (SQLPipelineBuilder(sql).with_catalog(catp).create_pipeline()
           .get_result_table())
    assert_tables_equal(got.rows(), ref.rows(), ordered=True)


def test_encoded_at_rest_whole_plan_compiled():
    """Whole-plan compilation over encoded-at-rest tables: narrow string
    code vectors are passed as the jit ARGUMENTS and upcast in-program
    (plan/compiler.py _narrow_encoded), so the at-rest HBM footprint is
    the encoded width. Results must match the unencoded eager engine."""
    import os
    from hyrise_tpu.ops.base import execute_plan
    from hyrise_tpu.plan.compiler import CompiledQuery
    from hyrise_tpu.storage.catalog import Catalog
    from hyrise_tpu.storage.encoding import ChunkEncoder, EncodingType
    from hyrise_tpu.tpch.dbgen import generate_tables
    from hyrise_tpu.tpch.queries import TPCH_PLANS
    from hyrise_tpu.utils.table_eq import assert_tables_equal

    tables = generate_tables(0.005)
    cat0, cat1 = Catalog(), Catalog()
    for n, t in tables.items():
        cat0.add_table(n, t)
        cat1.add_table(n, ChunkEncoder.encode_table(
            t, EncodingType.DICTIONARY))
    for qid in (1, 6, 12):
        ref = execute_plan(TPCH_PLANS[qid](cat0))
        cq = CompiledQuery(TPCH_PLANS[qid](cat1), cat1)
        out = cq.run()
        out = cq.run()
        assert_tables_equal(out.rows(), ref.rows(), ordered=True,
                            rel_tol=1e-9)
        assert any(a.dtype.itemsize < 4 for a in cq._flat_args()), \
            "expected narrow encoded jit arguments"
