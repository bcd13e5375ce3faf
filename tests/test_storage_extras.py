"""Block statistics / index / encoding tests."""

import numpy as np
import pandas as pd

from hyrise_tpu.expression.ast import col, lit
from hyrise_tpu.ops import TableWrapper, execute_plan
from hyrise_tpu.ops.index_scan import IndexScan
from hyrise_tpu.ops.table_scan import TableScan
from hyrise_tpu.storage.block_statistics import attach_block_statistics
from hyrise_tpu.storage.encoding import (ChunkEncoder, EncodingType,
                                         FrameOfReferenceColumn,
                                         RunLengthColumn,
                                         compress_attribute_vector,
                                         frame_of_reference_decode,
                                         frame_of_reference_encode,
                                         run_length_decode, run_length_encode)
from hyrise_tpu.storage.index import create_index, get_index
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import PredicateCondition
from hyrise_tpu.utils.table_eq import assert_tables_equal


def make_table(n=1000):
    rng = np.random.default_rng(1)
    return Table.from_pandas("t", pd.DataFrame({
        "a": np.arange(n, dtype=np.int32),          # clustered
        "b": rng.integers(0, 100, n).astype(np.int32),
        "s": np.array([f"k{v:03d}" for v in rng.integers(0, 50, n)],
                      dtype=object),
    }))


def test_block_pruning_short_circuit():
    t = make_table()
    attach_block_statistics(t, block_rows=100)
    scan = TableScan(TableWrapper(t), col("a") > lit(10**6))
    out = execute_plan(scan)
    assert out.num_rows == 0
    assert scan.performance_data.extra.get("pruned_all_blocks")


def test_block_pruning_keeps_correctness():
    t = make_table()
    attach_block_statistics(t, block_rows=100)
    out = execute_plan(TableScan(TableWrapper(t), col("a").between(150, 250)))
    assert out.num_rows == 101


def test_index_scan_matches_table_scan():
    t = make_table()
    create_index(t, "b")
    for cond, expr in [
        (PredicateCondition.EQUALS, col("b") == lit(42)),
        (PredicateCondition.LESS_THAN, col("b") < lit(10)),
        (PredicateCondition.GREATER_THAN_EQUALS, col("b") >= lit(90)),
    ]:
        via_index = execute_plan(IndexScan(TableWrapper(t), "b", cond,
                                           42 if cond is PredicateCondition.EQUALS
                                           else (10 if cond is
                                                 PredicateCondition.LESS_THAN
                                                 else 90)))
        via_scan = execute_plan(TableScan(TableWrapper(t), expr))
        assert_tables_equal(sorted(via_index.rows()), sorted(via_scan.rows()))


def test_index_scan_string():
    t = make_table()
    create_index(t, "s")
    via_index = execute_plan(IndexScan(TableWrapper(t), "s",
                                       PredicateCondition.EQUALS, "k010"))
    via_scan = execute_plan(TableScan(TableWrapper(t), col("s") == lit("k010")))
    assert_tables_equal(sorted(via_index.rows()), sorted(via_scan.rows()))
    # absent value
    out = execute_plan(IndexScan(TableWrapper(t), "s",
                                 PredicateCondition.EQUALS, "zzz"))
    assert out.num_rows == 0
    # range with absent bound
    via_index = execute_plan(IndexScan(TableWrapper(t), "s",
                                       PredicateCondition.GREATER_THAN, "k01"))
    via_scan = execute_plan(TableScan(TableWrapper(t), col("s") > lit("k01")))
    assert via_index.num_rows == via_scan.num_rows


def test_index_fallback_without_index():
    t = make_table()
    out = execute_plan(IndexScan(TableWrapper(t), "b",
                                 PredicateCondition.EQUALS, 42))
    ref = execute_plan(TableScan(TableWrapper(t), col("b") == lit(42)))
    assert out.num_rows == ref.num_rows


def test_compress_attribute_vector():
    assert compress_attribute_vector(
        np.array([0, 100], dtype=np.int64)).dtype == np.int8
    assert compress_attribute_vector(
        np.array([0, 1000], dtype=np.int64)).dtype == np.int16
    assert compress_attribute_vector(
        np.array([0, 10**6], dtype=np.int64)).dtype == np.int32


def test_run_length_roundtrip():
    data = np.array([5, 5, 5, 2, 2, 9, 9, 9, 9], dtype=np.int32)
    values, ends = run_length_encode(data)
    assert len(values) == 3
    import jax.numpy as jnp
    rle = RunLengthColumn(jnp.asarray(values), jnp.asarray(ends), len(data))
    np.testing.assert_array_equal(np.asarray(run_length_decode(rle)), data)


def test_frame_of_reference_roundtrip():
    rng = np.random.default_rng(0)
    data = (rng.integers(0, 100, 5000) + 10**6).astype(np.int64)
    forc = frame_of_reference_encode(data)
    assert forc.offsets.dtype == np.int8  # offsets fit one byte
    np.testing.assert_array_equal(np.asarray(frame_of_reference_decode(forc)),
                                  data)


def test_chunk_encoder_narrow_codes():
    t = make_table()
    c = t.column("s")
    enc = ChunkEncoder.encode_column(c, EncodingType.DICTIONARY)
    # at rest: one-byte codes (50 distinct values); dense form decodes lazily
    assert np.asarray(enc.encoded.codes).dtype == np.int8
    assert list(enc.decode(100)) == list(c.decode(100))
    from hyrise_tpu.storage.encoding import encoded_memory_bytes
    assert encoded_memory_bytes(enc) < encoded_memory_bytes(c)
