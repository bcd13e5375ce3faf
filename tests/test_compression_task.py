"""ChunkCompressionTask — hyrise_tpu/tasks.py.

Reference: src/lib/tasks/chunk_compression_task.{hpp,cpp}: appended data
is re-encoded to the table's at-rest encodings after the fact, without
changing query results."""

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.concurrency.transaction import (
    MvccData, reset_default_transaction_manager)
from hyrise_tpu.sql.pipeline import run_sql
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.encoding import ChunkEncoder, EncodingType
from hyrise_tpu.storage.table import Table
from hyrise_tpu.tasks import ChunkCompressionTask


@pytest.fixture
def cat():
    reset_default_transaction_manager()
    c = Catalog()
    t = Table.from_pandas("t", pd.DataFrame({
        "a": np.array([5, 5, 5, 7, 7, 9, 9, 9], dtype=np.int64),
        "s": np.array(list("aabbccdd"), dtype=object),
    }))
    t = ChunkEncoder.encode_table(t, EncodingType.DICTIONARY)
    t.mvcc = MvccData.for_new_table(t.num_rows, t.capacity)
    c.add_table("t", t)
    return c


def q(sql, cat):
    return run_sql(sql, cat, use_mvcc=True)


def test_compress_appended_restores_encoding(cat):
    t0 = cat.get_table("t")
    assert all(c.encoded is not None for c in t0.columns)
    assert getattr(t0, "encoding_spec", None) is EncodingType.DICTIONARY

    q("INSERT INTO t VALUES (11, 'zz'), (5, 'aa')", cat)
    before = q("SELECT a, s FROM t ORDER BY a, s", cat).rows()
    appended = cat.get_table("t")
    # the COW append materialized the columns to dense form
    assert all(c.encoded is None for c in appended.columns)

    out = ChunkCompressionTask("t", cat).run()
    assert all(c.encoded is not None for c in out.columns)
    assert cat.get_table("t") is out
    assert out.mvcc is appended.mvcc  # MVCC state carried over

    after = q("SELECT a, s FROM t ORDER BY a, s", cat).rows()
    assert after == before
    assert (11, "zz") in after and (5, "aa") in after


def test_compress_appended_noop_without_spec(cat):
    plain = Table.from_pandas("p", pd.DataFrame({
        "x": np.arange(4, dtype=np.int64)}))
    plain.mvcc = MvccData.for_new_table(plain.num_rows, plain.capacity)
    cat.add_table("p", plain)
    out = ChunkCompressionTask("p", cat).run()
    assert out is plain  # never-encoded tables are left untouched


def test_compress_appended_via_scheduler(cat):
    """The reference schedules ChunkCompressionTask on its task queue;
    ours runs under parallel/scheduler.py's JobTask the same way."""
    from hyrise_tpu.parallel.scheduler import JobTask

    q("INSERT INTO t VALUES (1, 'q')", cat)
    task = ChunkCompressionTask("t", cat)
    job = JobTask(task.run)
    job.schedule()
    job.join()
    assert all(c.encoded is not None for c in cat.get_table("t").columns)
    rows = q("SELECT COUNT(*) FROM t", cat).rows()
    assert rows[0][0] == 9
