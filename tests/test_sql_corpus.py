"""The sqlite_testrunner analogue: every query in tests/sql_corpus.sql runs
through the full SQL pipeline AND sqlite on identical data; results compared
unordered with lenient types (reference:
src/test/sql/sqlite_testrunner/sqlite_testrunner.cpp:31-60)."""

import os

import numpy as np
import pandas as pd
import pytest

from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
from hyrise_tpu.storage.catalog import Catalog
from hyrise_tpu.storage.table import Table
from hyrise_tpu.utils.sqlite_oracle import SqliteOracle
from hyrise_tpu.utils.table_eq import assert_tables_equal

CORPUS = os.path.join(os.path.dirname(__file__), "sql_corpus.sql")

_state = {}


def _queries():
    with open(CORPUS) as f:
        text = f.read()
    lines = [ln for ln in text.splitlines() if not ln.strip().startswith("--")]
    return [q.strip() for q in "\n".join(lines).split(";") if q.strip()]


def _setup():
    if _state:
        return _state["cat"], _state["oracle"]
    rng = np.random.default_rng(5)
    n = 10
    mixed = pd.DataFrame({
        "a": np.arange(1, n + 1, dtype=np.int32),
        "b": (rng.random(n) * 100).astype(np.float32),
        "s": np.array(["red", "green", None, "blue", "red", "green", "red",
                       None, "amber", "blue"], dtype=object),
    })
    lookup = pd.DataFrame({
        "k": np.array([1, 2, 2, 5, 11], dtype=np.int32),
        "v": np.array(["one", "two", "deux", "five", "eleven"], dtype=object),
    })
    empty_t = pd.DataFrame({"x": np.array([], dtype=np.int32)})
    # NULL-heavy numeric table (round-3 corpus expansion: NULL semantics
    # through arithmetic, aggregates, join keys, set ops)
    nullnum = pd.DataFrame({
        "i": np.array([1, None, 3, None, 5, 3, None, 8], dtype=object),
        "f": np.array([0.5, 1.5, None, None, 2.5, None, 3.5, 4.5],
                      dtype=object),
        "g": np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.int32),
    })
    nullnum["i"] = pd.array(nullnum["i"], dtype="Int32")
    nullnum["f"] = pd.array(nullnum["f"], dtype="Float64")
    tables = {"mixed": Table.from_pandas("mixed", mixed),
              "lookup": Table.from_pandas("lookup", lookup),
              "empty_t": Table.from_pandas("empty_t", empty_t),
              "nullnum": Table.from_pandas("nullnum", nullnum)}
    cat = Catalog()
    for name, t in tables.items():
        cat.add_table(name, t)
    oracle = SqliteOracle(tables)
    _state.update(cat=cat, oracle=oracle)
    return cat, oracle


@pytest.mark.parametrize("idx,sql", list(enumerate(_queries())))
def test_corpus_query(idx, sql):
    cat, oracle = _setup()
    expected = oracle.query(sql)
    out = (SQLPipelineBuilder(sql).with_catalog(cat)
           .dont_cache_query_plans().create_pipeline().get_result_table())
    assert_tables_equal(out.rows(), expected, ordered=False, rel_tol=1e-4,
                        abs_tol=1e-4)
