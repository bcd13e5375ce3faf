"""Storage layer tests.

Mirrors the reference's storage tests (src/test/storage/table_test.cpp,
value_column_test.cpp) plus .tbl round-trips against the reference's own
fixture files (SURVEY.md §7 step 1 oracle).
"""

import os

import numpy as np
import pytest

from hyrise_tpu.storage import Column, Table, TableColumnDefinition, Catalog
from hyrise_tpu.storage.column import merge_dictionaries
from hyrise_tpu.storage.load_table import load_table
from hyrise_tpu.types import DataType

from conftest import REFERENCE_TABLES


def test_column_roundtrip_int():
    c = Column.from_numpy("a", DataType.INT32, np.array([3, 1, 2], dtype=np.int32))
    assert c.capacity >= 3
    np.testing.assert_array_equal(c.decode(3), [3, 1, 2])


def test_column_roundtrip_string_nulls():
    c = Column.from_numpy("s", DataType.STRING,
                          np.array(["b", None, "a", "b"], dtype=object))
    out = c.decode(4)
    assert list(out) == ["b", None, "a", "b"]
    # order-preserving codes
    codes = np.asarray(c.data[:4])
    assert codes[2] < codes[0]


def test_column_dictionary_bounds():
    c = Column.from_numpy("s", DataType.STRING,
                          np.array(["apple", "cherry", "banana"], dtype=object))
    assert c.code_for("banana") is not None
    assert c.code_for("zzz") is None
    assert c.lower_bound("b") == 1
    assert c.upper_bound("banana") == 2


def test_merge_dictionaries():
    d1 = np.array(["a", "c"])
    d2 = np.array(["b", "c"])
    merged, r1, r2 = merge_dictionaries(d1, d2)
    assert list(merged) == ["a", "b", "c"]
    assert list(r1) == [0, 2]
    assert list(r2) == [1, 2]


def test_table_from_arrays():
    defs = [TableColumnDefinition("a", DataType.INT32),
            TableColumnDefinition("b", DataType.FLOAT32)]
    t = Table.from_arrays("t", defs,
                          [np.array([1, 2, 3]), np.array([1.5, 2.5, 3.5])])
    assert t.num_rows == 3
    assert t.column("a").dtype == DataType.INT32
    with pytest.raises(KeyError):
        t.column("nope")


def test_load_reference_tbl():
    t = load_table(os.path.join(REFERENCE_TABLES, "int_float.tbl"))
    assert t.column_names == ["a", "b"]
    assert t.num_rows == 3
    rows = t.rows()
    assert rows[0][0] == 12345
    assert abs(rows[0][1] - 458.7) < 1e-4


def test_load_reference_tbl_with_null():
    t = load_table(os.path.join(REFERENCE_TABLES, "int_float_with_null.tbl"))
    rows = t.rows()
    assert rows[1][1] is None or rows[1][0] is None or any(
        any(v is None for v in r) for r in rows)


def test_load_string_table():
    t = load_table(os.path.join(REFERENCE_TABLES, "int_string.tbl"))
    assert t.column("b").dtype == DataType.STRING


def test_catalog():
    cat = Catalog()
    defs = [TableColumnDefinition("a", DataType.INT32)]
    t = Table.from_arrays("x", defs, [np.array([1])])
    cat.add_table("x", t)
    assert cat.has_table("x")
    assert cat.get_table("x") is t
    with pytest.raises(ValueError):
        cat.add_table("x", t)
    cat.drop_table("x")
    assert not cat.has_table("x")
    with pytest.raises(KeyError):
        cat.get_table("x")


def test_to_pandas():
    t = load_table(os.path.join(REFERENCE_TABLES, "int_float.tbl"))
    df = t.to_pandas()
    assert list(df.columns) == ["a", "b"]
    assert len(df) == 3
