"""Load a broad sample of the reference's .tbl test fixtures and round-trip
them (SURVEY §7 step-1 oracle: parity with src/test/tables/)."""

import glob
import os

import pytest

from hyrise_tpu.storage.load_table import load_table

from conftest import REFERENCE_TABLES

# top-level fixtures only; a representative, deterministic sample
FILES = sorted(glob.glob(os.path.join(REFERENCE_TABLES, "*.tbl")))[:40]


@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(f)
                                             for f in FILES])
def test_fixture_roundtrip(path):
    t = load_table(path)
    assert t.num_rows >= 0
    rows = t.rows()
    assert len(rows) == t.num_rows
    # every live cell decodes without error; dictionary codes in range
    for c in t.columns:
        vals = c.decode(t.num_rows)
        assert len(vals) == t.num_rows
