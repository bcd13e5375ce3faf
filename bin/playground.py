#!/usr/bin/env python
"""Scratchpad (reference: src/bin/playground.cpp). Loads tiny TPC-H data and
drops into an interactive prompt with a ready catalog."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyrise_tpu.storage.catalog import default_catalog
from hyrise_tpu.tpch.dbgen import load_into_catalog
from hyrise_tpu.sql.pipeline import run_sql  # noqa: F401

if __name__ == "__main__":
    load_into_catalog(0.005)
    cat = default_catalog()
    print("tables:", cat.table_names())
    print("try: run_sql('SELECT COUNT(*) FROM lineitem', cat).rows()")
    import code
    code.interact(local=dict(globals(), cat=cat))
