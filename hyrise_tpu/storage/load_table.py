""".tbl test-table loader.

Reference: src/lib/utils/load_table.cpp — pipe-separated text tables with a
header of column names, a second line of types (`int|long|float|double|string`,
`_null` suffix marks nullable), and the literal `null` for NULL values.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from hyrise_tpu.storage.table import Table, TableColumnDefinition
from hyrise_tpu.types import DataType

_TYPE_MAP = {
    "int": DataType.INT32,
    "long": DataType.INT64,
    "float": DataType.FLOAT32,
    "double": DataType.FLOAT64,
    "string": DataType.STRING,
}


def load_table(path: str, name: str = "") -> Table:
    with open(path, "r") as f:
        lines = [ln.rstrip("\n") for ln in f]
    lines = [ln for ln in lines if ln != ""]
    names = lines[0].split("|")
    type_specs = lines[1].split("|")

    defs: List[TableColumnDefinition] = []
    for col_name, spec in zip(names, type_specs):
        parts = spec.split("_")
        base = parts[0]
        nullable = len(parts) > 1 and parts[1] == "null"
        if base not in _TYPE_MAP:
            raise ValueError(f"invalid data type {base!r} for column {col_name!r}")
        defs.append(TableColumnDefinition(col_name, _TYPE_MAP[base], nullable))

    n_cols = len(defs)
    raw: List[List[Optional[str]]] = [[] for _ in range(n_cols)]
    for ln in lines[2:]:
        cells = ln.split("|")
        assert len(cells) == n_cols, f"bad row in {path}: {ln!r}"
        for i, cell in enumerate(cells):
            if defs[i].nullable and cell == "null":
                raw[i].append(None)
            else:
                raw[i].append(cell)

    arrays, validities = [], []
    for i, d in enumerate(defs):
        col = raw[i]
        null_mask = np.array([v is None for v in col], dtype=bool)
        validity = ~null_mask if d.nullable else None
        if d.dtype is DataType.STRING:
            arrays.append(np.array(col, dtype=object))
        else:
            filled = ["0" if v is None else v for v in col]
            if d.dtype in (DataType.INT32, DataType.INT64):
                vals = np.array([int(v) for v in filled], dtype=d.dtype.numpy_dtype)
            else:
                vals = np.array([float(v) for v in filled], dtype=d.dtype.numpy_dtype)
            arrays.append(vals)
        validities.append(validity)

    return Table.from_arrays(name or path, defs, arrays, validities)
