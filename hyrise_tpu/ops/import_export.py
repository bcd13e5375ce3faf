"""CSV and binary table import/export operators.

Reference: src/lib/operators/{import_csv,export_csv,import_binary,
export_binary}.cpp and import_export/{csv_meta,csv_parser,binary}.*:
- CSV with an optional `<file>.json` meta file describing column types
  (reference: csv_meta.hpp; RFC-4180-ish parsing).
- A columnar binary format (reference: import_export/binary.hpp). Ours is a
  .npz container holding each column's dense data + validity + dictionary,
  plus a JSON schema — same role, numpy-native.
"""

from __future__ import annotations

import csv as _csv
import json
import os
from typing import List, Optional

import numpy as np

from hyrise_tpu.ops.base import AbstractOperator
from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table, TableColumnDefinition
from hyrise_tpu.types import DataType

_TYPE_MAP = {
    "int": DataType.INT32, "long": DataType.INT64, "float": DataType.FLOAT32,
    "double": DataType.FLOAT64, "string": DataType.STRING,
}
_TYPE_NAME = {v: k for k, v in _TYPE_MAP.items()}


def load_csv(path: str, name: str = "") -> Table:
    meta_path = path + ".json"
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    with open(path, newline="") as f:
        rows = list(_csv.reader(f))
    if meta is not None:
        col_meta = meta["columns"]
        names = [c["name"] for c in col_meta]
        dtypes = [_TYPE_MAP[c["type"]] for c in col_meta]
        nullable = [bool(c.get("nullable", False)) for c in col_meta]
        data_rows = rows  # with meta, the file has no header line
    else:
        names = rows[0]
        data_rows = rows[1:]
        # infer types from first data row
        dtypes, nullable = [], []
        sample = data_rows[0] if data_rows else []
        for cell in sample:
            try:
                int(cell)
                dtypes.append(DataType.INT32)
            except ValueError:
                try:
                    float(cell)
                    dtypes.append(DataType.FLOAT32)
                except ValueError:
                    dtypes.append(DataType.STRING)
            nullable.append(False)
        if not sample:
            dtypes = [DataType.STRING] * len(names)
            nullable = [False] * len(names)

    defs = [TableColumnDefinition(n, d, nl)
            for n, d, nl in zip(names, dtypes, nullable)]
    arrays, validities = [], []
    for i, d in enumerate(defs):
        col = [r[i] for r in data_rows]
        nulls = np.array([c == "" and d.nullable for c in col])
        if d.dtype is DataType.STRING:
            arrays.append(np.array([None if n else c
                                    for c, n in zip(col, nulls)], dtype=object))
        else:
            filled = ["0" if (c == "" and d.nullable) else c for c in col]
            if d.dtype.is_integral:
                arrays.append(np.array([int(x) for x in filled],
                                       dtype=d.dtype.numpy_dtype))
            else:
                arrays.append(np.array([float(x) for x in filled],
                                       dtype=d.dtype.numpy_dtype))
        validities.append(~nulls if d.nullable else None)
    return Table.from_arrays(name or os.path.basename(path), defs, arrays,
                             validities)


def export_csv(table: Table, path: str) -> None:
    with open(path, "w", newline="") as f:
        w = _csv.writer(f)
        from hyrise_tpu.ops.materialize import ensure_prefix
        table = ensure_prefix(table)
        decoded = [c.decode(table.num_rows) for c in table.columns]
        for i in range(table.num_rows):
            w.writerow(["" if col[i] is None else col[i] for col in decoded])
    meta = {"columns": [
        {"name": c.name, "type": _TYPE_NAME[c.dtype],
         "nullable": c.validity is not None} for c in table.columns]}
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def export_binary(table: Table, path: str) -> None:
    payload = {}
    schema = []
    from hyrise_tpu.ops.materialize import ensure_prefix
    table = ensure_prefix(table)
    n = table.num_rows
    for i, c in enumerate(table.columns):
        payload[f"data_{i}"] = np.asarray(c.data[:n])
        if c.validity is not None:
            payload[f"validity_{i}"] = np.asarray(c.validity[:n])
        if c.dictionary is not None:
            payload[f"dict_{i}"] = np.asarray(c.dictionary).astype(str)
        schema.append({"name": c.name, "type": _TYPE_NAME[c.dtype],
                       "nullable": c.validity is not None,
                       "dict": c.dictionary is not None})
    payload["schema"] = np.frombuffer(
        json.dumps({"columns": schema, "num_rows": n}).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)


def load_binary(path: str, name: str = "") -> Table:
    import jax.numpy as jnp

    from hyrise_tpu.types import bucket_capacity

    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=False)
    schema = json.loads(bytes(z["schema"]).decode())
    n = schema["num_rows"]
    cap = bucket_capacity(max(n, 1))
    cols: List[Column] = []
    for i, cs in enumerate(schema["columns"]):
        dt = _TYPE_MAP[cs["type"]]
        data = np.zeros(cap, dtype=dt.numpy_dtype)
        data[:n] = z[f"data_{i}"]
        validity = None
        if cs["nullable"]:
            v = np.zeros(cap, dtype=bool)
            v[:n] = z[f"validity_{i}"]
            validity = jnp.asarray(v)
        dictionary = z[f"dict_{i}"] if cs["dict"] else None
        cols.append(Column(cs["name"], dt, jnp.asarray(data), validity,
                           dictionary))
    return Table(cols, n, name=name or os.path.basename(path))


class ImportCsv(AbstractOperator):
    name = "ImportCsv"

    def __init__(self, path: str, table_name: str = ""):
        super().__init__()
        self.path = path
        self.table_name = table_name

    def _on_execute(self, context) -> Table:
        return load_csv(self.path, self.table_name)


class ExportCsv(AbstractOperator):
    name = "ExportCsv"

    def __init__(self, input_op: AbstractOperator, path: str):
        super().__init__(input_op)
        self.path = path

    def _on_execute(self, context) -> Table:
        t = self.input_table(0)
        export_csv(t, self.path)
        return t


class ImportBinary(AbstractOperator):
    name = "ImportBinary"

    def __init__(self, path: str, table_name: str = ""):
        super().__init__()
        self.path = path
        self.table_name = table_name

    def _on_execute(self, context) -> Table:
        return load_binary(self.path, self.table_name)


class ExportBinary(AbstractOperator):
    name = "ExportBinary"

    def __init__(self, input_op: AbstractOperator, path: str):
        super().__init__(input_op)
        self.path = path

    def _on_execute(self, context) -> Table:
        t = self.input_table(0)
        export_binary(t, self.path)
        return t
