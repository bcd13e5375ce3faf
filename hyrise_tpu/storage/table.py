"""Tables.

TPU-native analogue of the reference's Table/Chunk
(reference: src/lib/storage/table.hpp:26-175, chunk.hpp:41-160).

The reference partitions a table horizontally into Chunks of up to
Chunk::MAX_SIZE rows, each holding one BaseColumn per column. Here a table
(or one host-shard of a distributed table) is a single set of fixed-capacity
device arrays: the chunk axis is unnecessary on TPU because kernels tile the
row axis themselves (Pallas grid / XLA loop), and the multi-node axis is
handled by `parallel/` sharding instead of per-chunk NUMA placement.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.storage.column import Column
from hyrise_tpu.types import DataType, bucket_capacity


@dataclasses.dataclass
class TableColumnDefinition:
    """Reference: TableColumnDefinition in src/lib/storage/table_column_definition.hpp."""

    name: str
    dtype: DataType
    nullable: bool = False


class Table:
    """A named collection of equally-sized columns plus a live row count.

    `num_rows` is host-known; all device arrays share one padded capacity.

    Row layouts: by default rows [0, num_rows) are live (PREFIX layout).
    A table may instead carry an explicit `live` boolean mask (MASKED
    layout, kernels/tpu_prims.py rationale): filters then cost nothing —
    no compaction sort, no gathers — and mask-consuming operators (scans,
    joins, aggregates) run off live_mask() unchanged. Operators that truly
    need a prefix (concatenation, cross products, host reads) call
    materialize.ensure_prefix. This is the ReferenceColumn idea taken one
    step further: not even a PosList, just the predicate's bitmask.
    """

    def __init__(self, columns: Sequence[Column], num_rows, name: str = "",
                 live=None):
        assert len(columns) > 0
        caps = {c.capacity for c in columns}
        assert len(caps) == 1, f"column capacities differ: {caps}"
        self.columns: List[Column] = list(columns)
        # Under whole-plan compilation (plan/compiler.py) num_rows is a
        # traced device scalar; eagerly it is a host int.
        self.num_rows = (num_rows if isinstance(num_rows, jax.core.Tracer)
                         else int(num_rows))
        self.live = live  # None = prefix layout
        self.name = name
        self.mvcc = None  # set to MvccData for transactional tables
        # Duplicate names can occur after joins (both sides kept, like the
        # reference); lookup resolves to the FIRST occurrence.
        self._by_name: Dict[str, int] = {}
        for i, c in enumerate(columns):
            self._by_name.setdefault(c.name, i)

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_arrays(
        name: str,
        defs: Sequence[TableColumnDefinition],
        arrays: Sequence[np.ndarray],
        validities: Optional[Sequence[Optional[np.ndarray]]] = None,
    ) -> "Table":
        n = len(arrays[0])
        cap = bucket_capacity(n)
        cols = []
        for i, (d, arr) in enumerate(zip(defs, arrays)):
            v = validities[i] if validities is not None else None
            cols.append(Column.from_numpy(d.name, d.dtype, arr, validity=v,
                                          capacity=cap))
        return Table(cols, n, name=name)

    @staticmethod
    def from_pandas(name: str, df) -> "Table":
        """Build a table from a pandas DataFrame (host ingest path)."""
        defs, arrays, validities = [], [], []
        for col in df.columns:
            s = df[col]
            dtype_name = str(s.dtype)
            if dtype_name in ("Int32", "Int64", "Float32", "Float64"):
                # pandas nullable extension dtypes
                dt = {"Int32": DataType.INT32, "Int64": DataType.INT64,
                      "Float32": DataType.FLOAT32,
                      "Float64": DataType.FLOAT64}[dtype_name]
                null_mask = s.isna().to_numpy()
                defs.append(TableColumnDefinition(str(col), dt,
                                                  bool(null_mask.any())))
                arrays.append(s.fillna(0).to_numpy(dtype=dt.numpy_dtype))
                validities.append(~null_mask if null_mask.any() else None)
                continue
            if s.dtype == np.int32:
                dt = DataType.INT32
            elif s.dtype == np.int64:
                dt = DataType.INT64
            elif s.dtype == np.float32:
                dt = DataType.FLOAT32
            elif s.dtype == np.float64:
                dt = DataType.FLOAT64
            else:
                dt = DataType.STRING
            null_mask = s.isna().to_numpy()
            nullable = bool(null_mask.any())
            defs.append(TableColumnDefinition(str(col), dt, nullable))
            if dt is DataType.STRING:
                vals = s.astype(object).where(~s.isna(), None).to_numpy()
                arrays.append(vals)
            else:
                arrays.append(np.nan_to_num(s.to_numpy(), nan=0).astype(dt.numpy_dtype)
                              if nullable else s.to_numpy().astype(dt.numpy_dtype))
            validities.append(~null_mask if nullable else None)
        return Table.from_arrays(name, defs, arrays, validities)

    # -- accessors -----------------------------------------------------------

    @property
    def capacity(self) -> int:
        return self.columns[0].capacity

    @property
    def column_names(self) -> List[str]:
        return [c.name for c in self.columns]

    def column(self, name: str) -> Column:
        if name not in self._by_name:
            raise KeyError(f"table {self.name!r} has no column {name!r}; "
                           f"has {self.column_names}")
        return self.columns[self._by_name[name]]

    def has_column(self, name: str) -> bool:
        return name in self._by_name

    def column_id(self, name: str) -> int:
        return self._by_name[name]

    @property
    def is_prefix(self) -> bool:
        return self.live is None

    def live_mask(self) -> jax.Array:
        """Bool (capacity,): the live rows (mask layout) or rows < num_rows
        (prefix layout)."""
        if self.live is not None:
            return self.live
        return jnp.arange(self.capacity) < self.num_rows

    # -- conversion ----------------------------------------------------------

    def _decode_col(self, c: Column) -> np.ndarray:
        if self.live is None:
            return c.decode(self.num_rows)
        m = np.asarray(self.live)
        return c.decode(self.capacity)[m]

    def to_pandas(self):
        import pandas as pd

        data = {}
        for c in self.columns:
            col_name = c.name
            # Keep duplicate output names distinct for pandas.
            k = col_name
            suffix = 1
            while k in data:
                k = f"{col_name}.{suffix}"
                suffix += 1
            data[k] = self._decode_col(c)
        return pd.DataFrame(data)

    def rows(self) -> List[tuple]:
        """All live rows as python tuples (tests / printing)."""
        decoded = [self._decode_col(c) for c in self.columns]
        n = len(decoded[0])
        return [tuple(col[i] for col in decoded) for i in range(n)]

    def __repr__(self) -> str:
        cols = ", ".join(f"{c.name}:{c.dtype.value}" for c in self.columns)
        return f"Table({self.name!r}, rows={self.num_rows}, cap={self.capacity}, [{cols}])"
