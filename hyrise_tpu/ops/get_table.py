"""GetTable and TableWrapper.

Reference: src/lib/operators/get_table.{hpp,cpp} (catalog fetch, with
optimizer-set pruned chunk ids) and table_wrapper.cpp (wrap a literal table).
Chunk pruning maps to block pruning handled by the scan/statistics layer.
"""

from __future__ import annotations

from hyrise_tpu.ops.base import AbstractOperator
from hyrise_tpu.storage.catalog import Catalog, default_catalog
from hyrise_tpu.storage.table import Table


class GetTable(AbstractOperator):
    name = "GetTable"

    def __init__(self, table_name: str, catalog: Catalog = None):
        super().__init__()
        self.table_name = table_name
        self.catalog = catalog

    def _on_execute(self, context) -> Table:
        cat = self.catalog if self.catalog is not None else default_catalog()
        return cat.get_table(self.table_name)


class TableWrapper(AbstractOperator):
    name = "TableWrapper"

    def __init__(self, table: Table):
        super().__init__()
        self.table = table

    def _on_execute(self, context) -> Table:
        return self.table
