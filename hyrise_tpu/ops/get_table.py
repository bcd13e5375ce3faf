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
        return _maybe_traced(cat.get_table(self.table_name))


class TableWrapper(AbstractOperator):
    name = "TableWrapper"

    def __init__(self, table: Table):
        super().__init__()
        self.table = table

    def _on_execute(self, context) -> Table:
        return _maybe_traced(self.table)


def _maybe_traced(t: Table) -> Table:
    """Under whole-plan compilation, base tables must resolve to their
    traced stand-ins (jit arguments) — returning the concrete table would
    bake its device arrays into the program as giant constants."""
    from hyrise_tpu.plan import compiler
    ctx = compiler.active()
    if ctx is None:
        return t
    sub = ctx.table_subst.get(id(t))
    if sub is not None:
        return sub
    # a table created DURING the trace (e.g. UnionPositions' internal
    # TableWrapper) already holds tracers / lazy thunks — pass it through
    import jax
    d = t.columns[0]._data
    if callable(d) or isinstance(d, jax.core.Tracer):
        return t
    from hyrise_tpu.plan.compiler import PlanNotCompilable
    raise PlanNotCompilable(
        f"table {t.name!r} was not registered as a compile-time source "
        f"(catalog changed after CompiledQuery construction?)")
