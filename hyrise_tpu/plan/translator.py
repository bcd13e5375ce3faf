"""LQP -> physical operator translation.

Reference: src/lib/logical_query_plan/lqp_translator.cpp:68-246 —
node-type dispatch; join nodes pick JoinHash for hashable equi predicates and
SortMerge/NestedLoop otherwise; predicates become TableScan chains.
"""

from __future__ import annotations

from typing import Dict, Optional

from hyrise_tpu.ops.aggregate import Aggregate
from hyrise_tpu.ops.base import AbstractOperator
from hyrise_tpu.ops.get_table import GetTable, TableWrapper
from hyrise_tpu.ops.join import Join, JoinSortMerge, Product
from hyrise_tpu.ops.misc import Alias, Difference, Limit, UnionAll, UnionPositions
from hyrise_tpu.ops.projection import Projection
from hyrise_tpu.ops.rw_ops import AddRowIds, Delete, Insert, Update, Validate
from hyrise_tpu.ops.sort import Sort
from hyrise_tpu.ops.table_scan import TableScan
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import JoinMode, PredicateCondition


class _Maintenance(AbstractOperator):
    """CreateView/DropView/CreateTable/DropTable/ShowTables executor
    (reference: operators/maintenance/*)."""

    def __init__(self, node, catalog):
        super().__init__()
        self.node = node
        self.catalog = catalog

    @property
    def name(self):
        return type(self.node).__name__

    def _on_execute(self, context):
        import numpy as np

        from hyrise_tpu.storage.catalog import default_catalog
        from hyrise_tpu.storage.table import Table, TableColumnDefinition
        from hyrise_tpu.types import DataType

        cat = self.catalog if self.catalog is not None else default_catalog()
        n = self.node
        if isinstance(n, L.CreateViewNode):
            cat.add_view(n.view_name, n.lqp)
        elif isinstance(n, L.DropViewNode):
            cat.drop_view(n.view_name)
        elif isinstance(n, L.CreateTableNode):
            from hyrise_tpu.concurrency.transaction import MvccData
            cols = n.column_definitions
            t = Table.from_arrays(
                n.table_name, cols,
                [np.array([], dtype=d.dtype.numpy_dtype) if d.dtype is not
                 DataType.STRING else np.array([], dtype=object)
                 for d in cols])
            t.mvcc = MvccData.for_new_table(0, t.capacity)
            cat.add_table(n.table_name, t)
        elif isinstance(n, L.DropTableNode):
            cat.drop_table(n.table_name)
        elif isinstance(n, L.ShowTablesNode):
            names = np.array(cat.table_names(), dtype=object)
            return Table.from_arrays(
                "tables", [TableColumnDefinition("table_name", DataType.STRING)],
                [names if len(names) else np.array([], dtype=object)])
        elif isinstance(n, L.ShowColumnsNode):
            t = cat.get_table(n.table_name)
            return Table.from_arrays(
                "columns",
                [TableColumnDefinition("column_name", DataType.STRING),
                 TableColumnDefinition("column_type", DataType.STRING),
                 TableColumnDefinition("is_nullable", DataType.INT32)],
                [np.array([c.name for c in t.columns], dtype=object),
                 np.array([c.dtype.value for c in t.columns], dtype=object),
                 np.array([int(c.validity is not None) for c in t.columns],
                          dtype=np.int32)])
        # DDL succeeded: empty result
        return Table.from_arrays(
            "ok", [TableColumnDefinition("ok", DataType.INT32)],
            [np.array([], dtype=np.int32)])


def translate_lqp(node: L.LQPNode, catalog=None,
                  _memo: Optional[Dict[int, AbstractOperator]] = None
                  ) -> AbstractOperator:
    memo = _memo if _memo is not None else {}
    if id(node) in memo:
        return memo[id(node)]

    def T(n):
        return translate_lqp(n, catalog, memo)

    if isinstance(node, L.StoredTableNode):
        op: AbstractOperator = GetTable(node.table_name, catalog)
        if node.pruned_columns is not None:
            op = Projection(op, list(node.pruned_columns))
    elif isinstance(node, L.StaticTableNode):
        op = TableWrapper(node.table)
    elif isinstance(node, L.PredicateNode):
        use_composite = getattr(node, "use_index_composite", None)
        use_index = getattr(node, "use_index", None)
        if use_composite is not None:
            from hyrise_tpu.ops.index_scan import IndexScan
            stored = node.children[0]
            column, value, extra = use_composite
            op = IndexScan(GetTable(stored.table_name, catalog), column,
                           PredicateCondition.EQUALS, value,
                           extra_equals=extra)
            if stored.pruned_columns is not None:
                op = Projection(op, list(stored.pruned_columns))
        elif use_index is not None:
            # IndexScanRule marked this scan (optimizer.py); go through the
            # raw GetTable so the index registered on the base Table applies,
            # re-applying any column pruning on top.
            from hyrise_tpu.ops.index_scan import IndexScan
            stored = node.children[0]
            column, cond, value, value2 = use_index
            op = IndexScan(GetTable(stored.table_name, catalog),
                           column, cond, value, value2)
            if stored.pruned_columns is not None:
                op = Projection(op, list(stored.pruned_columns))
        else:
            op = TableScan(T(node.children[0]), node.predicate)
    elif isinstance(node, L.ProjectionNode):
        op = Projection(T(node.children[0]), node.outputs)
    elif isinstance(node, L.AggregateNode):
        # Fusion pass (reference: JitAwareLQPTranslator,
        # jit_operator/jit_aware_lqp_translator.cpp): lower a maximal
        # Predicate* -> Aggregate chain into ONE jitted scan+reduce program.
        # FusedFilterAggregate falls back to TableScan+Aggregate at runtime
        # when the shape doesn't fit (non-dictionary group-by, COUNT
        # DISTINCT).
        from hyrise_tpu.expression.ast import Logical
        from hyrise_tpu.kernels.fused import FusedFilterAggregate

        preds = []
        c = node.children[0]
        while isinstance(c, L.PredicateNode):
            preds.append(c.predicate)
            c = c.children[0]
        if preds:
            combined = preds[-1]
            for p in reversed(preds[:-1]):
                combined = Logical("and", combined, p)
            op = FusedFilterAggregate(T(c), combined, node.groupby,
                                      node.aggregates)
        else:
            op = Aggregate(T(node.children[0]), node.groupby, node.aggregates)
    elif isinstance(node, L.DistinctNode):
        child = T(node.children[0])

        class _Distinct(Aggregate):
            def _on_execute(self, context):
                t = self.input_table(0)
                self.groupby = t.column_names
                return super()._on_execute(context)

        op = _Distinct(child, [], [])
    elif isinstance(node, L.JoinNode):
        left, right = T(node.children[0]), T(node.children[1])
        if node.mode is JoinMode.CROSS:
            op = Product(left, right)
        elif node.cond is PredicateCondition.EQUALS:
            # reference picks JoinHash for hashable equi joins
            op = Join(left, right, node.mode, (node.left_col, node.right_col))
        else:
            op = JoinSortMerge(left, right, node.mode,
                               (node.left_col, node.right_col), node.cond)
    elif isinstance(node, L.SortNode):
        op = Sort(T(node.children[0]), node.sort_defs)
    elif isinstance(node, L.LimitNode):
        op = Limit(T(node.children[0]), node.n)
    elif isinstance(node, L.UnionNode):
        cls = UnionAll if node.kind == "all" else UnionPositions
        op = cls(T(node.children[0]), T(node.children[1]))
    elif isinstance(node, L.DifferenceNode):
        op = Difference(T(node.children[0]), T(node.children[1]))
    elif isinstance(node, L.AliasNode):
        op = Alias(T(node.children[0]), node.names, node.sources)
    elif isinstance(node, L.ValidateNode):
        op = Validate(T(node.children[0]))
    elif isinstance(node, L.AddRowIdsNode):
        op = AddRowIds(T(node.children[0]))
    elif isinstance(node, L.InsertNode):
        op = Insert(node.table_name, T(node.children[0]), catalog)
    elif isinstance(node, L.DeleteNode):
        op = Delete(node.table_name, T(node.children[0]), catalog)
    elif isinstance(node, L.UpdateNode):
        op = Update(node.table_name, T(node.children[0]), T(node.children[1]),
                    catalog)
    elif isinstance(node, (L.CreateViewNode, L.DropViewNode, L.CreateTableNode,
                           L.DropTableNode, L.ShowTablesNode,
                           L.ShowColumnsNode)):
        op = _Maintenance(node, catalog)
    else:
        raise NotImplementedError(f"cannot translate {type(node).__name__}")

    memo[id(node)] = op
    return op
