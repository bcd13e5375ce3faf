"""SQL pipeline: parse -> translate -> optimize -> physical plan -> execute.

Reference: src/lib/sql/ —
- SQLPipelineBuilder (sql_pipeline_builder.*): fluent config (disable MVCC,
  custom optimizer, plan cache).
- SQLPipeline / SQLPipelineStatement (sql_pipeline_statement.cpp:49-283):
  per-statement stages with metrics (parse/translate/optimize/compile/
  execute micros), query-plan cache keyed by SQL text, prepared statements
  with parameter substitution, auto-commit for DML.
"""

from __future__ import annotations

import dataclasses
import time
from collections import OrderedDict
from typing import Dict, List, Optional

from hyrise_tpu.concurrency.transaction import (TransactionManager,
                                                default_transaction_manager)
from hyrise_tpu.expression import ast
from hyrise_tpu.ops.base import execute_plan
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.plan.optimizer import Optimizer
from hyrise_tpu.plan.translator import translate_lqp
from hyrise_tpu.sql import parser as P
from hyrise_tpu.sql.translator import (ScalarSubquery, SQLToLQPTranslator,
                                       SQLTranslationError)
from hyrise_tpu.storage.catalog import Catalog, default_catalog
from hyrise_tpu.storage.table import Table


@dataclasses.dataclass
class StatementMetrics:
    """Reference: SQLPipelineStatementMetrics (sql_pipeline.hpp:17-25)."""

    parse_s: float = 0.0
    translate_s: float = 0.0
    optimize_s: float = 0.0
    compile_s: float = 0.0
    execute_s: float = 0.0
    cache_hit: bool = False


class SQLQueryCache:
    """Reference: sql/sql_query_cache.hpp with pluggable eviction policies —
    lru_cache.hpp, lru_k_cache.hpp, gds_cache.hpp, gdfs_cache.hpp,
    random_cache.hpp. Policies:

    - 'lru': least recently used.
    - 'lru_k': evict by oldest K-th most recent access (K=2); entries with
      fewer than K accesses are evicted first (classic LRU-K).
    - 'gds': greedy-dual size — priority = clock + cost/size; on eviction
      the clock advances to the evicted priority (cost/size per entry are
      optional put() args, both 1.0 by default).
    - 'gdfs': greedy-dual frequency-size — priority = clock +
      frequency * cost / size.
    - 'random'.
    """

    K = 2  # LRU-K history depth

    def __init__(self, capacity: int = 256, policy: str = "lru"):
        assert policy in ("lru", "lru_k", "gds", "gdfs", "random")
        self.capacity = capacity
        self.policy = policy
        self._d: OrderedDict = OrderedDict()
        self._freq: Dict = {}
        self._hist: Dict = {}        # lru_k: last K access tick times
        self._cost_size: Dict = {}   # gds/gdfs: (cost, size)
        self._prio: Dict = {}        # gds/gdfs: cached priority
        self._clock = 0.0
        self._tick = 0

    def _touch(self, key):
        self._tick += 1
        if self.policy == "lru":
            self._d.move_to_end(key)
        elif self.policy == "lru_k":
            h = self._hist.setdefault(key, [])
            h.append(self._tick)
            del h[:-self.K]
        elif self.policy in ("gds", "gdfs"):
            self._freq[key] = self._freq.get(key, 0) + 1
            cost, size = self._cost_size.get(key, (1.0, 1.0))
            f = self._freq[key] if self.policy == "gdfs" else 1.0
            self._prio[key] = self._clock + f * cost / size

    def get(self, key):
        if key not in self._d:
            return None
        self._touch(key)
        return self._d[key]

    def put(self, key, value, cost: float = 1.0, size: float = 1.0):
        self._d[key] = value
        if self.policy in ("gds", "gdfs"):
            self._cost_size[key] = (cost, size)
        self._touch(key)
        while len(self._d) > self.capacity:
            self._evict()

    def _evict(self):
        if self.policy == "lru":
            k, _ = self._d.popitem(last=False)
        elif self.policy == "random":
            import random
            k = random.choice(list(self._d))
            del self._d[k]
        elif self.policy == "lru_k":
            # oldest K-th-most-recent access; short histories evict first
            def kth(key):
                h = self._hist.get(key, [])
                return (0, h[-1] if h else 0) if len(h) < self.K \
                    else (1, h[0])
            k = min(self._d, key=kth)
            del self._d[k]
        else:  # gds / gdfs: evict minimum priority, advance the clock to it
            k = min(self._d, key=lambda x: self._prio.get(x, 0.0))
            self._clock = self._prio.get(k, self._clock)
            del self._d[k]
        self._freq.pop(k, None)
        self._hist.pop(k, None)
        self._cost_size.pop(k, None)
        self._prio.pop(k, None)

    def clear(self):
        for d in (self._d, self._freq, self._hist, self._cost_size,
                  self._prio):
            d.clear()


LRUCache = SQLQueryCache  # backwards-compatible alias

_plan_cache = SQLQueryCache()
_prepared: Dict[str, object] = {}


class SQLPipelineStatement:
    def __init__(self, stmt, sql_text: str, catalog: Catalog,
                 tm: TransactionManager, use_mvcc: bool,
                 optimizer: Optional[Optimizer], use_cache: bool,
                 context=None, params: Optional[List[object]] = None,
                 use_compiled: bool = False, dist_catalog=None):
        self.stmt = stmt
        self.sql_text = sql_text
        self.catalog = catalog
        self.tm = tm
        self.use_mvcc = use_mvcc
        self.optimizer = optimizer or Optimizer()
        self.use_cache = use_cache
        self.context = context
        self.params = params
        self.use_compiled = use_compiled
        self.dist_catalog = dist_catalog  # ShardedCatalog -> distributed
        self.metrics = StatementMetrics()

    # -- stages --------------------------------------------------------------

    def get_lqp(self) -> L.LQPNode:
        t0 = time.perf_counter()
        tr = SQLToLQPTranslator(self.catalog, params=self.params)
        lqp = tr.translate(self.stmt)
        if self.use_mvcc:
            lqp = self._insert_validates(lqp)
        self.metrics.translate_s = time.perf_counter() - t0
        return lqp

    def _insert_validates(self, root: L.LQPNode) -> L.LQPNode:
        """Wrap stored MVCC tables in ValidateNodes (the reference's
        translator adds Validate when MVCC is on)."""

        def visit(n: L.LQPNode) -> L.LQPNode:
            if isinstance(n, L.StoredTableNode) and \
                    self.catalog.has_table(n.table_name) and \
                    self.catalog.get_table(n.table_name).mvcc is not None:
                return L.ValidateNode(n)
            return n

        # DML plans already contain their own Validate chain
        if isinstance(root, (L.DeleteNode, L.UpdateNode, L.InsertNode)):
            return root
        return L.map_lqp(root, visit)

    def get_optimized_lqp(self) -> L.LQPNode:
        lqp = self.get_lqp()
        t0 = time.perf_counter()
        if not self.optimizer.stats:
            try:
                self.optimizer.stats = self.catalog.all_statistics()
            except Exception:
                pass
        out = self.optimizer.optimize(lqp, self.catalog)
        self.metrics.optimize_s = time.perf_counter() - t0
        return out

    def _resolve_scalar_subqueries(self, lqp: L.LQPNode) -> None:
        """Execute ScalarSubquery placeholders, substitute literals
        (the reference's uncorrelated PQPSelectExpression evaluation)."""

        def fix_expr(e: ast.Expr) -> ast.Expr:
            if isinstance(e, ScalarSubquery):
                sub_plan = translate_lqp(
                    self.optimizer.optimize(e.lqp, self.catalog), self.catalog)
                t = execute_plan(sub_plan, self.context)
                if t.num_rows == 0:
                    # SQL: an empty scalar subquery evaluates to NULL
                    return ast.lit(None)
                v = t._decode_col(t.columns[0])[0]
                if v is not None and not isinstance(v, str):
                    v = float(v) if hasattr(v, "__float__") and \
                        not isinstance(v, (int,)) else v
                return ast.lit(v if not hasattr(v, "item") else v.item())
            for attr in ("left", "right", "value", "lower", "upper"):
                if hasattr(e, attr) and isinstance(getattr(e, attr), ast.Expr):
                    setattr(e, attr, fix_expr(getattr(e, attr)))
            return e

        def visit(n: L.LQPNode) -> L.LQPNode:
            if isinstance(n, L.PredicateNode):
                n.predicate = fix_expr(n.predicate)
            if isinstance(n, L.ProjectionNode):
                n.outputs = [o if isinstance(o, str) else (o[0], fix_expr(o[1]))
                             for o in n.outputs]
            return n

        L.map_lqp(lqp, visit)

    def get_physical_plan(self):
        # key includes the catalog identity (cached operators hold catalog
        # references); DML is never cached (the reference only caches
        # SELECT pipelines and deep-copies them before reuse)
        cache_key = (self.sql_text, self.use_mvcc, id(self.catalog))
        if isinstance(self.stmt, (P.InsertStmt, P.UpdateStmt, P.DeleteStmt)):
            lqp = self.get_optimized_lqp()
            self._resolve_scalar_subqueries(lqp)
            return translate_lqp(lqp, self.catalog)
        if self.use_cache and self.params is None:
            cached = _plan_cache.get(cache_key)
            if cached is not None:
                self.metrics.cache_hit = True
                # plans cache their outputs -> clear before reuse (the
                # reference deep-copies cached PQPs instead)
                _clear_plan_outputs(cached)
                return cached
        lqp = self.get_optimized_lqp()
        self._resolve_scalar_subqueries(lqp)
        t0 = time.perf_counter()
        plan = translate_lqp(lqp, self.catalog)
        self.metrics.compile_s = time.perf_counter() - t0
        if self.use_cache and self.params is None:
            _plan_cache.put(cache_key, plan)
        return plan

    def execute(self) -> Table:
        if isinstance(self.stmt, P.ExplainStmt):
            import numpy as np
            from hyrise_tpu.storage.table import TableColumnDefinition
            from hyrise_tpu.types import DataType
            inner = SQLPipelineStatement(
                self.stmt.stmt, self.sql_text, self.catalog, self.tm,
                self.use_mvcc, self.optimizer, use_cache=False,
                context=self.context, params=self.params)
            lqp = inner.get_optimized_lqp()
            lines = np.array(lqp.describe().split("\n"), dtype=object)
            return Table.from_arrays(
                "explain", [TableColumnDefinition("plan", DataType.STRING)],
                [lines])
        # prepared statements
        if isinstance(self.stmt, P.PrepareStmt):
            _prepared[self.stmt.name] = self.stmt.stmt
            import numpy as np
            from hyrise_tpu.storage.table import TableColumnDefinition
            from hyrise_tpu.types import DataType
            return Table.from_arrays(
                "ok", [TableColumnDefinition("ok", DataType.INT32)],
                [np.array([], dtype=np.int32)])
        if isinstance(self.stmt, P.ExecuteStmt):
            inner = _prepared.get(self.stmt.name)
            if inner is None:
                raise SQLTranslationError(
                    f"no prepared statement {self.stmt.name!r}")
            vals = []
            for p in self.stmt.params:
                if isinstance(p, P.ELiteral):
                    vals.append(p.value)
                elif isinstance(p, P.EUnary) and p.op == "-" and \
                        isinstance(p.value, P.ELiteral):
                    vals.append(-p.value.value)
                else:
                    raise SQLTranslationError("EXECUTE params must be literals")
            sub = SQLPipelineStatement(
                inner, self.sql_text + repr(vals), self.catalog, self.tm,
                self.use_mvcc, self.optimizer, use_cache=False,
                context=self.context, params=vals)
            out = sub.execute()
            self.metrics = sub.metrics
            return out

        needs_tx = isinstance(self.stmt, (P.InsertStmt, P.UpdateStmt,
                                          P.DeleteStmt)) or self.use_mvcc
        auto_commit = False
        context = self.context
        if needs_tx and context is None:
            context = self.tm.new_transaction_context()
            auto_commit = isinstance(self.stmt, (P.InsertStmt, P.UpdateStmt,
                                                 P.DeleteStmt))
        plan = self.get_physical_plan()
        self.last_plan = plan  # retained for profiling / visualization
        t0 = time.perf_counter()
        try:
            result = self._execute_plan(plan, context, needs_tx)
        except Exception:
            if context is not None and auto_commit:
                try:
                    context.rollback()
                except Exception:
                    pass
            raise
        self.metrics.execute_s = time.perf_counter() - t0
        if auto_commit:
            context.commit()
        return result

    def _execute_plan(self, plan, context, needs_tx: bool) -> Table:
        """Whole-plan compiled execution for read-only plans (one jitted
        program per query, plan/compiler.py — the reference's JitOperator
        path); eager per-operator dispatch otherwise or on fallback. The
        CompiledQuery (with its learned capacities) rides on the cached
        plan object, so repeated executions re-trace nothing."""
        if self.dist_catalog is not None and not needs_tx:
            from hyrise_tpu.parallel.dist_compiler import \
                DistributedCompiledQuery
            from hyrise_tpu.plan.compiler import PlanNotCompilable
            try:
                dq = getattr(plan, "_dist_query", None)
                if dq is None or dq.shard_cat is not self.dist_catalog:
                    dq = DistributedCompiledQuery(plan, self.dist_catalog)
                    plan._dist_query = dq
                return dq.run()
            except PlanNotCompilable:
                _clear_plan_outputs(plan)
        if self.use_compiled and not needs_tx:
            from hyrise_tpu.plan.compiler import (CAP_SEEDS, GATHER_SEEDS,
                                                  CompiledQuery,
                                                  PlanNotCompilable)
            try:
                cq = getattr(plan, "_compiled_query", None)
                if cq is None:
                    cq = CompiledQuery(plan, self.catalog)
                    seed = CAP_SEEDS.get(self.sql_text)
                    if seed:  # pre-learned capacity vector (e.g. on CPU):
                        cq.caps[:] = seed  # one device compile, no retraces
                    gseed = GATHER_SEEDS.get(self.sql_text)
                    if gseed:  # pre-learned gather consumed-column sets
                        cq.seed_gathers(gseed)
                    plan._compiled_query = cq
                return cq.run()
            except PlanNotCompilable:
                _clear_plan_outputs(plan)
        return execute_plan(plan, context)


def _clear_plan_outputs(plan) -> None:
    seen = set()

    def walk(op):
        if id(op) in seen:
            return
        seen.add(id(op))
        op.clear_output()
        for i in op.inputs:
            walk(i)

    walk(plan)


class SQLPipeline:
    """Multi-statement pipeline (reference: sql_pipeline.cpp)."""

    def __init__(self, sql: str, catalog: Catalog, tm: TransactionManager,
                 use_mvcc: bool, optimizer: Optional[Optimizer],
                 use_cache: bool, context=None, use_compiled: bool = False,
                 dist_catalog=None, params: Optional[List[object]] = None):
        t0 = time.perf_counter()
        self.statements = P.parse_sql(sql)
        self.parse_s = time.perf_counter() - t0
        self._sql = sql
        self._args = (catalog, tm, use_mvcc, optimizer, use_cache, context,
                      use_compiled, dist_catalog, params)
        self.pipeline_statements: List[SQLPipelineStatement] = []

    def get_result_table(self) -> Table:
        (catalog, tm, use_mvcc, optimizer, use_cache, context,
         use_compiled, dist_catalog, params) = self._args
        result: Optional[Table] = None
        for stmt in self.statements:
            ps = SQLPipelineStatement(stmt, self._sql, catalog, tm, use_mvcc,
                                      optimizer, use_cache, context,
                                      params=params,
                                      use_compiled=use_compiled,
                                      dist_catalog=dist_catalog)
            ps.metrics.parse_s = self.parse_s / max(len(self.statements), 1)
            self.pipeline_statements.append(ps)
            result = ps.execute()
        assert result is not None, "empty SQL pipeline"
        return result


class SQLPipelineBuilder:
    """Reference: sql/sql_pipeline_builder.hpp fluent API."""

    def __init__(self, sql: str):
        self.sql = sql
        self._catalog: Optional[Catalog] = None
        self._tm: Optional[TransactionManager] = None
        self._use_mvcc = False
        self._optimizer: Optional[Optimizer] = None
        self._use_cache = True
        self._context = None
        import os
        self._use_compiled = os.environ.get("HYRISE_COMPILED", "") == "1"
        self._dist_catalog = None
        self._params: Optional[List[object]] = None

    def with_catalog(self, catalog: Catalog) -> "SQLPipelineBuilder":
        self._catalog = catalog
        return self

    def with_transaction_manager(self, tm) -> "SQLPipelineBuilder":
        self._tm = tm
        return self

    def with_mvcc(self, enabled: bool = True) -> "SQLPipelineBuilder":
        self._use_mvcc = enabled
        return self

    def disable_mvcc(self) -> "SQLPipelineBuilder":
        self._use_mvcc = False
        return self

    def with_optimizer(self, optimizer: Optimizer) -> "SQLPipelineBuilder":
        self._optimizer = optimizer
        return self

    def with_transaction_context(self, context) -> "SQLPipelineBuilder":
        self._context = context
        return self

    def dont_cache_query_plans(self) -> "SQLPipelineBuilder":
        self._use_cache = False
        return self

    def with_compiled_execution(self, enabled: bool = True
                                ) -> "SQLPipelineBuilder":
        """Execute read-only plans as one jitted program (whole-plan
        compilation). Default from env HYRISE_COMPILED=1."""
        self._use_compiled = enabled
        return self

    def with_distributed_execution(self, shard_catalog
                                   ) -> "SQLPipelineBuilder":
        """Execute read-only plans over a ShardedCatalog as ONE
        shard_map program per query (parallel/dist_compiler.py). The
        ShardedCatalog's table names must cover the plan's base tables."""
        self._dist_catalog = shard_catalog
        return self

    def with_params(self, params: Optional[List[object]]
                    ) -> "SQLPipelineBuilder":
        """Typed values for `?` placeholders, substituted as literal AST
        nodes at translation time (NO textual splicing — a string value
        containing quotes or `?` is just a string literal). The server's
        extended-protocol Bind rides this path (reference:
        server_session.cpp:67-110 typed parameter handling)."""
        self._params = params
        return self

    def create_pipeline(self) -> SQLPipeline:
        return SQLPipeline(
            self.sql,
            self._catalog if self._catalog is not None else default_catalog(),
            self._tm if self._tm is not None else
            default_transaction_manager(),
            self._use_mvcc, self._optimizer, self._use_cache, self._context,
            use_compiled=self._use_compiled,
            dist_catalog=self._dist_catalog, params=self._params)


def run_sql(sql: str, catalog: Optional[Catalog] = None, context=None,
            use_mvcc: bool = False) -> Table:
    b = SQLPipelineBuilder(sql)
    if catalog is not None:
        b.with_catalog(catalog)
    if context is not None:
        b.with_transaction_context(context)
    if use_mvcc:
        b.with_mvcc(True)
    return b.create_pipeline().get_result_table()
