"""Catalog — the StorageManager equivalent.

Reference: src/lib/storage/storage_manager.hpp:19-66 — a singleton
name→Table map plus LQP views. Here an instantiable class (a module-level
default instance serves the singleton role; tests reset it like the
reference's BaseTest resets StorageManager).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from hyrise_tpu.storage.table import Table


class Catalog:
    def __init__(self) -> None:
        self._tables: Dict[str, Table] = {}
        self._views: Dict[str, object] = {}  # name -> LQP (plan.lqp.LQPNode)

    # Tables
    def add_table(self, name: str, table: Table) -> None:
        if name in self._tables or name in self._views:
            raise ValueError(f"table or view {name!r} already exists")
        table.name = name
        self._tables[name] = table

    def drop_table(self, name: str) -> None:
        if name not in self._tables:
            raise KeyError(f"no such table {name!r}")
        del self._tables[name]

    def get_table(self, name: str) -> Table:
        if name not in self._tables:
            raise KeyError(f"no such table {name!r}")
        return self._tables[name]

    def has_table(self, name: str) -> bool:
        return name in self._tables

    def table_names(self) -> List[str]:
        return sorted(self._tables)

    def replace_table(self, name: str, table: Table) -> None:
        table.name = name
        self._tables[name] = table

    # Views (reference: StorageManager::add_lqp_view)
    def add_view(self, name: str, lqp) -> None:
        if name in self._tables or name in self._views:
            raise ValueError(f"table or view {name!r} already exists")
        self._views[name] = lqp

    def drop_view(self, name: str) -> None:
        del self._views[name]

    def get_view(self, name: str):
        return self._views[name]

    def has_view(self, name: str) -> bool:
        return name in self._views

    def view_names(self) -> List[str]:
        return sorted(self._views)

    def table_statistics(self, name: str):
        """Lazily generated TableStatistics (reference: StorageManager has no
        stats cache; Hyrise generates them per StoredTableNode — we cache
        per table here for the optimizer's PredicateReorderingRule)."""
        t = self.get_table(name)
        stats = getattr(t, "_stats_cache", None)
        if stats is None or getattr(t, "_stats_rows", -1) != t.num_rows:
            from hyrise_tpu.plan.statistics import generate_table_statistics
            stats = generate_table_statistics(t)
            t._stats_cache = stats
            t._stats_rows = t.num_rows
        return stats

    def all_statistics(self):
        return {name: self.table_statistics(name) for name in self._tables}

    def reset(self) -> None:
        self._tables.clear()
        self._views.clear()


_default: Optional[Catalog] = None


def default_catalog() -> Catalog:
    global _default
    if _default is None:
        _default = Catalog()
    return _default


def reset_default_catalog() -> None:
    global _default
    _default = None
