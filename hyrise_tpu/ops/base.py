"""Physical operator base.

Analogue of the reference's AbstractOperator
(reference: src/lib/operators/abstract_operator.hpp:56-172): an operator has
up to two input operators, executes once, caches one output Table, and
records wall-clock performance data. The task-scheduler integration
(OperatorTask) lives in parallel/scheduler.py; `execute_plan` is the simple
recursive driver (the reference's single-threaded fallback,
current_scheduler.hpp:19-80).
"""

from __future__ import annotations

import time
from typing import List, Optional

from hyrise_tpu.storage.table import Table


class OperatorPerformanceData:
    """Reference: src/lib/operators/operator_performance_data.hpp:12-19."""

    def __init__(self) -> None:
        self.walltime_s: float = 0.0
        self.extra: dict = {}

    def __repr__(self) -> str:
        return f"{self.walltime_s * 1e3:.3f}ms"


class AbstractOperator:
    name = "AbstractOperator"

    def __init__(self, *inputs: "AbstractOperator") -> None:
        assert len(inputs) <= 2
        self.inputs: List[AbstractOperator] = list(inputs)
        self._output: Optional[Table] = None
        self.performance_data = OperatorPerformanceData()
        self.transaction_context = None  # set for read-write operators

    @property
    def left_input(self) -> "AbstractOperator":
        return self.inputs[0]

    @property
    def right_input(self) -> "AbstractOperator":
        return self.inputs[1]

    def input_table(self, side: int = 0) -> Table:
        out = self.inputs[side].get_output()
        assert out is not None, f"input {side} of {self.name} not executed"
        return out

    def execute(self, context=None) -> Table:
        if self._output is not None:
            return self._output
        t0 = time.perf_counter()
        self._output = self._on_execute(context)
        from hyrise_tpu.plan import compiler
        if compiler.active() is None:
            # Block so walltime measures real device work, like the
            # reference's per-operator timing in AbstractOperator::execute().
            # Lazy (not yet materialized) columns are NOT forced — their cost
            # lands on the operator that first reads them. Under whole-plan
            # tracing there is nothing to block on (and walltime is
            # meaningless: the program runs later as one kernel).
            for c in self._output.columns:
                if not c.is_lazy:
                    c.data.block_until_ready()
        self.performance_data.walltime_s = time.perf_counter() - t0
        return self._output

    def get_output(self) -> Optional[Table]:
        return self._output

    def clear_output(self) -> None:
        """Reference: OperatorTask drains predecessors (operator_task.cpp:100-117)."""
        self._output = None

    def _on_execute(self, context) -> Table:
        raise NotImplementedError

    def describe(self, depth: int = 0) -> str:
        pad = "  " * depth
        lines = [f"{pad}{self.name} [{self.performance_data}]"]
        for i in self.inputs:
            lines.append(i.describe(depth + 1))
        return "\n".join(lines)


def execute_plan(root: AbstractOperator, context=None) -> Table:
    """Post-order recursive execution (single-threaded fallback path)."""
    seen = set()

    def walk(op: AbstractOperator):
        if id(op) in seen:
            return
        seen.add(id(op))
        for i in op.inputs:
            walk(i)
        op.execute(context)

    walk(root)
    return root.get_output()
