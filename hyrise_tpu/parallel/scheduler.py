"""Operator DAG scheduler.

Reference: src/lib/scheduler/ —
- AbstractTask with predecessor/successor edges, ready when
  _pending_predecessors == 0 (abstract_task.hpp:36-146),
- OperatorTask wrapping one operator (operator_task.cpp:25-58:
  make_tasks_from_operator does a post-order DAG walk),
- NodeQueueScheduler with per-NUMA-node queues + worker threads
  (node_queue_scheduler.cpp:30-122),
- CurrentScheduler static facade with an execute-immediately fallback
  (current_scheduler.hpp:19-80).

TPU redesign: device work is async under XLA already, so workers exist to
overlap HOST-side work (expression compilation, count syncs, dispatch) of
INDEPENDENT plan branches. A small thread pool replaces per-NUMA queues —
placement is the mesh's job (parallel/partition.py), not the scheduler's.
The single-threaded fallback (no scheduler set) executes inline, like the
reference.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Dict, List, Optional

from hyrise_tpu.ops.base import AbstractOperator
from hyrise_tpu.storage.table import Table


class OperatorTask:
    """Reference: scheduler/operator_task.hpp — one task per operator."""

    def __init__(self, op: AbstractOperator):
        self.op = op
        self.predecessors: List["OperatorTask"] = []
        self.successors: List["OperatorTask"] = []
        self._undrained = 0  # successors that still need our output

    def mark_drained_by(self, successor: "OperatorTask") -> None:
        """Reference: operator_task.cpp:100-117 — once every successor has
        executed, the cached output Table (and its device buffers) is
        dropped so long chains don't hold every intermediate in HBM. Leaf
        fetches (GetTable/TableWrapper) just reference catalog-owned
        tables, so clearing them releases nothing but is harmless."""
        self._undrained -= 1
        if self._undrained == 0:
            self.op.clear_output()

    def set_as_predecessor_of(self, other: "OperatorTask") -> None:
        self.successors.append(other)
        other.predecessors.append(self)

    @staticmethod
    def make_tasks_from_operator(root: AbstractOperator) -> List["OperatorTask"]:
        """Post-order DAG walk; shared sub-operators become one task
        (reference: operator_task.cpp:25-58)."""
        tasks: Dict[int, OperatorTask] = {}
        order: List[OperatorTask] = []

        def walk(op: AbstractOperator) -> OperatorTask:
            if id(op) in tasks:
                return tasks[id(op)]
            t = OperatorTask(op)
            tasks[id(op)] = t
            for i in op.inputs:
                walk(i).set_as_predecessor_of(t)
            order.append(t)
            return t

        walk(root)
        for t in order:
            t._undrained = len(t.successors)
        return order


class JobTask:
    """Reference: scheduler/job_task.hpp — a schedulable lambda. Used by
    maintenance work (tasks.ChunkCompressionTask, placement migrations)
    that isn't an operator DAG. schedule() runs through the current
    scheduler's thread pool when one is set, else inline; join() waits and
    re-raises."""

    def __init__(self, fn):
        self.fn = fn
        self._future: Optional[Future] = None
        self._result = None
        self._ran = False

    def schedule(self) -> "JobTask":
        sched = current_scheduler()
        pool = getattr(sched, "_job_pool", None)
        if isinstance(sched, PoolScheduler):
            if pool is None:
                pool = ThreadPoolExecutor(max_workers=sched.workers)
                sched._job_pool = pool
            self._future = pool.submit(self.fn)
        else:
            self._result = self.fn()
            self._ran = True
        return self

    def join(self):
        if self._future is not None:
            return self._future.result()
        assert self._ran, "join() before schedule()"
        return self._result


class ImmediateScheduler:
    """Single-threaded fallback (reference: AbstractTask::schedule() with no
    scheduler set executes on the caller)."""

    def schedule_and_wait(self, tasks: List[OperatorTask], context=None,
                          drain: bool = True) -> None:
        for t in tasks:  # already topologically ordered (post-order)
            t.op.execute(context)
            if drain:
                for p in t.predecessors:
                    p.mark_drained_by(t)


class PoolScheduler:
    """Thread-pool DAG scheduler (reference: NodeQueueScheduler). Tasks run
    as soon as all predecessors finished; independent branches overlap."""

    def __init__(self, workers: int = 4):
        self.workers = workers

    def schedule_and_wait(self, tasks: List[OperatorTask], context=None,
                          drain: bool = True) -> None:
        pending = {id(t): len(t.predecessors) for t in tasks}
        lock = threading.Lock()
        done = threading.Event()
        remaining = [len(tasks)]
        errors: List[BaseException] = []

        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            def run(task: OperatorTask):
                try:
                    task.op.execute(context)
                except BaseException as e:  # propagate to caller
                    with lock:
                        errors.append(e)
                        done.set()
                    return
                ready = []
                with lock:
                    if drain:
                        for p in task.predecessors:
                            p.mark_drained_by(task)
                    remaining[0] -= 1
                    if remaining[0] == 0:
                        done.set()
                    for s in task.successors:
                        pending[id(s)] -= 1
                        if pending[id(s)] == 0:
                            ready.append(s)
                for s in ready:
                    pool.submit(run, s)

            roots = [t for t in tasks if not t.predecessors]
            if not roots:
                return
            for r in roots:
                pool.submit(run, r)
            done.wait()
        if errors:
            raise errors[0]


_current: Optional[object] = None


def set_scheduler(s) -> None:
    """Reference: CurrentScheduler::set()."""
    global _current
    _current = s


def current_scheduler():
    return _current if _current is not None else ImmediateScheduler()


def schedule_plan(root: AbstractOperator, context=None,
                  drain: bool = True) -> Table:
    """Execute a plan through the current scheduler. With `drain` (the
    default, matching the reference's OperatorTask), every intermediate
    output is released as soon as its last consumer has executed — only
    the root's result survives."""
    tasks = OperatorTask.make_tasks_from_operator(root)
    current_scheduler().schedule_and_wait(tasks, context, drain=drain)
    return root.get_output()
