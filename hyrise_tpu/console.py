"""Interactive SQL console.

Reference: src/bin/console/console.cpp (readline REPL; commands: generate,
load, script, print, visualize, begin/rollback/commit, txinfo, setting,
help, exit; SQL via SQLPipeline with explicit transaction support).
"""

from __future__ import annotations

import shlex
import sys
import time
from typing import Optional

from hyrise_tpu.concurrency.transaction import default_transaction_manager
from hyrise_tpu.ops.print_op import format_table
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
from hyrise_tpu.storage.catalog import default_catalog


class Console:
    PROMPT = "> "

    def __init__(self, out=None):
        self.catalog = default_catalog()
        self.tm = default_transaction_manager()
        self.context = None
        self.out = out or sys.stdout
        # MVCC validation on by default, like the reference console —
        # otherwise DML appears ineffective (deleted rows stay visible).
        self.use_mvcc = True
        self.last_plan = None

    def println(self, *a):
        print(*a, file=self.out)

    # -- command dispatch ----------------------------------------------------

    def handle(self, line: str) -> bool:
        """Returns False when the console should exit."""
        line = line.strip()
        if not line:
            return True
        if line.startswith("."):  # dot-commands operate like the reference's
            return self._command(line[1:])
        for word, fn in (("generate", self._cmd_generate),
                         ("load", self._cmd_load),
                         ("script", self._cmd_script),
                         ("print", self._cmd_print),
                         ("visualize", self._cmd_visualize),
                         ("begin", self._cmd_begin),
                         ("rollback", self._cmd_rollback),
                         ("commit", self._cmd_commit),
                         ("txinfo", self._cmd_txinfo),
                         ("setting", self._cmd_setting),
                         ("help", self._cmd_help),
                         ("quit", None), ("exit", None)):
            if line.lower() == word or line.lower().startswith(word + " "):
                if fn is None:
                    return False
                fn(line[len(word):].strip())
                return True
        self._run_sql(line)
        return True

    def _command(self, cmd: str) -> bool:
        if cmd in ("quit", "exit"):
            return False
        self.println(f"unknown command .{cmd}")
        return True

    # -- commands ------------------------------------------------------------

    def _cmd_generate(self, arg: str):
        """generate [tpch|tpcc] [scale_factor]"""
        parts = arg.split()
        kind = parts[0] if parts else "tpch"
        sf = float(parts[1]) if len(parts) > 1 else 0.01
        t0 = time.time()
        if kind == "tpcc":
            from hyrise_tpu.tpcc.generator import generate_tpcc_tables
            tables = generate_tpcc_tables(max(int(sf), 1))
        else:
            from hyrise_tpu.tpch.dbgen import generate_tables
            tables = generate_tables(sf)
        for name, t in tables.items():
            if self.catalog.has_table(name):
                self.catalog.drop_table(name)
            self.catalog.add_table(name, t)
        self.println(f"generated {len(tables)} {kind} tables "
                     f"(sf={sf}) in {time.time() - t0:.1f}s")

    def _cmd_load(self, arg: str):
        """load FILE [NAME] — .tbl / .csv / .npz"""
        parts = shlex.split(arg)
        path = parts[0]
        name = parts[1] if len(parts) > 1 else path.rsplit("/", 1)[-1] \
            .split(".")[0]
        if path.endswith(".tbl"):
            from hyrise_tpu.storage.load_table import load_table
            t = load_table(path, name)
        elif path.endswith(".csv"):
            from hyrise_tpu.ops.import_export import load_csv
            t = load_csv(path, name)
        else:
            from hyrise_tpu.ops.import_export import load_binary
            t = load_binary(path, name)
        if self.catalog.has_table(name):
            self.catalog.drop_table(name)
        self.catalog.add_table(name, t)
        self.println(f"loaded {name}: {t.num_rows} rows")

    def _cmd_script(self, arg: str):
        with open(arg) as f:
            for line in f:
                if not self.handle(line.rstrip("\n")):
                    break

    def _cmd_print(self, arg: str):
        t = self.catalog.get_table(arg)
        self.println(format_table(t))

    def _cmd_visualize(self, arg: str):
        """visualize [lqp|pqp] SQL"""
        from hyrise_tpu.plan.optimizer import Optimizer
        from hyrise_tpu.plan.translator import translate_lqp
        from hyrise_tpu.sql.parser import parse_sql
        from hyrise_tpu.sql.translator import SQLToLQPTranslator
        from hyrise_tpu.utils.visualize import lqp_to_dot, pqp_to_dot, render_dot

        parts = arg.split(None, 1)
        kind = "lqp"
        sql = arg
        if parts and parts[0] in ("lqp", "pqp"):
            kind, sql = parts[0], parts[1]
        stmt = parse_sql(sql)[0]
        lqp = SQLToLQPTranslator(self.catalog).translate(stmt)
        lqp = Optimizer().optimize(lqp, self.catalog)
        if kind == "lqp":
            dot = lqp_to_dot(lqp)
        else:
            plan = translate_lqp(lqp, self.catalog)
            dot = pqp_to_dot(plan)
        path = render_dot(dot, f"/tmp/hyrise_tpu_{kind}")
        self.println(f"wrote {path}")

    def _cmd_begin(self, arg: str):
        if self.context is not None:
            self.println("already in a transaction")
            return
        self.context = self.tm.new_transaction_context()
        self.println(f"transaction {int(self.context.transaction_id)} started")

    def _cmd_rollback(self, arg: str):
        if self.context is None:
            self.println("no open transaction")
            return
        self.context.rollback()
        self.context = None
        self.println("rolled back")

    def _cmd_commit(self, arg: str):
        if self.context is None:
            self.println("no open transaction")
            return
        self.context.commit()
        self.println(f"committed at cid {int(self.context.commit_id)}")
        self.context = None

    def _cmd_txinfo(self, arg: str):
        if self.context is None:
            self.println("auto-commit mode (no explicit transaction)")
        else:
            c = self.context
            self.println(f"tid={int(c.transaction_id)} "
                         f"snapshot_cid={int(c.snapshot_commit_id)} "
                         f"phase={c.phase.value}")

    def _cmd_setting(self, arg: str):
        parts = arg.split()
        if len(parts) == 2 and parts[0] == "mvcc":
            self.use_mvcc = parts[1] in ("on", "true", "1")
            self.println(f"mvcc = {self.use_mvcc}")
            return
        self.println("settings: mvcc on|off")

    def _cmd_help(self, arg: str):
        self.println("""commands:
  generate [tpch|tpcc] [sf]   generate benchmark tables
  load FILE [NAME]            load .tbl/.csv/.npz into the catalog
  script FILE                 run commands from a file
  print TABLE                 dump a table
  visualize [lqp|pqp] SQL     write a plan graph (graphviz)
  begin / commit / rollback   explicit transactions
  txinfo                      show transaction state
  setting mvcc on|off         toggle MVCC validation
  help, quit                  this help / exit
anything else is executed as SQL""")

    # -- SQL -----------------------------------------------------------------

    def _run_sql(self, sql: str):
        t0 = time.time()
        try:
            b = SQLPipelineBuilder(sql).with_catalog(self.catalog) \
                .with_transaction_manager(self.tm)
            if self.use_mvcc:
                b.with_mvcc(True)
            if self.context is not None:
                b.with_transaction_context(self.context)
            result = b.create_pipeline().get_result_table()
            self.println(format_table(result))
            self.println(f"({(time.time() - t0) * 1e3:.1f}ms)")
        except Exception as e:
            self.println(f"error: {e}")

    def repl(self):
        self.println("hyrise_tpu console — 'help' for commands")
        while True:
            try:
                line = input(self.PROMPT)
            except (EOFError, KeyboardInterrupt):
                break
            if not self.handle(line):
                break


def main():
    Console().repl()


if __name__ == "__main__":
    main()
