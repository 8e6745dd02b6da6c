"""Interactive SQL shell over Engine (the reference's `litebase sql`
TUI, pkg/cli/cmd/sql.go — behavioral analog: a line-oriented REPL that
runs statements against one database/branch, prints aligned tables, and
keeps history).

Design for testability: the REPL core is `Shell.run(lines)` over any
iterable of input lines writing to any file-like sink, so tests drive it
without a TTY. `main()` wires stdin/stdout and readline history.

Meta-commands (SQLite-shell dialect the reference's users know):
  .tables [pattern]   list tables
  .schema <table>     show columns
  .mode table|csv     output format
  .timer on|off       per-statement latency
  .eqp on|off         EXPLAIN QUERY PLAN preamble
  .changes            print `changes` after DML
  .help               this text
  .quit / .exit       leave
Statements may span lines and end with `;` — same continuation rule as
the reference shell's input frame.
"""

from __future__ import annotations

import sys

from litebase_spark.engine import Engine

_HELP = """\
.tables [pattern]   list tables
.schema <table>     show columns and types
.mode table|csv     set output format
.timer on|off       toggle per-statement latency
.eqp on|off         print EXPLAIN QUERY PLAN before each query
.changes            toggle printing `changes` after DML
.indexes [table]    list declared indexes
.metrics            per-statement latency telemetry (query logs)
.help               show this help
.quit / .exit       leave the shell"""


def format_table(columns: list[str], rows: list) -> str:
    """Aligned text table (the shell's default output mode)."""
    cells = [[("" if v is None else str(v)) for v in row] for row in rows]
    widths = [
        max([len(c)] + [len(r[i]) for r in cells])
        for i, c in enumerate(columns)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep]
    out.append(
        "|" + "|".join(f" {c.ljust(w)} " for c, w in zip(columns, widths)) + "|"
    )
    out.append(sep)
    for r in cells:
        out.append(
            "|" + "|".join(f" {v.ljust(w)} " for v, w in zip(r, widths)) + "|"
        )
    out.append(sep)
    return "\n".join(out)


def format_csv(columns: list[str], rows: list) -> str:
    import csv
    import io

    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(columns)
    for r in rows:
        w.writerow(["" if v is None else v for v in r])
    return buf.getvalue().rstrip("\n")


class Shell:
    def __init__(self, engine: Engine, out=None) -> None:
        self.engine = engine
        self.out = out or sys.stdout
        self.mode = "table"
        self.timer = False
        self.eqp = False
        self.show_changes = True

    def _p(self, text: str = "") -> None:
        print(text, file=self.out)

    # -- meta-commands ------------------------------------------------------

    def _meta(self, line: str) -> bool:
        """Handle a .command; returns False to exit the loop."""
        parts = line.split()
        cmd, args = parts[0], parts[1:]
        if cmd in (".quit", ".exit"):
            return False
        if cmd == ".help":
            self._p(_HELP)
        elif cmd == ".tables":
            pattern = args[0] if args else None
            names = [
                t.name
                for t in self.engine.spark.catalog.listTables()
                if pattern is None or pattern.lower() in t.name.lower()
            ]
            self._p("  ".join(sorted(names)))
        elif cmd == ".schema":
            if not args:
                self._p("usage: .schema <table>")
            else:
                try:
                    df = self.engine.spark.table(args[0])
                    self._p(
                        format_table(
                            ["column", "type"],
                            [(f.name, f.dataType.simpleString()) for f in df.schema.fields],
                        )
                    )
                except Exception as e:
                    self._p(f"error: {str(e).splitlines()[0]}")
        elif cmd == ".mode":
            if args and args[0] in ("table", "csv"):
                self.mode = args[0]
            else:
                self._p("usage: .mode table|csv")
        elif cmd == ".timer":
            self.timer = bool(args and args[0] == "on")
        elif cmd == ".eqp":
            # sqlite3 shell parity: print EXPLAIN QUERY PLAN before each
            # subsequent statement (sqlite.org/cli.html#index_eqp)
            self.eqp = bool(args and args[0] == "on")
        elif cmd == ".changes":
            self.show_changes = not self.show_changes
        elif cmd == ".indexes":
            # sqlite3 shell parity (sqlite.org/cli.html): list declared
            # indexes, optionally filtered to one table
            table = args[0] if args else None
            names = sorted(
                name
                for name, meta in self.engine._indexes.items()
                if table is None or meta["table"] == table
            )
            self._p("  ".join(names))
        elif cmd == ".metrics":
            # reference CLI `database query logs` analog: the engine's
            # per-statement-hash latency telemetry (count/avg/min/max/
            # p50/p90/p99 — pkg/logs/query_metric.go:14-28) as a table
            df = self.engine.query_metrics()
            rows = [tuple(r) for r in df.collect()]
            self._p(format_table(df.columns, rows))
        else:
            self._p(f"unknown command {cmd} (try .help)")
        return True

    # -- statements ---------------------------------------------------------

    def _execute(self, statement: str) -> None:
        from litebase_spark.engine import classify_statement

        if self.eqp and classify_statement(statement) == "DQL":
            try:
                for r in self.engine.sql(
                    f"EXPLAIN QUERY PLAN {statement}"
                ).rows:
                    self._p(f"{r.id}|{r.parent}|{r.notused}|{r.detail}")
            except Exception as e:
                self._p(f"eqp error: {str(e).splitlines()[0]}")
        try:
            res = self.engine.sql(statement)
        except Exception as e:
            self._p(f"error: {str(e).splitlines()[0]}")
            return
        if res.rows:
            fmt = format_csv if self.mode == "csv" else format_table
            self._p(fmt(res.columns, res.rows))
        if res.statement_class == "DML" and self.show_changes:
            self._p(f"changes: {res.changes}")
        if self.timer:
            self._p(f"elapsed: {res.latency * 1000:.1f} ms")

    def run(self, lines) -> None:
        """Drive the REPL from an iterable of input lines."""
        buf: list[str] = []
        for raw in lines:
            line = raw.rstrip("\n")
            if not buf and not line.strip():
                continue
            if not buf and line.lstrip().startswith("."):
                if not self._meta(line.strip()):
                    return
                continue
            buf.append(line)
            joined = "\n".join(buf)
            if joined.rstrip().endswith(";"):
                self._execute(joined.rstrip().rstrip(";"))
                buf = []
        if buf:  # trailing statement without ';' (EOF) still runs
            self._execute("\n".join(buf))


def main() -> int:
    """litebase-spark sql shell: reads stdin, UTC session, history via
    readline when interactive."""
    from litebase_spark.session import get_spark

    try:
        import readline  # noqa: F401  (line editing when on a TTY)
    except ImportError:
        pass
    spark = get_spark("litebase-sql-shell")
    shell = Shell(Engine(spark=spark))
    if sys.stdin.isatty():
        print("litebase-spark sql shell — .help for commands, .quit to exit")

        def prompt_lines():
            while True:
                try:
                    yield input("sql> ")
                except EOFError:
                    return

        shell.run(prompt_lines())
    else:
        shell.run(sys.stdin)
    return 0


if __name__ == "__main__":
    sys.exit(main())
