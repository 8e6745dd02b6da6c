"""Engine — the service-level surface of the reference, Spark-first.

Maps litebase's query lifecycle (SURVEY §3.1) onto a SparkSession:

  * ``Engine.sql(statement, params)`` — parse/bind/execute/collect with a
    result envelope mirroring the reference's response shape
    (``changes``, ``row_count``, ``columns``, ``latency`` — reference:
    pkg/database/query_response.go:15-50).
  * Parameter binding — positional ``?`` and named ``:name`` over the five
    SQLite storage classes INTEGER/FLOAT/TEXT/BLOB/NULL (reference:
    pkg/sqlite3/statement.go:103-159), implemented with Spark's native
    parameterized ``spark.sql(sql, args=...)``.
  * Statement classification — read/write routing analog of the
    reference's prefix classifier (reference: pkg/database/query.go:46-102);
    here it only gates writes and feeds metrics, since Spark's driver is
    the single writer (the reference's write queue / primary forwarding —
    pkg/database/write_queue.go, resolver.go:205-262 — collapse to this).
  * Query metrics — per-statement-hash latency aggregation with
    count/avg/min/max/p50/p90/p99, the reference's telemetry shape
    (reference: pkg/logs/query_metric.go:14-28), queryable as a DataFrame.
  * Databases/branches — namespace management in the session catalog
    (reference: pkg/database/system_database.go:98-131); branch forking is
    snapshot-copy of a namespace location.
"""

from __future__ import annotations

import re
import time
import zlib
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession

from litebase_spark.session import get_spark

# Statement-prefix classes, mirroring reference pkg/database/query.go:46-102
# (IsDDL/IsDML/IsDQL/IsPragma/IsVacuum/IsBegin/IsCommit/IsRollback).
_DDL_PREFIXES = (
    "CREATE", "ALTER", "DROP", "TRUNCATE", "REPLACE", "ATTACH", "DETACH",
)
_DML_PREFIXES = ("INSERT", "UPDATE", "DELETE", "MERGE", "REPLACE")
_DQL_PREFIXES = ("SELECT", "WITH", "VALUES", "TABLE", "DESCRIBE", "SHOW", "EXPLAIN")
_TCL_PREFIXES = ("BEGIN", "COMMIT", "END", "ROLLBACK", "SAVEPOINT", "RELEASE")


def classify_statement(sql: str) -> str:
    """Classify a statement DDL/DML/DQL/PRAGMA/VACUUM/TCL/OTHER (analog of
    reference pkg/database/query.go:46-102 prefix classification, which
    routes reads vs writes and gates PRAGMA/VACUUM)."""
    head = sql.lstrip().split(None, 2)
    kw = head[0].upper() if head else ""
    if kw == "REPLACE":
        # REPLACE INTO is SQLite DML (alias of INSERT OR REPLACE);
        # REPLACE TABLE stays DDL
        second = head[1].upper() if len(head) > 1 else ""
        return "DML" if second == "INTO" else "DDL"
    if kw in _DDL_PREFIXES:
        return "DDL"
    if kw in _DML_PREFIXES:
        return "DML"
    if kw in _DQL_PREFIXES:
        return "DQL"
    if kw == "PRAGMA":
        return "PRAGMA"
    if kw == "VACUUM":
        return "VACUUM"
    if kw in _TCL_PREFIXES:
        return "TCL"
    if kw in ("ANALYZE", "REINDEX"):
        return "MAINT"
    return "OTHER"


def is_write(sql: str) -> bool:
    return classify_statement(sql) in ("DDL", "DML")


_SQLITE_CAST_TYPES = {
    # SQLite type name -> Spark type. INTEGER maps to BIGINT because
    # SQLite's INTEGER storage class is 64-bit.
    "TEXT": "STRING",
    "BLOB": "BINARY",
}

# SQLite CAST applies *prefix parsing*: CAST('42abc' AS INTEGER) = 42,
# CAST('3.7xyz' AS REAL) = 3.7, CAST('junk' AS INTEGER) = 0 (see
# sqlite.org/lang_expr.html#castexpr; the reference binds through
# pkg/sqlite3/statement.go:103-159 over dynamically-typed storage).
# The rewrite tries, in order: Spark's native cast (covers numeric
# operands and clean strings, including int64 that a double round-trip
# would corrupt, and double->bigint clamping at +/-2^63 like SQLite);
# a double parse (clean real strings like '3.9' -> 3); the longest
# numeric prefix; then SQLite's 0 default. NUMERIC stays DOUBLE-typed
# (Spark columns are statically typed — documented deviation: SQLite
# would narrow 42.0 back to integer 42).
# NB: these are SQL string literals — Spark's parser unescapes '\\s'
# to the regex \s (escapedStringLiterals is off by default).
_INT_PREFIX_RX = r"^\\s*([+-]?[0-9]+)"
_REAL_PREFIX_RX = (
    r"^\\s*[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?"
)


def _int_affinity(x: str) -> str:
    # Numeric operands vs text operands need different rules (SQLite
    # dispatches on the runtime storage class; Spark types are static):
    # a REAL value truncates toward zero (1.23e7 -> 12300000, clamping
    # at +/-2^63), but TEXT parses only the INTEGER prefix — exponents
    # are junk ('1e3' -> 1). The double round-trip guard separates the
    # two at runtime: a numeric operand's string form IS its canonical
    # double rendering, so equality selects the numeric path; any other
    # text falls to prefix parsing. (A string that happens to equal a
    # canonical exponent rendering like '1.0E20' takes the numeric path
    # — the one residue of static typing; documented in COVERAGE.md.)
    s = f"CAST({x} AS STRING)"
    d = f"TRY_CAST({x} AS DOUBLE)"
    return (
        f"CASE WHEN {d} IS NOT NULL AND CAST({d} AS STRING) = {s} "
        f"THEN CAST({d} AS BIGINT) "
        f"ELSE COALESCE("
        f"TRY_CAST({x} AS BIGINT), "
        f"TRY_CAST(regexp_extract({s}, '{_INT_PREFIX_RX}', 1) AS BIGINT), "
        f"CAST(TRY_CAST(regexp_extract({s}, '{_REAL_PREFIX_RX}', 0) "
        f"AS DOUBLE) AS BIGINT), "
        f"CAST(0 AS BIGINT)) END"
    )


def _real_affinity(x: str) -> str:
    return (
        f"COALESCE(TRY_CAST({x} AS DOUBLE), "
        f"TRY_CAST(regexp_extract(CAST({x} AS STRING), "
        f"'{_REAL_PREFIX_RX}', 0) AS DOUBLE), CAST(0.0 AS DOUBLE))"
    )


def _rewrite_sqlite_casts(sql: str) -> str:
    """Map SQLite CAST semantics onto Spark: type-name translation for
    TEXT/BLOB, full prefix-parsing affinity for INTEGER/REAL/NUMERIC.

    Scoped strictly to CAST expressions (depth-tracked to the matching
    close paren), so a column alias that happens to be named `text` is
    never touched — the fixtures' documents.text would otherwise be a
    landmine for a blanket regex."""
    import re as _re

    out = []
    i = 0
    pat = _re.compile(r"(?is)\bCAST\s*\(")
    tail = _re.compile(
        r"(?is)(\bAS\s+)(TEXT|REAL|BLOB|NUMERIC|INTEGER)(\s*)$"
    )
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            return "".join(out)
        depth, j = 1, m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        inner = _rewrite_sqlite_casts(sql[m.end():j - 1])
        tm = tail.search(inner)
        if tm:
            ty = tm.group(2).upper()
            operand = inner[: tm.start()].rstrip()
            if ty == "INTEGER":
                out.append(sql[i:m.start()])
                out.append(_int_affinity(operand))
                i = j
                continue
            if ty in ("REAL", "NUMERIC"):
                out.append(sql[i:m.start()])
                out.append(_real_affinity(operand))
                i = j
                continue
            inner = (inner[: tm.start()] + tm.group(1)
                     + _SQLITE_CAST_TYPES[ty]
                     + tm.group(3))
        out.append(sql[i:m.end()])
        out.append(inner)
        out.append(sql[j - 1:j])
        i = j


@dataclass
class QueryResult:
    """Result envelope mirroring reference pkg/database/query_response.go:15-50."""

    columns: list[str]
    rows: list[Row]
    row_count: int
    changes: int
    latency: float
    statement_class: str

    def __iter__(self):
        return iter(self.rows)


@dataclass
class _MetricAccumulator:
    statement: str
    count: int = 0
    total: float = 0.0
    vmin: float = float("inf")
    vmax: float = 0.0
    latencies: list[float] = field(default_factory=list)


class QueryMetrics:
    """Per-statement-hash latency telemetry (reference
    pkg/logs/query_metric.go:14-46 keeps count/avg/min/max/p50/p90/p99 in
    64-byte records keyed by statement hash; we keep exact samples locally
    and aggregate with percentile_approx when reading back at scale)."""

    BUCKET_SECONDS = 60  # reference flushes per-second buckets every 5s;
    # minute grain fits the driver-side read pattern

    def __init__(self) -> None:
        self._acc: dict[int, _MetricAccumulator] = {}
        # time-bucketed log: bucket_ts -> statement_hash -> accumulator
        # (reference pkg/logs/query_log.go keeps queue[time][checksum])
        self._buckets: dict[int, dict[int, _MetricAccumulator]] = {}

    @staticmethod
    def statement_hash(sql: str) -> int:
        # CRC32 statement keying, like the reference's statement cache key
        # (reference: pkg/database/database_connection.go:726-756).
        return zlib.crc32(sql.encode())

    def record(self, sql: str, latency: float, ts: float | None = None) -> None:
        h = self.statement_hash(sql)
        acc = self._acc.get(h)
        if acc is None:
            acc = self._acc[h] = _MetricAccumulator(statement=sql)
        acc.count += 1
        acc.total += latency
        acc.vmin = min(acc.vmin, latency)
        acc.vmax = max(acc.vmax, latency)
        acc.latencies.append(latency)
        bucket = int((ts if ts is not None else time.time())
                     // self.BUCKET_SECONDS) * self.BUCKET_SECONDS
        bacc = self._buckets.setdefault(bucket, {}).get(h)
        if bacc is None:
            bacc = self._buckets[bucket][h] = _MetricAccumulator(statement=sql)
        bacc.count += 1
        bacc.total += latency
        bacc.vmin = min(bacc.vmin, latency)
        bacc.vmax = max(bacc.vmax, latency)
        bacc.latencies.append(latency)

    def snapshot(self) -> list[dict[str, Any]]:
        out = []
        for h, a in sorted(self._acc.items()):
            lat = sorted(a.latencies)

            def pct(p: float) -> float:
                if not lat:
                    return 0.0
                return lat[min(len(lat) - 1, int(p * len(lat)))]

            out.append(
                {
                    "statement_hash": h,
                    "statement": a.statement,
                    "count": a.count,
                    "avg": a.total / a.count if a.count else 0.0,
                    "min": a.vmin if a.count else 0.0,
                    "max": a.vmax,
                    "p50": pct(0.50),
                    "p90": pct(0.90),
                    "p99": pct(0.99),
                }
            )
        return out

    def to_df(self, spark: SparkSession) -> DataFrame:
        snap = self.snapshot()
        schema = (
            "statement_hash long, statement string, count long, avg double,"
            " min double, max double, p50 double, p90 double, p99 double"
        )
        return spark.createDataFrame(snap, schema=schema)

    # -- time-bucketed query log (reference pkg/logs/query_log.go) ----------

    @staticmethod
    def _bucket_row(bucket: int, h: int, a: _MetricAccumulator) -> dict:
        lat = sorted(a.latencies)

        def pct(p: float) -> float:
            return lat[min(len(lat) - 1, int(p * len(lat)))] if lat else 0.0

        return {
            "bucket_ts": bucket,
            "statement_hash": h,
            "statement": a.statement,
            "count": a.count,
            "avg": a.total / a.count if a.count else 0.0,
            "min": a.vmin if a.count else 0.0,
            "max": a.vmax,
            "p50": pct(0.50),
            "p90": pct(0.90),
            "p99": pct(0.99),
        }

    def log_entries(
        self, start: float | None = None, end: float | None = None
    ) -> list[dict[str, Any]]:
        """Per-(time-bucket, statement) metric rows, optionally windowed
        — the reference's GET .../metrics/query with from/to filtering
        over the flushed query log (pkg/logs/query_log.go)."""
        out = []
        for bucket in sorted(self._buckets):
            if start is not None and bucket + self.BUCKET_SECONDS <= start:
                continue
            if end is not None and bucket > end:
                continue
            for h, a in sorted(self._buckets[bucket].items()):
                out.append(self._bucket_row(bucket, h, a))
        return out

    def flush(self, path: str) -> int:
        """Append the bucketed log to a JSON-lines file and clear the
        in-memory queue (the reference's 5-second flush of closed
        buckets to tiered storage). Returns rows flushed."""
        import json as _json

        rows = self.log_entries()
        if rows:
            with open(path, "a") as f:
                for r in rows:
                    f.write(_json.dumps(r) + "\n")
        self._buckets.clear()
        return len(rows)

    @staticmethod
    def read_log(spark: SparkSession, path: str) -> DataFrame:
        """Flushed query-log readback as a DataFrame (distributed read —
        at scale the log lands on shared storage and this is a plain
        spark.read.json over partitioned files)."""
        schema = (
            "bucket_ts long, statement_hash long, statement string,"
            " count long, avg double, min double, max double,"
            " p50 double, p90 double, p99 double"
        )
        return spark.read.schema(schema).json(path)


class Engine:
    """Session + catalog + query dispatch (reference resolver analog,
    SURVEY §2.A rows A2/A3/A6/A22)."""

    PREPARED_CACHE_CAP = 256  # LFU-evicted (pkg/cache/lfu_cache.go role)

    def __init__(
        self,
        spark: SparkSession | None = None,
        default_database: str = "main",
    ) -> None:
        self.spark = spark or get_spark()
        self.metrics = QueryMetrics()
        self.default_database = default_database
        self._plan_cache: dict[int, DataFrame] = {}
        self._plan_freq: dict[int, int] = {}
        self._transactions: dict[str, "Transaction"] = {}
        self._autotxn: "Transaction | None" = None
        self._vstore = None  # attach_versioned_store enables time travel
        # declared PRIMARY KEYs (parsed from CREATE TABLE or declared
        # explicitly) — the conflict target for INSERT OR REPLACE/IGNORE
        # and bare ON CONFLICT, like SQLite's rowid/unique machinery
        self._primary_keys: dict[str, list[str]] = {}
        # declared secondary indexes (CREATE INDEX): metadata-only, like
        # the PRIMARY KEY registry — Parquet min/max stats + partition/
        # Z-order layout are the physical analog (SURVEY §2.B row 2), so
        # an index declaration records intent and feeds introspection
        # (PRAGMA index_list/index_info, sqlite_master, sqlite_stat1).
        self._indexes: dict[str, dict] = {}
        # statement-level AFTER triggers (SQLite DDL family
        # SQLITE_CREATE_TRIGGER/SQLITE_DROP_TRIGGER, reference
        # pkg/sqlite3/constants.go:74-77): trigger name -> {event,
        # table, body statements, original sql}. Semantics: the body
        # runs once AFTER a DML statement of the matching kind touches
        # the table (the foreachBatch/CDF per-commit hook shape, not
        # SQLite's per-row NEW/OLD form — set-based engines maintain
        # derived state by re-running a statement over the base table).
        # Non-recursive, like SQLite's default recursive_triggers=off.
        self._triggers: dict[str, dict] = {}
        self._in_trigger = False
        # connection-scope counters behind SQLite's changes() /
        # total_changes() functions (sqlite.org/lang_corefunc.html)
        self._last_changes = 0
        self._total_changes = 0
        # SQLite-name shims (ifnull/iif/julianday/unixepoch/...) are part
        # of the dialect surface a reference user expects from plain
        # Engine.sql() — register them up front, UDF-free (SQL macros).
        from litebase_spark.functions.compat import register_sqlite_functions

        register_sqlite_functions(self.spark)

    # -- query dispatch (A2/A3) --------------------------------------------

    def sql(
        self,
        statement: str,
        params: list | dict | None = None,
        collect: bool = True,
        transaction_id: str | None = None,
        timeout: float | None = None,
    ) -> QueryResult:
        """Execute a statement with optional positional/named parameters.

        Positional ``?`` placeholders are rewritten to named placeholders
        and bound via Spark's parameterized SQL — the engine-side analog of
        the reference's typed bind (pkg/sqlite3/statement.go:87-167).
        ``transaction_id`` routes the statement into an open interactive
        transaction, mirroring the wire model's per-query transaction_id
        (reference: pkg/database/query_input.go:28-32, routing
        pkg/http/query_controller.go:94-120). ``timeout`` (seconds) is
        the statement-level analog of the reference's busy_timeout
        (pkg/database/database_connection.go:52, 5000 ms): the
        statement's Spark jobs run under a dedicated job group that a
        watchdog timer cancels, surfacing TimeoutError.
        """
        if transaction_id is not None:
            txn = self._transactions.get(transaction_id)
            if txn is None:
                raise LookupError(f"no open transaction {transaction_id!r}")
            return txn.sql(statement, params)
        if timeout is not None:
            return self._sql_with_timeout(statement, params, collect, timeout)
        t0 = time.time()
        head_class = classify_statement(statement)
        if head_class == "VACUUM":
            # Reference rejects VACUUM from the query API (needs drained
            # connections — pkg/database/resolver.go:100-103); our analog
            # is the explicit compaction job (sources/io.py compact_table).
            raise ValueError(
                "VACUUM is not allowed through the query API; "
                "use litebase_spark.sources.io.compact_table"
            )
        import re as _re

        eqp = _re.match(
            r"(?is)^\s*EXPLAIN\s+QUERY\s+PLAN\s+(.+)$", statement
        )
        if eqp:
            # SQLite EXPLAIN QUERY PLAN dialect (sqlite.org/eqp.html):
            # (id, parent, notused, detail) rows over the Catalyst plan
            from pyspark.sql import Row as _Row

            rows = [
                _Row(id=i, parent=p, notused=n, detail=d)
                for i, p, n, d in self.explain_query_plan(eqp.group(1))
            ]
            latency = time.time() - t0
            self.metrics.record(statement, latency)
            return QueryResult(
                columns=["id", "parent", "notused", "detail"],
                rows=rows,
                row_count=len(rows),
                changes=0,
                latency=latency,
                statement_class="DQL",
            )
        if head_class == "PRAGMA":
            return self._run_pragma(statement, t0)
        if head_class == "MAINT":
            return self._run_maintenance(statement, t0)
        if head_class == "TCL":
            return self._run_tcl(statement, t0)
        if self._autotxn is not None and head_class == "DML":
            # SQL-level BEGIN routes subsequent writes into the open
            # transaction (interactive-shell semantics, reference
            # pkg/cli/cmd/sql.go / transaction routing
            # pkg/http/query_controller.go:94-120).
            return self._autotxn.sql(statement, params)
        stmt_class = classify_statement(statement)
        sql_text, args = self._bind(statement, params)
        sql_text = self._rewrite_time_travel(sql_text)
        sql_text = _rewrite_sqlite_casts(sql_text)
        from litebase_spark.functions.dialect import (
            rewrite_double_quoted_identifiers as _rw_dqi,
            rewrite_integer_literal_division as _rw_div,
            rewrite_sqlite_functions as _rw_fns,
        )

        sql_text = _rw_dqi(_rw_div(_rw_fns(sql_text)))
        sql_text = self._rewrite_connection_fns(sql_text)
        returning = None
        if stmt_class == "DML":
            sql_text, returning = self._split_returning(sql_text)
        if stmt_class == "DDL":
            res = self._try_attach_ddl(sql_text, t0)
            if res is not None:
                return res
            res = self._try_trigger_ddl(sql_text, t0)
            if res is not None:
                return res
            res = self._try_index_ddl(sql_text, t0)
            if res is not None:
                return res
            # CREATE TABLE ... PRIMARY KEY: record the key (conflict target
            # for upserts) and strip the constraint Spark's parser rejects.
            sql_text = self._register_primary_key(sql_text)
        if stmt_class == "DML":
            res = self._try_dml(sql_text, returning)
            if res is not None:
                changes, rrows, rcols = res
                self._last_changes = changes
                self._total_changes += changes
                self._fire_triggers(sql_text, changes)
                latency = time.time() - t0
                self.metrics.record(statement, latency)
                return QueryResult(
                    columns=rcols,
                    rows=rrows,
                    row_count=len(rrows),
                    changes=changes,
                    latency=latency,
                    statement_class=stmt_class,
                )
        if _re.search(r"(?i)\bsqlite_master\b", sql_text):
            self._refresh_sqlite_master()
        df = self.spark.sql(sql_text, args=args) if args else self.spark.sql(sql_text)
        if collect and stmt_class in ("DQL", "OTHER"):
            rows = df.collect()
            columns = list(df.columns)
            changes = 0
        else:
            # DDL/DML: Spark executes eagerly on .collect(); row results of
            # DML are commit metrics, not data (changes analog — reference
            # resolver.go:127-130 captures sqlite3_changes).
            res = df.collect()
            rows = []
            columns = list(df.columns)
            changes = self._changes_from(res)
            if changes == 0 and stmt_class == "DML":
                changes = self._insert_values_count(sql_text)
            if stmt_class == "DML":
                self._last_changes = changes
                self._total_changes += changes
                self._fire_triggers(sql_text, changes)
            if returning is not None:
                rows, columns = self._returning_rows(sql_text, returning)
        latency = time.time() - t0
        self.metrics.record(statement, latency)
        return QueryResult(
            columns=columns,
            rows=rows,
            row_count=len(rows),
            changes=changes,
            latency=latency,
            statement_class=stmt_class,
        )

    def _sql_with_timeout(
        self,
        statement: str,
        params,
        collect: bool,
        timeout: float,
    ) -> QueryResult:
        """Run the statement inside a cancellable job group with a
        watchdog timer — cancellation interrupts the statement's Spark
        jobs only (other sessions/statements are untouched), and the
        caller sees TimeoutError, like a busy_timeout expiry."""
        import threading
        import uuid as _uuid

        sc = self.spark.sparkContext
        group = f"litebase-stmt-{_uuid.uuid4().hex[:12]}"
        fired = threading.Event()

        def _cancel():
            fired.set()
            sc.cancelJobGroup(group)

        sc.setJobGroup(group, statement[:80], interruptOnCancel=True)
        timer = threading.Timer(timeout, _cancel)
        timer.start()
        try:
            return self.sql(statement, params, collect)
        except Exception:
            if fired.is_set():
                raise TimeoutError(
                    f"statement exceeded {timeout}s and was cancelled "
                    f"(job group {group})"
                ) from None
            raise
        finally:
            timer.cancel()
            sc.setJobGroup("", "", False)

    def df(self, statement: str, params: list | dict | None = None) -> DataFrame:
        """Lazy variant: return the DataFrame without collecting."""
        sql_text, args = self._bind(statement, params)
        sql_text = self._rewrite_time_travel(sql_text)
        sql_text = _rewrite_sqlite_casts(sql_text)
        from litebase_spark.functions.dialect import (
            rewrite_double_quoted_identifiers as _rw_dqi,
            rewrite_integer_literal_division as _rw_div,
            rewrite_sqlite_functions as _rw_fns,
        )

        sql_text = _rw_dqi(_rw_div(_rw_fns(sql_text)))
        return self.spark.sql(sql_text, args=args) if args else self.spark.sql(sql_text)

    # -- time travel over a VersionedStore (A21 SQL surface) ----------------

    def attach_versioned_store(self, store) -> None:
        """Enable `FROM t VERSION AS OF n` / `TIMESTAMP AS OF '<ts>'`
        (the Delta/Iceberg time-travel dialect) against a
        snapshots.VersionedStore: version references resolve to pinned
        immutable file lists, zero-copy (reference PITR timeline:
        pkg/backups/restore.go resolves the log covering the point)."""
        self._vstore = store

    _TT_VERSION_RE = re.compile(r"(?is)\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)")
    _TT_TS_RE = re.compile(r"(?is)\b(\w+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'")

    def _rewrite_time_travel(self, sql_text: str) -> str:
        if self._vstore is None:
            return sql_text

        def sub_version(m):
            table, version = m.group(1), int(m.group(2))
            view = f"__tt_{table}_v{version}"
            self._vstore.read(table, version).createOrReplaceTempView(view)
            return view

        def sub_ts(m):
            import datetime as _dt

            table, raw = m.group(1), m.group(2)
            try:
                ts = float(raw)
            except ValueError:
                ts = _dt.datetime.fromisoformat(raw).timestamp()
            version = self._vstore.version_at(table, ts)
            view = f"__tt_{table}_v{version}"
            self._vstore.read(table, version).createOrReplaceTempView(view)
            return view

        sql_text = self._TT_VERSION_RE.sub(sub_version, sql_text)
        return self._TT_TS_RE.sub(sub_ts, sql_text)

    def sql_batch(self, statements: list[str | tuple]) -> list[QueryResult]:
        """Execute N statements sequentially in one call (batch query
        endpoint analog — reference POST …/query accepts {queries:[…]},
        pkg/http/query_controller.go:11-141). Each item is a statement or
        a (statement, params) tuple."""
        out = []
        for item in statements:
            stmt, params = item if isinstance(item, tuple) else (item, None)
            out.append(self.sql(stmt, params))
        return out

    def prepared(self, statement: str) -> DataFrame:
        """Statement-cache analog (A6): analyzed-plan reuse keyed by
        CRC32(SQL), like the reference's per-connection prepared cache
        (reference: pkg/database/database_connection.go:726-756).
        Catalyst already caches plan fragments; this keeps the PYTHON-side
        DataFrame (parse+analyze done once) for repeated execution.
        Read-only statements only — DML/DDL must re-resolve tables.
        Bounded with LFU eviction (reference pkg/cache/lfu_cache.go backs
        the same role): at capacity the least-frequently-used statement
        is dropped, so hot statements survive churn."""
        if classify_statement(statement) != "DQL":
            raise ValueError("prepared() caches read statements only")
        h = QueryMetrics.statement_hash(statement)
        df = self._plan_cache.get(h)
        if df is None:
            if len(self._plan_cache) >= self.PREPARED_CACHE_CAP:
                coldest = min(self._plan_freq, key=lambda k: self._plan_freq[k])
                self._plan_cache.pop(coldest, None)
                self._plan_freq.pop(coldest, None)
            df = self._plan_cache[h] = self.spark.sql(statement)
            self._plan_freq[h] = 0
        self._plan_freq[h] = self._plan_freq.get(h, 0) + 1
        return df

    def explain_query_plan(self, statement: str) -> list[tuple]:
        """SQLite ``EXPLAIN QUERY PLAN`` dialect: rows of
        (id, parent, notused, detail) — here the detail lines are the
        physical-plan tree of the Catalyst plan, one operator per row,
        parent derived from tree indentation (sqlite.org/eqp.html shape
        over a Spark plan)."""
        import re

        tree = self.explain(statement, mode="simple")
        rows, stack = [], []  # stack of (indent, id)
        next_id = 1
        for line in tree.splitlines():
            m = re.match(r"^([ :+|*-]*)(\(?\d*\)?\s*)?([A-Za-z].*)$", line)
            if not m or not m.group(3).strip():
                continue
            if m.group(3).startswith("== "):
                continue
            indent = len(m.group(1))
            while stack and stack[-1][0] >= indent:
                stack.pop()
            parent = stack[-1][1] if stack else 0
            rows.append((next_id, parent, 0, m.group(3).strip()))
            stack.append((indent, next_id))
            next_id += 1
        return rows

    def explain(self, statement: str, mode: str = "formatted") -> str:
        """EXPLAIN pass-through (PRAGMA-analog introspection, M3/A13)."""
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self.spark.sql(statement).explain(mode=mode)
        return buf.getvalue()

    def describe(self, table: str) -> list[Row]:
        """DESCRIBE analog of the reference's introspection pragmas
        (table_info etc. — allowlist pkg/auth/pragma_list.go:3)."""
        return self.spark.sql(f"DESCRIBE TABLE {table}").collect()

    def dataset_card(self, table: str, **columns) -> DataFrame:
        """Datasheet rollup for a registered corpus table — the ops-parity
        analog of PRAGMA-style introspection for training-data tables
        (doc/char/token volume, language profile, exact-dupe count per
        source; one corpus scan). Column roles default to the documents
        schema; override via source_col/lang_col/text_col/chars_col."""
        from litebase_spark.operators.pipeline import dataset_card

        return dataset_card(self.spark.table(table), **columns)

    def compaction_plan(self, table: str, **options) -> DataFrame:
        """OPTIMIZE planning for a registered table: greedy bin packing
        of the (synthesized) file manifest into target-size output bins.
        Metadata-only — plans, never rewrites; the rewrite itself is
        sources/io.py compact_table (the VACUUM analog, A11)."""
        from litebase_spark.operators.pipeline import compaction_plan

        return compaction_plan(self.spark.table(table), **options)

    def drift_report(
        self,
        table: str,
        value_col: str = "value",
        ts_col: str = "ts",
        split: str | None = None,
        cols: str | list[str] | None = None,
    ) -> DataFrame:
        """Fused distribution-drift report for a registered table: PSI,
        Jensen-Shannon, KS D, and 1-Wasserstein between the rows before
        and after `split` (on `ts_col`; default = the table's median
        timestamp — no fixture date baked in), over `value_col` — the
        nightly pipeline health gate as ONE corpus scan (the four
        standalone stats operators would cost four). An unparseable
        split or an empty half raises (HTTP surfaces it as a 400).

        `cols` switches to the MULTI-column report (one row per
        column, still one corpus scan): a list, a comma-separated
        string (the HTTP form, ?cols=a,b), or '*' for every numeric
        column of the table. Served at /tables/{t}/drift-report."""
        from litebase_spark.operators.relational import (
            drift_report,
            drift_report_multi,
        )

        df = self.spark.table(table)
        if cols is not None:
            if isinstance(cols, str):
                cols = (
                    [c for c, t in df.dtypes
                     if t in ("double", "float", "bigint", "int",
                              "smallint", "tinyint")
                     or t.startswith("decimal")]
                    if cols == "*"
                    else [c.strip() for c in cols.split(",") if c.strip()]
                )
            if not cols:
                raise ValueError(
                    f"drift_report: no numeric columns resolved on "
                    f"{table!r}"
                )
            return drift_report_multi(
                df, value_cols=cols, ts_col=ts_col, split=split
            )
        return drift_report(
            df, value_col=value_col, ts_col=ts_col, split=split
        )

    def _rewrite_connection_fns(self, sql_text: str) -> str:
        """Connection-scope SQLite functions: changes()/total_changes()
        substitute the engine's DML counters (the reference captures
        sqlite3_changes the same way, resolver.go:127-130);
        sqlite_version() reports the emulated dialect version;
        random() maps to a full-range signed 64-bit value (Spark's
        rand() is [0,1)). Textual, word-boundary, call-site only."""
        import re as _re

        subs = [
            (r"(?i)(?<![\w.])changes\s*\(\s*\)", str(self._last_changes)),
            (r"(?i)(?<![\w.])total_changes\s*\(\s*\)",
             str(self._total_changes)),
            (r"(?i)(?<![\w.])sqlite_version\s*\(\s*\)", "'3.45.3'"),
            (r"(?i)(?<![\w.])random\s*\(\s*\)",
             "CAST((rand() - 0.5) * 1.844674407370955E19 AS BIGINT)"),
        ]
        for pat, repl in subs:
            sql_text = _re.sub(pat, repl, sql_text)
        return sql_text

    _TRIGGER_CREATE_RE = re.compile(
        r"(?is)^\s*CREATE\s+TRIGGER\s+(?:IF\s+NOT\s+EXISTS\s+)?"
        r"([A-Za-z_][\w]*)\s+AFTER\s+(INSERT|UPDATE|DELETE)\s+ON\s+"
        r"([A-Za-z_][\w.]*)\s+(?:FOR\s+EACH\s+STATEMENT\s+)?BEGIN\s+"
        # greedy body + anchored terminal END: a CASE ... END inside the
        # body must not terminate the trigger early
        r"(.*)\s*;?\s*END\s*;?\s*$"
    )
    _TRIGGER_DROP_RE = re.compile(
        r"(?is)^\s*DROP\s+TRIGGER\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w]*)\s*$"
    )
    _DML_TARGET_RE = re.compile(
        r"(?is)^\s*(?:INSERT\s+(?:OR\s+\w+\s+)?INTO|REPLACE\s+INTO|"
        r"UPDATE|DELETE\s+FROM)\s+([A-Za-z_][\w.]*)"
    )

    _ATTACH_RE = re.compile(
        r"(?is)^\s*ATTACH\s+(?:DATABASE\s+)?'([^']+)'\s+AS\s+"
        r"([A-Za-z_]\w*)\s*$"
    )
    _DETACH_RE = re.compile(
        r"(?is)^\s*DETACH\s+(?:DATABASE\s+)?([A-Za-z_]\w*)\s*$"
    )

    def _try_attach_ddl(self, sql_text: str, t0: float):
        """ATTACH DATABASE '<dir>' AS alias / DETACH alias (SQLite
        authorizer codes SQLITE_ATTACH/SQLITE_DETACH,
        pkg/sqlite3/constants.go:84-85). A database here is a directory
        of parquet tables (<dir>/<table>.parquet — the engine's storage
        model); ATTACH maps it to a Spark catalog namespace of EXTERNAL
        tables, so `SELECT ... FROM alias.t JOIN main_table ...` — the
        cross-database query ATTACH exists for — runs natively through
        one Catalyst plan. DETACH drops only the namespace metadata;
        external tables never delete their files, matching SQLite's
        detach-leaves-the-file semantics."""
        m = self._ATTACH_RE.match(sql_text)
        if m:
            import os as _os

            path, alias = m.group(1), m.group(2)
            if not _os.path.isdir(path):
                raise ValueError(f"ATTACH: no such directory: {path}")
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{alias}`")
            for fn in sorted(_os.listdir(path)):
                if not fn.endswith(".parquet"):
                    continue
                tname = fn[: -len(".parquet")]
                # directory contents are untrusted input to this SQL
                # text: ''-double quotes in the LOCATION literal and
                # ``-double backticks in the identifier so a filename
                # like "x'.parquet" can't break out of either
                loc = f"{path}/{fn}".replace("'", "''")
                tq = tname.replace("`", "``")
                self.spark.sql(
                    f"CREATE TABLE IF NOT EXISTS `{alias}`.`{tq}` "
                    f"USING PARQUET LOCATION '{loc}'"
                )
            latency = time.time() - t0
            self.metrics.record(sql_text, latency)
            return QueryResult([], [], 0, 0, latency, "DDL")
        m = self._DETACH_RE.match(sql_text)
        if m:
            alias = m.group(1)
            dbs = {d.name for d in self.spark.catalog.listDatabases()}
            if alias not in dbs:
                raise ValueError(f"no such database: {alias}")
            self.spark.sql(f"DROP DATABASE `{alias}` CASCADE")
            latency = time.time() - t0
            self.metrics.record(sql_text, latency)
            return QueryResult([], [], 0, 0, latency, "DDL")
        return None

    def _try_trigger_ddl(self, sql_text: str, t0: float):
        """CREATE/DROP TRIGGER (reference authorizer DDL codes
        SQLITE_CREATE_TRIGGER/SQLITE_DROP_TRIGGER,
        pkg/sqlite3/constants.go:74-77). Statement-level AFTER triggers:
        the body (one or more ';'-separated statements) re-runs once
        after each matching DML commit — the foreachBatch/CDF analog of
        SQLite's row triggers. Row-level NEW/OLD references are out of
        scope (documented: derived state is maintained by re-derivation
        from the base table, the set-based idiom)."""
        m = self._TRIGGER_CREATE_RE.match(sql_text)
        if m:
            name, event, table, body = m.groups()
            stmts = [s.strip() for s in body.split(";") if s.strip()]
            if re.search(r"(?i)\bIF\s+NOT\s+EXISTS\b", sql_text) and (
                name in self._triggers
            ):
                pass
            elif not stmts:
                raise ValueError(f"trigger {name}: empty body")
            else:
                self._triggers[name] = {
                    "event": event.upper(),
                    "table": table.split(".")[-1].lower(),
                    "statements": stmts,
                    "sql": sql_text.strip(),
                }
            latency = time.time() - t0
            self.metrics.record(sql_text, latency)
            return QueryResult([], [], 0, 0, latency, "DDL")
        m = self._TRIGGER_DROP_RE.match(sql_text)
        if m:
            if_exists, name = m.group(1), m.group(2)
            if name not in self._triggers and not if_exists:
                raise ValueError(f"no such trigger: {name}")
            self._triggers.pop(name, None)
            latency = time.time() - t0
            self.metrics.record(sql_text, latency)
            return QueryResult([], [], 0, 0, latency, "DDL")
        return None

    def _fire_triggers(self, sql_text: str, changes: int) -> None:
        """Run matching AFTER triggers once per committed DML statement.
        Non-recursive (a trigger body's own DML never re-fires triggers,
        SQLite's recursive_triggers=off default); a statement that
        touched no rows fires nothing, matching SQLite's per-affected-row
        firing collapsing to zero."""
        if self._in_trigger or not self._triggers or changes == 0:
            return
        m = self._DML_TARGET_RE.match(sql_text)
        if not m:
            return
        table = m.group(1).split(".")[-1].lower()
        head = sql_text.lstrip().split(None, 1)[0].upper()
        event = {"REPLACE": "INSERT"}.get(head, head)
        self._in_trigger = True
        try:
            for name in sorted(self._triggers):
                trg = self._triggers[name]
                if trg["table"] == table and trg["event"] == event:
                    for stmt in trg["statements"]:
                        self.sql(stmt)
        finally:
            self._in_trigger = False

    def _try_index_ddl(self, sql_text: str, t0: float):
        """CREATE INDEX / DROP INDEX as metadata DDL (SQLite surface the
        reference inherits wholesale). Spark has no secondary indexes —
        Parquet min/max footers, partition pruning and the Z-order
        layout path (operators/layout.py) are the physical equivalent —
        so the declaration is recorded, surfaced through PRAGMA
        index_list/index_info, sqlite_master and sqlite_stat1, and
        DROPped symmetrically. Returns None when the statement is not
        index DDL."""
        import re as _re

        m = _re.match(
            r"(?is)^\s*CREATE\s+(UNIQUE\s+)?INDEX\s+(IF\s+NOT\s+EXISTS\s+)?"
            r"([A-Za-z_][\w]*)\s+ON\s+([A-Za-z_][\w.]*)\s*\(([^)]*)\)\s*;?\s*$",
            sql_text,
        )
        if m:
            uniq, if_not, name, table, cols = m.groups()
            if name in self._indexes:
                if if_not:
                    return self._index_result(t0, sql_text)
                raise ValueError(f"index {name} already exists")
            self._indexes[name] = {
                "table": table,
                "cols": [c.strip() for c in cols.split(",") if c.strip()],
                "unique": bool(uniq),
                "sql": sql_text.strip().rstrip(";"),
            }
            return self._index_result(t0, sql_text)
        m = _re.match(
            r"(?is)^\s*DROP\s+INDEX\s+(IF\s+EXISTS\s+)?"
            r"([A-Za-z_][\w]*)\s*;?\s*$",
            sql_text,
        )
        if m:
            if_exists, name = m.groups()
            if name not in self._indexes and not if_exists:
                raise ValueError(f"no such index: {name}")
            self._indexes.pop(name, None)
            return self._index_result(t0, sql_text)
        return None

    def _index_result(self, t0: float, statement: str) -> QueryResult:
        latency = time.time() - t0
        self.metrics.record(statement, latency)
        return QueryResult(
            columns=[], rows=[], row_count=0, changes=0,
            latency=latency, statement_class="DDL",
        )

    def _refresh_sqlite_master(self) -> None:
        """Materialize the ``sqlite_master`` schema table
        (sqlite.org/schematab.html) as a temp view over the live Spark
        catalog, so ``SELECT * FROM sqlite_master`` works through the
        query API exactly as it does against the reference (every SQLite
        client introspects this way). Columns match SQLite:
        (type, name, tbl_name, rootpage, sql); ``sql`` is reconstructed
        from the Spark schema, with the declared PRIMARY KEY (upsert
        conflict-target registry) folded back in. Rebuilt lazily on
        each statement that references it — O(catalog), no data scan."""
        rows = []
        page = 2  # SQLite roots user tables at page >= 2; views are 0
        for t in self.spark.catalog.listTables():
            # Spark reports temp views as TEMPORARY; both are views in
            # sqlite_master terms (SQLite keeps temp objects in
            # sqlite_temp_master — folded in here, single-session engine).
            is_view = t.tableType in ("VIEW", "TEMPORARY")
            try:
                fields = self.spark.table(t.name).schema.fields
            except Exception:
                continue
            cols = ", ".join(
                f"{f.name} {f.dataType.simpleString().upper()}"
                for f in fields
            )
            pk = self._primary_keys.get(t.name)
            if pk and not is_view:
                cols += f", PRIMARY KEY ({', '.join(pk)})"
            kind = "view" if is_view else "table"
            create = (
                f"CREATE {'VIEW' if is_view else 'TABLE'} "
                f"{t.name} ({cols})"
            )
            rows.append((kind, t.name, t.name,
                         0 if is_view else page, create))
            if not is_view:
                page += 1
        for iname, meta in self._indexes.items():
            rows.append(("index", iname, meta["table"], page,
                         meta["sql"]))
            page += 1
        for tname in sorted(self._triggers):
            meta = self._triggers[tname]
            # SQLite stores triggers with rootpage 0 (schematab.html)
            rows.append(("trigger", tname, meta["table"], 0, meta["sql"]))
        schema = ("type string, name string, tbl_name string, "
                  "rootpage int, sql string")
        self.spark.createDataFrame(rows, schema).createOrReplaceTempView(
            "sqlite_master")

    def _refresh_sqlite_stat1(self, names: list[str]) -> None:
        """Populate ``sqlite_stat1`` after ANALYZE (sqlite.org/fileformat2
        §stat1): one row per analyzed table, (tbl, idx, stat) with stat's
        leading integer = row count, exactly the part of SQLite's format
        a planner consumes. Row counts come from the catalog statistics
        COMPUTE STATISTICS just gathered (no second scan); tables whose
        stats are unavailable fall back to a count, mirroring ANALYZE's
        own full-scan cost. Like SQLite, the table only exists once
        ANALYZE has run."""
        rows = []
        for name in names:
            nrow = None
            try:
                for r in self.spark.sql(
                    f"DESCRIBE TABLE EXTENDED {name}"
                ).collect():
                    if r.col_name == "Statistics" and "rows" in str(r.data_type):
                        nrow = int(str(r.data_type).split()[-2])
                        break
            except Exception:
                pass
            if nrow is None:
                try:
                    nrow = self.spark.table(name).count()
                except Exception:
                    continue
            # like SQLite: one stat row per index on the table; tables
            # without indexes get the (tbl, NULL, nrow) analog row
            idx_names = [i for i, m in self._indexes.items()
                         if m["table"] == name]
            if idx_names:
                for iname in idx_names:
                    rows.append((name, iname, str(nrow)))
            else:
                rows.append((name, None, str(nrow)))
        self.spark.createDataFrame(
            rows, "tbl string, idx string, stat string"
        ).createOrReplaceTempView("sqlite_stat1")

    # -- PRAGMA surface (A13) -----------------------------------------------
    #
    # The reference filters pragmas through an allowlist: read-only
    # introspection pragmas run, mutating ones are denied
    # (pkg/auth/pragma_list.go:3-…). Same policy here, with each allowed
    # pragma mapped to the Spark introspection equivalent.

    _PRAGMA_DENIED = frozenset(
        {
            "journal_mode", "synchronous", "cache_size", "page_size",
            "temp_store", "mmap_size", "wal_checkpoint", "wal_autocheckpoint",
            "foreign_keys", "writable_schema", "secure_delete",
        }
    )

    def _run_pragma(self, statement: str, t0: float) -> QueryResult:
        import re

        m = re.match(r"(?is)\s*PRAGMA\s+(\w+)\s*(?:\(([^)]*)\))?\s*;?\s*$",
                     statement)
        if not m:
            raise ValueError(f"cannot parse PRAGMA: {statement!r}")
        name, arg = m.group(1).lower(), (m.group(2) or "").strip().strip("'\"")
        if name in self._PRAGMA_DENIED:
            # Mirrors the reference's denial of mutating pragmas
            # (pkg/auth/pragma_list.go entries set to false).
            raise PermissionError(f"PRAGMA {name} is not allowed")
        if name == "table_info":
            df = self.spark.sql(f"DESCRIBE TABLE {arg}")
        elif name == "table_list":
            df = self.spark.sql("SHOW TABLES")
        elif name == "database_list":
            df = self.spark.sql("SHOW DATABASES")
        elif name == "index_list":
            # Declared indexes (metadata-only — Parquet stats/layout are
            # the physical analog) in SQLite's schema
            # (seq, name, unique, origin, partial).
            decls = [
                (i, iname, int(meta["unique"]), "c", 0)
                for i, (iname, meta) in enumerate(
                    m for m in self._indexes.items()
                    if m[1]["table"] == arg
                )
            ]
            schema = "seq int, name string, `unique` int, origin string, partial int"
            df = self.spark.createDataFrame(decls, schema)
        elif name == "index_info":
            meta = self._indexes.get(arg)
            if meta is None:
                raise LookupError(f"no such index: {arg}")
            try:
                table_cols = [
                    f.name for f in self.spark.table(meta["table"]).schema
                ]
            except Exception:
                table_cols = []
            info = [
                (seq,
                 table_cols.index(c) if c in table_cols else -1,
                 c)
                for seq, c in enumerate(meta["cols"])
            ]
            df = self.spark.createDataFrame(
                info, "seqno int, cid int, name string")
        elif name == "user_version":
            df = self.spark.sql("SELECT 0 AS user_version")
        else:
            raise PermissionError(f"PRAGMA {name} is not in the allowlist")
        rows = df.collect()
        latency = time.time() - t0
        self.metrics.record(statement, latency)
        return QueryResult(
            columns=list(df.columns), rows=rows, row_count=len(rows),
            changes=0, latency=latency, statement_class="PRAGMA",
        )

    def _run_maintenance(self, statement: str, t0: float) -> QueryResult:
        """ANALYZE / REINDEX (authorizer codes SQLITE_ANALYZE /
        SQLITE_REINDEX, reference pkg/sqlite3/constants.go:64-93;
        exercised via pkg/database/database_connection.go:618-619).

        ANALYZE in SQLite gathers planner statistics (sqlite_stat1); the
        Spark analog is ``ANALYZE TABLE … COMPUTE STATISTICS`` feeding
        Catalyst's cost-based optimizer. Temp views over parquet have no
        catalog entry to attach stats to — those are skipped silently,
        matching SQLite's ANALYZE which never errors on un-analyzable
        schema objects. REINDEX is an accepted no-op: there are no
        physical secondary indexes (Parquet min/max + partition pruning
        replace them), mirroring index_list's truthfully-empty result.
        """
        import re

        m = re.match(
            r"(?is)\s*(ANALYZE|REINDEX)\s*([A-Za-z_][\w.]*)?\s*;?\s*$",
            statement,
        )
        if not m:
            raise ValueError(f"cannot parse statement: {statement!r}")
        verb, target = m.group(1).upper(), m.group(2)
        analyzed = 0
        if verb == "ANALYZE":
            if target:
                names = [target]
            else:  # bare ANALYZE: every analyzable catalog table
                names = [
                    t.name
                    for t in self.spark.catalog.listTables()
                    if t.tableType != "TEMPORARY"
                ]
            for name in names:
                try:
                    self.spark.sql(
                        f"ANALYZE TABLE {name} COMPUTE STATISTICS"
                    )
                    analyzed += 1
                except Exception:
                    if target:  # explicit target must exist as a table
                        raise
            # sqlite_stat1 becomes queryable after ANALYZE, like SQLite.
            stat_names = (
                [target] if target
                else [t.name for t in self.spark.catalog.listTables()]
            )
            self._refresh_sqlite_stat1(stat_names)
        latency = time.time() - t0
        self.metrics.record(statement, latency)
        return QueryResult(
            columns=[], rows=[], row_count=0, changes=analyzed,
            latency=latency, statement_class="MAINT",
        )

    def _run_tcl(self, statement: str, t0: float) -> QueryResult:
        """SQL-level BEGIN/COMMIT/ROLLBACK (reference begin-kind selection:
        pkg/sqlite3/connection.go:118-156; DEFERRED for reads, IMMEDIATE
        for writes — database_connection.go:759-821)."""
        import re

        toks = re.findall(r"\w+", statement.upper())
        raw_toks = re.findall(r"\w+", statement)
        kw = toks[0]
        if kw == "BEGIN":
            if self._autotxn is not None:
                raise RuntimeError("cannot start a transaction within a transaction")
            kind = "IMMEDIATE" if "IMMEDIATE" in toks else "DEFERRED"
            self._autotxn = self.begin(kind=kind)
        elif kw in ("COMMIT", "END"):
            if self._autotxn is None:
                raise RuntimeError("cannot commit - no transaction is active")
            try:
                self._autotxn.commit()
            finally:
                self._autotxn = None
        elif kw in ("SAVEPOINT", "RELEASE") or (
            kw == "ROLLBACK" and len(toks) > 1 and toks[1] == "TO"
        ):
            # SQLite savepoint dialect; requires an open transaction here
            # (SQLite's implicit-txn savepoints are out of scope — the
            # engine's txn unit is the shadow-view transaction)
            if self._autotxn is None:
                raise RuntimeError(f"no transaction is active for {kw}")
            name = raw_toks[-1]
            if kw == "SAVEPOINT":
                self._autotxn.savepoint(name)
            elif kw == "RELEASE":
                self._autotxn.release(name)
            else:
                self._autotxn.rollback_to(name)
        else:  # ROLLBACK
            if self._autotxn is None:
                raise RuntimeError("cannot rollback - no transaction is active")
            try:
                self._autotxn.rollback()
            finally:
                self._autotxn = None
        latency = time.time() - t0
        self.metrics.record(statement, latency)
        return QueryResult(
            columns=[], rows=[], row_count=0, changes=0,
            latency=latency, statement_class="TCL",
        )

    @staticmethod
    def _bind(statement: str, params: list | dict | None):
        if params is None:
            return statement, None
        if isinstance(params, dict):
            return statement, params
        # positional: rewrite ? -> :p0, :p1 ... outside of string literals
        out, args, i = [], {}, 0
        in_str = False
        for ch in statement:
            if ch == "'":
                in_str = not in_str
                out.append(ch)
            elif ch == "?" and not in_str:
                if i >= len(params):
                    raise ValueError(
                        f"statement has more placeholders than the "
                        f"{len(params)} params given"
                    )
                out.append(f":p{i}")
                args[f"p{i}"] = params[i]
                i += 1
            else:
                out.append(ch)
        if i != len(params):
            raise ValueError(f"statement has {i} placeholders, got {len(params)} params")
        return "".join(out), args

    @staticmethod
    def _changes_from(rows: list[Row]) -> int:
        # Delta-style DML returns metric rows (num_affected_rows); plain
        # parquet DDL returns nothing. Best-effort extraction.
        for r in rows:
            d = r.asDict() if hasattr(r, "asDict") else {}
            for k in ("num_affected_rows", "num_inserted_rows", "num_updated_rows"):
                if k in d and d[k] is not None:
                    return int(d[k])
        return 0

    # -- write side (M2): DML with `changes` semantics ---------------------
    #
    # Vanilla Spark has no UPDATE/DELETE on parquet v1 tables (Delta is not
    # available in this environment), so the engine supplies the
    # reference's DML surface (reference classifies and executes these:
    # pkg/database/query.go:53-58, resolver.go:127-130 captures changes)
    # as copy-on-write rewrites: read -> transform -> localCheckpoint
    # (breaks file lineage, making self-overwrite safe) -> overwrite.
    # On a Delta/Iceberg catalog these methods become single SQL calls.

    # `changes` counts ride the DML job itself via df.observe() — the
    # Spark analog of reading commit operationMetrics (Delta) or
    # sqlite3_changes (reference resolver.go:127-130). Round 2 ran a
    # separate count() scan per statement; observations are computed by
    # the same tasks that rewrite the data, so DML is one scan.

    def insert_rows(self, table: str, rows: list[tuple], schema=None) -> int:
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        df = self.spark.createDataFrame(
            rows, schema=schema or self.spark.table(table).schema
        )
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("changes")).write.insertInto(
            table
        )
        return obs.get["changes"]

    def insert_select(self, table: str, select_df) -> int:
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation()
        select_df.observe(
            obs, F.count(F.lit(1)).alias("changes")
        ).write.insertInto(table)
        return obs.get["changes"]

    def update_table(
        self,
        table: str,
        assignments: dict[str, str],
        where: str | None = None,
        returning: str | None = None,
    ):
        """UPDATE table SET col=expr[, ...] [WHERE cond]; returns changes
        observed during the rewrite scan (no separate count job). With
        ``returning``, also evaluates the clause over the post-update
        image of the affected rows (SQLite RETURNING semantics) and
        returns (changes, rows, cols)."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        df = self.spark.table(table)
        cond = F.expr(where) if where else F.lit(True)
        obs = Observation()
        observed = df.observe(
            obs,
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("changes"),
        )
        cols = []
        for c in df.columns:
            if c in assignments:
                cols.append(
                    F.when(cond, F.expr(assignments[c]))
                    .otherwise(F.col(c))
                    .alias(c)
                )
            else:
                cols.append(F.col(c))
        new_full = observed.select(
            cols + [cond.alias("__changed")]
        ).localCheckpoint(eager=True)
        changes = int(obs.get["changes"] or 0)
        rows, rcols = [], []
        if returning is not None:
            rdf = self._returning_df(
                new_full.filter("__changed").drop("__changed"), returning
            )
            rows, rcols = rdf.collect(), list(rdf.columns)
        new_full.drop("__changed").write.mode("overwrite").saveAsTable(table)
        return (changes, rows, rcols) if returning is not None else changes

    def delete_from(
        self,
        table: str,
        where: str | None = None,
        returning: str | None = None,
    ):
        """DELETE FROM table [WHERE cond]; returns changes observed
        during the rewrite scan (no separate count job). With
        ``returning``, also evaluates the clause over the deleted rows
        and returns (changes, rows, cols)."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        df = self.spark.table(table)
        cond = F.expr(where) if where else F.lit(True)
        obs = Observation()
        observed = df.observe(
            obs,
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("changes"),
        )
        ck = observed.withColumn("__del", cond).localCheckpoint(eager=True)
        changes = int(obs.get["changes"] or 0)
        rows, rcols = [], []
        if returning is not None:
            rdf = self._returning_df(
                ck.filter("__del").drop("__del"), returning
            )
            rows, rcols = rdf.collect(), list(rdf.columns)
        ck.filter(~F.col("__del")).drop("__del").write.mode(
            "overwrite"
        ).saveAsTable(table)
        return (changes, rows, rcols) if returning is not None else changes

    def merge_upsert(self, table: str, source, on: list[str]) -> int:
        """MERGE (upsert) analog: source rows replace matches and append
        the rest (reference upsert surface: INSERT ... ON CONFLICT,
        SURVEY §2.B scans row). `changes` = source rows, observed on the
        union branch of the same rewrite job."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        df = self.spark.table(table)
        obs = Observation()
        observed_src = source.observe(
            obs, F.count(F.lit(1)).alias("changes")
        )
        kept = df.join(source, on=on, how="left_anti")
        new_df = kept.unionByName(observed_src).localCheckpoint(eager=True)
        changes = obs.get["changes"]
        new_df.write.mode("overwrite").saveAsTable(table)
        return int(changes or 0)

    # -- SQLite upsert dialect: INSERT OR REPLACE/IGNORE and
    # INSERT ... ON CONFLICT [(cols)] DO NOTHING | DO UPDATE SET ...
    # (reference surface: full SQLite upsert grammar through the query API,
    # pkg/database/query.go DML classes; sqlite.org/lang_upsert.html).
    # Executed as ONE full-outer join of target and deduplicated source —
    # matched rows take the DO UPDATE assignments (`excluded.col` = the
    # proposed row), source-only rows insert, target-only rows pass
    # through. DO NOTHING never rewrites the table: it appends the
    # anti-joined new rows only.

    def declare_primary_key(self, table: str, cols: list[str]) -> None:
        """Declare the conflict target used by INSERT OR REPLACE/IGNORE
        and bare ON CONFLICT (SQLite reads it from the schema's PRIMARY
        KEY/unique indexes; parquet tables carry no constraints, so the
        engine keeps its own registry — also fed by CREATE TABLE parsing)."""
        self._primary_keys[table.lower()] = list(cols)

    def _register_primary_key(self, sql_text: str) -> str:
        """Record PRIMARY KEY constraints in a CREATE TABLE and strip them
        from the DDL (Spark's v1 parser rejects constraint syntax).
        Handles both `col TYPE PRIMARY KEY` and `PRIMARY KEY (a, b)`."""
        import re

        m = re.match(
            r"(?is)^(\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\()"
            r"(.*)(\)\s*(?:USING\s+\w+\s*)?;?\s*)$",
            sql_text,
        )
        if not m or "PRIMARY KEY" not in m.group(3).upper():
            return sql_text
        head, table, body, tail = m.groups()
        parts, pk = [], []
        for part in self._split_top_level(body):
            tm = re.match(r"(?is)^\s*PRIMARY\s+KEY\s*\(([^)]*)\)\s*$", part)
            if tm:  # table-level constraint: drop the whole element
                pk = [c.strip() for c in tm.group(1).split(",")]
                continue
            cm = re.match(r"(?is)^(\s*(\w+)\s+.*?)\s+PRIMARY\s+KEY\s*(.*)$", part)
            if cm:
                pk = [cm.group(2)]
                part = cm.group(1) + (" " + cm.group(3) if cm.group(3) else "")
            parts.append(part)
        if pk:
            self.declare_primary_key(table, pk)
        return head + ", ".join(p.strip() for p in parts) + tail

    @staticmethod
    def _rewrite_excluded(expr: str) -> str:
        """`excluded.col` (the proposed insert row, SQLite upsert scope)
        -> the join's `__exc_col` columns."""
        import re

        return re.sub(r"(?i)\bexcluded\s*\.\s*(\w+)", r"__exc_\1", expr)

    def _parse_insert_upsert(self, statement: str):
        """Parse the upsert INSERT forms; None for plain INSERT (which
        Spark executes natively)."""
        import re

        stmt = statement.strip().rstrip(";")
        # REPLACE INTO is SQLite's alias for INSERT OR REPLACE INTO
        stmt = re.sub(r"(?is)^\s*REPLACE\s+INTO\b", "INSERT OR REPLACE INTO", stmt)
        m = re.match(
            r"(?is)^\s*INSERT\s+(?:OR\s+(REPLACE|IGNORE)\s+)?INTO\s+"
            r"(\w+)\s*(?:\(([^)]*)\))?\s*(VALUES\b.*|SELECT\b.*|WITH\b.*?)$",
            stmt,
        )
        if not m:
            return None
        or_action, table, collist, body = m.groups()
        action = conflict_cols = assignments = upd_where = None
        cm = re.search(
            r"(?is)\bON\s+CONFLICT\s*(?:\(([^)]*)\))?\s*DO\s+"
            r"(NOTHING|UPDATE\s+SET\s+.*)$",
            body,
        )
        if cm:
            body = body[: cm.start()].strip()
            if cm.group(1):
                conflict_cols = [c.strip() for c in cm.group(1).split(",")]
            rest = cm.group(2)
            if rest.upper().startswith("NOTHING"):
                action = "nothing"
            else:
                action = "update"
                um = re.match(
                    r"(?is)UPDATE\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$", rest
                )
                assignments = {}
                for part in self._split_top_level(um.group(1)):
                    c, _, e = part.partition("=")
                    assignments[c.strip()] = e.strip()
                upd_where = um.group(2)
        elif or_action:
            action = "replace" if or_action.upper() == "REPLACE" else "nothing"
        if action is None:
            return None  # plain INSERT: native path
        if conflict_cols is None:
            conflict_cols = self._primary_keys.get(table.lower())
            if not conflict_cols:
                raise ValueError(
                    f"upsert on {table!r} needs a conflict target: declare a "
                    "PRIMARY KEY (CREATE TABLE ... PRIMARY KEY or "
                    "declare_primary_key) or write ON CONFLICT(cols)"
                )
        cols = [c.strip() for c in collist.split(",")] if collist else None
        return {
            "table": table, "cols": cols, "body": body, "action": action,
            "conflict_cols": conflict_cols, "assignments": assignments,
            "upd_where": upd_where,
        }

    def _insert_source(self, table: str, cols, body: str) -> DataFrame:
        """Build the source DataFrame for an upsert INSERT: VALUES tuples
        (tagged with their statement order, so within-statement conflicts
        resolve like SQLite's sequential row processing) or a SELECT/CTE.
        Missing columns fill with NULL; everything casts to the target
        schema."""
        from pyspark.sql import functions as F

        tgt_schema = self.spark.table(table).schema
        col_list = cols or tgt_schema.fieldNames()
        if body.upper().startswith("VALUES"):
            tuples = [
                p.strip()
                for p in self._split_top_level(
                    body[len("VALUES"):]
                )
                if p.strip().startswith("(")
            ]
            seq_vals = ", ".join(
                f"({i}, {t[1:]}" for i, t in enumerate(tuples)
            )
            src = self.spark.sql(
                f"SELECT * FROM (VALUES {seq_vals} "
                f"AS __v(__seq, {', '.join(col_list)}))"
            )
        else:
            src = self.spark.sql(body).toDF(*col_list).withColumn(
                "__seq", F.lit(0)
            )
        out = [F.col("__seq")]
        for f in tgt_schema.fields:
            if f.name in col_list:
                out.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                out.append(F.lit(None).cast(f.dataType).alias(f.name))
        return src.select(out)

    @staticmethod
    def _dedup_source(src: DataFrame, conflict_cols, keep_last: bool) -> DataFrame:
        """Within-statement conflict resolution: SQLite processes VALUES
        rows sequentially, so REPLACE/DO UPDATE keep the LAST proposed row
        per key and IGNORE/DO NOTHING keep the FIRST."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        order = F.col("__seq").desc() if keep_last else F.col("__seq").asc()
        w = Window.partitionBy(*conflict_cols).orderBy(order)
        return (
            src.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__seq")
        )

    def _upsert_plan(
        self, tgt: DataFrame, src: DataFrame, conflict_cols,
        assignments, upd_where,
    ):
        """One-pass upsert: full-outer join target with the deduplicated
        source on the conflict key; project the merged row. Returns
        (new_df, changes) — new_df is localCheckpointed (one scan of the
        target materializes it; the changes count and the table rewrite
        both read the checkpoint). Scale: shuffles both sides on the
        conflict key once; the source is statement-sized (VALUES) so AQE
        broadcasts it in practice."""
        from functools import reduce

        from pyspark.sql import functions as F

        cols = tgt.columns
        dtypes = dict(tgt.dtypes)
        t_ren = tgt.select(
            [F.col(c).alias(f"__t_{c}") for c in cols]
        ).withColumn("__t_present", F.lit(True))
        s_ren = src.select(
            [F.col(c).alias(f"__exc_{c}") for c in cols]
        ).withColumn("__s_present", F.lit(True))
        cond = reduce(
            lambda a, b: a & b,
            [t_ren[f"__t_{k}"] == s_ren[f"__exc_{k}"] for k in conflict_cols],
        )
        j = t_ren.join(s_ren, cond, "full_outer").select(
            *[F.col(f"__t_{c}").alias(c) for c in cols],
            *[F.col(f"__exc_{c}") for c in cols],
            F.coalesce("__t_present", F.lit(False)).alias("__t_present"),
            F.coalesce("__s_present", F.lit(False)).alias("__s_present"),
        )
        matched = F.col("__t_present") & F.col("__s_present")
        src_only = ~F.col("__t_present") & F.col("__s_present")
        gate = matched
        if upd_where:
            gate = matched & F.expr(self._rewrite_excluded(upd_where))
        ck = j.withColumn("__changed", gate | src_only).localCheckpoint(
            eager=True
        )
        changes = ck.filter("__changed").count()
        final = []
        for c in cols:
            if c in assignments:
                val = (
                    F.when(
                        gate,
                        F.expr(
                            self._rewrite_excluded(assignments[c])
                        ).cast(dtypes[c]),
                    )
                    .when(src_only, F.col(f"__exc_{c}"))
                    .otherwise(F.col(c))
                )
            else:
                val = F.when(src_only, F.col(f"__exc_{c}")).otherwise(F.col(c))
            final.append(val.alias(c))
        return ck.select(final), ck.filter("__changed").select(final), changes

    def _run_insert_upsert(self, parsed: dict, returning: str | None = None):
        """Execute a parsed upsert INSERT against the catalog table.
        Returns (changes, returning_rows, returning_cols) — RETURNING
        projects the post-statement image of the affected rows, SQLite
        upsert semantics."""
        table = parsed["table"]
        action = parsed["action"]
        src_raw = self._insert_source(table, parsed["cols"], parsed["body"])
        src = self._dedup_source(
            src_raw, parsed["conflict_cols"], keep_last=(action != "nothing")
        )
        tgt = self.spark.table(table)
        rows, rcols = [], []
        if action == "nothing":
            # append-only: no table rewrite, just the anti-joined new rows
            new_rows = src.join(
                tgt, on=parsed["conflict_cols"], how="left_anti"
            ).select(tgt.columns).localCheckpoint(eager=True)
            changes = new_rows.count()
            if returning is not None:
                rdf = self._returning_df(new_rows, returning)
                rows, rcols = rdf.collect(), list(rdf.columns)
            if changes:
                new_rows.write.insertInto(table)
            return changes, rows, rcols
        if action == "replace":
            assignments = {c: f"excluded.{c}" for c in tgt.columns}
            upd_where = None
        else:
            assignments, upd_where = parsed["assignments"], parsed["upd_where"]
        new_df, affected, changes = self._upsert_plan(
            tgt, src, parsed["conflict_cols"], assignments, upd_where
        )
        if action == "replace":
            # SQLite counts EVERY processed row (a within-statement
            # re-replacement counts again), not the post-dedup set —
            # verified differentially vs stdlib sqlite3
            changes = self._source_row_count(parsed["body"], src_raw)
        if returning is not None:
            rdf = self._returning_df(affected, returning)
            rows, rcols = rdf.collect(), list(rdf.columns)
        new_df.write.mode("overwrite").saveAsTable(table)
        return changes, rows, rcols

    @classmethod
    def _source_row_count(cls, body: str, src) -> int:
        """Pre-dedup source cardinality: parsed for VALUES (no job),
        counted for SELECT sources."""
        if body.upper().startswith("VALUES"):
            return len(
                [
                    p
                    for p in cls._split_top_level(body[len("VALUES"):])
                    if p.strip().startswith("(")
                ]
            )
        return src.count()

    def _update_from_plan(
        self, tgt: DataFrame, table: str, assignments,
        from_clause: str, where,
    ):
        """UPDATE ... FROM (SQLite >= 3.33 joined update): tag target rows
        with a row id, join the FROM source via plain SQL (assignments and
        WHERE reference both sides, target under its own name), then stitch
        new values back by row id. Multiple source matches per target row
        pick one match (SQLite: 'unspecified'). Returns (new_df, changes)."""
        from pyspark.sql import functions as F

        dtypes = dict(tgt.dtypes)
        rid = tgt.withColumn(
            "__rid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=True)
        rid.createOrReplaceTempView("__update_from_target")
        assigned = list(assignments)
        sel = [f"{table}.__rid AS __rid", "true AS __hit"] + [
            f"({assignments[c]}) AS __new_{i}" for i, c in enumerate(assigned)
        ]
        sql = (
            f"SELECT {', '.join(sel)} FROM __update_from_target AS {table}, "
            f"{from_clause}"
        )
        if where:
            sql += f" WHERE {where}"
        m = (
            self.spark.sql(sql)
            .dropDuplicates(["__rid"])
            .localCheckpoint(eager=True)
        )
        changes = m.count()
        joined = rid.join(m, on="__rid", how="left")
        final = []
        for c in tgt.columns:
            if c in assignments:
                i = assigned.index(c)
                final.append(
                    F.when(
                        F.col("__hit"),
                        F.col(f"__new_{i}").cast(dtypes[c]),
                    )
                    .otherwise(F.col(c))
                    .alias(c)
                )
            else:
                final.append(F.col(c))
        self.spark.catalog.dropTempView("__update_from_target")
        return joined.select(final).localCheckpoint(eager=True), changes

    @staticmethod
    def _split_returning(statement: str):
        """Split a trailing ``RETURNING <exprs>`` clause off a DML
        statement (SQLite >= 3.35 dialect surface, SURVEY §2.B scans row:
        'INSERT ... RETURNING'). Spark SQL has no RETURNING; the engine
        executes the bare DML, then evaluates the clause over the
        affected rows (see _returning_rows)."""
        import re

        m = re.match(r"(?is)^(.*?)\s+RETURNING\s+(.+?)\s*;?\s*$", statement)
        if m and re.match(r"(?is)\s*(INSERT|UPDATE|DELETE)\b", statement):
            return m.group(1), m.group(2)
        return statement, None

    def _returning_rows(self, statement: str, returning: str):
        """Evaluate a RETURNING clause for INSERT ... VALUES: projects the
        requested expressions over the literal tuples (the rows just
        written). Mirrors SQLite semantics for the VALUES form; for
        INSERT...SELECT the reference-equivalent result is the source
        SELECT itself, which callers can issue directly."""
        import re

        m = re.search(
            r"(?is)\bINSERT\s+INTO\s+(\w+)\s*(\(([^)]*)\))?\s*VALUES\b(.*)$",
            statement,
        )
        if not m:
            return [], []
        table, cols, values = m.group(1), m.group(3), m.group(4)
        if cols:
            col_list = [c.strip() for c in cols.split(",")]
        else:
            col_list = self.spark.table(table).columns
        proj = "*" if returning.strip() == "*" else returning
        df = self.spark.sql(
            f"SELECT {proj} FROM (VALUES {values.strip().rstrip(';')} "
            f"AS t({', '.join(col_list)}))"
        )
        return df.collect(), list(df.columns)

    def _try_dml(self, statement: str, returning: str | None = None):
        """Intercept UPDATE/DELETE/upsert statements (unsupported by Spark
        on parquet v1) and route them through the rewrite path. Returns
        (changes, returning_rows, returning_cols) or None if not
        intercepted (plain INSERT falls through to Spark's native
        INSERT). RETURNING (SQLite >= 3.35 applies it to every DML form)
        projects over the post-statement image of the affected rows."""
        import re

        m = re.match(
            r"(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.*?)"
            r"(?:\s+FROM\s+(.+?))?(?:\s+WHERE\s+(.*))?\s*;?\s*$",
            statement,
        )
        if m:
            table, set_clause, from_clause, where = m.groups()
            assignments = {}
            for part in self._split_top_level(set_clause):
                c, _, e = part.partition("=")
                assignments[c.strip()] = e.strip()
            if from_clause:
                new_df, changes = self._update_from_plan(
                    self.spark.table(table), table, assignments,
                    from_clause, where,
                )
                new_df.write.mode("overwrite").saveAsTable(table)
                return changes, [], []
            r = self.update_table(table, assignments, where, returning)
            return r if returning else (r, [], [])
        m = re.match(
            r"(?is)\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
            statement,
        )
        if m:
            r = self.delete_from(m.group(1), m.group(2), returning)
            return r if returning else (r, [], [])
        parsed = self._parse_insert_upsert(statement)
        if parsed is not None:
            return self._run_insert_upsert(parsed, returning)
        return None

    def _returning_df(self, df: DataFrame, returning: str) -> DataFrame:
        exprs = (
            ["*"]
            if returning.strip() == "*"
            else [e.strip() for e in self._split_top_level(returning)]
        )
        return df.selectExpr(*exprs)

    @classmethod
    def _insert_values_count(cls, statement: str) -> int:
        """`changes` for INSERT ... VALUES: the tuple count, parsed — the
        reference reads sqlite3_changes after DML (resolver.go:127-130);
        plain-parquet INSERT returns no commit metrics, so the engine
        counts the literal rows instead (0 for INSERT...SELECT, which
        callers route through insert_select for an exact count)."""
        import re

        m = re.search(r"(?is)\bINSERT\s+INTO\b.*?\bVALUES\b(.*)$", statement)
        if not m:
            return 0
        tuples = [
            p for p in cls._split_top_level(m.group(1)) if p.strip().startswith("(")
        ]
        return len(tuples)

    @staticmethod
    def _split_top_level(s: str) -> list[str]:
        """Split on commas not nested in parens/quotes."""
        out, depth, cur, in_str = [], 0, [], False
        for ch in s:
            if ch == "'":
                in_str = not in_str
            elif not in_str:
                if ch in "([":
                    depth += 1
                elif ch in ")]":
                    depth -= 1
                elif ch == "," and depth == 0:
                    out.append("".join(cur))
                    cur = []
                    continue
            cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out

    # -- catalog / namespace management (A21 analog, §1.1) -----------------

    def create_database(self, name: str) -> None:
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{name}`")

    def drop_database(self, name: str) -> None:
        self.spark.sql(f"DROP DATABASE IF EXISTS `{name}` CASCADE")

    def create_branch(self, database: str, branch: str, tables: list[str]) -> str:
        """Fork a database: copy-on-read snapshot of each table into a new
        namespace `database__branch` (reference branch model:
        pkg/database/branch.go:15-30; fork-by-copy pkg/backups/restore.go:29-56).
        With a Delta catalog this becomes SHALLOW CLONE; on plain parquet we
        materialize a snapshot copy. The O(metadata) fork for large tables
        is snapshots.VersionedStore.create_branch (shared immutable files,
        manifest-only fork)."""
        ns = f"{database}__{branch}"
        self.create_database(ns)
        for t in tables:
            self.spark.sql(
                f"CREATE TABLE IF NOT EXISTS `{ns}`.`{t}` AS "
                f"SELECT * FROM `{database}`.`{t}`"
            )
        return ns

    def register_parquet_dir(self, sf_dir: str, tables) -> None:
        for t in tables:
            self.spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)

    # -- metrics (A22) ------------------------------------------------------

    def query_metrics(self) -> DataFrame:
        return self.metrics.to_df(self.spark)

    # -- interactive transactions (A9/A10) ----------------------------------

    def begin(
        self, kind: str = "DEFERRED", timeout: float = 300.0
    ) -> "Transaction":
        """BEGIN an interactive multi-statement transaction (reference:
        HTTP-scoped transactions bound to a dedicated connection with a
        5-minute timeout — pkg/database/transaction.go:17-82, manager
        transaction_manager.go:1-88; begin-kind selection DEFERRED for
        reads / IMMEDIATE for writes, database_connection.go:759-821).
        Returns a Transaction whose id can be passed to ``sql(...,
        transaction_id=)`` — the wire model carries transaction_id per
        query (pkg/database/query_input.go:28-32)."""
        txn = Transaction(self, kind=kind, timeout=timeout)
        self._transactions[txn.transaction_id] = txn
        return txn

    def transaction(self, kind: str = "DEFERRED", timeout: float = 300.0):
        """Context-manager form: commit on success, rollback on error."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            txn = self.begin(kind=kind, timeout=timeout)
            try:
                yield txn
                txn.commit()
            except BaseException:
                txn.rollback()
                raise

        return _cm()


class Transaction:
    """Interactive multi-statement transaction over Spark, emulating the
    reference's BEGIN…COMMIT/ROLLBACK surface (A9/A10) with copy-on-write
    **shadow views**.

    The first write to a table inside the txn builds a derived DataFrame
    plan over the table's current state and registers it as a temp view
    under the same name — temp views shadow catalog tables during
    resolution, so later statements in the txn (reads and writes) see the
    txn's own uncommitted state, while nothing is written to storage.
    COMMIT localCheckpoints each shadow (cutting lineage off the files
    about to be replaced) and overwrites the catalog table: one
    distributed write per touched table, and a ROLLBACK costs nothing
    (drop the views). This is the Spark-idiomatic inversion of the
    reference's design — SQLite holds locks and writes WAL frames per
    statement, rolling back by discarding them (pkg/database/
    transaction.go, sqlite3/connection.go:118-156); immutable storage
    lets us defer ALL writes to commit instead.

    Scope/deviations: single-session single-writer (the engine model,
    SURVEY §2.A A4/A5) — cross-session isolation is out of scope; DDL
    inside a txn applies immediately (non-transactional), as in the
    reference where DDL takes the same write path but rollback of DDL is
    rare-path. Timeout mirrors the reference's 5-minute default: an
    expired txn auto-rolls-back and every later statement fails
    (transaction.go:55-56)."""

    _seq = 0

    def __init__(self, engine: Engine, kind: str, timeout: float) -> None:
        kind = kind.upper()
        if kind not in ("DEFERRED", "IMMEDIATE"):
            raise ValueError("kind must be DEFERRED or IMMEDIATE")
        Transaction._seq += 1
        self.engine = engine
        self.kind = kind
        self.timeout = timeout
        self.started_at = time.time()
        self.transaction_id = f"txn-{Transaction._seq}"
        self.state = "active"  # active | committed | rolled_back | expired
        # table -> (pre-image DataFrame or None for catalog tables, was_temp)
        self._touched: dict[str, tuple] = {}
        # name -> {"touched": snapshot, "views": {table: DataFrame}};
        # insertion order = savepoint stack order (SQLite semantics)
        self._savepoints: dict[str, dict] = {}

    # -- lifecycle ----------------------------------------------------------

    def _check_live(self) -> None:
        if self.state == "active" and time.time() - self.started_at > self.timeout:
            self.rollback()
            self.state = "expired"
        if self.state != "active":
            raise RuntimeError(f"transaction {self.transaction_id} is {self.state}")

    def commit(self) -> None:
        self._check_live()
        spark = self.engine.spark
        for table, (pre_image, was_temp) in self._touched.items():
            if was_temp:
                continue  # shadow view IS the committed state for views
            final = spark.table(table).localCheckpoint(eager=True)
            spark.catalog.dropTempView(table)
            final.write.mode("overwrite").saveAsTable(table)
        self.state = "committed"
        self.engine._transactions.pop(self.transaction_id, None)

    def rollback(self) -> None:
        if self.state != "active":
            return
        spark = self.engine.spark
        for table, (pre_image, was_temp) in self._touched.items():
            if was_temp and pre_image is not None:
                pre_image.createOrReplaceTempView(table)
            else:
                spark.catalog.dropTempView(table)
        self.state = "rolled_back"
        self.engine._transactions.pop(self.transaction_id, None)

    # -- savepoints (SQLite SAVEPOINT/RELEASE/ROLLBACK TO; the reference
    # grants database:savepoint, pkg/auth/database_privileges.go:43) -----

    def savepoint(self, name: str) -> None:
        """Mark the current txn state. Shadow views are immutable
        DataFrame plans, so a savepoint is O(touched tables) plan refs —
        no data copied (SQLite stacks WAL offsets the same way)."""
        self._check_live()
        spark = self.engine.spark
        key = name.lower()
        if key in self._savepoints:  # SQLite: reusing a name moves it
            self._savepoints.pop(key)
        self._savepoints[key] = {
            "touched": dict(self._touched),
            "views": {t: spark.table(t) for t in self._touched},
        }

    def _drop_after(self, key: str, inclusive: bool) -> None:
        names = list(self._savepoints)
        idx = names.index(key)
        for n in names[idx if inclusive else idx + 1 :]:
            self._savepoints.pop(n)

    def rollback_to(self, name: str) -> None:
        """Revert to the savepoint's state; the savepoint survives
        (SQLite ROLLBACK TO), later savepoints are discarded."""
        self._check_live()
        key = name.lower()
        sp = self._savepoints.get(key)
        if sp is None:
            raise LookupError(f"no such savepoint: {name}")
        spark = self.engine.spark
        for t, (pre, was_temp) in self._touched.items():
            if t in sp["views"]:
                sp["views"][t].createOrReplaceTempView(t)
            elif was_temp and pre is not None:
                pre.createOrReplaceTempView(t)  # untouched at savepoint
            else:
                spark.catalog.dropTempView(t)
        self._touched = dict(sp["touched"])
        self._drop_after(key, inclusive=False)

    def release(self, name: str) -> None:
        """Remove the savepoint (and its descendants), keeping state —
        SQLite RELEASE folds the savepoint into its parent."""
        self._check_live()
        key = name.lower()
        if key not in self._savepoints:
            raise LookupError(f"no such savepoint: {name}")
        self._drop_after(key, inclusive=True)

    # -- statement execution ------------------------------------------------

    def sql(self, statement: str, params: list | dict | None = None) -> QueryResult:
        self._check_live()
        t0 = time.time()
        stmt_class = classify_statement(statement)
        if stmt_class == "TCL":
            import re as _re

            toks = _re.findall(r"\w+", statement.upper())
            raw = _re.findall(r"\w+", statement)
            if toks[0] == "SAVEPOINT":
                self.savepoint(raw[-1])
            elif toks[0] == "RELEASE":
                self.release(raw[-1])
            elif toks[0] == "ROLLBACK" and len(toks) > 1 and toks[1] == "TO":
                self.rollback_to(raw[-1])
            elif toks[0] in ("COMMIT", "END"):
                self.commit()
            elif toks[0] == "ROLLBACK":
                self.rollback()
            else:
                raise RuntimeError(f"unsupported TCL inside txn: {statement}")
            latency = time.time() - t0
            self.engine.metrics.record(statement, latency)
            return QueryResult(
                columns=[], rows=[], row_count=0, changes=0,
                latency=latency, statement_class="TCL",
            )
        if stmt_class == "DML":
            changes = self._apply_dml(statement, params)
            latency = time.time() - t0
            self.engine.metrics.record(statement, latency)
            return QueryResult(
                columns=[], rows=[], row_count=0, changes=changes,
                latency=latency, statement_class=stmt_class,
            )
        # DQL/DDL/OTHER: session resolution already sees shadow views.
        return self.engine.sql(statement, params)

    def _shadow(self, table: str) -> None:
        """Record the pre-image of `table` on first touch."""
        if table in self._touched:
            return
        spark = self.engine.spark
        try:
            was_temp = spark.catalog.getTable(table).tableType == "TEMPORARY"
        except Exception:
            raise ValueError(f"unknown table {table!r}") from None
        pre_image = spark.table(table) if was_temp else None
        self._touched[table] = (pre_image, was_temp)

    def _publish(self, table: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(table)

    def _apply_dml(self, statement: str, params) -> int:
        import re

        spark = self.engine.spark
        sql_text, args = Engine._bind(statement, params)
        parsed = self.engine._parse_insert_upsert(sql_text)
        if parsed is not None:
            # upsert inside a txn: same one-pass plan, applied to the
            # shadow view and re-published (no table write until COMMIT)
            table = parsed["table"]
            self._shadow(table)
            tgt = spark.table(table)
            src_raw = self.engine._insert_source(
                table, parsed["cols"], parsed["body"]
            )
            src = Engine._dedup_source(
                src_raw, parsed["conflict_cols"],
                keep_last=(parsed["action"] != "nothing"),
            )
            if parsed["action"] == "nothing":
                new_rows = src.join(
                    tgt, on=parsed["conflict_cols"], how="left_anti"
                ).select(tgt.columns).localCheckpoint(eager=True)
                changes = new_rows.count()
                self._publish(table, tgt.unionByName(new_rows))
                return changes
            if parsed["action"] == "replace":
                assignments, upd_where = (
                    {c: f"excluded.{c}" for c in tgt.columns}, None
                )
            else:
                assignments, upd_where = (
                    parsed["assignments"], parsed["upd_where"]
                )
            new_df, _affected, changes = self.engine._upsert_plan(
                tgt, src, parsed["conflict_cols"], assignments, upd_where
            )
            if parsed["action"] == "replace":
                # SQLite counts every processed row (see _run_insert_upsert)
                changes = Engine._source_row_count(parsed["body"], src_raw)
            self._publish(table, new_df)
            return changes
        m = re.match(
            r"(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.*?)"
            r"(?:\s+FROM\s+(.+?))?(?:\s+WHERE\s+(.*))?\s*;?\s*$",
            sql_text,
        )
        if m and m.group(3):
            table, set_clause, from_clause, where = m.groups()
            self._shadow(table)
            assignments = {}
            for part in Engine._split_top_level(set_clause):
                c, _, e = part.partition("=")
                assignments[c.strip()] = e.strip()
            new_df, changes = self.engine._update_from_plan(
                spark.table(table), table, assignments, from_clause, where
            )
            self._publish(table, new_df)
            return changes
        m = re.match(
            r"(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?\s*$",
            sql_text,
        )
        if m:
            from pyspark.sql import functions as F

            table, set_clause, where = m.group(1), m.group(2), m.group(3)
            self._shadow(table)
            df = spark.table(table)
            cond = F.expr(where) if where else F.lit(True)
            changes = df.filter(cond).count()
            assignments = {}
            for part in Engine._split_top_level(set_clause):
                c, _, e = part.partition("=")
                assignments[c.strip()] = e.strip()
            cols = [
                F.when(cond, F.expr(assignments[c])).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
                for c in df.columns
            ]
            self._publish(table, df.select(cols))
            return changes
        m = re.match(
            r"(?is)\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*))?\s*$", sql_text
        )
        if m:
            from pyspark.sql import functions as F

            table, where = m.group(1), m.group(2)
            self._shadow(table)
            df = spark.table(table)
            cond = F.expr(where) if where else F.lit(True)
            changes = df.filter(cond).count()
            self._publish(table, df.filter(~cond))
            return changes
        m = re.match(
            r"(?is)\s*INSERT\s+INTO\s+(\w+)\s*(\(([^)]*)\))?\s*"
            r"(VALUES\b.*|SELECT\b.*|WITH\b.*)$",
            sql_text,
        )
        if m:
            table, cols, body = m.group(1), m.group(3), m.group(4)
            self._shadow(table)
            df = spark.table(table)
            col_list = (
                [c.strip() for c in cols.split(",")] if cols else df.columns
            )
            if body.upper().startswith("VALUES"):
                src_sql = (
                    f"SELECT * FROM ({body.rstrip(';')}) "
                    f"AS t({', '.join(col_list)})"
                )
            else:
                src_sql = body.rstrip(";")
            src = (
                spark.sql(src_sql, args=args) if args else spark.sql(src_sql)
            )
            src = src.toDF(*col_list)
            for c in df.columns:  # missing columns -> NULL, like INSERT(cols)
                if c not in col_list:
                    from pyspark.sql import functions as F

                    src = src.withColumn(c, F.lit(None).cast(dict(df.dtypes)[c]))
            src = src.select(*df.columns)
            for c, t in df.dtypes:
                src = src.withColumn(c, src[c].cast(t))
            changes = src.count()
            self._publish(table, df.unionByName(src))
            return changes
        raise ValueError(f"unsupported DML inside transaction: {statement[:60]}")
