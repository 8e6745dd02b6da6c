"""SQL-text dialect rewriter: SQLite scalar-function calls -> Spark SQL.

The compat layer (functions/compat.py) gives every SQLite scalar a
Python Column helper, and a handful of names are SQL-registered as
typed temporary functions — but typed SQL UDFs cannot express the
generic/variadic SQLite forms (iif over any type, char(...) variadic,
scalar max/min, strftime's literal format, GLOB's pattern language,
datetime modifiers). Those become a *textual* rewrite here, applied by
``Engine.sql`` after parameter binding: each call site is located with
a quote- and paren-aware scanner (never inside string literals,
requires word boundary, arguments split at top level and rewritten
recursively) and replaced with the equivalent Spark expression.

Reference surface: sqlite.org/lang_corefunc.html and lang_datefunc.html
(the reference enables the full core-function set, pkg/sqlite3).
Unsupported spots are left untouched so the resolver error names the
original function.
"""

from __future__ import annotations

import json
import re

from litebase_spark.functions.compat import strftime_format

_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _split_args(s: str) -> list[str] | None:
    """Split a call's argument text at top-level commas; None if the
    text is unbalanced. Tracks single-quoted strings ('' escapes)."""
    args, depth, cur, i = [], 0, [], 0
    while i < len(s):
        ch = s[i]
        if ch == "'":
            j = i + 1
            while j < len(s):
                if s[j] == "'":
                    if j + 1 < len(s) and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            cur.append(s[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return None
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    args.append("".join(cur).strip())
    return args


def _literal(arg: str) -> str | None:
    """The Python string value of a SQL single-quoted literal, else None."""
    a = arg.strip()
    if len(a) >= 2 and a[0] == "'" and a[-1] == "'":
        return a[1:-1].replace("''", "'")
    return None


def _glob_regex(pattern: str) -> str:
    """SQLite GLOB pattern -> anchored Java regex (mirrors
    compat.glob_match, as text)."""
    out, i = [], 0
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
                body = pattern[i + 1 : j]
                if body.startswith("^"):
                    body = "^" + re.escape(body[1:])
                else:
                    body = re.escape(body)
                # keep ranges like a-z usable
                body = body.replace("\\-", "-")
                out.append(f"[{body}]")
                i = j
        else:
            out.append(re.escape(ch))
        i += 1
    return "^" + "".join(out) + "$"


_TRUNC = {"start of day": "day", "start of month": "month",
          "start of year": "year"}
_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _apply_modifier(expr: str, mod: str) -> str | None:
    """One SQLite date modifier applied to a timestamp expression, as
    SQL text (mirrors compat.sqlite_datetime)."""
    m = mod.strip().lower()
    if m in _TRUNC:
        return f"date_trunc('{_TRUNC[m]}', {expr})"
    sign, body = 1, m
    if m.startswith(("+", "-")):
        sign = -1 if m[0] == "-" else 1
        body = m[1:].strip()
    num_s, _, unit = body.partition(" ")
    try:
        num = float(num_s)
    except ValueError:
        return None
    unit = unit.strip().rstrip("s")
    if unit in _SECONDS:
        delta = int(sign * num * _SECONDS[unit] * 1e6)
        return f"timestamp_micros(unix_micros({expr}) + {delta})"
    if unit == "month":
        return f"({expr} + INTERVAL {int(sign * num)} MONTH)"
    if unit == "year":
        return f"({expr} + INTERVAL {int(sign * num * 12)} MONTH)"
    return None


def _dt_chain(ts_arg: str, mods: list[str]) -> str | None:
    expr = f"CAST({ts_arg} AS TIMESTAMP)"
    for a in mods:
        lit = _literal(a)
        if lit is None:
            return None
        expr2 = _apply_modifier(expr, lit)
        if expr2 is None:
            return None
        expr = expr2
    return expr


_TYPEOF_CASE = (
    "CASE WHEN typeof({a}) = 'void' THEN 'null' "
    "WHEN typeof({a}) = 'string' THEN 'text' "
    "WHEN typeof({a}) IN ('int','bigint','smallint','tinyint','boolean')"
    " THEN 'integer' "
    "WHEN typeof({a}) IN ('double','float') OR typeof({a}) LIKE 'decimal%'"
    " THEN 'real' "
    "WHEN typeof({a}) = 'binary' THEN 'blob' "
    "ELSE typeof({a}) END"
)


_PRINTF_DIR = re.compile(r"%[-+ #0]*\d*(?:\.\d+)?([diouxXeEfgGcs])")


def _printf_call(args: list[str]) -> str:
    """printf with SQLite's numeric laxity: when the format is a
    literal, cast each argument to the type its directive expects
    (Spark's printf raises on e.g. %f over a DECIMAL literal)."""
    fmt = _literal(args[0])
    if fmt is None or len(args) == 1:
        return f"printf({', '.join(args)})"
    kinds = _PRINTF_DIR.findall(fmt)
    cast_args = [args[0]]
    for i, a in enumerate(args[1:]):
        kind = kinds[i] if i < len(kinds) else "s"
        if kind in "eEfgG":
            cast_args.append(f"CAST({a} AS DOUBLE)")
        elif kind in "diouxX":
            cast_args.append(f"CAST({a} AS BIGINT)")
        else:
            cast_args.append(f"CAST({a} AS STRING)")
    return f"printf({', '.join(cast_args)})"


_JSON_PATH_KEY_RE = re.compile(r"^\$\.([A-Za-z_][A-Za-z0-9_]*)$")

# json_* / jsonb_* modify family accepted at a literal TOP-LEVEL path
# ('$.key'); nested paths are left unrewritten so the resolver error
# names the original function instead of silently mis-editing.
_JSON_MODIFY = {
    "json_set", "jsonb_set",
    "json_insert", "jsonb_insert",
    "json_replace", "jsonb_replace",
}


def _json_path_key(arg: str) -> str | None:
    p = _literal(arg)
    if p is None:
        return None
    m = _JSON_PATH_KEY_RE.match(p)
    return m.group(1).replace("'", "''") if m else None


_VMAP = "'map<string,variant>'"
_EMPTY_VMAP = f"from_json('{{}}', {_VMAP})"

# json_patch recurses into nested objects (RFC 7386); the generated
# merge expression is unrolled to this depth, and a patch value that
# is STILL an object past it raises loudly instead of silently
# wholesale-replacing (same bounded-recursion policy as
# json_tree_walk's max_depth)
_PATCH_DEPTH = 3


def _vmap(x: str) -> str:
    """Parse a TEXT JSON document into map<string,variant> — NULL for
    a non-object document (array/scalar), which the callers use as
    the SQLite 'path does not match, return doc unchanged' guard."""
    return f"from_json({x}, {_VMAP})"


def _let(bind: str, var: str, body: str) -> str:
    """Evaluate `bind` ONCE per row and make it available to `body`
    as lambda variable `var` — a let-binding built from a 1-element
    transform. Why: these rewrites repeat the parsed-document
    subexpression (null guard + contains guard + the edit itself),
    and the higher-order map functions force the interpreted
    projection path, where Spark does NO common-subexpression
    elimination — each textual repeat re-parses the document.
    Measured at x100 (640M-row events): jsonb_set fell 11.4 s ->
    ~4 s from exactly this. Lambda scoping nests (inner lambdas see
    outer vars), so merge levels can reference the bound document."""
    return f"element_at(transform(array({bind}), {var} -> {body}), 1)"


def _canon_render(m: str) -> str:
    """Render a map<string,variant> to canonical TEXT JSON in ONE
    pass: sort the top-level entries by key (variant values already
    carry sorted nested keys out of from_json), then to_json. This
    replaces the old to_json -> parse_json -> to_json canonicalizing
    round-trip, which cost an extra full-document parse AND render
    per modify call — the per-row money at 100 TB (round-12 bench:
    jsonb chain 45x DuckDB at x100 from exactly this)."""
    return (
        f"to_json(map_from_entries(array_sort(map_entries({m}), "
        f"(l, r) -> CASE WHEN l.key < r.key THEN -1 "
        f"WHEN l.key > r.key THEN 1 ELSE 0 END)))"
    )


def _merge_patch(a: str, b: str, depth: int) -> str:
    """RFC-7386 MergePatch of two map<string,variant> expressions ->
    merged map expression. `a` may be NULL (non-object doc: treated
    as {}, matching SQLite json_patch('[1,2]','{...}') -> '{...}');
    the caller guards `b` non-null. Recursive object-vs-object merges
    are unrolled `depth` levels; past that a nested-object patch
    value raises rather than silently diverging from SQLite.

    Each unrolled level needs its own lambda variable (e3, e2, ...)
    — the inner transform would otherwise shadow the outer binding
    its sub-expressions still reference."""
    e = f"e{depth}"
    aa = f"coalesce({a}, {_EMPTY_VMAP})"
    keep_a = f"map_filter({aa}, (k, v) -> NOT map_contains_key({b}, k))"
    if depth <= 0:
        val = (
            f"CASE WHEN startswith(to_json({e}.value), '{{') "
            f"THEN raise_error('json_patch: object nesting deeper "
            f"than {_PATCH_DEPTH} levels is unsupported') "
            f"ELSE {e}.value END"
        )
    else:
        sub_a = f"from_json(to_json(element_at({aa}, {e}.key)), {_VMAP})"
        sub_b = f"from_json(to_json({e}.value), {_VMAP})"
        merged = _merge_patch(sub_a, sub_b, depth - 1)
        # parse_json re-canonicalizes the nested level; the top-level
        # _canon_render pass only sorts depth-0 keys
        val = (
            f"CASE WHEN startswith(to_json({e}.value), '{{') "
            f"THEN parse_json(to_json({merged})) "
            f"ELSE {e}.value END"
        )
    from_b = (
        f"map_from_entries(transform(filter(map_entries({b}), "
        f"{e} -> NOT is_variant_null({e}.value)), "
        f"{e} -> struct({e}.key, {val})))"
    )
    return f"map_concat({keep_a}, {from_b})"


def _json_xform(n: str, args: list[str], j: str) -> str | None:
    """SQLite JSON1 family -> Spark SQL (SURVEY §2.B; the reference
    enables JSON1 wholesale, pkg/sqlite3/sqlite3.go:22, which since
    SQLite 3.45 includes the jsonb_* binary-storage variants —
    present in the reference's 3.49.1).

    jsonb is a STORAGE optimization, not a semantics change
    (sqlite.org/json1.html#jsonb): every jsonb_* accepts the same
    arguments and represents the same document as its json_* twin, so
    this engine accepts both spellings and returns TEXT JSON for
    both — the documented deviation (columnar parquet + Spark's
    variant kernel already fill jsonb's decode-saving role; a binary
    wire format would buy nothing here). Second deviation: outputs
    canonicalize key order (sorted, matching parse_json) where SQLite
    preserves insertion order. Third: json_patch merges nested
    objects recursively to _PATCH_DEPTH levels and raises loudly
    past that (SQLite recurses arbitrarily). Values keep their JSON
    types end-to-end: documents round-trip through Spark's
    map<string,variant>, never through a stringly-typed map; each
    modify call costs ONE document parse and ONE render
    (_canon_render sorts entries in place of the old
    parse_json(to_json(...)) round-trip)."""
    if n in ("json", "jsonb") and len(args) == 1:
        return f"to_json(parse_json({args[0]}))"
    if n in ("json_extract", "jsonb_extract") and len(args) == 2:
        return f"get_json_object({args[0]}, {args[1]})"
    if n in ("json_array", "jsonb_array"):
        return f"to_json(array({j}))" if args else "'[]'"
    if n in ("json_object", "jsonb_object") and len(args) % 2 == 0:
        return f"to_json(named_struct({j}))" if args else "'{}'"
    if n in ("json_group_array", "jsonb_group_array") and len(args) == 1:
        return f"to_json(collect_list({args[0]}))"
    if n in ("json_group_object", "jsonb_group_object") and len(args) == 2:
        return f"to_json(map_from_entries(collect_list(struct({j}))))"
    if n == "json_valid" and len(args) == 1:
        return f"(try_parse_json({args[0]}) IS NOT NULL)"
    if n in ("json_array_length", "jsonb_array_length") and len(args) == 2:
        return f"json_array_length(get_json_object({args[0]}, {args[1]}))"
    if n == "jsonb_array_length" and len(args) == 1:
        return f"json_array_length({args[0]})"
    if n in _JSON_MODIFY and len(args) == 3:
        key = _json_path_key(args[1])
        if key is None:
            return None
        x, val = args[0], args[2]
        # lift an arbitrary SQL value to variant: a direct cast, no
        # render/re-parse round-trip (strings become JSON strings,
        # numerics keep their type — same lift as the old
        # parse_json(to_json(array(v))) path, minus two conversions)
        vv = f"cast({val} as variant)"
        set_expr = _canon_render(
            f"map_concat(map_filter(m0, (k, v) -> k != '{key}'), "
            f"map('{key}', {vv}))"
        )
        # non-object document (array/scalar): a '$.key' path matches
        # nothing — SQLite returns the document unchanged (and a
        # malformed document still raises, via parse_json)
        nonobj = f"to_json(parse_json({x}))"
        if n.endswith("_set"):
            body = f"CASE WHEN m0 IS NULL THEN {nonobj} ELSE {set_expr} END"
        else:
            hit, miss = (
                (set_expr, _canon_render("m0"))
                if n.endswith("_replace")
                else (_canon_render("m0"), set_expr)
            )
            body = (
                f"CASE WHEN m0 IS NULL THEN {nonobj} "
                f"WHEN map_contains_key(m0, '{key}') THEN {hit} "
                f"ELSE {miss} END"
            )
        return f"({_let(_vmap(x), 'm0', body)})"
    if n in ("json_remove", "jsonb_remove") and len(args) == 2:
        key = _json_path_key(args[1])
        if key is None:
            return None
        removed = _canon_render(f"map_filter(m0, (k, v) -> k != '{key}')")
        body = (
            f"CASE WHEN m0 IS NULL THEN to_json(parse_json({args[0]})) "
            f"ELSE {removed} END"
        )
        return f"({_let(_vmap(args[0]), 'm0', body)})"
    if n in ("json_patch", "jsonb_patch") and len(args) == 2:
        # RFC 7386 MergePatch, recursive to _PATCH_DEPTH object levels
        # (loud raise past that): patch nulls delete, objects merge
        # recursively, everything else overwrites/inserts; a
        # non-object patch replaces the document wholesale and a
        # non-object document is treated as {} — all per SQLite.
        fast = _flat_literal_patch(args[0], args[1])
        if fast is not None:
            return fast
        # general path: both documents let-bound (one parse each; a
        # literal patch constant-folds away entirely)
        merged = _canon_render(_merge_patch("a0", "b0", _PATCH_DEPTH))
        body = (
            f"CASE WHEN b0 IS NULL THEN to_json(parse_json({args[1]})) "
            f"ELSE {merged} END"
        )
        inner = _let(_vmap(args[0]), "a0", _let(_vmap(args[1]), "b0", body))
        return (
            f"(CASE WHEN {args[0]} IS NULL OR {args[1]} IS NULL "
            f"THEN CAST(NULL AS STRING) "
            f"ELSE {inner} END)"
        )
    return None


def _sq(s: str) -> str:
    return s.replace("'", "''")


def _flat_literal_patch(x: str, parg: str) -> str | None:
    """Fast path for json_patch(doc, '<flat literal object>') — the
    overwhelmingly common CDC/upsert shape: the patch is folded at
    REWRITE time (keys to delete, values to set, and the
    non-object-doc result are all Python-side constants), so the
    per-row plan is one parse + filter + concat + sorted render —
    the same cost as json_remove, ~2x cheaper at x100 than the
    general recursive-merge expression. Returns None (general path)
    for non-literal patches or patches with nested-object values."""
    lit = _literal(parg)
    if lit is None:
        return None
    try:
        patch = json.loads(lit)
    except ValueError:
        return None
    if not isinstance(patch, dict):
        return None
    if any(isinstance(v, dict) for v in patch.values()):
        return None
    keys_sql = ", ".join(f"'{_sq(k)}'" for k in patch)
    updates = {k: v for k, v in patch.items() if v is not None}
    if updates:
        pairs = ", ".join(
            f"'{_sq(k)}', parse_json('{_sq(json.dumps(v))}')"
            for k, v in updates.items()
        )
        merged_map = (
            f"map_concat(map_filter(m0, (k, v) -> "
            f"NOT array_contains(array({keys_sql}), k)), map({pairs}))"
        )
    else:
        merged_map = (
            f"map_filter(m0, (k, v) -> "
            f"NOT array_contains(array({keys_sql}), k))"
        )
    # non-object doc: mergepatch({}, patch) = patch minus nulls —
    # a Python-side constant
    nonobj = json.dumps(
        dict(sorted(updates.items())), separators=(",", ":")
    )
    body = (
        f"CASE WHEN m0 IS NULL THEN '{_sq(nonobj)}' "
        f"ELSE {_canon_render(merged_map)} END"
    )
    return (
        f"(CASE WHEN {x} IS NULL THEN CAST(NULL AS STRING) "
        f"ELSE {_let(_vmap(x), 'm0', body)} END)"
    )


def _xform(name: str, args: list[str]) -> str | None:
    """Replacement text for one call, or None to leave it unchanged."""
    n = name.lower()
    # _split_args('') yields [''] — normalize so zero-arg forms
    # (json_array() -> '[]', json_object() -> '{}') actually fire
    if args == [""]:
        args = []
    j = ", ".join(args)
    if n.startswith(("json", "jsonb")):
        return _json_xform(n, args, j)
    if n == "iif" and len(args) == 3:
        return f"if({j})"
    if n in ("format", "printf") and len(args) >= 1:
        return _printf_call(args)
    if n in ("ltrim", "rtrim") and len(args) == 2:
        # SQLite: ltrim(x, chars); Spark's two-arg form is
        # (trimStr, srcStr) — swap
        return f"{n}({args[1]}, {args[0]})"
    if n == "trim" and len(args) == 2:
        return f"btrim({j})"  # btrim takes (str, trimStr) like SQLite
    if n in ("max", "min") and len(args) >= 2:
        return f"{'greatest' if n == 'max' else 'least'}({j})"
    if n == "char" and len(args) >= 2:
        return "concat(" + ", ".join(f"char({a})" for a in args) + ")"
    if n == "like" and len(args) in (2, 3):
        esc = f" ESCAPE {args[2]}" if len(args) == 3 else ""
        return f"(({args[1]}) LIKE ({args[0]}){esc})"
    if n == "quote" and len(args) == 1:
        return f"sqlite_quote({j})"
    if n == "unicode" and len(args) == 1:
        return f"ascii({j})"
    if n == "zeroblob" and len(args) == 1:
        return f"unhex(repeat('00', {args[0]}))"
    if n == "typeof" and len(args) == 1:
        return _TYPEOF_CASE.format(a=args[0])
    if n == "glob" and len(args) == 2:
        pat = _literal(args[0])
        if pat is None:
            return None
        rx = _glob_regex(pat).replace("\\", "\\\\").replace("'", "''")
        return f"(({args[1]}) RLIKE '{rx}')"
    if n == "strftime" and len(args) >= 2:
        fmt = _literal(args[0])
        chain = _dt_chain(args[1], args[2:])
        if fmt is None or chain is None:
            return None
        if fmt == "%s":
            return f"CAST(unix_timestamp({chain}) AS STRING)"
        try:
            jfmt = strftime_format(fmt)
        except ValueError:
            return None
        return f"date_format({chain}, '{jfmt}')"
    if n == "datetime" and len(args) >= 1:
        chain = _dt_chain(args[0], args[1:])
        if chain is None:
            return None
        return f"date_format({chain}, 'yyyy-MM-dd HH:mm:ss')"
    if n == "date" and len(args) >= 2:
        chain = _dt_chain(args[0], args[1:])
        if chain is None:
            return None
        return f"date_format({chain}, 'yyyy-MM-dd')"
    if n == "time" and len(args) >= 1:
        chain = _dt_chain(args[0], args[1:])
        if chain is None:
            return None
        return f"date_format({chain}, 'HH:mm:ss')"
    return None


_NAMES = {
    "iif", "format", "printf", "max", "min", "char", "like", "quote",
    "unicode", "zeroblob", "typeof", "glob", "strftime", "datetime",
    "date", "time", "ltrim", "rtrim", "trim",
    # JSON1 family, both spellings (jsonb_* = SQLite >= 3.45 binary
    # storage variants; accepted, TEXT JSON returned)
    "json", "jsonb", "json_extract", "jsonb_extract",
    "json_array", "jsonb_array", "json_object", "jsonb_object",
    "json_group_array", "jsonb_group_array",
    "json_group_object", "jsonb_group_object",
    "json_valid", "json_array_length", "jsonb_array_length",
    "json_set", "jsonb_set", "json_insert", "jsonb_insert",
    "json_replace", "jsonb_replace", "json_remove", "jsonb_remove",
    "json_patch", "jsonb_patch",
}


def rewrite_sqlite_functions(sql: str) -> str:
    """Rewrite SQLite scalar-function call sites to Spark SQL text."""
    out, i = [], 0
    while i < len(sql):
        ch = sql[i]
        if ch == "'":  # skip string literals wholesale
            j = i + 1
            while j < len(sql):
                if sql[j] == "'":
                    if j + 1 < len(sql) and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        m = _WORD_RE.match(sql, i)
        if m and (i == 0 or not (sql[i - 1].isalnum()
                                 or sql[i - 1] in "_.")):
            word = m.group(0)
            k = m.end()
            while k < len(sql) and sql[k] in " \t\n":
                k += 1
            if word.lower() in _NAMES and k < len(sql) and sql[k] == "(":
                depth, j = 1, k + 1
                while j < len(sql) and depth:
                    if sql[j] == "'":
                        j2 = j + 1
                        while j2 < len(sql):
                            if sql[j2] == "'":
                                if j2 + 1 < len(sql) and sql[j2 + 1] == "'":
                                    j2 += 2
                                    continue
                                break
                            j2 += 1
                        j = j2 + 1
                        continue
                    if sql[j] == "(":
                        depth += 1
                    elif sql[j] == ")":
                        depth -= 1
                    j += 1
                inner = rewrite_sqlite_functions(sql[k + 1 : j - 1])
                args = _split_args(inner)
                repl = _xform(word, args) if args is not None else None
                if repl is not None:
                    out.append(repl)
                else:
                    out.append(sql[i:k + 1])
                    out.append(inner)
                    out.append(")")
                i = j
                continue
            out.append(word)
            i = m.end()
            continue
        out.append(ch)
        i += 1
    return "".join(out)


# -- SQLite integer division ------------------------------------------------
#
# SQLite `/` performs INTEGER division when both operands carry INTEGER
# affinity: 7/2 = 3, -9/2 = -4 (truncation toward zero), 7/0 = NULL.
# Spark `/` always returns DOUBLE. Operand storage classes are not
# recoverable from SQL text in general, but the ubiquitous case a ported
# query hits — integer LITERALS on both sides — is: rewrite
# `<int-literal> / <int-literal> [/ <int-literal> ...]` chains to
# Spark's `DIV`, which shares SQLite's truncation-toward-zero and
# NULL-on-zero (ANSI mode off) semantics and returns BIGINT, so 7/2
# prints 3 and 8/2/2 prints 2, not 3.5/2.0.
#
# The rewrite fires ONLY when the leading literal is genuinely the LEFT
# operand of the division at runtime. Because Spark parses `*`, `/`, `%`
# and `DIV` left-associatively at equal precedence, rewriting `x / 2/3`
# to `x / 2 DIV 3` would make the DIV's left operand the whole `x / 2`
# expression and silently truncate a REAL column. So: if the nearest
# non-whitespace text before the literal ends with another multiplicative
# operator (`*` `/` `%`), an expression tail (`)` quote-close, a
# parameter marker) or any word that is not a known SQL keyword, the
# chain is left as true division. Column-typed operands always remain
# true division (documented deviation; `DIV` is available explicitly).

_INT_DIV_CHAIN_RE = re.compile(
    # multiplicative chain of int literals (*, /, %): not part of an
    # identifier or float on either flank. Literal-only chains are safe
    # to fold left-to-right with DIV because every intermediate stays
    # integral in SQLite (5*1/2 = 2, 8/2*3/4 = 3).
    r"(?<![\w.$])[0-9]+(?:\s*[*/%]\s*[0-9]+)+(?![\w.])"
)

# Words that can legitimately precede a literal expression in SQL text.
# Anything alphanumeric NOT in this set is an identifier / named
# parameter tail, i.e. the literal is a RIGHT operand or invalid SQL —
# either way, don't rewrite.
_KEYWORDS_BEFORE_EXPR = frozenset(
    """select where when then else case and or not on by having limit
    offset set values returning in like glob is between all distinct
    union except intersect escape collate as if elseif do while return
    null true false""".split()
)


def _chain_is_left_operand(seg: str, start: int) -> bool:
    """True when the literal at seg[start] is the left operand of its
    division chain (not the right operand of a preceding same-precedence
    operator or an identifier/parameter)."""
    k = start - 1
    while k >= 0 and seg[k] in " \t\r\n":
        k -= 1
    if k < 0:
        return True
    ch = seg[k]
    if ch in "*/%)?'`\"":
        # preceding multiplicative operator / expression tail / param
        return False
    if ch.isalnum() or ch == "_":
        # walk back the word: keyword => expression starts here (safe);
        # anything else (identifier, named param, digit run) => not the
        # left operand — leave as true division.
        e = k + 1
        while k >= 0 and (seg[k].isalnum() or seg[k] == "_"):
            k -= 1
        word = seg[k + 1:e].lower()
        if word == "div" and k >= 0 and seg[k] not in ":@$":
            # our own prior chain rewrite: left operand is already
            # BIGINT, folding further DIVs is exact
            return True
        if k >= 0 and seg[k] in ":@$":
            return False  # named parameter tail
        return word in _KEYWORDS_BEFORE_EXPR
    return True  # '(' ',' '=' '<' '>' '+' '-' '|' '&' '~' ';' etc.


def rewrite_integer_literal_division(sql: str) -> str:
    """Rewrite int-literal division chains to DIV, skipping string
    literals (a '/' inside quotes is data, not an operator) and any
    chain whose leading literal is not the true left operand."""
    parts = []
    i = 0
    while i < len(sql):
        if sql[i] == "'":
            j = i + 1
            while j < len(sql):
                if sql[j] == "'":
                    if j + 1 < len(sql) and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            parts.append(sql[i:j + 1])
            i = j + 1
            continue
        j = sql.find("'", i)
        seg = sql[i:] if j == -1 else sql[i:j]
        out = []
        pos = 0
        for m in _INT_DIV_CHAIN_RE.finditer(seg):
            if "/" not in m.group(0):
                continue  # *-/% chain with no division: nothing to fold
            if not _chain_is_left_operand(seg, m.start()):
                continue
            out.append(seg[pos:m.start()])
            out.append(re.sub(r"\s*/\s*", " DIV ", m.group(0)))
            pos = m.end()
        out.append(seg[pos:])
        parts.append("".join(out))
        i = len(sql) if j == -1 else j
    return "".join(parts)


# -- double-quoted identifiers ---------------------------------------------
#
# The reference compiles SQLite with -DSQLITE_DQS=0
# (pkg/sqlite3/sqlite3.go:4): double quotes are STRICTLY identifier
# quoting, never string literals. Spark's default parser reads "x" as
# the string 'x', which silently breaks every ported statement that
# quotes a column ("SELECT \"doc_id\" FROM t" would project a constant).
# Rewrite "ident" (with "" escaping, per SQL) to Spark backtick quoting
# outside single-quoted strings. ANSI double-quote mode is not an
# option here: spark.sql.ansi.doubleQuotedIdentifiers requires ANSI
# mode, which the engine keeps off for SQLite-compatible casts.

def rewrite_double_quoted_identifiers(sql: str) -> str:
    out = []
    i = 0
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":  # skip string literals ('' escaping)
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i:j + 1])
            i = j + 1
            continue
        if ch == '"':
            j = i + 1
            ident = []
            while j < n:
                if sql[j] == '"':
                    if j + 1 < n and sql[j + 1] == '"':
                        ident.append('"')
                        j += 2
                        continue
                    break
                ident.append(sql[j])
                j += 1
            name = "".join(ident)
            out.append("`" + name.replace("`", "``") + "`")
            i = j + 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)
