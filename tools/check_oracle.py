"""Local replica of the driver's t2 correctness gate.

Runs every query in the catalog on Spark and its oracle SQL on DuckDB at
sf0.01, canonicalizes both results (columns sorted by name, rows sorted,
timestamps truncated to microseconds), and compares values exactly.

Usage: python tools/check_oracle.py [--sf-dir DIR] [name ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from litebase_spark import operators  # noqa: F401  (registers queries)
from litebase_spark.catalog import REGISTRY, TABLES
from litebase_spark.session import get_spark


def canon_value(v):
    # Int-vs-float strict: the driver's value hash serializes 1 and 1.0
    # differently (round-1 lesson: DuckDB SIGN->TINYINT vs Spark
    # signum->DOUBLE hash-mismatched while plain == compared equal), so
    # tag numeric kind explicitly. Decimal canonicalizes to float — the
    # driver's round-1 results show Decimal/float divergence hashing equal.
    if isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else ("f", v)
    if isinstance(v, dt.datetime):
        return v.replace(microsecond=(v.microsecond // 1) if v.microsecond else 0)
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    import decimal

    if isinstance(v, decimal.Decimal):
        return ("f", float(v))
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon_value(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def changed_query_names(base: str) -> list[str] | None:
    """Names whose defining module differs from `base` (plus the working
    tree). Returns None when a CROSS-CUTTING file changed (catalog,
    session, functions/, plans/, streaming/) — those affect every plan,
    so the caller should run the full sweep."""
    import inspect
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        ["git", "diff", "--name-only", base],
        capture_output=True, text=True, cwd=repo, check=True,
    ).stdout.split()
    if not out and base == "HEAD":
        # clean tree: gate the last commit instead
        out = subprocess.run(
            ["git", "diff", "--name-only", "HEAD~1", "HEAD"],
            capture_output=True, text=True, cwd=repo, check=True,
        ).stdout.split()
    changed = {f for f in out if f.endswith(".py")}
    pkg = {f for f in changed if f.startswith("litebase_spark/")}
    cross = {
        f for f in pkg
        if not f.startswith("litebase_spark/operators/")
    }
    if cross:
        print(f"# cross-cutting change ({sorted(cross)[0]}...): full sweep")
        return None
    names = []
    for name, spec in REGISTRY.items():
        mod = os.path.relpath(inspect.getfile(spec.builder), repo)
        if mod in pkg:
            names.append(name)
    return sorted(names)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--changed", action="store_true",
        help="gate only queries whose defining operator module differs "
        "from --base (default HEAD; falls back to HEAD~1..HEAD on a "
        "clean tree). Cross-cutting changes widen to the full sweep.",
    )
    ap.add_argument("--base", default="HEAD")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.changed and not args.names:
        picked = changed_query_names(args.base)
        if picked is not None:
            if not picked:
                print("0 queries affected by the diff — nothing to gate")
                return
            print(f"# --changed: {len(picked)} queries")
            args.names = picked

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    names = args.names or sorted(REGISTRY)
    n_pass = n_fail = n_noracle = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.builder(spark, args.sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            cur = con.execute(spec.oracle)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = canon_rows(scols, srows)
        dc, dr = canon_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: row count spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: first diff at sorted row {i}:")
            print(f"  cols:  {sc}")
            print(f"  spark: {a}")
            print(f"  duck:  {b}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
