"""Warm-time the Spark side of every registered query at a given SF.

The oracle sweep times Spark+DuckDB together; this isolates OUR side so
plan pathologies (serialized stages, recomputed subtrees) show up as
outliers. Prints one `name seconds rows` line per query, slowest last.

--x K runs the FULL registry against the x-K fact replica
(tools/scale_stress.build_replica — same files BENCH_SF10 uses), so
every query gets a measured at-scale number and outliers can't hide
outside a curated subset. Methodology there: noop WRITE (full column
materialization — count() would let Catalyst prune every column), one
warm execution then one timed, per-query wall cap enforced by
cancelJobGroup with the capped queries listed loudly in the output
(a cap is a measurement too: it bounds the query from below).

Usage:
  python tools/time_spark_side.py [--sf-dir DIR] [name ...]
  python tools/time_spark_side.py --x 100 --cap 120 --out SWEEP_X100.md
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import threading
import time

# Queries whose x100m executions hold multi-GB state (embedding-pair
# giants): running them back-to-back inside ONE long-lived JVM degrades
# every successor (GC-locker thrash after a capped/cancelled giant), so
# the r13 sweep table showed them ">cap" while isolated fresh-JVM runs
# measured 53-98 s. With --x they run in a forked fresh JVM each (same
# script, single-name invocation; the replica marker makes the rebuild
# a no-op), so the committed table carries the honest isolated numbers.
ISOLATE_AT_X = (
    "dedup_components",  # ngram-pair build + components loop: build
    #                      alone is ~110 s at x100m, over the 120 s
    #                      in-thread budget (r13 measured it at 0.19 s
    #                      timed only because build+warm squeaked under
    #                      the cap that day)
    "dedup_embedding_blocked",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh_verified",
    "dedup_semantic",
)


def _timed_noop(spark, name, builder, sf_dir, cap):
    """Build + warm + time one query in a worker thread; cancel its
    job group at the cap. Returns dict(sec=, rows=) or dict(err=)."""
    out: dict = {}
    group = f"sweep-{name}"

    def work():
        try:
            # job groups are thread-local; each query gets its own
            # worker thread, so stale groups never leak across queries
            spark.sparkContext.setJobGroup(group, name, True)
            df = builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            out["sec"] = time.time() - t0
        except Exception as exc:
            out.setdefault("err", str(exc).splitlines()[0][:140])

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(cap)
    if th.is_alive():
        spark.sparkContext.cancelJobGroup(group)
        th.join(60)
        out["err"] = f">cap {cap:.0f}s (job group cancelled)"
        out["capped"] = True
    return out


def _forked_run(name: str, args, cap: float) -> dict:
    """Run one query in a FRESH subprocess JVM (same script, single
    name). Returns the same dict shape as _timed_noop. The replica
    build is a marker-file no-op in the child; budget JVM+replica
    startup on top of the cap."""
    cmd = [sys.executable, os.path.abspath(__file__), "--cap", str(cap)]
    if args.x:
        cmd += ["--x", str(args.x)]
        if args.mutate:
            cmd += ["--mutate"]
    else:
        cmd += ["--sf-dir", args.sf_dir]
    cmd.append(name)
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=cap + 300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        return {"err": f">cap {cap:.0f}s (isolated JVM timed out)",
                "capped": True}
    m = re.search(
        rf"^\[1/1\] {re.escape(name)} ([0-9.]+)s$",
        proc.stdout, re.MULTILINE,
    )
    if m:
        return {"sec": float(m.group(1))}
    m = re.search(
        rf"^\[1/1\] {re.escape(name)} ERR (.*)$",
        proc.stdout, re.MULTILINE,
    )
    if m:
        return {"err": m.group(1) + " [isolated JVM]",
                "capped": ">cap" in m.group(1)}
    tail = (proc.stderr or proc.stdout).strip().splitlines()
    return {"err": "isolated JVM produced no timing: "
            + (tail[-1][:120] if tail else f"rc={proc.returncode}")}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--x", type=int, default=None,
        help="time against the x-K fact replica of sf0.1 instead of "
        "--sf-dir (builds it if absent; same files as BENCH_SF10)",
    )
    ap.add_argument(
        "--cap", type=float, default=None,
        help="per-query wall cap in seconds (default: none at base "
        "SF, 120 with --x)",
    )
    ap.add_argument(
        "--out", default=None,
        help="also write a markdown artifact (sweep table, slowest "
        "first, capped/err section on top)",
    )
    ap.add_argument(
        "--mutate", action="store_true",
        help="with --x: use the MUTATED replica (x{K}m — per-copy "
        "token/vector mutations, ~2%% true near-dup copies) so "
        "pair-forming dedup ops see realistic duplicate density "
        "instead of k-clone families; see scale_stress.build_replica",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import litebase_spark.operators  # noqa: F401
    from bench import read_loadavg
    from litebase_spark.catalog import REGISTRY
    from litebase_spark.session import get_spark

    load = read_loadavg()
    spark = get_spark("time-spark-side")
    spark.range(1).count()

    sf_dir = args.sf_dir
    if args.x:
        from tools.scale_stress import build_replica

        t0 = time.time()
        sf_dir = build_replica(spark, args.x, mutate=args.mutate)
        print(f"# x{args.x} replica ready in {time.time() - t0:.1f}s "
              f"at {sf_dir}", file=sys.stderr)
    cap = args.cap if args.cap is not None else (120.0 if args.x else 1e9)

    def rebuild_spark():
        """A per-query OOM in local mode kills the whole JVM; the
        sweep must record that query as the (legitimate, interesting)
        at-scale failure it is and carry on in a fresh JVM."""
        from pyspark import SparkContext
        from pyspark.sql import SparkSession

        try:
            SparkSession.builder.getOrCreate().stop()
        except Exception:
            pass
        SparkContext._active_spark_context = None
        SparkContext._gateway = None
        SparkContext._jvm = None
        SparkSession._instantiatedSession = None
        SparkSession._activeSession = None
        s = get_spark("time-spark-side")
        s.range(1).count()
        return s

    def alive() -> bool:
        try:
            spark.range(1).count()
            return True
        except Exception:
            return False

    names = args.names or sorted(REGISTRY)
    # Full --x sweeps fork the embedding giants into fresh JVMs (see
    # ISOLATE_AT_X). Explicit-name invocations never fork — that is the
    # recursion guard for the child process.
    isolate = set(ISOLATE_AT_X) if (args.x and not args.names) else set()
    timed, bad = [], []
    for i, name in enumerate(names):
        if name in isolate:
            # the isolated giants legitimately run 50-100 s warm, and
            # the in-thread budget covers build + warm + timed — a 120 s
            # cap would re-cap exactly the queries isolation exists to
            # measure. 480 s bounds a runaway without censoring them.
            r = _forked_run(name, args, max(cap, 480.0))
        else:
            r = _timed_noop(
                spark, name, REGISTRY[name].builder, sf_dir, cap
            )
        if "err" in r and not r.get("capped") and not alive():
            r["err"] = (
                f"JVM died executing this query at this scale "
                f"(heap exhaustion class) — original: {r['err']}"
            )
            spark = rebuild_spark()
            print(f"# JVM restarted after {name}", file=sys.stderr)
        if "sec" in r:
            timed.append((r["sec"], name))
            print(f"[{i + 1}/{len(names)}] {name} {r['sec']:.2f}s",
                  flush=True)
        else:
            bad.append((name, r["err"]))
            print(f"[{i + 1}/{len(names)}] {name} ERR {r['err']}",
                  flush=True)
    timed.sort()
    print()
    for sec, name in timed:
        print(f"{sec:7.2f}  {name}")
    total = sum(s for s, _ in timed)
    print(f"\ntotal {total:.1f}s over {len(timed)} timed, "
          f"{len(bad)} capped/err")

    if args.out:
        tag = (
            f"x{args.x}{'m (mutated)' if args.mutate else ''}"
            if args.x else args.sf_dir
        )
        lines = [
            f"# Spark-side warm-time sweep — {tag}, "
            f"local[{spark.sparkContext.defaultParallelism}], "
            f"{len(names)} registry queries",
            "",
            "Methodology: noop write (full materialization), 1 warm + "
            f"1 timed execution, per-query cap {cap:.0f}s via "
            "cancelJobGroup. Machine load at run START (1m/5m/15m): "
            f"{load[0]:.2f}/{load[1]:.2f}/{load[2]:.2f}.",
            "",
        ]
        if bad:
            lines += ["## Capped / errored", ""]
            lines += [f"- `{n}` — {e}" for n, e in bad]
            lines += [""]
        lines += ["| query | spark s |", "|---|---|"]
        lines += [f"| {n} | {s:.2f} |" for s, n in reversed(timed)]
        lines += ["", f"Total timed: {total:.1f}s over {len(timed)}."]
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
