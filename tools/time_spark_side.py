"""Warm-time the Spark side of every registered query at a given SF.

The oracle sweep times Spark+DuckDB together; this isolates OUR side so
plan pathologies (serialized stages, recomputed subtrees) show up as
outliers. Prints one `name seconds rows` line per query, slowest last.

Usage: python tools/time_spark_side.py [--sf-dir DIR] [name ...]
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import litebase_spark.operators  # noqa: F401
    from litebase_spark.catalog import REGISTRY
    from litebase_spark.session import get_spark

    spark = get_spark("time-spark-side")
    names = args.names or sorted(REGISTRY)
    out = []
    for name in names:
        spec = REGISTRY[name]
        try:
            df = spec.builder(spark, args.sf_dir)
            df.count()  # warm
            t0 = time.time()
            n = df.count()
            out.append((time.time() - t0, name, n))
        except Exception as exc:  # pragma: no cover
            print(f"\nERR {name}: {str(exc)[:100]}", flush=True)
    out.sort()
    print()
    for sec, name, n in out:
        print(f"{sec:7.2f}  {name}  rows={n}")
    print(f"\ntotal {sum(s for s, _, _ in out):.1f}s over {len(out)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
