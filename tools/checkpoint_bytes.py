"""Measure what each query's eager localCheckpoint()s actually
materialize: build the query (which runs every eager checkpoint), then
dump the JVM block-manager storage info per cached RDD — memory bytes,
disk bytes, partition counts. This is the evidence the bounded-only
materialization law asks for: a checkpoint is either vocabulary/cell/
fingerprint-BOUNDED (fine) or corpus-sized (needs a measured
justification or removal).

Usage:
  python tools/checkpoint_bytes.py [--sf-dir DIR | --x K [--mutate]] name...
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--x", type=int, default=None)
    ap.add_argument("--mutate", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import litebase_spark.operators  # noqa: F401
    from litebase_spark.catalog import REGISTRY
    from litebase_spark.session import get_spark

    spark = get_spark("checkpoint-bytes")
    spark.range(1).count()
    sf_dir = args.sf_dir
    if args.x:
        from tools.scale_stress import build_replica

        sf_dir = build_replica(spark, args.x, mutate=args.mutate)

    jsc = spark.sparkContext._jsc.sc()
    for name in args.names:
        t0 = time.time()
        REGISTRY[name].builder(spark, sf_dir)  # build triggers eager ckpts
        build_s = time.time() - t0
        infos = jsc.getRDDStorageInfo()
        print(f"\n== {name} (build {build_s:.1f}s) — "
              f"{len(infos)} cached RDD(s)")
        total_mem = total_disk = 0
        for info in infos:
            total_mem += info.memSize()
            total_disk += info.diskSize()
            print(f"   rdd {info.id():>4}  mem {info.memSize()/1e6:10.1f} MB"
                  f"  disk {info.diskSize()/1e6:8.1f} MB"
                  f"  parts {info.numCachedPartitions()}/"
                  f"{info.numPartitions()}  {info.name() or ''}")
        print(f"   TOTAL mem {total_mem/1e6:.1f} MB  "
              f"disk {total_disk/1e6:.1f} MB")
        # free everything before the next query so attribution is clean
        for (rid, rdd) in list(spark.sparkContext._jsc.getPersistentRDDs().items()):
            rdd.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
