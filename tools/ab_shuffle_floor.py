"""A/B the round-11 verdict's last untested idea for the four
exchange-floor `weak` queries (q4, q10, q12, join_salted_skew):
shuffle-partition right-sizing / AQE coalesce tuning.

Hypothesis under test: the ~0.5 s bars are dominated by per-exchange
constants that scale with the PARTITION COUNT (task launch + fetch
setup x 32), so fewer/bigger shuffle partitions at the sf0.1 point
should cut them — if they don't, the floor is scheduler-latency-bound
and the machine-bound closure stands with this receipt.

Method: for each query x each setting, one warm build+run, then N
timed noop-write executions INTERLEAVED across settings (setting loop
outside, run loop inside, repeated R rounds) so box drift hits all
arms equally; report per-arm min. spark.sql.shuffle.partitions and
spark.sql.adaptive.advisoryPartitionSizeInBytes are runtime-settable
session confs — each arm sets them before building its plan (AQE
reads both at execution).

Usage: python tools/ab_shuffle_floor.py [--sf-dir DIR] [--rounds 3]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

QUERIES = [
    "q4_order_priority",
    "q10_returned_items",
    "q12_priority_lateness",
    "join_salted_skew",
]

# (label, shuffle.partitions, advisoryPartitionSizeInBytes)
ARMS = [
    ("p32-adv64m (repo default)", "32", str(64 * 1024 * 1024)),
    ("p16-adv64m", "16", str(64 * 1024 * 1024)),
    ("p8-adv64m", "8", str(64 * 1024 * 1024)),
    ("p32-adv256m", "32", str(256 * 1024 * 1024)),
    ("p64-adv64m", "64", str(64 * 1024 * 1024)),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--names", nargs="*", default=QUERIES)
    args = ap.parse_args()

    import litebase_spark.operators  # noqa: F401
    from bench import read_loadavg
    from litebase_spark.catalog import REGISTRY
    from litebase_spark.session import get_spark

    load = read_loadavg()
    spark = get_spark("ab-shuffle-floor")
    spark.range(1).count()
    print(f"# load at start: {load[0]:.2f}/{load[1]:.2f}/{load[2]:.2f}")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    results: dict[tuple[str, str], list[float]] = {}
    for name in args.names:
        builder = REGISTRY[name].builder
        # warm each arm once (plan + JIT)
        for label, parts, adv in ARMS:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", adv
            )
            run(builder(spark, args.sf_dir))
        for _ in range(args.rounds):
            for label, parts, adv in ARMS:
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                spark.conf.set(
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                    adv,
                )
                df = builder(spark, args.sf_dir)
                t0 = time.time()
                run(df)
                results.setdefault((name, label), []).append(
                    time.time() - t0
                )
        # restore defaults
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            str(64 * 1024 * 1024),
        )

    print("\n| query | arm | min s | runs |")
    print("|---|---|---|---|")
    for name in args.names:
        for label, _, _ in ARMS:
            ts = results[(name, label)]
            print(f"| {name} | {label} | {min(ts):.3f} | "
                  + "/".join(f"{t:.2f}" for t in ts) + " |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
