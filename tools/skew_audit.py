"""Key-histogram skew audit (guide §2.5) for the two designed
corpus-scale exchanges the r13 verdict asked to certify:

  * stats_spearman_rho — the cells exchange groupBy(c) over cents of
    l_extendedprice (relational.py): is any single cents value hot?
  * text_bigram_logppl — repartition(w1) of per-(doc, bigram) counts
    keyed by the LEFT WORD (text.py): Zipf says w1 is skewed; is the
    hottest word bounded relative to a partition's fair share?

For each key the audit reproduces the operator's exchange input exactly
as the builder derives it (same tokenizer/cents expressions), then
reports total rows, distinct keys, max/median key count, the hottest 5
keys, and the hot key's share of one partition's fair share (rows /
shuffle partitions). A max-key share well under one fair share means
AQE-level balance; a hot key holding many fair shares argues for a
salt. Writes SKEW_AUDIT.md.

Usage: python tools/skew_audit.py [--sf-dir DIR | --x K [--mutate]]
"""

from __future__ import annotations

import argparse
import sys


def _hist_stats(spark, df, key_cols: list[str], label: str) -> dict:
    from pyspark.sql import functions as F

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("kn"))
    agg = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("kn").alias("n_rows"),
        F.max("kn").alias("max_kn"),
        F.expr("percentile_approx(kn, 0.5)").alias("med_kn"),
    ).collect()[0]
    top = [
        (str([r[c] for c in key_cols]), int(r["kn"]))
        for r in counts.orderBy(F.desc("kn")).limit(5).collect()
    ]
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    fair = max(int(agg["n_rows"]) / parts, 1.0)
    return {
        "label": label,
        "n_rows": int(agg["n_rows"]),
        "n_keys": int(agg["n_keys"]),
        "max_kn": int(agg["max_kn"]),
        "med_kn": int(agg["med_kn"]),
        "max_over_med": round(int(agg["max_kn"]) / max(int(agg["med_kn"]), 1), 1),
        "fair_share_rows": int(fair),
        "max_key_fair_shares": round(int(agg["max_kn"]) / fair, 3),
        "top5": top,
        "partitions": parts,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--x", type=int, default=None)
    ap.add_argument("--mutate", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import litebase_spark.operators  # noqa: F401
    from pyspark.sql import functions as F

    from litebase_spark.catalog import fp, load
    from litebase_spark.operators.text import tokens
    from litebase_spark.session import get_spark

    spark = get_spark("skew-audit")
    spark.range(1).count()
    sf_dir = args.sf_dir
    if args.x:
        from tools.scale_stress import build_replica

        sf_dir = build_replica(spark, args.x, mutate=args.mutate)

    results = []

    # 1. spearman cells exchange: groupBy(c) where c = cents(price);
    #    exchange input is one row per lineitem (complete cases)
    l = (
        load(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_extendedprice").isNotNull()
        )
        .select(fp("l_extendedprice").alias("c"))
    )
    results.append(_hist_stats(
        spark, l, ["c"],
        "stats_spearman_rho cells exchange — key c = cents(l_extendedprice)",
    ))

    # 2. bigram w1 exchange: repartition(w1) of the (doc_id, b) counts
    w = tokens("text")
    bigrams = F.expr(
        "transform(sequence(1, size(w) - 1), "
        "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
    )
    bf = (
        load(spark, sf_dir, "documents")
        .select("doc_id", w.alias("w"))
        .filter(F.size("w") > 1)
        .select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("w1", F.split_part(F.col("b"), F.lit(" "), F.lit(1)))
    )
    results.append(_hist_stats(
        spark, bf.select("w1"), ["w1"],
        "text_bigram_logppl w1 exchange — key w1 = left word of bigram, "
        "rows are per-(doc, bigram) counts",
    ))

    tag = (f"x{args.x}{'m' if args.mutate else ''}" if args.x
           else args.sf_dir)
    lines = [
        f"# SKEW_AUDIT — key histograms at {tag} "
        f"(tools/skew_audit.py, guide §2.5)",
        "",
        "A key is 'hot' when its row count exceeds a partition's fair "
        "share (n_rows / shuffle partitions) by a large factor — that "
        "is what stalls a stage at N-1/N tasks. max/median alone "
        "over-alarms on high-cardinality keys.",
        "",
    ]
    for r in results:
        lines += [
            f"## {r['label']}", "",
            f"- rows entering the exchange: {r['n_rows']:,}",
            f"- distinct keys: {r['n_keys']:,}",
            f"- max key rows: {r['max_kn']:,} (median {r['med_kn']:,}, "
            f"max/med {r['max_over_med']})",
            f"- fair share per partition ({r['partitions']} partitions): "
            f"{r['fair_share_rows']:,} rows",
            f"- hottest key = {r['max_key_fair_shares']} fair shares",
            f"- top 5 keys: {r['top5']}",
            "",
        ]
    with open("SKEW_AUDIT.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
