"""Trigram-index probe economics, MEASURED (round-12 verdict task 3).

The round-12 numbers timed the registry queries, which build the
trigram index INLINE per query — so every 'probe' row paid the
index-build cost that a real deployment amortizes across queries.
This tool decomposes the economics the way a 100 TB user runs it:

  1. build_trigram_index -> parquet ONCE (timed separately);
  2. time each probe (LIKE / GLOB / MATCH substring / boolean MATCH)
     against the MATERIALIZED index (In() pushdown to the index scan,
     plan-asserted by test_new_ops_r12.py);
  3. time DuckDB's raw corpus scan for the same predicates;
  4. repeat at a LARGER corpus point (x1000 documents replica, text
     mutated like the x100m build) to show where the curves cross.

Usage: python tools/trigram_economics.py [--points 100,1000]
Writes a markdown section to stdout (paste into BENCH_SF10.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/litebase_scale_stress"

PROBES = [
    ("LIKE", "like", "%hash%window%sort%"),
    ("GLOB", "glob", "*big*table*"),
    ("MATCH substring", "match", "vector stream"),
    ("MATCH boolean", "boolean", None),
]

DUCK_PRED = {
    "LIKE": "text LIKE '%hash%window%sort%'",
    "GLOB": "text GLOB '*big*table*'",
    "MATCH substring": "contains(text, 'vector stream')",
    "MATCH boolean": (
        "contains(lower(text),'que') AND contains(lower(text),'tab') "
        "AND (contains(lower(text),'vect') OR "
        "contains(lower(text),'strea')) AND NOT "
        "contains(lower(text),'merg')"
    ),
}


def build_docs_replica(spark, k: int) -> str:
    """documents-only x-k mutated replica (same mutation as
    build_replica mutate=True; facts are irrelevant to this bench)."""
    from pyspark.sql import functions as F

    from tools.scale_stress import _FILES, _SHIFT, _mut_documents

    out = f"{WORK}/docs_x{k}m"
    marker = f"{out}/.complete_v2"
    if os.path.exists(marker):
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    df = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for i in range(k):
        p = _mut_documents(df, i) if i > 0 else df
        parts.append(p.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * _SHIFT)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    u.repartitionByRange(max(_FILES, k // 8), F.col("doc_id")).write.mode(
        "overwrite").parquet(f"{out}/documents.parquet")
    open(marker, "w").close()
    return out


def timed(fn, reps=3):
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="100,1000")
    ap.add_argument("--cluster-max-k", type=int, default=100)
    args = ap.parse_args()

    import duckdb

    from litebase_spark.operators.text import fts_match
    from litebase_spark.operators.text_trigram import (
        build_trigram_index,
        glob_trigram,
        like_trigram,
        match_trigram,
    )
    from litebase_spark.session import get_spark

    spark = get_spark("trigram-econ")
    spark.range(1).count()

    print("## Trigram probe economics — materialized index "
          "(round-13, tools/trigram_economics.py)\n")
    print("Methodology: index built and written to parquet ONCE per "
          "corpus point (cost listed); probes then run against the "
          "materialized index (best of 3 warm noop writes). DuckDB "
          "rows are the raw corpus scan for the same predicate, best "
          "of 3. Corpus points are the MUTATED document replicas "
          "(copy-salted token mutations — realistic vocabulary "
          "growth, so the index is bigger and more realistic than a "
          "verbatim replica would be).\n")

    for k in [int(x) for x in args.points.split(",")]:
        t0 = time.time()
        d_dir = build_docs_replica(spark, k)
        print(f"<!-- replica x{k} ready in {time.time() - t0:.0f}s -->")
        docs = spark.read.parquet(f"{d_dir}/documents.parquet")
        n_docs = docs.count()
        corpus_mb = sum(
            os.path.getsize(os.path.join(f"{d_dir}/documents.parquet", f))
            for f in os.listdir(f"{d_dir}/documents.parquet")
            if f.endswith(".parquet")
        ) / 1e6

        # index LAYOUT is part of the design: range-clustered by
        # trigram with 16 MB row groups, so a probe's In(tri)
        # pushdown skips to the few row groups holding the query
        # grams instead of sieving the whole posting file (measured
        # at x100: MATCH 3.40 -> 2.14 s vs unclustered). Above
        # --cluster-max-k the global range sort of the posting table
        # is skipped (single-box memory: the x1000 clustered write's
        # ~5e9-row exchange thrashed and failed parquet closes) —
        # sortWithinPartitions still gives per-file tri runs for
        # page-level skipping; on a cluster you would range-cluster
        # any size.
        clustered = k <= args.cluster_max_k
        suffix = "clustered" if clustered else "sorted"
        idx_path = f"{d_dir}/trigram_idx_{suffix}.parquet"
        t0 = time.time()
        if not os.path.exists(f"{idx_path}/_SUCCESS"):
            from pyspark.sql import functions as F

            base_idx = build_trigram_index(docs)
            if clustered:
                base_idx = base_idx.repartitionByRange(
                    128, F.col("tri"))
            w = (base_idx.sortWithinPartitions("tri")
                 .write.mode("overwrite")
                 .option("parquet.block.size", 16 * 1024 * 1024))
            w.parquet(idx_path)
        build_s = time.time() - t0
        idx = spark.read.parquet(idx_path)
        idx_mb = sum(
            os.path.getsize(os.path.join(idx_path, f))
            for f in os.listdir(idx_path) if f.endswith(".parquet")
        ) / 1e6

        print(f"\n### x{k} — {n_docs:,} docs, corpus {corpus_mb:.0f} MB "
              f"parquet; index build {build_s:.1f}s once, "
              f"{idx_mb:.0f} MB\n")
        print("| probe | spark probe s | duckdb scan s | ratio |")
        print("|---|---|---|---|")

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count()}")
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"parquet_scan('{d_dir}/documents.parquet/*.parquet')"
        )

        # a SELECTIVE pattern: one copy-salted token (unique-ish to a
        # handful of docs). Probe cost is sum of the query grams'
        # posting lists — selectivity, not corpus size, decides the
        # probe-vs-scan crossover, so the dense rows above (40-word
        # fixture vocabulary: every gram is hot) are the index's
        # worst case and this row is its actual use case.
        from pyspark.sql import functions as F

        rare = (
            docs.filter(F.col("doc_id") >= 10**9)
            .select(F.explode(F.split("text", " ")).alias("t"))
            .filter(F.col("t").contains("~"))
            .first()["t"]
        )
        probes = PROBES + [("LIKE selective", "like", f"%{rare}%")]
        DUCK_PRED["LIKE selective"] = (
            "text LIKE '%" + rare.replace("'", "''") + "%'"
        )

        for label, kind, pat in probes:
            if kind == "like":
                q = like_trigram(None, pat, postings=idx)
            elif kind == "glob":
                q = glob_trigram(None, pat, postings=idx)
            elif kind == "match":
                q = match_trigram(None, pat, postings=idx)
            else:
                q = fts_match(
                    docs, must=["que", "tab"],
                    should=["vect", "strea"], must_not=["merg"],
                    tokenize="trigram", trigram_postings_df=idx,
                )
            q.write.format("noop").mode("overwrite").save()  # warm
            s_spark = timed(
                lambda q=q: q.write.format("noop").mode(
                    "overwrite").save())
            s_duck = timed(lambda label=label: con.execute(
                f"SELECT count(*) FROM documents WHERE "
                f"{DUCK_PRED[label]}").fetchone())
            print(f"| {label} | {s_spark:.2f} | {s_duck:.2f} | "
                  f"{s_spark / s_duck:.2f}x |")
        con.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
