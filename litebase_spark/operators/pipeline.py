"""Composed training-data pipeline: the north-star use case end-to-end.

Each stage exists as a standalone operator elsewhere (quality scoring,
language filter, exact near-dup removal, token accounting); this module
chains them into ONE declarative plan — the way a real 100 TB corpus
prep job runs — so Catalyst can fuse the stages: the tokenizer runs
once, filters collapse into the scan, and the only shuffle is the dedup
group-by. Compare with running four separate jobs: 4 scans, 4 plans, no
fusion.

Stage order matters at scale: cheap narrow filters (quality, language)
run BEFORE the shuffle-bearing dedup so the exchange moves only
surviving documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from litebase_spark.catalog import load, query
from litebase_spark.operators.text import _SQL_TOKENS, tokens

MIN_TOKENS = 20
MIN_DISTINCT_RATIO = 0.30


@query(
    "pipeline_training_corpus",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, lang,
               len({_SQL_TOKENS.format(c='text')}) AS n_tokens,
               CAST(len(list_distinct({_SQL_TOKENS.format(c='text')})) AS DOUBLE)
                 / len({_SQL_TOKENS.format(c='text')}) AS distinct_ratio,
               lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_text
        FROM documents
        WHERE len({_SQL_TOKENS.format(c='text')}) >= {MIN_TOKENS}
    ),
    filtered AS (
        SELECT * FROM scored
        WHERE distinct_ratio >= {MIN_DISTINCT_RATIO} AND lang = 'en'
    ),
    deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY norm_text
                                         ORDER BY doc_id) AS rn
            FROM filtered) WHERE rn = 1
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(distinct_ratio), 6) AS avg_distinct_ratio
    FROM deduped
    GROUP BY source
    ORDER BY source
    """,
    description="End-to-end training-corpus prep in one plan: tokenize -> "
    "quality filter (length + lexical diversity) -> language filter -> "
    "exact near-dup removal (normalized text, keep lowest doc_id) -> "
    "per-source corpus accounting. Narrow filters run before the dedup "
    "shuffle; the tokenizer expression is shared by Catalyst CSE. At "
    "100 TB the dedup key (normalized text) would be a fingerprint hash "
    "(text_fingerprint) to keep the exchange rows small.",
    tags=("pipeline", "text", "dedup"),
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    words = tokens("text")
    scored = (
        d.select(
            "doc_id",
            "source",
            "lang",
            F.size(words).alias("n_tokens"),
            (
                F.size(F.array_distinct(words)).cast("double")
                / F.size(words)
            ).alias("distinct_ratio"),
            F.lower(
                F.trim(F.regexp_replace("text", r"\s+", " "))
            ).alias("norm_text"),
        )
        .filter(F.col("n_tokens") >= MIN_TOKENS)
        .filter(
            (F.col("distinct_ratio") >= MIN_DISTINCT_RATIO)
            & (F.col("lang") == "en")
        )
    )
    w = Window.partitionBy("norm_text").orderBy("doc_id")
    deduped = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        deduped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("distinct_ratio"), 6).alias("avg_distinct_ratio"),
        )
        .orderBy("source")
    )
