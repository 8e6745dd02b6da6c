"""Multimodal column convention + processing plumbing (north-star op).

Convention: media travels as an opaque ``binary`` column plus a typed
metadata struct (modality, mime, width/height/duration, byte size) — the
BLOB storage class is the reference's only media answer
(pkg/sqlite3/constants.go:52 SQLITE_BLOB); we add the typed envelope and
the distributed processing shape.

The decode/feature-extract stage runs as Arrow-batched ``mapInPandas``
(the only place Python touches the data; everything around it is JVM).
The image/audio codecs are NOT in this container, so the decoder is a
deterministic stub behind an import-try (SURVEY north-star instruction);
the Spark-side plumbing — schema, batch shape, partitioning — is real and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from litebase_spark.catalog import load, query

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("modality", StringType()),
                    StructField("mime", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("source", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_entropy_proxy", DoubleType()),
    ]
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Build the multimodal frame from documents: utf-8 bytes stand in for
    media payloads (fixtures carry no real media), with the typed metadata
    envelope the convention requires."""
    media = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.struct(
            F.lit("text").alias("modality"),
            F.lit("text/plain;charset=utf-8").alias("mime"),
            F.octet_length(media).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _decode_media(payload: bytes, modality: str) -> bytes:
    """Decode stub. Real deployments branch per modality to PIL/librosa/
    pyav — none of which exist in this container, so decode is identity
    for text and NotImplemented for everything else."""
    if modality == "text":
        return payload
    try:
        import PIL  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"decoder for modality {modality!r} requires media codecs not "
            "present in this environment"
        ) from None
    raise NotImplementedError(f"unsupported modality {modality!r}")


def extract_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the media column.

    mapInPandas keeps the binary payloads inside executor-local Arrow
    batches — no collect, no per-row Python overhead. Deterministic
    byte-statistics stand in for model features."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _decode_media(m, meta["modality"])
                for m, meta in zip(pdf["media"], pdf["meta"])
            ]
            means, entropies = [], []
            for p in payloads:
                if len(p) == 0:
                    means.append(0.0)
                    entropies.append(0.0)
                    continue
                arr = pd.Series(list(p))
                means.append(float(arr.mean()))
                # distinct-byte ratio as a cheap entropy proxy
                entropies.append(float(arr.nunique()) / 256.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feat_mean": means,
                    "feat_entropy_proxy": entropies,
                }
            )

    return media_df.mapInPandas(compute, schema=FEATURE_SCHEMA)


@query(
    "multimodal_ingest",
    oracle="""
    SELECT source AS media_source,
           COUNT(*) AS n_items,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY source
    """,
    description="Multimodal ingest accounting: binary payload + typed "
    "metadata struct, aggregated per source. Verifies the envelope "
    "(byte sizes) against the oracle.",
    tags=("multimodal",),
)
def multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = attach_media(load(spark, sf_dir, "documents"))
    return m.groupBy(F.col("meta.source").alias("media_source")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )


@query(
    "multimodal_features",
    oracle=None,  # pandas-UDF feature stub has no SQL equivalent
    description="mapInPandas feature extraction over binary media "
    "(Arrow-batched; decode stubbed for non-text modalities — codecs "
    "absent in this container). Returns per-item byte-statistics "
    "features; rows-only check.",
    tags=("multimodal", "pandas_udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = attach_media(load(spark, sf_dir, "documents"))
    return extract_features(m).orderBy("doc_id")
