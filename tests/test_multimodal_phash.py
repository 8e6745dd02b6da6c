"""Perceptual-hash media dedup (operators/multimodal.py): hash recipe
hand-recomputed in pure Python, banding recall on a constructed
near-dup, sub-64-byte exclusion, and the oracle-exactness invariant
that the Spark long and the SQL bit string are the same hash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from litebase_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    multimodal_phash_dedup,
    perceptual_hash,
)


def _ahash(data: bytes) -> int:
    """Independent reimplementation: bit j (MSB-first) = chunk j mean >
    global mean, chunk(i) = i*64//len."""
    n = len(data)
    total = sum(data)
    sums = [0] * 64
    lens = [0] * 64
    for i, byte in enumerate(data):
        j = i * 64 // n
        sums[j] += byte
        lens[j] += 1
    h = 0
    for j in range(64):
        h <<= 1
        if sums[j] * n > total * lens[j]:
            h |= 1
    return h - (1 << 64) if h >= 1 << 63 else h


def _media_df(spark, payloads):
    rows = [
        (i, p, ("text", "application/octet-stream", len(p), "src"))
        for i, p in payloads.items()
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


@pytest.fixture(scope="module")
def payloads():
    base = bytes(range(64)) * 4  # 256 bytes, strong chunk structure
    near = bytearray(base)
    near[10] ^= 0xFF  # flips a couple of region means at most
    return {
        1: base,
        2: base,  # exact duplicate of 1
        3: bytes(near),  # near-duplicate of 1
        4: bytes([7] * 256),  # flat -> all-zero hash, far from base
        5: b"tiny",  # < 64 bytes -> excluded
    }


def test_phash_matches_hand_model(spark, payloads):
    got = {
        r["doc_id"]: (r["n_bytes"], r["phash"])
        for r in perceptual_hash(_media_df(spark, payloads)).collect()
    }
    assert 5 not in got  # sub-64-byte payload dropped
    for doc_id in (1, 2, 3, 4):
        assert got[doc_id] == (
            len(payloads[doc_id]),
            _ahash(payloads[doc_id]),
        ), doc_id
    assert got[1][1] == got[2][1]  # identical payloads, identical hash


def _write_toy_documents(spark, tmp_path):
    import os

    texts = {
        1: "a" * 100 + "z" * 100,
        2: "a" * 100 + "z" * 100,  # exact dup
        3: "a" * 100 + "z" * 99 + "y",  # near dup
        4: "m" * 200,  # flat, unrelated
        5: "tiny",
    }
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return texts


def test_phash_dedup_pairs(spark, tmp_path):
    _write_toy_documents(spark, tmp_path)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming_dist"]
        for r in multimodal_phash_dedup(spark, str(tmp_path)).collect()
    }
    assert pairs.get((1, 2)) == 0  # exact dup at distance 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 6  # near dup caught
    assert (2, 3) in pairs
    # the flat payload must not pair with the structured ones
    assert not any(4 in p for p in pairs)
    assert not any(5 in p for p in pairs)


def test_phash_dedup_oracle_replay_positive_pairs(spark, tmp_path):
    """The DuckDB oracle SQL (hex decode -> chunk sums -> bit string ->
    banding -> hamming) must produce the SAME non-empty pair set as the
    Spark operator on a fixture that actually CONTAINS near-dups — the
    fleet-wide sweep only exercises this oracle vacuously (0 rows at the
    stock SFs)."""
    import duckdb

    from litebase_spark.catalog import REGISTRY

    _write_toy_documents(spark, tmp_path)
    spark_pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming_dist"]
        for r in multimodal_phash_dedup(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    oracle_pairs = {
        (int(a), int(b)): int(d)
        for a, b, d in con.execute(
            REGISTRY["multimodal_phash_dedup"].oracle
        ).fetchall()
    }
    assert spark_pairs  # positive-pair path, not the vacuous 0-row case
    assert oracle_pairs == spark_pairs
