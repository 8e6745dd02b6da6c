"""Training-data pipeline operators: split determinism, packing invariants,
mixture-weight algebra."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import litebase_spark.operators  # noqa: F401
from litebase_spark.catalog import REGISTRY, load
from litebase_spark.operators.pipeline import PACK_BUDGET


def test_train_test_split_deterministic_and_partition_invariant(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    split = F.when(
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4
        )
        < "1999",
        "test",
    ).otherwise("train")
    a = {
        r["doc_id"]: r["s"]
        for r in d.select("doc_id", split.alias("s")).collect()
    }
    # identical assignment after an arbitrary repartition (no rand() in
    # the lineage — the split is a pure function of doc_id)
    b = {
        r["doc_id"]: r["s"]
        for r in d.repartition(7)
        .select("doc_id", split.alias("s"))
        .collect()
    }
    assert a == b
    frac = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.0 < frac < 0.25  # ~10% target, loose bound at tiny SF


def test_train_test_split_covers_all_docs(spark, sf_dir):
    out = REGISTRY["pipeline_train_test_split"].builder(spark, sf_dir)
    rows = out.collect()
    total = sum(r["n_docs"] for r in rows)
    assert total == load(spark, sf_dir, "documents").count()
    assert {r["split"] for r in rows} == {"train", "test"}


def test_pack_sequences_invariants(spark, sf_dir):
    rows = REGISTRY["pipeline_pack_sequences"].builder(spark, sf_dir).collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, packs in by_source.items():
        ids = [p["pack_id"] for p in packs]
        # pack ids are dense from 0 (concat-and-chop leaves no gaps)
        assert ids == list(range(len(ids))), source
        # every non-final pack starts because the budget was crossed:
        # cumulative tokens through pack k >= (k+1) * budget
        cum = 0
        for k, p in enumerate(packs):
            cum += p["pack_tokens"]
            if k < len(packs) - 1:
                assert cum >= (k + 1) * PACK_BUDGET, (source, k)


def test_mixture_weights_normalize(spark, sf_dir):
    rows = REGISTRY["pipeline_mixture_weights"].builder(spark, sf_dir).collect()
    assert math.isclose(
        sum(r["token_share"] for r in rows), 1.0, abs_tol=1e-3
    )
    n = len(rows)
    # weighted shares re-normalize to uniform: share * weight == 1/n
    for r in rows:
        assert math.isclose(
            r["token_share"] * r["sample_weight"], 1.0 / n, rel_tol=1e-3
        ), r


def test_bpe_merges_hand_computed(spark):
    """BPE on a tiny corpus with hand-derived merge order, including the
    greedy left-to-right overlap case ('aaa' merges to 'aa'+'a')."""
    from pyspark.sql import functions as F

    from litebase_spark.operators.pipeline import bpe_learn_merges

    # vocabulary: low 'lo' x3, lowest 'lowest' x1, aaa x2
    words = spark.createDataFrame(
        [("l o w", 3), ("l o w e s t", 1), ("a a a", 2)],
        "sym string, cnt long",
    )
    merges = bpe_learn_merges(words, 3)
    # round 1 counts: 'l o'=4, 'o w'=4, 'a a'=4 (aaa has 2 adjacent
    # pairs x2 words) -> tie on 4, pair ASC picks 'a a'; after merging,
    # 'a a a' -> 'aa a' (greedy, NOT 'a aa')
    assert merges[0] == (1, "a a", 4)
    # round 2: 'l o'=4, 'o w'=4, 'aa a'=2 -> 'l o'
    assert merges[1] == (2, "l o", 4)
    # round 3: 'lo w'=4 wins
    assert merges[2] == (3, "lo w", 4)


def test_quality_gate_attribution_order(spark):
    """First-failing-rule attribution on a hand corpus: gopher beats
    blocklist beats duplicate; only clean unique docs are kept."""
    import litebase_spark.operators  # noqa: F401
    from litebase_spark.catalog import REGISTRY

    long_ok = ("the quick brown fox jumps over the lazy dog and runs far "
               "to the old town in a quiet morning with many small birds ")
    docs = spark.createDataFrame(
        [
            (1, long_ok * 2, "en", "s1", 100),            # kept
            (2, "short text", "en", "s1", 10),            # gopher (too few)
            (3, long_ok * 2 + " casino", "en", "s1", 100),  # blocklist
            (4, long_ok * 2, "en", "s1", 100),            # duplicate of 1
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.createOrReplaceTempView("documents")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        out = {
            (r["verdict"]): r["n_docs"]
            for r in REGISTRY["pipeline_quality_gate"]
            .builder(spark, td)
            .collect()
        }
    assert out == {"kept": 1, "gopher": 1, "blocklist": 1, "duplicate": 1}


def test_dataset_card_single_scan(spark, sf_dir):
    """Round-8 re-plan: the card must read the corpus ONCE (the old
    3-branch form scanned it three times, processing text twice). The
    GROUPING SETS formulation is structurally single-scan — assert it
    on the executed adaptive plan like test_dsir does."""
    import contextlib
    import io
    import re

    from litebase_spark.operators.pipeline import pipeline_dataset_card

    df = pipeline_dataset_card(spark, sf_dir)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    final = buf.getvalue().split("== Initial Plan ==")[0]
    scans = len(re.findall(r"Scan parquet", final))
    assert scans == 1, f"expected 1 corpus scan, final plan has {scans}"
