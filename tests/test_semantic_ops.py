"""SemDeDup-style semantic dedup + k-means-quantized IVF search.

Both are rows-only ops (iterative k-means is the SURVEY carve-out), so
the contract is invariants: the IVF probe's recall against the exact
brute-force top-k, and the dedup's consistency with the oracle-exact
global pair set (within-cluster pairs are a subset, so every dup group
must live inside one global connected component).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import litebase_spark.operators  # noqa: F401
from litebase_spark.catalog import REGISTRY, load
from litebase_spark.operators.dedup import connected_components


def test_ivf_kmeans_recall_and_shape(spark, sf_dir):
    bf = {
        (r["qid"], r["vec_id"])
        for r in REGISTRY["knn_cosine_bruteforce"].builder(spark, sf_dir).collect()
    }
    out = REGISTRY["knn_ivf_kmeans"].builder(spark, sf_dir).collect()
    ivf = {(r["qid"], r["vec_id"]) for r in out}
    # per-query result shape: at most TOP_K ranked 1..k, all 5 queries
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r["rank"])
    assert set(by_q) == {0, 1, 2, 3, 4}
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # trained quantizer with nprobe=4/10 cells: recall well above chance
    assert len(bf & ivf) / len(bf) >= 0.6


def test_dedup_semantic_consistent_with_exact_pairs(spark, sf_dir):
    out = REGISTRY["dedup_semantic"].builder(spark, sf_dir).collect()
    assert len(out) == load(spark, sf_dir, "embeddings").count()
    for r in out:
        assert r["dup_group"] <= r["vec_id"]
        assert r["keep"] == (r["dup_group"] == r["vec_id"])
    # every semantic dup group must be inside one component of the
    # oracle-exact global pair graph (within-cluster pairs are a subset
    # of all pairs, so clustering can only split groups, never merge
    # across non-duplicates)
    exact_pairs = REGISTRY["dedup_embedding_cosine"].builder(spark, sf_dir)
    comps = {
        r["node"]: r["comp"]
        for r in connected_components(
            exact_pairs, "vec_id_a", "vec_id_b"
        ).collect()
    }
    for r in out:
        if not r["keep"]:
            assert comps[r["vec_id"]] == comps[r["dup_group"]]


def test_dedup_semantic_deterministic(spark, sf_dir):
    a = {
        (r["vec_id"], r["dup_group"])
        for r in REGISTRY["dedup_semantic"].builder(spark, sf_dir).collect()
    }
    b = {
        (r["vec_id"], r["dup_group"])
        for r in REGISTRY["dedup_semantic"].builder(spark, sf_dir).collect()
    }
    assert a == b
