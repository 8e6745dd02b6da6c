"""Distributed Lloyd's k-means: convergence and determinism invariants.

The embeddings fixture's `label` column is not geometric (measured
within-label mean cosine ~ 0.0016 vs between-label ~ 0.0003), so purity
against labels is meaningless; Lloyd's own guarantees are the contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import litebase_spark.operators  # noqa: F401
from litebase_spark.catalog import REGISTRY, load
from litebase_spark.operators.similarity import K_CLUSTERS, kmeans_fit


def _inertia(assigned):
    return assigned.agg(F.sum("d2").alias("s")).collect()[0]["s"]


def test_kmeans_inertia_monotone_and_occupied(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    inertias = []
    for iters in (1, 2, 4):
        assigned, cents = kmeans_fit(e, iters=iters)
        inertias.append(_inertia(assigned))
        assert len(cents) == K_CLUSTERS
    # Lloyd's: inertia after more iterations never increases (allow fp slack)
    assert inertias[1] <= inertias[0] * (1 + 1e-9)
    assert inertias[2] <= inertias[1] * (1 + 1e-9)
    # strictly improved from the seed assignment
    assert inertias[2] < inertias[0]


def test_kmeans_deterministic_assignments(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    a1, c1 = kmeans_fit(e, iters=2)
    a2, c2 = kmeans_fit(e.repartition(5), iters=2)
    m1 = {r["vec_id"]: r["cluster_id"] for r in a1.collect()}
    m2 = {r["vec_id"]: r["cluster_id"] for r in a2.collect()}
    assert m1 == m2
    assert c1 == c2


def test_kmeans_query_covers_corpus(spark, sf_dir):
    out = REGISTRY["embedding_kmeans"].builder(spark, sf_dir).collect()
    total = sum(r["n_vectors"] for r in out)
    assert total == load(spark, sf_dir, "embeddings").count()
