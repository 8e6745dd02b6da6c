

def test_int8_quantized_scoring_preserves_topk_recall(spark, sf_dir):
    from litebase_spark.catalog import REGISTRY, load
    from litebase_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        quantize_codes,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = load(spark, sf_dir, "embeddings")
    qz = quantize_codes(e)
    # reconstruct from int8 codes, then brute-force cosine on the
    # reconstruction — recall vs the exact ranking must stay high
    recon = qz.select(
        "vec_id",
        F.expr(
            "transform(codes, c -> CAST(c AS DOUBLE) * qscale)"
        ).alias("rv"),
    )
    q = recon.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("rv").alias("qv")
    )
    dotp = F.expr(
        "aggregate(zip_with(qv, rv, (x, y) -> x * y), 0D, (a, v) -> a + v)"
    )
    nrm = (
        "sqrt(aggregate(transform({c}, x -> x * x), 0D, (a, v) -> a + v))"
    )
    sim = dotp / (F.expr(nrm.format(c="qv")) * F.expr(nrm.format(c="rv")))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    approx = (
        recon.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", sim.alias("sim"))
        .select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
    )
    exact = REGISTRY["knn_cosine_bruteforce"].builder(spark, sf_dir)
    got = {(r["qid"], r["vec_id"]) for r in approx.collect()}
    want = {(r["qid"], r["vec_id"]) for r in exact.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.8, (recall, got, want)


def test_ivf_adc_recall_vs_exact_probe(spark, sf_dir):
    """ADC shortlist + exact rerank recovers most of the probe-limited
    exact top-k (quantization noise can only cost shortlist membership,
    never a reported value — values are exact by construction)."""
    import litebase_spark.operators  # noqa: F401
    from litebase_spark.catalog import REGISTRY

    adc = {
        (r["qid"], r["vec_id"])
        for r in REGISTRY["knn_ivf_adc"].builder(spark, sf_dir).collect()
    }
    exact = {
        (r["qid"], r["vec_id"])
        for r in REGISTRY["knn_ivf_probe"].builder(spark, sf_dir).collect()
    }
    assert len(adc) == len(exact) > 0
    # int8 codes over 64 dims keep ADC ranking close to exact: allow a
    # small boundary divergence, require high overlap
    assert len(adc & exact) / len(exact) >= 0.8


def test_pq_training_reduces_reconstruction_error(spark, sf_dir):
    """One Lloyd round per subspace must not worsen — and should
    measurably improve — mean reconstruction error vs raw seeds."""
    from pyspark.sql import functions as F

    from litebase_spark.catalog import load
    from litebase_spark.operators.similarity import (
        PQ_M,
        PQ_SUB,
        _argmin_sub,
        pq_fit,
    )

    e = load(spark, sf_dir, "embeddings")

    def mean_err(books):
        out = e.select(
            *[
                F.slice("embedding", s * PQ_SUB + 1, PQ_SUB).alias(f"v{s}")
                for s in range(PQ_M)
            ]
        )
        err = None
        for s in range(PQ_M):
            d2 = _argmin_sub(books[s], f"v{s}")["d2"]
            err = d2 if err is None else err + d2
        return out.agg(F.avg(err)).collect()[0][0]

    seeds = pq_fit(e, iters=0)
    trained = pq_fit(e, iters=1)
    e_seed, e_trained = mean_err(seeds), mean_err(trained)
    assert e_trained <= e_seed
    assert e_trained < 0.9 * e_seed  # a real improvement, not noise
