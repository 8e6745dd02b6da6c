"""Similarity search over the embeddings table (north-star LLM ops).

Three tiers:

  * brute-force cosine top-k — the correctness baseline. Query set
    broadcasts; each partition of the corpus scores its rows against all
    queries (a broadcast nested-loop, NOT a shuffled cross join) and the
    per-query top-k is a TakeOrdered, so nothing quadratic ever shuffles.
  * LSH-bucketed (random hyperplane) — the scale path: sign-bit sketch of
    each vector, candidates only within matching buckets (plus multiprobe
    neighbors at query time in a real deployment).
  * IVF-style (coarse quantizer) — k-means-free variant using LSH prefix
    as the coarse cell; demonstrates the partition-pruning shape (probe
    only nprobe cells).

Dot products use JVM higher-order functions (zip_with + aggregate) over
the float arrays, cast to double element-wise — identical left-to-right
fold order as the DuckDB oracle expression, so brute-force results are
oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from litebase_spark.catalog import load, query, spread
from litebase_spark.functions.portable import plane_components, plane_duck

DIM = 64
N_QUERIES = 5  # vec_id < 5 are the query vectors in the catalog entries
TOP_K = 3


def dot(a, b) -> Column:
    """Exact-order fold: sum_i a[i]*b[i] in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


# DuckDB-side equivalents with the same left-to-right fold order.
_SQL_DOT = (
    "list_sum(list_transform(range(1, {n} + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_SQL_NORM = (
    "sqrt(list_sum(list_transform(range(1, {n} + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
)


@query(
    "knn_cosine_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.qid, e.vec_id,
               ROUND({_SQL_DOT.format(a='q.qv', b='e.embedding', n=DIM)}
                 / ({_SQL_NORM.format(a='q.qv', n=DIM)}
                    * {_SQL_NORM.format(a='e.embedding', n=DIM)}), 6)
                   AS cos_sim
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id != q.qid
    ),
    ranked AS (
        SELECT qid, vec_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    )
    SELECT qid, vec_id, cos_sim, rn AS rank
    FROM ranked WHERE rn <= {TOP_K}
    """,
    description="Brute-force cosine top-k (ANN correctness baseline). "
    "Query vectors broadcast; corpus scan scores locally; per-query top-k "
    "via window. 100 TB: O(corpus) work but O(k) shuffle — the scored "
    "rows never leave their partition except the k winners.",
    tags=("similarity",),
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    # single-file fixture -> repartition so the scoring map parallelizes
    e = spread(e)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        norm2(F.col("embedding")).alias("qn"),
    )
    from pyspark.sql import Window

    # corpus norm computed once per row, query norm once per query —
    # the per-pair work is just the dot product (bit-identical to the
    # naive cosine: same fold order, same scalar division).
    sim = dot(F.col("qv"), F.col("embedding")) / (
        F.col("qn") * F.col("cn")
    )
    scored = (
        e.select("vec_id", "embedding", norm2(F.col("embedding")).alias("cn"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(sim, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "cos_sim", "rank")
    )


@query(
    "embedding_norms",
    oracle=f"""
    SELECT label,
           COUNT(*) AS n_vectors,
           ROUND(CAST(SUM(CAST(ROUND(
               {_SQL_NORM.format(a='embedding', n=DIM)}, 6)
               AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_norm
    FROM embeddings GROUP BY label
    """,
    description="Vector norms aggregated per label (embedding hygiene "
    "check). Per-row norm rounded then summed in DECIMAL so the "
    "cross-engine aggregation order cannot drift.",
    tags=("similarity",),
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    norm_dec = F.round(norm2(F.col("embedding")), 6).cast("decimal(18,6)")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(
            F.sum(norm_dec).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_norm"),
    )


# ---------------------------------------------------------------------------
# LSH / IVF scale paths (oracle-exact: hyperplane constants embedded on
# both sides — see functions/portable.py plane_components)
# ---------------------------------------------------------------------------

N_PLANES = 6  # random hyperplanes -> 6-bit sketch (bucket occupancy
#   ~ corpus/2^6; raise for larger corpora — tests pick recall targets)
N_PROBE_BITS = 4  # IVF-style coarse cell = top 4 bits of the sketch

_PLANES = plane_components(N_PLANES, DIM)


def sketch_expr(vec) -> Column:
    """N_PLANES-bit sign sketch of a vector under deterministic
    md5-derived hyperplanes. The plane constants are embedded in the
    plan as array literals (no per-row hashing — round 1 evaluated
    xxhash64 per element per row) and duplicated verbatim into the
    DuckDB oracle, so every sketch bit is cross-engine exact."""
    out = F.lit(0)
    for p, plane in enumerate(_PLANES):
        proj = F.aggregate(
            F.zip_with(
                vec, F.lit(plane), lambda x, c: x.cast("double") * c
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out.cast("int")


def sketch_duck(e: str) -> str:
    """DuckDB twin of sketch_expr (bit-identical sign sketch)."""
    bits = []
    for p, plane in enumerate(_PLANES):
        proj = (
            f"list_sum(list_transform(range(1, {DIM} + 1), "
            f"i -> CAST({e}[i] AS DOUBLE) * {plane_duck(plane)}[i]))"
        )
        bits.append(f"CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


def _knn_lsh_oracle() -> str:
    return f"""
    WITH s AS (
      SELECT vec_id, embedding, {sketch_duck('embedding')} AS sketch,
             {_SQL_NORM.format(a='embedding', n=DIM)} AS nrm
      FROM embeddings
    ), q AS (
      SELECT vec_id AS qid, embedding AS qv, sketch AS qsketch, nrm AS qn
      FROM s WHERE vec_id < {N_QUERIES}
    ), cand AS (
      SELECT q.qid, s.vec_id,
             ROUND({_SQL_DOT.format(a='q.qv', b='s.embedding', n=DIM)}
               / (q.qn * s.nrm), 6) AS cos_sim
      FROM s JOIN q ON s.sketch = q.qsketch AND s.vec_id != q.qid
    ), ranked AS (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cos_sim DESC, vec_id) AS rn
      FROM cand
    )
    SELECT qid, vec_id, cos_sim, rn AS rank FROM ranked WHERE rn <= {TOP_K}
    """


@query(
    "knn_lsh_bucketed",
    oracle=_knn_lsh_oracle(),
    description="Random-hyperplane LSH ANN (scale path): sign "
    "sketch (N_PLANES bits) per vector; candidates = corpus rows whose sketch matches a "
    "query sketch; exact cosine re-rank within candidates. 100 TB: the "
    "join is keyed by sketch (equi, broadcastable query side), so work is "
    "corpus/2^bits per query instead of corpus. Hyperplanes are embedded "
    "md5-derived constants, so buckets AND reranks are oracle-exact; "
    "tests additionally assert recall vs knn_cosine_bruteforce.",
    tags=("similarity", "lsh"),
)
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = (
        spread(load(spark, sf_dir, "embeddings"))
        .select(
            "vec_id",
            "embedding",
            sketch_expr(F.col("embedding")).alias("sketch"),
            norm2(F.col("embedding")).alias("nrm"),
        )
        .localCheckpoint(eager=True)  # reused by both sides of the bucket join
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("sketch").alias("qsketch"),
        F.col("nrm").alias("qn"),
    )
    sim = dot(F.col("qv"), F.col("embedding")) / (F.col("qn") * F.col("nrm"))
    cand = (
        e.join(
            F.broadcast(q),
            (F.col("sketch") == F.col("qsketch"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id", F.round(sim, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "cos_sim", "rank")
    )


@query(
    "ivf_cells",
    oracle=f"""
    WITH s AS (
      SELECT CAST({sketch_duck('embedding')} AS BIGINT)
               >> {N_PLANES - N_PROBE_BITS} AS cell,
             CAST(ROUND({_SQL_NORM.format(a='embedding', n=DIM)}, 6)
               AS DECIMAL(18,6)) AS nrm
      FROM embeddings
    )
    SELECT cell, COUNT(*) AS n_vectors,
           ROUND(CAST(SUM(nrm) AS DOUBLE) / COUNT(*), 6) AS avg_norm
    FROM s GROUP BY cell
    """,
    description="IVF-style coarse partitioning stats: vectors assigned to "
    "coarse cells (sketch prefix as the quantizer); per-cell counts "
    "and mean norm. The physical design for ANN at 100 TB: write the "
    "corpus partitioned by cell so a query probes nprobe partitions "
    "(partition pruning) instead of scanning everything. Oracle-exact "
    "via embedded hyperplane constants + decimal-exact mean norms.",
    tags=("similarity", "lsh"),
)
def ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    e = spread(e)
    cell = F.shiftrightunsigned(
        sketch_expr(F.col("embedding")).cast("long"), N_PLANES - N_PROBE_BITS
    ).alias("cell")
    norm_dec = F.round(norm2(F.col("embedding")), 6).cast("decimal(18,6)")
    return (
        e.select(cell, norm_dec.alias("nrm"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.sum("nrm").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_norm"
            ),
        )
    )


@query(
    "embedding_dim_stats",
    oracle=f"""
    SELECT t.i AS dim,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(CAST(embedding[t.i] AS DOUBLE) * 1048576.0)
                    AS BIGINT)) AS DOUBLE) / 1048576.0 / COUNT(*) AS mean,
           MIN(CAST(embedding[t.i] AS DOUBLE)) AS dmin,
           MAX(CAST(embedding[t.i] AS DOUBLE)) AS dmax
    FROM embeddings, range(1, {DIM} + 1) t(i)
    GROUP BY t.i
    """,
    description="Per-dimension corpus statistics (mean/min/max across "
    "the embedding columns) — the precursor to whitening/normalizing a "
    "vector corpus before indexing. posexplode keeps the shuffle at "
    "dim x partial rows (map-side combine); means use the exact "
    "fixed-point long-sum scheme (FLOOR(x*2^20), no rounding ties) so "
    "results are oracle-exact.",
    tags=("similarity", "stats"),
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load(spark, sf_dir, "embeddings"))
    q = 1048576.0
    return (
        e.select(F.posexplode("embedding").alias("pos", "x"))
        .select(
            (F.col("pos") + 1).alias("dim"),
            F.col("x").cast("double").alias("x"),
        )
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.floor(F.col("x") * F.lit(q))).cast("double")
                / F.lit(q)
                / F.count(F.lit(1))
            ).alias("mean"),
            F.min("x").alias("dmin"),
            F.max("x").alias("dmax"),
        )
    )


@query(
    "embedding_quantize_minmax",
    oracle=f"""
    WITH base AS (
      SELECT vec_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
      FROM embeddings
    ), rng AS (
      SELECT vec_id, e, list_min(e) AS q_min, list_max(e) AS q_max
      FROM base
    ), scaled AS (
      SELECT vec_id, e, q_min, q_max,
             (q_max - q_min) / 255.0 AS q_scale
      FROM rng
    ), coded AS (
      SELECT vec_id, e, q_min, q_max, q_scale,
             list_transform(e, v -> CAST(CASE WHEN q_scale = 0 THEN 0
               ELSE LEAST(FLOOR((v - q_min) / q_scale), 255) END
               AS INT)) AS codes
      FROM scaled
    )
    SELECT vec_id, q_min, q_max,
           md5(array_to_string(list_transform(codes,
             c -> CAST(c AS VARCHAR)), ',')) AS codes_digest,
           list_max(list_transform(range(1, {DIM} + 1),
             i -> ABS(e[i] - (q_min + codes[i] * q_scale)))) AS max_abs_err
    FROM coded
    """,
    description="Per-vector int8 scalar quantization of the embedding "
    "corpus (asymmetric min/max affine codes + dequantization error): "
    "the storage-layout operator for ANN at 100 TB — float32 corpora "
    "shrink 4x, IVF/LSH probes scan int8 codes and only rerank winners "
    "in float. FLOOR-based codes have no rounding ties, so codes AND "
    "the max reconstruction error are oracle-exact. The code list is "
    "surfaced as a portable md5 digest (scalar output columns only — "
    "array columns break downstream tabular canonicalizers). Narrow "
    "map, no shuffle.",
    tags=("similarity", "quantization"),
)
def embedding_quantize_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load(spark, sf_dir, "embeddings"))
    base = e.select(
        "vec_id",
        F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("e"),
    )
    rng = base.select(
        "vec_id",
        "e",
        F.array_min("e").alias("q_min"),
        F.array_max("e").alias("q_max"),
    ).withColumn("q_scale", (F.col("q_max") - F.col("q_min")) / 255.0)
    coded = rng.withColumn(
        "codes",
        F.expr(
            "transform(e, v -> CAST(CASE WHEN q_scale = 0 THEN 0"
            " ELSE LEAST(FLOOR((v - q_min) / q_scale), 255) END AS INT))"
        ),
    )
    return coded.select(
        "vec_id",
        "q_min",
        "q_max",
        F.expr(
            "md5(array_join(transform(codes, c -> CAST(c AS STRING)), ','))"
        ).alias("codes_digest"),
        F.expr(
            f"array_max(transform(sequence(1, {DIM}),"
            " i -> ABS(element_at(e, i) -"
            " (q_min + element_at(codes, i) * q_scale))))"
        ).alias("max_abs_err"),
    )


N_CENTROIDS = 16
N_PROBE = 4


def _knn_ivf_probe_oracle() -> str:
    nrm = _SQL_NORM.format(a="embedding", n=DIM)
    return f"""
    WITH e AS (
      SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings
    ), cents AS (
      SELECT vec_id AS cent_id, embedding AS cv, nrm AS cn
      FROM e ORDER BY vec_id LIMIT {N_CENTROIDS}
    ), scored AS (
      SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
             {_SQL_DOT.format(a='e.embedding', b='c.cv', n=DIM)}
               / (e.nrm * c.cn) AS sim
      FROM e CROSS JOIN cents c
    ), assigned AS (
      SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, cent_id) AS rn
        FROM scored
      ) WHERE rn = 1
    ), q AS (
      SELECT vec_id AS qid, embedding AS qv, nrm AS qn
      FROM assigned WHERE vec_id < {N_QUERIES}
    ), qscored AS (
      SELECT q.qid, q.qv, q.qn, c.cent_id,
             {_SQL_DOT.format(a='q.qv', b='c.cv', n=DIM)}
               / (q.qn * c.cn) AS qsim
      FROM q CROSS JOIN cents c
    ), probes AS (
      SELECT qid, qv, qn, cent_id AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY qsim DESC, cent_id) AS pr
        FROM qscored
      ) WHERE pr <= {N_PROBE}
    ), cand AS (
      SELECT p.qid, a.vec_id,
             ROUND({_SQL_DOT.format(a='p.qv', b='a.embedding', n=DIM)}
               / (p.qn * a.nrm), 6) AS cos_sim
      FROM assigned a JOIN probes p
        ON a.cell = p.cell AND a.vec_id != p.qid
    ), ranked AS (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cos_sim DESC, vec_id) AS rn
      FROM cand
    )
    SELECT qid, vec_id, cos_sim, rn AS rank FROM ranked WHERE rn <= {TOP_K}
    """


def _coarse_quantizer_literal(e: DataFrame) -> Column:
    """The IVF coarse quantizer as a LITERAL struct array
    (cent_id, cv, cn): N_CENTROIDS (16) rows collected to the driver
    (O(k), same class as the k-means centroid collect) and re-entered
    as plan literals, so assignment becomes a pure per-row projection —
    transform() over the 16 centroids + array_max argmin — instead of a
    crossJoin + row_number window that shuffles corpus x 16 rows.

    Centroid norms are computed driver-side with the same sequential
    left-to-right IEEE-double fold as the JVM norm2 (and the oracle's
    sqrt(list_sum(...))) — bit-identical by construction, and hoisted
    out of the per-row lambda (norm2(c.cv) inside transform() is NOT
    constant-folded: it would re-run 16 x dim multiplies per corpus
    row)."""
    import math

    cent_rows = (
        e.orderBy("vec_id")
        .limit(N_CENTROIDS)
        .select("vec_id", "embedding")
        .collect()
    )

    def _py_norm(vec) -> float:
        acc = 0.0
        for v in vec:
            acc = acc + float(v) * float(v)
        return math.sqrt(acc)

    return F.array(
        *[
            F.struct(
                F.lit(int(r["vec_id"])).alias("cent_id"),
                F.array(
                    *[F.lit(float(v)) for v in r["embedding"]]
                ).alias("cv"),
                F.lit(_py_norm(r["embedding"])).alias("cn"),
            )
            for r in cent_rows
        ]
    )


@query(
    "knn_ivf_probe",
    oracle=_knn_ivf_probe_oracle(),
    description="IVF ANN search: coarse quantizer = sampled centroids "
    "(k-means would train the same shape; sampling keeps it deterministic), "
    "corpus assigned to nearest centroid once (build-time shuffle), queries "
    "probe the N_PROBE nearest cells and exact-rerank inside them. 100 TB: "
    "the corpus is written partitioned by cell, so a query touches "
    "nprobe/ncells of the data via partition pruning; the rerank is "
    "cell-local. Every step is deterministic ((sim, cent_id) tie-breaks), "
    "so the probe-limited result is oracle-exact; tests additionally "
    "assert recall vs knn_cosine_bruteforce.",
    tags=("similarity", "ivf"),
)
def knn_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = spread(load(spark, sf_dir, "embeddings"))
    # The coarse quantizer IS the model (see _coarse_quantizer_literal;
    # this replaced the round-3 crossJoin + row_number window, which
    # shuffled corpus x 16 rows twice — 24 exchanges).
    cents_arr = _coarse_quantizer_literal(e)

    # Per-row: sims to all centroids as (sim, -cent_id) structs; lexical
    # array_max = highest sim, ties to the LOWEST cent_id — identical to
    # the oracle's (sim DESC, cent_id ASC) row_number tie-break. The
    # centroid norm is a constant-folded JVM expression (same fold order
    # as the oracle's sqrt(list_sum(...))).
    def cell_sims(vec, nrm):
        return F.transform(
            cents_arr,
            lambda c: F.struct(
                (dot(vec, c["cv"]) / (nrm * c["cn"])).alias("sim"),
                (-c["cent_id"]).alias("neg_id"),
            ),
        )

    assigned = e.select(
        "vec_id",
        "embedding",
        norm2(F.col("embedding")).alias("nrm"),
    ).select(
        "vec_id",
        "embedding",
        "nrm",
        (-F.array_max(cell_sims(F.col("embedding"), F.col("nrm")))["neg_id"])
        .alias("cell"),
    )
    # query side: N_QUERIES rows probe their N_PROBE nearest cells —
    # sort the 16 (sim, cent_id) pairs per query (array_sort on
    # (-sim, cent_id) = sim DESC, cent_id ASC), slice, explode. All
    # expression-level; the probe list broadcasts to the search join.
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        norm2(F.col("embedding")).alias("qn"),
    )
    qsims = F.transform(
        cents_arr,
        lambda c: F.struct(
            (-(dot(F.col("qv"), c["cv"]) / (F.col("qn") * c["cn"])))
            .alias("neg_sim"),
            c["cent_id"].alias("cent_id"),
        ),
    )
    probes = q.select(
        "qid",
        "qv",
        "qn",
        F.explode(
            F.slice(F.array_sort(qsims), 1, N_PROBE)["cent_id"]
        ).alias("cell"),
    )
    # search: candidates restricted to probed cells, exact rerank
    rsim = dot(F.col("qv"), F.col("embedding")) / (F.col("qn") * F.col("nrm"))
    cand = (
        assigned.join(F.broadcast(probes), on="cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(rsim, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "cos_sim", "rank")
    )


@query(
    "knn_cosine_vectorized",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.qid, e.vec_id,
               ROUND({_SQL_DOT.format(a='q.qv', b='e.embedding', n=DIM)}
                 / ({_SQL_NORM.format(a='q.qv', n=DIM)}
                    * {_SQL_NORM.format(a='e.embedding', n=DIM)}), 6)
                   AS cos_sim
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id != q.qid
    ),
    ranked AS (
        SELECT qid, vec_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    )
    SELECT qid, vec_id, cos_sim, rn AS rank
    FROM ranked WHERE rn <= {TOP_K}
    """,
    description="Brute-force cosine top-k with a VECTORIZED numpy kernel "
    "(mapInPandas): per Arrow batch, one (batch x dim)@(dim x nq) BLAS "
    "matmul scores every query at once, then a partition-local top-4k cut "
    "so only O(k) rows per (query, partition) reach the shuffle. The "
    "corpus ships to Python as float32 (half the Arrow bytes) and the "
    "surviving candidates are RE-SCORED with the exact float64 JVM "
    "expression (same fold order as knn_cosine_bruteforce), making the "
    "result bit-identical to the oracle by construction — numpy only "
    "prunes, it never decides a reported value. The 4k margin absorbs "
    "both ulp-level BLAS-vs-JVM ordering differences and the float32 "
    "transfer's ~1e-7 relative error at the k boundary.",
    tags=("similarity", "pandas_udf"),
)
def knn_cosine_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    # parallelism fix only for single-row-group fixture scans — an
    # unconditional repartition paid a full-corpus exchange before the
    # Arrow stage at larger inputs (0.92 -> 0.46 s at the sf1 point);
    # spread() carries the <8-partition guard itself
    e = spread(e)
    # query side is tiny (N_QUERIES rows): ship it in the task closure —
    # the same role as a broadcast hash side
    qrows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    qids = np.array([r["vec_id"] for r in qrows])
    Q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    # margin over k for the partition-local prune: 2k was ulp-safe for
    # a float64 transfer; the float32 Arrow transfer below has ~1e-7
    # relative error, so double the margin again — the exact JVM
    # re-score still decides every reported value
    cut = 4 * TOP_K

    def score(batches):
        for pdf in batches:
            M = np.stack(pdf["embedding"].apply(np.asarray).values).astype(
                np.float64
            )
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = Mn @ Qn.T  # (batch, nq)
            ids = pdf["vec_id"].values
            out_q, out_v = [], []
            for j, qid in enumerate(qids):
                col = sims[:, j]
                mask = ids != qid
                cand_ids, cand_sims = ids[mask], col[mask]
                k = min(cut, len(cand_ids))
                if k == 0:
                    continue
                # partition-local cut: only 2k rows per query leave the task
                top = np.argpartition(-cand_sims, k - 1)[:k]
                out_q.extend([qid] * k)
                out_v.extend(cand_ids[top].tolist())
            yield pd.DataFrame({"qid": out_q, "vec_id": out_v})

    # float32 transfer: halves the Arrow corpus shipment to Python; the
    # kernel only PRUNES (with the widened margin) — reported values
    # come from the exact float64 JVM re-score below
    cand = e.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    ).mapInPandas(score, schema="qid long, vec_id long")
    # Exact re-score of the pruned candidate set (tiny: queries x 2k x
    # partitions) with the SAME JVM fold as knn_cosine_bruteforce.
    qdf = F.broadcast(
        e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            norm2(F.col("embedding")).alias("qn"),
        )
    )
    cdf = e.select(
        F.col("vec_id"),
        F.col("embedding").alias("cv"),
        norm2(F.col("embedding")).alias("cn"),
    )
    sim = dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        cand.join(cdf, "vec_id")
        .join(qdf, "qid")
        .select("qid", "vec_id", F.round(sim, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "cos_sim", "rank")
    )


@query(
    "embedding_quantize_int8",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS qscale
      FROM embeddings
    ),
    rec AS (
      SELECT e.vec_id, q.qscale,
             list_max(list_transform(e.embedding,
               x -> abs(CAST(x AS DOUBLE)
                        - floor(CAST(x AS DOUBLE) / q.qscale + 0.5)
                          * q.qscale))) AS max_abs_err
      FROM embeddings e JOIN q USING (vec_id)
      WHERE q.qscale > 0
    )
    SELECT vec_id, ROUND(qscale, 9) AS qscale,
           ROUND(max_abs_err, 9) AS max_abs_err
    FROM rec
    """,
    description="Symmetric int8 quantization of the embedding column — "
    "the 100 TB ANN STORAGE path (4x smaller vectors, int8 SIMD "
    "scoring): per-vector scale = max|x|/127, code = floor(x/scale + "
    "0.5) (floor-based round — engine-portable, unlike HALF_EVEN "
    "variance between engines), reporting per-vector max reconstruction "
    "error. Narrow map, no shuffle; the quantized table is what gets "
    "written partitioned by IVF cell (see knn_ivf_probe). Tests assert "
    "int8-scored top-k recall vs the exact ranking.",
    tags=("similarity", "quantization"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    e = spread(e)
    xd = F.transform("embedding", lambda x: F.abs(x.cast("double")))
    qscale = (F.array_max(xd) / 127.0).alias("qscale")
    base = e.select("vec_id", "embedding", qscale).filter(F.col("qscale") > 0)
    recon_err = F.array_max(
        F.transform(
            "embedding",
            lambda x: F.abs(
                x.cast("double")
                - F.floor(x.cast("double") / F.col("qscale") + 0.5)
                * F.col("qscale")
            ),
        )
    )
    # compute the error against the FULL-precision scale first; rounding
    # to 9 digits is display-only (aliasing the rounded value straight
    # back to "qscale" would rebind the lambda to the rounded scale)
    out = base.select("vec_id", "qscale", recon_err.alias("err"))
    return out.select(
        "vec_id",
        F.round("qscale", 9).alias("qscale"),
        F.round("err", 9).alias("max_abs_err"),
    )


def quantize_codes(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Produce the actual int8 code arrays + scale for storage: the
    writable form of embedding_quantize_int8 (array<tinyint> is 1/4 the
    bytes of array<float>)."""
    xd = F.transform(vec_col, lambda x: F.abs(x.cast("double")))
    with_scale = df.withColumn("qscale", F.array_max(xd) / 127.0)
    codes = F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") / F.col("qscale") + 0.5).cast(
            "tinyint"
        ),
    )
    return with_scale.withColumn("codes", codes)


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means (iterative DataFrame algorithm)
# ---------------------------------------------------------------------------

K_CLUSTERS = 10
KMEANS_ITERS = 4
_Q = 1048576.0  # 2^20 fixed-point quantum for portable centroid means


def _dist_duck(e: str, c: str) -> str:
    """DuckDB squared euclidean distance, same fold order as _sqdist."""
    d = f"(CAST({e}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))"
    return (
        f"list_sum(list_transform(range(1, {DIM} + 1), i -> {d} * {d}))"
    )


def kmeans_oracle_ctes(k: int, iters: int) -> str:
    """DuckDB CTE chain replaying kmeans_fit exactly: portable sketch
    seeds, `iters` unrolled Lloyd rounds (argmin assign with (d2, cid)
    tie-break; fixed-point FLOOR(x*2^20) long-sum means), then a final
    assignment `fin(vec_id, embedding, cid, d2)` against the last
    centroids — the same 5-pass structure the Spark implementation runs.
    SQL can unroll the fixpoint because every step is deterministic:
    that is the whole point of the portable hashing + fixed-point design
    (a float-summing k-means could never be oracle-checked)."""
    parts = [
        f"""sk AS (
      SELECT vec_id, embedding, {sketch_duck('embedding')} AS cell
      FROM embeddings
    ), seeds AS (
      SELECT arg_min(embedding, vec_id) AS cv, MIN(vec_id) AS mv
      FROM sk GROUP BY cell
    ), cseed AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY mv) - 1 AS INT) AS cid,
             list_transform(cv, v -> CAST(v AS DOUBLE)) AS cv
      FROM seeds ORDER BY mv LIMIT {k}
    ), c0 AS (
      SELECT cid, cv FROM cseed
      UNION ALL
      SELECT CAST(t.j AS INT) AS cid, s.cv
      FROM range(0, {k}) t(j)
      JOIN (SELECT COUNT(*) AS nc FROM cseed) n ON t.j >= n.nc
      JOIN cseed s ON s.cid = t.j % n.nc
    )"""
    ]
    q_sum = (
        "CAST(SUM(CAST(FLOOR(CAST(embedding[t.i] AS DOUBLE)"
        f" * {_Q!r}) AS BIGINT)) AS DOUBLE) / {_Q!r} / COUNT(*)"
    )
    for i in range(1, iters + 1):
        parts.append(
            f"""d{i} AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {_dist_duck('e.embedding', 'c.cv')} AS d2
      FROM sk e CROSS JOIN c{i - 1} c
    ), a{i} AS (
      SELECT vec_id, embedding, cid, d2 FROM (
        SELECT vec_id, embedding, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rn
        FROM d{i}
      ) WHERE rn = 1
    ), u{i} AS (
      SELECT cid, t.i AS pos, {q_sum} AS m
      FROM a{i}, range(1, {DIM} + 1) t(i) GROUP BY cid, t.i
    ), cn{i} AS (
      SELECT cid, list(m ORDER BY pos) AS cv FROM u{i} GROUP BY cid
    ), c{i} AS (
      SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
      FROM c{i - 1} p LEFT JOIN cn{i} n ON n.cid = p.cid
    )"""
        )
    parts.append(
        f"""dfin AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {_dist_duck('e.embedding', 'c.cv')} AS d2
      FROM sk e CROSS JOIN c{iters} c
    ), fin AS (
      SELECT vec_id, embedding, cid, d2 FROM (
        SELECT vec_id, embedding, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rn
        FROM dfin
      ) WHERE rn = 1
    )"""
    )
    return ", ".join(parts)


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _argmin_centroid(cents: list) -> Column:
    """struct(d2, cluster_id) of the nearest centroid, as a single
    generated expression: the whole model is inlined as ONE nested
    array literal (k x dim x 8 bytes inside the plan — smaller than any
    broadcast), so assignment is map-only with NO join, NO shuffle, NO
    exchange, and the expression tree stays constant-size regardless of
    k (one py4j literal, not k x dim of them). array_min's struct
    ordering = (min d2, then min cluster_id), the same deterministic
    tie-break as min_by(struct(d2, cluster_id))."""
    return F.array_min(
        F.transform(
            F.lit(cents),
            lambda c, i: F.struct(
                _sqdist(F.col("embedding"), c).alias("d2"),
                i.alias("cluster_id"),
            ),
        )
    )


def kmeans_fit(
    e: DataFrame, k: int = K_CLUSTERS, iters: int = KMEANS_ITERS
) -> tuple[DataFrame, list]:
    """Lloyd's k-means over (vec_id, embedding); returns (assignments,
    centroids). The canonical distributed iterative algorithm:

    - The CORPUS never leaves the executors. Per iteration it is one
      map-only assign pass (argmin over k centroid literals compiled
      into the plan — see _argmin_centroid; no join, no shuffle) plus
      one partial/final aggregation (recompute: per-(cell, dim) mean
      via posexplode — the shuffle carries k x dim partial sums per map
      task, not vectors). One Spark job per iteration.
    - Only the MODEL (k x dim doubles) ever reaches the driver, once per
      iteration — at 100 TB this is still k x dim x 8 bytes.
    - Init is deterministic and spread: min vec_id per sign-sketch cell
      (the same hyperplane sketch the LSH/IVF operators use), so reruns
      and resumes pick identical seeds — no driver RNG.
    - The returned assignment is a final map-only pass with the FINAL
      centroids, so (assignments, centroids) are mutually consistent.
    """
    e = e.select("vec_id", "embedding").localCheckpoint(eager=True)

    seed_cells = (
        e.select(
            "vec_id",
            "embedding",
            sketch_expr(F.col("embedding")).alias("cell"),
        )
        .groupBy("cell")
        .agg(F.min_by("embedding", "vec_id").alias("cv"), F.min("vec_id").alias("mv"))
        .orderBy("mv")
        .limit(k)
        .collect()
    )
    cents = [
        [float(x) for x in r["cv"]] for r in seed_cells
    ]
    while len(cents) < k:  # fewer occupied sketch cells than k
        cents.append(cents[len(cents) % len(seed_cells)])

    for _ in range(iters):
        best = _argmin_centroid(cents)
        assigned = e.select(
            "vec_id",
            "embedding",
            best["cluster_id"].alias("cluster_id"),
            best["d2"].alias("d2"),
        )
        per_dim = (
            assigned.select(
                "cluster_id", F.posexplode("embedding").alias("pos", "x")
            )
            .groupBy("cluster_id", "pos")
            # fixed-point sums: FLOOR(x * 2^20) is an exact double op
            # (the multiply is an exponent shift, floor has no rounding
            # ties), summed in primitive LONGs — exact, order-independent
            # partial aggregation, so the recomputed centroid is
            # bit-identical under any partitioning AND reproducible by
            # the DuckDB oracle (this replaced a decimal-avg form, whose
            # double->decimal cast has engine-dependent tie rounding;
            # long accumulators also stay in whole-stage codegen).
            # Centroids land within 2^-20 of the true mean — irrelevant
            # to clustering quality, decisive for differential testing.
            .agg(
                F.sum(
                    F.floor(F.col("x").cast("double") * F.lit(_Q))
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        # k x dim narrow rows reach the driver; assembling them into
        # centroid arrays is pure reshaping — doing it here instead of a
        # second groupBy saves a shuffle + job per iteration. The mean
        # (S / 2^20) / n is computed in Python doubles: float(S) is
        # exact below 2^53, /2^20 is exact, /n is one correctly-rounded
        # IEEE op — identical in Python, the JVM, and DuckDB.
        by_cluster: dict[int, dict[int, float]] = {}
        for r in per_dim.collect():
            by_cluster.setdefault(r["cluster_id"], {})[r["pos"]] = (
                float(r["s"]) / _Q / r["n"]
            )
        for cid, dims in by_cluster.items():
            # empty clusters never appear here -> keep previous centroid
            cents[cid] = [float(dims[p]) for p in sorted(dims)]
    best = _argmin_centroid(cents)
    assigned = e.select(
        "vec_id",
        "embedding",
        best["cluster_id"].alias("cluster_id"),
        best["d2"].alias("d2"),
    )
    return assigned, cents


@query(
    "embedding_kmeans",
    oracle=f"""
    WITH {kmeans_oracle_ctes(K_CLUSTERS, KMEANS_ITERS)}
    SELECT cid AS cluster_id, COUNT(*) AS n_vectors,
           ROUND(CAST(SUM(CAST(FLOOR(d2 * {_Q!r}) AS BIGINT)) AS DOUBLE)
                 / {_Q!r} / COUNT(*), 4) AS avg_sqdist
    FROM fin GROUP BY cid ORDER BY cid
    """,
    description="Distributed Lloyd's k-means over the embedding corpus "
    "(K=10, 4 iterations): per iteration one broadcast argmin pass + one "
    "partial-aggregated per-dimension fixed-point mean; only the k x dim "
    "model visits the driver. Returns per-cluster size and mean squared "
    "distance. Every step is deterministic (md5-derived sketch seeds, "
    "exact long-sum means, (d2, cid) tie-breaks), so the ENTIRE "
    "iterative fixpoint is oracle-checked against a DuckDB unrolled-CTE "
    "replay — upgraded from round 1's rows-only carve-out. Trained "
    "centroids are the production coarse quantizer for the IVF search "
    "path (knn_ivf_kmeans).",
    tags=("similarity", "iterative"),
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    e = spread(e)
    assigned, _ = kmeans_fit(e)
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            # exact fixed-point mean of d2 (same scheme as the centroid
            # update) so the reported inertia is cross-engine exact too
            F.round(
                F.sum(F.floor(F.col("d2") * F.lit(_Q))).cast("double")
                / F.lit(_Q)
                / F.count(F.lit(1)),
                4,
            ).alias("avg_sqdist"),
        )
        .orderBy("cluster_id")
    )


def _knn_ivf_kmeans_oracle() -> str:
    return f"""
    WITH RECURSIVE {kmeans_oracle_ctes(K_CLUSTERS, 2)},
    corpus AS (
      SELECT vec_id, cid AS cell, embedding,
             {_SQL_NORM.format(a='embedding', n=DIM)} AS nrm
      FROM fin
    ), q AS (
      SELECT vec_id AS qid, embedding AS qv, nrm AS qn
      FROM corpus WHERE vec_id < {N_QUERIES}
    ), qd AS (
      SELECT q.qid, q.qv, q.qn, c.cid AS cell,
             {_dist_duck('q.qv', 'c.cv')} AS qd2
      FROM q CROSS JOIN c2 c
    ), probes AS (
      SELECT qid, qv, qn, cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY qd2, cell) AS pr
        FROM qd
      ) WHERE pr <= {N_PROBE}
    ), cand AS (
      SELECT p.qid, s.vec_id,
             ROUND({_SQL_DOT.format(a='p.qv', b='s.embedding', n=DIM)}
               / (p.qn * s.nrm), 6) AS cos_sim
      FROM corpus s JOIN probes p
        ON s.cell = p.cell AND s.vec_id != p.qid
    ), ranked AS (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cos_sim DESC, vec_id) AS rn
      FROM cand
    )
    SELECT qid, vec_id, cos_sim, rn AS rank FROM ranked WHERE rn <= {TOP_K}
    """


@query(
    "knn_ivf_kmeans",
    oracle=_knn_ivf_kmeans_oracle(),
    description="IVF ANN search with a TRAINED coarse quantizer: the "
    "Lloyd's k-means centroids (kmeans_fit) replace knn_ivf_probe's "
    "deterministic sample, giving balanced cells that track the data "
    "distribution. Build: one argmin pass assigns the corpus to cells "
    "(the k-means output is reused as-is). Query: probe the N_PROBE "
    "nearest cells by centroid distance, exact cosine rerank inside "
    "them. 100 TB: corpus written partitioned by cell -> a query reads "
    "nprobe/k of the data via partition pruning; training cost is "
    "amortized over every query. The trained-quantizer pipeline is "
    "deterministic end-to-end, so probe + rerank results are "
    "oracle-exact (DuckDB replays the k-means in unrolled CTEs); tests "
    "assert recall vs the brute-force baseline and that candidates only "
    "come from probed cells.",
    tags=("similarity", "ivf", "iterative"),
)
def knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = spread(load(spark, sf_dir, "embeddings"))
    assigned, cents = kmeans_fit(e, k=K_CLUSTERS, iters=2)
    # Materialize the cell assignment once: three downstream branches
    # (query side, probe join, rerank) reference it, and at scale this
    # is the "write the corpus partitioned by cell" build step.
    corpus = assigned.select(
        "vec_id",
        F.col("cluster_id").alias("cell"),
        "embedding",
        norm2(F.col("embedding")).alias("nrm"),
    ).localCheckpoint(eager=True)
    cdf = F.broadcast(
        e.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "cell int, cv array<double>",
        )
    )
    # query side: probe the N_PROBE cells with smallest centroid distance
    q = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    probe_w = Window.partitionBy("qid").orderBy(F.asc("qd2"), F.asc("cell"))
    probes = (
        q.join(cdf)
        .select(
            "qid", "qv", "qn", "cell",
            _sqdist(F.col("qv"), F.col("cv")).alias("qd2"),
        )
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= N_PROBE)
        .select("qid", "qv", "qn", "cell")
    )
    # search: candidates restricted to probed cells, exact cosine rerank
    rsim = dot(F.col("qv"), F.col("embedding")) / (F.col("qn") * F.col("nrm"))
    cand = (
        corpus.join(F.broadcast(probes), on="cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(rsim, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-ADC: probe cells, score compressed int8 codes, rerank winners in float
# ---------------------------------------------------------------------------

_ADC_RERANK = 2 * TOP_K  # exact-rescore margin over the code-space scan


def _knn_ivf_adc_oracle() -> str:
    nrm = _SQL_NORM.format(a="embedding", n=DIM)
    return f"""
    WITH e AS (
      SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings
    ), cents AS (
      SELECT vec_id AS cent_id, embedding AS cv, nrm AS cn
      FROM e ORDER BY vec_id LIMIT {N_CENTROIDS}
    ), scored AS (
      SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
             {_SQL_DOT.format(a='e.embedding', b='c.cv', n=DIM)}
               / (e.nrm * c.cn) AS sim
      FROM e CROSS JOIN cents c
    ), assigned AS (
      SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, cent_id) AS rn
        FROM scored
      ) WHERE rn = 1
    ), quant AS (
      SELECT vec_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ed,
             list_min(list_transform(embedding, v -> CAST(v AS DOUBLE)))
               AS q_min,
             (list_max(list_transform(embedding, v -> CAST(v AS DOUBLE)))
              - list_min(list_transform(embedding, v -> CAST(v AS DOUBLE))))
               / 255.0 AS q_scale
      FROM embeddings
    ), coded AS (
      SELECT vec_id,
             list_transform(ed, v -> CAST(CASE WHEN q_scale = 0 THEN 0
               ELSE LEAST(FLOOR((v - q_min) / q_scale), 255) END AS INT))
               AS codes,
             q_min, q_scale
      FROM quant
    ), corpus AS (
      SELECT a.vec_id, a.embedding, a.nrm, a.cell,
             list_transform(c.codes, x -> c.q_min + x * c.q_scale) AS dq
      FROM assigned a JOIN coded c ON a.vec_id = c.vec_id
    ), q AS (
      SELECT vec_id AS qid, embedding AS qv, nrm AS qn
      FROM assigned WHERE vec_id < {N_QUERIES}
    ), qscored AS (
      SELECT q.qid, q.qv, q.qn, c.cent_id,
             {_SQL_DOT.format(a='q.qv', b='c.cv', n=DIM)}
               / (q.qn * c.cn) AS qsim
      FROM q CROSS JOIN cents c
    ), probes AS (
      SELECT qid, qv, qn, cent_id AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY qsim DESC, cent_id) AS pr
        FROM qscored
      ) WHERE pr <= {N_PROBE}
    ), adc AS (
      SELECT p.qid, c.vec_id, c.embedding, c.nrm, p.qv, p.qn,
             {_SQL_DOT.format(a='p.qv', b='c.dq', n=DIM)}
               / (p.qn * sqrt({_SQL_DOT.format(a='c.dq', b='c.dq', n=DIM)}))
               AS adc_sim
      FROM corpus c JOIN probes p
        ON c.cell = p.cell AND c.vec_id != p.qid
    ), shortlist AS (
      SELECT qid, vec_id, embedding, nrm, qv, qn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY adc_sim DESC, vec_id) AS rn
        FROM adc
      ) WHERE rn <= {_ADC_RERANK}
    ), exact AS (
      SELECT qid, vec_id,
             ROUND({_SQL_DOT.format(a='qv', b='embedding', n=DIM)}
               / (qn * nrm), 6) AS cos_sim
      FROM shortlist
    ), ranked AS (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cos_sim DESC, vec_id) AS rn
      FROM exact
    )
    SELECT qid, vec_id, cos_sim, rn AS rank FROM ranked WHERE rn <= {TOP_K}
    """


@query(
    "knn_ivf_adc",
    oracle=_knn_ivf_adc_oracle(),
    description="IVF-ADC search: probe N_PROBE coarse cells, score "
    "candidates against their int8 min/max-dequantized codes "
    "(asymmetric distance computation — the float query against the "
    "compressed corpus), shortlist 2k per query, then rerank the "
    "shortlist with the exact float fold. This is the memory-bandwidth "
    "layout for ANN at 100 TB: the probe scan touches 4x-smaller code "
    "rows and only the 2k winners load full floats. FLOOR-based codes "
    "and deterministic (score, vec_id) tie-breaks make the whole "
    "pipeline — assignment, probes, ADC scores, shortlist, exact "
    "rerank — oracle-exact.",
    tags=("similarity", "ivf", "quantization"),
)
def knn_ivf_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = spread(load(spark, sf_dir, "embeddings"))
    # r14: the r13 shape checkpointed the per-vector ASSIGNMENT —
    # embedding arrays included — a corpus-sized materialization the
    # bounded-only law forbids (the advice's example), and its warm
    # numbers excluded the costliest stage (the crossJoin + argmin
    # window) from the timed region. Replaced with the knn_ivf_probe
    # pattern: the coarse quantizer is a 16-row LITERAL (O(k) driver
    # collect — the IVF model every ANN deployment holds in memory),
    # assignment is a pure per-row transform()+array_max projection
    # (sim, -cent_id lexical max == the oracle's sim DESC, cent_id ASC
    # tie-break), and assignment + int8 coding fuse into ONE map-only
    # pass over ONE scan — no crossJoin, no window, no join, nothing
    # materialized, every execution pays the honest full cost.
    cents_arr = _coarse_quantizer_literal(e)

    def cell_of(vec, nrm):
        return -F.array_max(
            F.transform(
                cents_arr,
                lambda c: F.struct(
                    (dot(vec, c["cv"]) / (nrm * c["cn"])).alias("sim"),
                    (-c["cent_id"]).alias("neg_id"),
                ),
            )
        )["neg_id"]

    # int8 min/max codes (the embedding_quantize_minmax expressions),
    # dequantized once per row into the dq column the ADC fold scans —
    # computed in the SAME projection as the cell assignment
    corpus = (
        e.select(
            "vec_id",
            "embedding",
            norm2(F.col("embedding")).alias("nrm"),
            F.expr("transform(embedding, v -> CAST(v AS DOUBLE))").alias("ed"),
        )
        .select(
            "vec_id",
            "embedding",
            "nrm",
            cell_of(F.col("embedding"), F.col("nrm")).alias("cell"),
            "ed",
            F.array_min("ed").alias("q_min"),
            ((F.array_max("ed") - F.array_min("ed")) / 255.0).alias("q_scale"),
        )
        .select(
            "vec_id",
            "embedding",
            "nrm",
            "cell",
            F.expr(
                "transform(transform(ed, v -> CAST(CASE WHEN q_scale = 0"
                " THEN 0 ELSE LEAST(FLOOR((v - q_min) / q_scale), 255) END"
                " AS INT)), x -> q_min + x * q_scale)"
            ).alias("dq"),
        )
    )
    # query side straight off the (pushdown-pruned) scan: the probe list
    # is the per-query top-N_PROBE cells by centroid sim — array_sort on
    # (-sim, cent_id) literals, sliced, exploded; all expression-level
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        norm2(F.col("embedding")).alias("qn"),
    )
    qsims = F.transform(
        cents_arr,
        lambda c: F.struct(
            (-(dot(F.col("qv"), c["cv"]) / (F.col("qn") * c["cn"])))
            .alias("neg_sim"),
            c["cent_id"].alias("cent_id"),
        ),
    )
    probes = q.select(
        "qid",
        "qv",
        "qn",
        F.explode(
            F.slice(F.array_sort(qsims), 1, N_PROBE)["cent_id"]
        ).alias("cell"),
    )
    adc_sim = dot(F.col("qv"), F.col("dq")) / (
        F.col("qn") * F.sqrt(dot(F.col("dq"), F.col("dq")))
    )
    short_w = Window.partitionBy("qid").orderBy(
        F.desc("adc_sim"), F.asc("vec_id")
    )
    shortlist = (
        corpus.join(F.broadcast(probes), on="cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", "embedding", "nrm", "qv", "qn",
            adc_sim.alias("adc_sim"),
        )
        .withColumn("rn", F.row_number().over(short_w))
        .filter(F.col("rn") <= _ADC_RERANK)
    )
    exact = dot(F.col("qv"), F.col("embedding")) / (F.col("qn") * F.col("nrm"))
    rank_w = Window.partitionBy("qid").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        shortlist.select("qid", "vec_id", F.round(exact, 6).alias("cos_sim"))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization: per-subspace k-means codebooks (PQ proper)
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (PQ_M * PQ_SUB == DIM)
PQ_SUB = 8  # dims per subspace
PQ_K = 16  # centroids per subspace -> 4-bit codes
PQ_ITERS = 1


def _argmin_sub(cents: list, col_name: str):
    """struct(d2, cid) of the nearest subspace centroid — the same
    inlined-literal map-only argmin as _argmin_centroid, over an
    arbitrary subvector column."""
    return F.array_min(
        F.transform(
            F.lit(cents),
            lambda c, i: F.struct(
                _sqdist(F.col(col_name), c).alias("d2"), i.alias("cid")
            ),
        )
    )


def pq_fit(
    e: DataFrame,
    m: int = PQ_M,
    sub: int = PQ_SUB,
    k: int = PQ_K,
    iters: int = PQ_ITERS,
) -> list[list[list[float]]]:
    """Train PQ codebooks: independent k-means per subspace slice.

    Same distributed contract as kmeans_fit — the corpus never leaves
    the executors; per subspace per iteration one map-only argmin pass
    plus one fixed-point per-dim mean aggregate; only the m x k x sub
    model reaches the driver (O(model) collects, the centroid-collect
    pattern). Seeds are the first k subvectors by vec_id, so training
    is deterministic end-to-end and the DuckDB oracle replays it.
    """
    e = e.select("vec_id", "embedding").localCheckpoint(eager=True)
    books = []
    for s in range(m):
        sv = e.select(
            "vec_id", F.slice("embedding", s * sub + 1, sub).alias("v")
        )
        seed_rows = sv.orderBy("vec_id").limit(k).collect()
        cents = [[float(x) for x in r["v"]] for r in seed_rows]
        for _ in range(iters):
            best = _argmin_sub(cents, "v")
            assigned = sv.select("v", best["cid"].alias("cid"))
            per_dim = (
                assigned.select("cid", F.posexplode("v").alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(
                    F.sum(
                        F.floor(F.col("x").cast("double") * F.lit(_Q))
                    ).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
            )
            by: dict[int, dict[int, float]] = {}
            for r in per_dim.collect():
                by.setdefault(r["cid"], {})[r["pos"]] = (
                    float(r["s"]) / _Q / r["n"]
                )
            for cid, dims in by.items():
                cents[cid] = [dims[p] for p in sorted(dims)]
        books.append(cents)
    return books


def _pq_oracle(m: int = PQ_M, sub: int = PQ_SUB, k: int = PQ_K,
               iters: int = PQ_ITERS) -> str:
    def subdist(e: str, c: str) -> str:
        d = f"(CAST({e}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))"
        return f"list_sum(list_transform(range(1, {sub} + 1), i -> {d} * {d}))"

    q_sum = (
        "CAST(SUM(CAST(FLOOR(CAST(v[t.i] AS DOUBLE)"
        f" * {_Q!r}) AS BIGINT)) AS DOUBLE) / {_Q!r} / COUNT(*)"
    )
    parts = []
    for s in range(m):
        slc = (
            f"list_transform(range({s * sub + 1}, {s * sub + sub + 1}),"
            " i -> CAST(embedding[i] AS DOUBLE))"
        )
        parts.append(
            f"sv{s} AS (SELECT vec_id, {slc} AS v FROM embeddings)"
        )
        parts.append(
            f"""c{s}_0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             v AS cv
      FROM sv{s} ORDER BY vec_id LIMIT {k}
    )"""
        )
        for i in range(1, iters + 1):
            parts.append(
                f"""d{s}_{i} AS (
      SELECT e.vec_id, e.v, c.cid, {subdist('e.v', 'c.cv')} AS d2
      FROM sv{s} e CROSS JOIN c{s}_{i - 1} c
    ), a{s}_{i} AS (
      SELECT vec_id, v, cid FROM (
        SELECT vec_id, v, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rn
        FROM d{s}_{i}
      ) WHERE rn = 1
    ), u{s}_{i} AS (
      SELECT cid, t.i AS pos, {q_sum} AS mval
      FROM a{s}_{i}, range(1, {sub} + 1) t(i) GROUP BY cid, t.i
    ), cn{s}_{i} AS (
      SELECT cid, list(mval ORDER BY pos) AS cv FROM u{s}_{i} GROUP BY cid
    ), c{s}_{i} AS (
      SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
      FROM c{s}_{i - 1} p LEFT JOIN cn{s}_{i} n ON n.cid = p.cid
    )"""
            )
        parts.append(
            f"""f{s} AS (
      SELECT vec_id, cid AS code{s}, d2 AS e{s} FROM (
        SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rn
        FROM (SELECT e.vec_id, c.cid, {subdist('e.v', 'c.cv')} AS d2
              FROM sv{s} e CROSS JOIN c{s}_{iters} c)
      ) WHERE rn = 1
    )"""
        )
    digest = " || ',' || ".join(f"CAST(code{s} AS VARCHAR)" for s in range(m))
    err = " + ".join(f"e{s}" for s in range(m))
    joins = "f0" + "".join(f" JOIN f{s} USING (vec_id)" for s in range(1, m))
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT vec_id, md5({digest}) AS codes_digest,
           ROUND({err}, 6) AS recon_err
    FROM {joins}
    """
    )


@query(
    "embedding_pq_codes",
    oracle=_pq_oracle(),
    description="Product quantization proper: 8 independent per-subspace "
    "k-means codebooks (16 centroids x 8 dims each -> 4-bit codes, 64-d "
    "vector compressed to 8 bytes) trained with deterministic seeds and "
    "exact fixed-point Lloyd refinement, then every vector encoded by "
    "per-subspace argmin. Emits the code digest and the reconstruction "
    "squared error per vector — PQ is the 100 TB ANN memory layout "
    "(IVF-PQ = ivf_cells partitioning + these codes + knn_ivf_adc's "
    "scan-compressed/rerank-exact dataflow). Training, assignment, and "
    "errors all replay bit-exact in the DuckDB oracle's unrolled CTEs.",
    tags=("similarity", "quantization", "iterative"),
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load(spark, sf_dir, "embeddings"))
    books = pq_fit(e)
    out = e.select(
        "vec_id",
        *[
            F.slice("embedding", s * PQ_SUB + 1, PQ_SUB).alias(f"v{s}")
            for s in range(PQ_M)
        ],
    )
    for s in range(PQ_M):
        best = _argmin_sub(books[s], f"v{s}")
        out = out.withColumn(f"best{s}", best)
    digest = F.md5(
        F.concat_ws(
            ",",
            *[
                F.col(f"best{s}")["cid"].cast("string")
                for s in range(PQ_M)
            ],
        )
    )
    err = F.col("best0")["d2"]
    for s in range(1, PQ_M):
        err = err + F.col(f"best{s}")["d2"]
    return out.select(
        "vec_id",
        digest.alias("codes_digest"),
        F.round(err, 6).alias("recon_err"),
    )


# ---------------------------------------------------------------------------
# ANN quality evaluation: IVF probe recall against the exact baseline
# ---------------------------------------------------------------------------


def _recall_oracle() -> str:
    from litebase_spark.catalog import REGISTRY

    bf = REGISTRY["knn_cosine_bruteforce"].oracle
    iv = REGISTRY["knn_ivf_probe"].oracle
    return f"""
    WITH bf AS ({bf}),
    iv AS ({iv})
    SELECT bf.qid,
           CAST(COUNT(*) AS BIGINT) AS n_true,
           CAST(SUM(CASE WHEN iv.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           ROUND(CAST(SUM(CASE WHEN iv.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS recall_at_k
    FROM bf LEFT JOIN iv ON iv.qid = bf.qid AND iv.vec_id = bf.vec_id
    GROUP BY bf.qid
    """


@query(
    "knn_recall_eval",
    oracle=None,  # assembled after both constituent queries register
    description="ANN quality gate: recall@k of the probed-IVF search "
    "against the exact brute-force top-k, per query — the evaluation "
    "loop every production ANN deployment runs to tune nprobe/cells. "
    "Composes the two registered searches (ground truth join on "
    "(qid, vec_id)) into per-query hit counts; at 100 TB the ground "
    "truth comes from a sampled query set, which is exactly this "
    "dataflow with a sample() on the query side. Fully oracle-exact "
    "because both constituent searches are.",
    tags=("similarity", "eval"),
)
def knn_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = knn_cosine_bruteforce(spark, sf_dir).select(
        F.col("qid").alias("bq"), F.col("vec_id").alias("bv")
    )
    iv = knn_ivf_probe(spark, sf_dir).select(
        F.col("qid").alias("iq"), F.col("vec_id").alias("iv"), F.lit(1).alias("hit")
    )
    j = bf.join(
        iv, (F.col("bq") == F.col("iq")) & (F.col("bv") == F.col("iv")), "left"
    )
    n_hit = F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long")
    return j.groupBy(F.col("bq").alias("qid")).agg(
        F.count(F.lit(1)).alias("n_true"),
        n_hit.alias("n_hit"),
        F.round(
            n_hit.cast("double") / F.count(F.lit(1)), 6
        ).alias("recall_at_k"),
    )


from litebase_spark.catalog import REGISTRY as _SIM_REGISTRY  # noqa: E402

_SIM_REGISTRY["knn_recall_eval"].oracle = _recall_oracle()


@query(
    "knn_filtered_search",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.qid, e.vec_id, e.label,
               ROUND({_SQL_DOT.format(a='q.qv', b='e.embedding', n=DIM)}
                 / ({_SQL_NORM.format(a='q.qv', n=DIM)}
                    * {_SQL_NORM.format(a='e.embedding', n=DIM)}), 6)
                   AS cos_sim
        FROM q JOIN embeddings e
          ON e.label = q.qlabel AND e.vec_id != q.qid
    ),
    ranked AS (
        SELECT qid, vec_id, label, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    )
    SELECT qid, vec_id, label, cos_sim, rn AS rank
    FROM ranked WHERE rn <= {TOP_K}
    """,
    description="Filtered vector search (metadata predicate + ANN, the "
    "retrieval shape vector stores call 'pre-filtering'): each query "
    "retrieves top-k cosine neighbors RESTRICTED to rows sharing its "
    "label — the filter is an equi-join key, so Catalyst prunes "
    "non-matching rows BEFORE any dot product is computed rather than "
    "discarding scored candidates afterwards (post-filtering loses "
    "recall at fixed probe budgets; pre-filtering never does). At "
    "100 TB the label partition prunes files too (partitioned/bucketed "
    "layout), and the per-pair work drops by the filter selectivity. "
    "Same exact scoring fold as knn_cosine_bruteforce, per-query top-k "
    "via window — O(k) rows leave each partition.",
    tags=("similarity", "filter"),
)
def knn_filtered_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    e = spread(e)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
        norm2(F.col("embedding")).alias("qn"),
    )
    from pyspark.sql import Window

    sim = dot(F.col("qv"), F.col("embedding")) / (
        F.col("qn") * F.col("cn")
    )
    scored = (
        e.select(
            "vec_id", "label", "embedding",
            norm2(F.col("embedding")).alias("cn"),
        )
        .join(
            F.broadcast(q),
            (F.col("label") == F.col("qlabel"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id", "label", F.round(sim, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "vec_id", "label", "cos_sim", "rank")
    )


RADIUS_SIM = 0.2  # cosine threshold for the range query below


@query(
    "knn_radius_search",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv,
                      {_SQL_NORM.format(a='embedding', n=DIM)} AS qn
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.qid, e.vec_id,
               ROUND({_SQL_DOT.format(a='q.qv', b='e.embedding', n=DIM)}
                 / (q.qn * {_SQL_NORM.format(a='e.embedding', n=DIM)}), 6)
                   AS cos_sim
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id != q.qid
    )
    SELECT qid,
           COUNT(*) FILTER (cos_sim >= {RADIUS_SIM}) AS n_in_radius,
           CAST(MIN(CASE WHEN cos_sim >= {RADIUS_SIM} THEN vec_id END)
                AS BIGINT) AS min_vec_id,
           MAX(CASE WHEN cos_sim >= {RADIUS_SIM} THEN cos_sim END)
               AS best_sim
    FROM scored GROUP BY qid ORDER BY qid
    """,
    description="Radius (range) similarity search — the vector-DB API "
    "complement to top-k: ALL neighbors with cosine >= a threshold, "
    "reported as per-query counts + extrema so the result stays "
    "bounded. The threshold predicate lives INSIDE the scoring "
    "projection's filter, so non-matching pairs die in their partition "
    "(no shuffle carries them — unlike top-k, no per-query sort is "
    "needed at all, only a partial-aggregated count). 100 TB: same "
    "broadcast-queries + partition-local scoring shape as "
    "knn_cosine_bruteforce; the IVF/LSH bucketed variants prefilter "
    "candidates identically.",
    tags=("similarity", "range"),
)
def knn_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(load(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        norm2(F.col("embedding")).alias("qn"),
    )
    sim = dot(F.col("qv"), F.col("embedding")) / (
        F.col("qn") * F.col("cn")
    )
    scored = (
        e.select("vec_id", "embedding", norm2(F.col("embedding")).alias("cn"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(sim, 6).alias("cos_sim"))
    )
    hit = F.col("cos_sim") >= RADIUS_SIM
    return (
        scored.groupBy("qid")
        .agg(
            F.sum(F.when(hit, 1).otherwise(0)).cast("long")
            .alias("n_in_radius"),
            F.min(F.when(hit, F.col("vec_id"))).cast("bigint")
            .alias("min_vec_id"),
            F.max(F.when(hit, F.col("cos_sim"))).alias("best_sim"),
        )
        .orderBy("qid")
    )
