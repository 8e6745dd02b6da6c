"""Spatial operators — R-Tree and Geopoly analogs.

The reference build enables SQLite's R-Tree and Geopoly extensions
(reference: pkg/sqlite3/sqlite3.go:21,23 — SQLITE_ENABLE_RTREE /
SQLITE_ENABLE_GEOPOLY), whose query surface is (a) bounding-box range
queries / spatial joins against an R-Tree virtual table and (b)
point-in-polygon predicates (geopoly_contains_point). Spark has no
spatial index, so the scale-correct re-expression is:

* R-Tree bbox join -> **grid-cell bucketing**: every box is exploded to
  the grid cells it overlaps, every point maps to exactly one cell, the
  join is an equi-join on cell id followed by the exact containment
  predicate. This is precisely how distributed spatial engines
  (Sedona-style) partition: the shuffle is keyed by cell, each cell's
  work is independent, and skew is bounded by cell size — no cross
  join anywhere, so it survives 1000 executors at 100 TB.
* geopoly_contains_point -> **ray casting** compiled to a JVM-side
  `aggregate` over the polygon's edge array: one narrow map, whole-stage
  codegen, no UDF.

Geometry is derived deterministically from fixture keys (integer
arithmetic only) since the TPC-H-ish fixtures carry no spatial columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from litebase_spark.catalog import load, query

# World is [0, 1000)^2, integer coordinates; grid cells are 50x50.
_CELL = 50


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic point per customer: hash-spread integer coords."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        ((F.col("c_custkey") * 37 + 11) % 1000).alias("px"),
        ((F.col("c_custkey") * 91 + 7) % 1000).alias("py"),
    )


def _boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic box per supplier: center + per-key half-width."""
    s = load(spark, sf_dir, "supplier")
    cx = (F.col("s_suppkey") * 53 + 3) % 1000
    cy = (F.col("s_suppkey") * 29 + 17) % 1000
    hw = 5 + (F.col("s_suppkey") % 20)
    return s.select(
        "s_suppkey",
        (cx - hw).alias("xmin"),
        (cx + hw).alias("xmax"),
        (cy - hw).alias("ymin"),
        (cy + hw).alias("ymax"),
    )


_SQL_POINTS = (
    "SELECT c_custkey, (c_custkey * 37 + 11) % 1000 AS px, "
    "(c_custkey * 91 + 7) % 1000 AS py FROM customer"
)
_SQL_BOXES = (
    "SELECT s_suppkey, "
    "(s_suppkey * 53 + 3) % 1000 - (5 + s_suppkey % 20) AS xmin, "
    "(s_suppkey * 53 + 3) % 1000 + (5 + s_suppkey % 20) AS xmax, "
    "(s_suppkey * 29 + 17) % 1000 - (5 + s_suppkey % 20) AS ymin, "
    "(s_suppkey * 29 + 17) % 1000 + (5 + s_suppkey % 20) AS ymax "
    "FROM supplier"
)


@query(
    "spatial_rtree_bbox_join",
    oracle=f"""
    WITH points AS ({_SQL_POINTS}), boxes AS ({_SQL_BOXES})
    SELECT b.s_suppkey, COUNT(p.c_custkey) AS n_points,
           CAST(MIN(p.c_custkey) AS BIGINT) AS min_custkey
    FROM boxes b
    LEFT JOIN points p
      ON p.px BETWEEN b.xmin AND b.xmax
     AND p.py BETWEEN b.ymin AND b.ymax
    GROUP BY b.s_suppkey
    """,
    description="R-Tree bbox containment join (SQLITE_ENABLE_RTREE "
    "surface, reference pkg/sqlite3/sqlite3.go:21) via grid-cell "
    "bucketing: boxes explode to overlapped 50x50 cells, points map to "
    "exactly one cell, equi-join on cell + exact predicate — the "
    "Sedona-style distributed spatial join; shuffle keyed by cell, no "
    "cross join, skew bounded by cell capacity. LEFT semantics keep "
    "empty boxes (R-Tree query returns every box probed).",
    tags=("spatial", "join"),
)
def spatial_rtree_bbox_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    points = _points(spark, sf_dir).withColumn(
        "cell",
        (F.col("px") / _CELL).cast("long") * 1000
        + (F.col("py") / _CELL).cast("long"),
    )
    boxes = _boxes(spark, sf_dir)
    # Explode each box to the grid cells its extent overlaps (integer
    # sequence per dimension — a few cells per box at this half-width).
    cells = boxes.select(
        "*",
        F.explode(
            F.expr(
                f"flatten(transform("
                f"  sequence(greatest(xmin, 0) div {_CELL},"
                f"           least(xmax, 999) div {_CELL}),"
                f"  cx -> transform("
                f"    sequence(greatest(ymin, 0) div {_CELL},"
                f"             least(ymax, 999) div {_CELL}),"
                f"    cy -> cx * 1000 + cy)))"
            )
        ).alias("cell"),
    )
    hits = (
        cells.join(points, on="cell", how="inner")
        .filter(
            F.col("px").between(F.col("xmin"), F.col("xmax"))
            & F.col("py").between(F.col("ymin"), F.col("ymax"))
        )
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("c_custkey").alias("min_custkey"),
        )
    )
    # LEFT semantics: boxes with no points still appear (count 0).
    return (
        _boxes(spark, sf_dir)
        .select("s_suppkey")
        .join(hits, on="s_suppkey", how="left")
        .select(
            "s_suppkey",
            F.coalesce("n_points", F.lit(0)).alias("n_points"),
            "min_custkey",
        )
    )


# A fixed non-convex polygon (L-shape) on nice integer coordinates;
# closed ring, vertices counter-clockwise.
_POLY = [(100, 100), (600, 100), (600, 300), (350, 300), (350, 650), (100, 650)]


def geopoly_contains_point(px, py, poly=None):
    """Ray-casting point-in-polygon as a pure Column expression (Geopoly's
    geopoly_contains_point, reference pkg/sqlite3/sqlite3.go:23): count
    edge crossings of the +x ray from (px, py+0.5); odd => inside. The
    +0.5 offset keeps the ray off every integer vertex, so no
    vertex-on-ray ambiguity exists and integer inputs stay exact. Builds
    an `aggregate` over the edge array — JVM codegen, no UDF."""
    poly = poly or _POLY
    edges = F.array(
        *[
            F.struct(
                F.lit(float(x1)).alias("x1"),
                F.lit(float(y1)).alias("y1"),
                F.lit(float(x2)).alias("x2"),
                F.lit(float(y2)).alias("y2"),
            )
            for (x1, y1), (x2, y2) in zip(poly, poly[1:] + poly[:1])
        ]
    )
    pxc = px if not isinstance(px, str) else F.col(px)
    pyc = (py if not isinstance(py, str) else F.col(py)) + F.lit(0.5)
    crossings = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e["y1"] > pyc) != (e["y2"] > pyc))
            & (
                pxc
                < (e["x2"] - e["x1"]) * (pyc - e["y1"]) / (e["y2"] - e["y1"])
                + e["x1"]
            ),
            1,
        ).otherwise(0),
    )
    return crossings % 2 == 1


def _sql_ray_cast(poly) -> str:
    """Unrolled DuckDB expression for the same ray cast (fixed polygon =>
    one CASE term per edge; identical arithmetic, so results are exact)."""
    terms = []
    for (x1, y1), (x2, y2) in zip(poly, poly[1:] + poly[:1]):
        terms.append(
            f"CASE WHEN ({y1} > py + 0.5) <> ({y2} > py + 0.5) "
            f"AND px < ({x2} - {x1}) * (py + 0.5 - {y1}) "
            f"/ ({y2} - {y1}) + {x1} THEN 1 ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


@query(
    "geopoly_point_in_polygon",
    oracle=f"""
    WITH points AS ({_SQL_POINTS})
    SELECT c_custkey, px, py
    FROM points WHERE {_sql_ray_cast(_POLY)}
    """,
    description="Geopoly point-in-polygon (geopoly_contains_point analog, "
    "SQLITE_ENABLE_GEOPOLY — reference pkg/sqlite3/sqlite3.go:23): "
    "ray casting against a non-convex L-shaped polygon, compiled to an "
    "aggregate over the edge array inside codegen. Narrow map over the "
    "point set — embarrassingly parallel at any scale; for polygon SETS "
    "compose with the grid-bucketing of spatial_rtree_bbox_join "
    "(bbox prefilter per cell, exact ray cast on survivors).",
    tags=("spatial",),
)
def geopoly_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _points(spark, sf_dir)
    return p.filter(geopoly_contains_point("px", "py")).select(
        "c_custkey", "px", "py"
    )


def _box_corners():
    return [("xmin", "ymin"), ("xmax", "ymin"), ("xmax", "ymax"), ("xmin", "ymax")]


def _edge_hit_terms():
    """Per fixed polygon edge (the L-shape is rectilinear, so every edge
    is axis-parallel): segment-vs-box intersection as interval logic.
    Returns (spark_exprs, duck_exprs) lists of boolean SQL strings valid
    in both dialects (plain comparisons only)."""
    terms = []
    for (x1, y1), (x2, y2) in zip(_POLY, _POLY[1:] + _POLY[:1]):
        if y1 == y2:  # horizontal: y = y1, x in [lo, hi]
            lo, hi = min(x1, x2), max(x1, x2)
            terms.append(
                f"({y1} >= ymin AND {y1} <= ymax"
                f" AND {lo} <= xmax AND {hi} >= xmin)"
            )
        else:  # vertical: x = x1, y in [lo, hi]
            lo, hi = min(y1, y2), max(y1, y2)
            terms.append(
                f"({x1} >= xmin AND {x1} <= xmax"
                f" AND {lo} <= ymax AND {hi} >= ymin)"
            )
    return terms


def _vertex_in_box_terms():
    return [
        f"({vx} >= xmin AND {vx} <= xmax AND {vy} >= ymin AND {vy} <= ymax)"
        for vx, vy in _POLY
    ]


def _geopoly_area_overlap_oracle() -> str:
    shoelace = []
    corners = _box_corners()
    for (ax, ay), (bx, by) in zip(corners, corners[1:] + corners[:1]):
        shoelace.append(f"({ax} * {by} - {bx} * {ay})")
    area = f"CAST(ABS({' + '.join(shoelace)}) AS DOUBLE) / 2.0"
    corner_in = " OR ".join(
        "(" + _sql_ray_cast(_POLY).replace("px", cx).replace("py", cy) + ")"
        for cx, cy in corners
    )
    overlap = " OR ".join(
        _edge_hit_terms() + _vertex_in_box_terms() + [f"({corner_in})"]
    )
    return f"""
    WITH boxes AS ({_SQL_BOXES})
    SELECT s_suppkey, {area} AS area
    FROM boxes WHERE {overlap}
    """


@query(
    "geopoly_area_overlap",
    oracle=_geopoly_area_overlap_oracle(),
    description="Geopoly area + overlap (geopoly_area / geopoly_overlap "
    "analogs, SQLITE_ENABLE_GEOPOLY): per-supplier box polygons get an "
    "exact shoelace area (integer cross sums, one halving) and an EXACT "
    "overlap test against the non-convex L-polygon — the polygon is "
    "rectilinear, so segment-vs-box intersection reduces to interval "
    "comparisons; box-inside-poly is covered by corner ray casts and "
    "poly-inside-box by vertex containment. Pure comparison logic in "
    "codegen, narrow map, no shuffle; for polygon SETS the bbox "
    "grid-bucketing of spatial_rtree_bbox_join prefilters pairs first.",
    tags=("spatial",),
)
def geopoly_area_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _boxes(spark, sf_dir)
    corners = _box_corners()
    shoelace = sum(
        (F.col(ax) * F.col(by) - F.col(bx) * F.col(ay))
        for (ax, ay), (bx, by) in zip(corners, corners[1:] + corners[:1])
    )
    area = F.abs(shoelace).cast("double") / 2.0
    corner_in = None
    for cx, cy in corners:
        c = geopoly_contains_point(F.col(cx), F.col(cy))
        corner_in = c if corner_in is None else (corner_in | c)
    others = " OR ".join(_edge_hit_terms() + _vertex_in_box_terms())
    overlap = F.expr(others) | corner_in
    return b.filter(overlap).select("s_suppkey", area.alias("area"))


def _geopoly_within_oracle() -> str:
    corners = _box_corners()
    corner_in_all = " AND ".join(
        "(" + _sql_ray_cast(_POLY).replace("px", cx).replace("py", cy) + ")"
        for cx, cy in corners
    )
    no_edge = " AND ".join(f"NOT {t}" for t in _edge_hit_terms())
    return f"""
    WITH boxes AS ({_SQL_BOXES})
    SELECT s_suppkey, xmin, xmax, ymin, ymax
    FROM boxes WHERE ({corner_in_all}) AND ({no_edge})
    """


@query(
    "geopoly_within",
    oracle=_geopoly_within_oracle(),
    description="geopoly_within analog (SQLITE_ENABLE_GEOPOLY, reference "
    "pkg/sqlite3/sqlite3.go:23): boxes COMPLETELY contained in the "
    "non-convex L-polygon. Exact for a rectilinear container: all four "
    "corners inside (ray cast) AND no polygon edge intersects the box "
    "(interval logic per axis-parallel edge) — corners-in plus an "
    "uncrossed boundary imply full containment. Pure comparison "
    "expressions in codegen, narrow map, no shuffle.",
    tags=("spatial",),
)
def geopoly_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _boxes(spark, sf_dir)
    corner_in_all = None
    for cx, cy in _box_corners():
        c = geopoly_contains_point(F.col(cx), F.col(cy))
        corner_in_all = c if corner_in_all is None else (corner_in_all & c)
    no_edge = ~F.expr(" OR ".join(_edge_hit_terms()))
    return b.filter(corner_in_all & no_edge).select(
        "s_suppkey", "xmin", "xmax", "ymin", "ymax"
    )


_BBOX_JSON_DUCK = (
    "'[[' || CAST(bxmin AS VARCHAR) || ',' || CAST(bymin AS VARCHAR) || "
    "'],[' || CAST(bxmax AS VARCHAR) || ',' || CAST(bymin AS VARCHAR) || "
    "'],[' || CAST(bxmax AS VARCHAR) || ',' || CAST(bymax AS VARCHAR) || "
    "'],[' || CAST(bxmin AS VARCHAR) || ',' || CAST(bymax AS VARCHAR) || "
    "'],[' || CAST(bxmin AS VARCHAR) || ',' || CAST(bymin AS VARCHAR) || "
    "']]'"
)


@query(
    "geopoly_group_bbox",
    oracle=f"""
    WITH boxes AS (
        SELECT s.s_nationkey, b.* FROM ({_SQL_BOXES}) b
        JOIN supplier s USING (s_suppkey)
    ),
    agg AS (
        SELECT s_nationkey,
               COUNT(*) AS n_boxes,
               MIN(xmin) AS bxmin, MAX(xmax) AS bxmax,
               MIN(ymin) AS bymin, MAX(ymax) AS bymax
        FROM boxes GROUP BY s_nationkey
    )
    SELECT s_nationkey, n_boxes, bxmin, bxmax, bymin, bymax,
           {_BBOX_JSON_DUCK} AS bbox_json
    FROM agg
    """,
    description="geopoly_group_bbox + geopoly_json analogs "
    "(SQLITE_ENABLE_GEOPOLY): aggregate bounding box of all supplier "
    "boxes per nation — min/max folds are associative and map-side "
    "combined, so the exchange carries one partial bbox per (partition, "
    "nation), the exact mergeable-summary shape geopoly_group_bbox has "
    "inside SQLite. The result polygon serializes as the closed-ring "
    "vertex JSON geopoly_json emits (integer coordinates, so the text "
    "is engine-identical).",
    tags=("spatial", "agg"),
)
def geopoly_group_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    b = _boxes(spark, sf_dir).join(s, on="s_suppkey")
    agg = b.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_boxes"),
        F.min("xmin").alias("bxmin"),
        F.max("xmax").alias("bxmax"),
        F.min("ymin").alias("bymin"),
        F.max("ymax").alias("bymax"),
    )
    j = F.concat(
        F.lit("[["),
        F.col("bxmin").cast("string"), F.lit(","),
        F.col("bymin").cast("string"), F.lit("],["),
        F.col("bxmax").cast("string"), F.lit(","),
        F.col("bymin").cast("string"), F.lit("],["),
        F.col("bxmax").cast("string"), F.lit(","),
        F.col("bymax").cast("string"), F.lit("],["),
        F.col("bxmin").cast("string"), F.lit(","),
        F.col("bymax").cast("string"), F.lit("],["),
        F.col("bxmin").cast("string"), F.lit(","),
        F.col("bymin").cast("string"), F.lit("]]"),
    )
    return agg.select(
        "s_nationkey", "n_boxes", "bxmin", "bxmax", "bymin", "bymax",
        j.alias("bbox_json"),
    )
