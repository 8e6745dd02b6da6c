"""Scale audit: sweep every registered query's physical plan for
100 TB anti-patterns and write PLAN_AUDIT.md.

Flags per query:
  * CARTESIAN   — CartesianProduct / BroadcastNestedLoopJoin (allowed for
                  the declared broadcast-NL operators: theta joins, knn
                  query-side cross joins — listed in _ALLOWED_NL)
  * PYTHON      — BatchEvalPython (row-at-a-time Python UDF: always a
                  bug); ArrowEvalPython / mapInPandas are fine but listed
                  so the set of Python-touching operators stays reviewed
  * NO_PUSHDOWN — a parquet scan whose PushedFilters is empty while the
                  plan filters directly above the scan (missed pushdown)
  * EXCHANGES   — shuffle count (informational; sorted descending)

Run: python tools/plan_audit.py [sf_dir]    (default sf0.01)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from litebase_spark import operators  # noqa: F401
from litebase_spark.catalog import REGISTRY
from litebase_spark.session import get_spark

# Operators whose nested-loop / cross joins are the declared physical
# strategy (broadcast query side or theta semantics), not an accident.
_ALLOWED_NL = {
    "join_theta",
    "join_cross",
    "knn_cosine_bruteforce",
    "knn_cosine_vectorized",
    "dedup_embedding_cosine",
    "dedup_embedding_blocked",
    "knn_ivf_probe",
    "knn_ivf_kmeans",
    "spatial_rtree_bbox_join",
    "q19_discounted_revenue",  # OR-of-conjuncts residual over broadcast
}

# Operators that intentionally run Arrow-batched Python (mapInPandas /
# pandas UDF kernels) — reviewed, not flagged.
_ALLOWED_ARROW = {
    "dedup_minhash_lsh",
    "dedup_embedding_blocked",
    "knn_cosine_vectorized",
    "multimodal_ingest",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "pipeline_training_corpus",
    "text_chunk_dedup",
    "text_unigram_logppl",
    "stream_stateful_totals",
}


def audit_plan(name: str, plan: str, simple: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        if name not in _ALLOWED_NL:
            flags.append("CARTESIAN")
    elif "BroadcastNestedLoopJoin" in plan and name not in _ALLOWED_NL:
        # A broadcast-NL join whose build side is an ungrouped (scalar,
        # 1-row) aggregate is the correct plan for scalar-subquery
        # thresholds — O(n), not quadratic. Heuristic: the simple-mode
        # plan shows the scalar aggregate as keys=[].
        if "keys=[]" not in simple:
            flags.append("CARTESIAN")
    if "BatchEvalPython" in plan:
        flags.append("PYTHON_ROW_UDF")
    if (
        ("ArrowEvalPython" in plan or "MapInPandas" in plan)
        and name not in _ALLOWED_ARROW
    ):
        flags.append("PYTHON_ARROW_UNREVIEWED")
    # missed pushdown: a scan with no pushed filters but a Filter right
    # above it mentioning a scanned column
    for scan in re.finditer(r"PushedFilters: \[\]", plan):
        # crude but effective: any empty-pushdown scan in a plan that
        # also contains a Filter node is worth an eyeball
        if "Filter (" in plan or "+- Filter" in plan:
            flags.append("EMPTY_PUSHDOWN_SCAN")
            break
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    rows = []
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        try:
            df = spec.builder(spark, sf_dir)
            qe = df._jdf.queryExecution()
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
            plan = qe.explainString(mode.fromString("formatted"))
            simple = qe.explainString(mode.fromString("simple"))
        except Exception as e:  # builder with eager action etc.
            rows.append((name, -1, [f"ERROR: {str(e)[:100]}"]))
            continue
        n_ex = plan.count("Exchange")
        rows.append((name, n_ex, audit_plan(name, plan, simple)))

    flagged = [(n, x, f) for n, x, f in rows if f]
    rows.sort(key=lambda r: -r[1])
    with open("PLAN_AUDIT.md", "w") as out:
        out.write(
            "# PLAN_AUDIT — physical-plan scale audit\n\n"
            f"Swept {len(rows)} registered queries at {sf_dir} "
            "(tools/plan_audit.py; re-run per round).\n\n"
        )
        out.write(f"## Flags ({len(flagged)})\n\n")
        if not flagged:
            out.write("None — every plan is clean under the audit rules.\n")
        for n, x, f in flagged:
            out.write(f"- **{n}**: {', '.join(f)}\n")
        out.write("\n## Shuffle (Exchange) count, descending\n\n")
        out.write("| query | exchanges |\n|---|---|\n")
        for n, x, _ in rows[:25]:
            out.write(f"| {n} | {x} |\n")
        out.write(
            "\n(Exchanges are counted from the formatted plan; AQE may "
            "coalesce or eliminate some at runtime. Allowed nested-loop "
            "and Arrow-Python operators are listed in the tool.)\n"
        )
    print(f"{len(rows)} plans, {len(flagged)} flagged -> PLAN_AUDIT.md")
    for n, x, f in flagged:
        print(f"  {n}: {f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
