"""Scale audit + regression gate: sweep every registered query's
physical plan for 100 TB anti-patterns, write PLAN_AUDIT.md, and EXIT
NON-ZERO on any flag (run it like a test; a new anti-pattern blocks the
round the way a failing pytest does).

Flags per query:
  * CARTESIAN       — CartesianProduct / BroadcastNestedLoopJoin outside
                      the declared broadcast-NL operators (_ALLOWED_NL)
  * PYTHON_ROW_UDF  — BatchEvalPython (row-at-a-time Python: always a bug)
  * PYTHON_ARROW_UNREVIEWED — ArrowEvalPython / mapInPandas outside the
                      reviewed kernel list (_ALLOWED_ARROW)
  * EMPTY_PUSHDOWN_SCAN — a parquet scan with PushedFilters: [] while a
                      Filter node references one of THAT scan's output
                      columns (matched by exprId, so an unrelated Filter
                      elsewhere in the plan does not trip it)
  * DRIVER_COLLECT  — a registered query builder whose source calls
                      .collect()/.toPandas()/.toLocalIterator() outside
                      the O(k) allowlist (_ALLOWED_COLLECT) — the
                      "driver materializes the corpus" scale-killer class

Run:  python tools/plan_audit.py [sf_dir]     (default sf0.01)
      python tools/plan_audit.py --selftest   (prove the pushdown
          heuristic trips on a known unpushed-filter plan)
"""

from __future__ import annotations

import ast
import glob
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
    "sketch_hll_union",  # 1-row grand-total cross join onto estimates
    "knn_recall_eval",  # composes bruteforce + ivf_probe (both declared)
    "knn_radius_search",  # broadcast of the N_QUERIES (5) query vectors,
    # same shape as knn_cosine_bruteforce
    "pipeline_epoch_shuffle",  # broadcast of the N_EPOCHS (2) epoch ids —
    # a constant-size replication factor, not a data-sized NL join
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
    "multimodal_phash_dedup",  # decode+aHash in the Arrow decode stage;
    # only (doc_id, 8-byte hash) leaves the executor
    "pipeline_training_corpus",
    "text_chunk_dedup",
    "text_unigram_logppl",
    "stream_stateful_totals",
    "stream_scd2_apply",  # applyInPandasWithState SCD-2 fold: Arrow
    # batches per key, state is 4 scalars, emission O(changes)
    "multimodal_audio_energy",  # windowed PCM energy in the Arrow
    # decode stage; O(windows) 32-byte rows leave the executor
    "multimodal_frame_diff",  # inter-frame SAD in the Arrow decode
    # stage; O(frames) 32-byte rows leave the executor
}

# Queries whose only scan-adjacent Filter is an EXPRESSION predicate
# (computed from transforms/regex/arithmetic over scanned columns) that
# parquet cannot evaluate — reviewed round 3, each condition verified
# non-pushable by inspection of the formatted plan:
_REVIEWED_NONPUSHABLE = {
    "dedup_simhash",  # size(tokens(text)) > 0
    "embedding_quantize_int8",  # array_max(|embedding|)/127 > 0
    "fts_match_syntax_full",  # compiled FTS5 boolean over token arrays
    "func_json_tree",  # RLIKE over rendered JSON
    "geopoly_point_in_polygon",  # ray-cast aggregate over polygon rings
    "geopoly_area_overlap",  # interval/ray-cast logic over derived bboxes
    "text_hashed_linear_score",  # size(tokens(text)) > 0
    "pipeline_pack_sequences",  # size(tokens(text)) > 0
    "spatial_rtree_bbox_join",  # derived bbox arithmetic (synth geometry)
    "text_bm25",  # size(filter(tokens)) predicates
    "text_chunk_dedup",  # token-count window predicate
    "text_highlight_snippet",  # locate(term, lower(text)) > 0
    "text_pii_scrub",  # regexp_extract_all counts > 0
    "text_quality_score",  # computed quality components
    "text_repetition_ratio",  # size(tokens) threshold
    "text_topk_bigrams",  # size(tokens) >= 2
    "text_dup_5gram_fraction",  # size(tokens(text)) >= 5
    # round 4 additions, each verified by plan inspection:
    "pipeline_bpe_encode",  # size(tokens(text)) > 0
    "pipeline_quality_bins",  # size(tokens(text)) > 0
    "sketch_countmin_topk",  # isnotnull(affine-hash bucket exprs) join guards
    "text_hybrid_retrieval",  # any_tf > 0 (BM25 side; embedding-side
    # vec_id filters DO push: PushedFilters [IsNotNull, EqualTo] verified)
    "text_substring_dedup",  # size(tokens(text)) >= 8 gram-anchor guard
    "pipeline_weighted_sample",  # size(tokens(text)) > 0 weight guard
    "geopoly_within",  # ray-cast aggregate over the edge array (HOF) —
    # not a pushable predicate; the scan reads only s_suppkey
    # round 6:
    "pipeline_dsir_weights",  # size(tokens(text)) > 1 bigram guard +
    # isnotnull(hash-bucket) kept un-pushed DELIBERATELY: the explicit
    # null-key filter must sit above the shared projection so both
    # consumers of the dbc exchange have identical subtrees
    # (ReuseExchange -> single corpus scan; see operators/pipeline.py)
    "pipeline_token_budget",  # size(split(lower(text),...)) > 0 token
    # guard — computed expression, verified non-pushable by inspection
    # round 7:
    "text_containment_rare",  # size(tokens(text)) >= 3 shingle guard —
    # the shingle work itself sits behind the tokenizer barrier
    # exchange (see operators/text.py), only the cheap size() guard
    # lands in the scan stage
    "expr_null_safe_eq",  # isnotnull(o_orderkey % 100) inferred from
    # the combo-join keys — a one-op modulo guard on a non-null key,
    # verified harmless by inspection (the r7 combinatorial re-plan)
    # round 10:
    "text_bigram_logppl",  # size(tokens(text)) > 1 bigram guard —
    # same class as text_topk_bigrams; sits above the tokenizer
    # barrier, only the cheap guard is non-pushable
}

# Registered builders allowed a driver-side collect because it is O(k)
# by construction, never O(data):
_ALLOWED_COLLECT = {
    "cte_recursive_sql": "1 row: recursion date bounds",
    "knn_cosine_vectorized": "N_QUERIES (5) query vectors",
    # bpe_learn_merges (helper, outside the builder body the AST gate
    # walks) collects one argmax row per BPE round — listed here for
    # transparency, same O(k) class as the k-means centroid collect.
    "pipeline_bpe_merges": "4 argmax rows (1 per BPE round, via helper)",
    "pipeline_bpe_encode": "4 argmax rows (1 per BPE round, via helper)",
    "join_bloom_semi": "32 Bloom words (1024-bit filter) — the "
    "runtime-filter build, same driver-accumulated shape as Spark's own "
    "bloom pushdown",
    "knn_ivf_probe": "N_CENTROIDS (16) coarse-quantizer rows — the IVF "
    "model, same O(k) class as the k-means centroid collect",
    "knn_ivf_adc": "N_CENTROIDS (16) coarse-quantizer rows — the IVF "
    "model (r14: same literal-quantizer shape as knn_ivf_probe, "
    "replacing the corpus-sized assignment checkpoint)",
}

_SCAN_RE = re.compile(r"^\(\d+\) Scan parquet", re.M)
_ID_RE = re.compile(r"#(\d+)")


def _blocks(plan: str) -> list[str]:
    """Formatted-explain operator blocks ('(N) NodeName' + detail lines)."""
    out, cur = [], []
    for line in plan.splitlines():
        if re.match(r"^\(\d+\) ", line):
            if cur:
                out.append("\n".join(cur))
            cur = [line]
        elif cur:
            cur.append(line)
    if cur:
        out.append("\n".join(cur))
    return out


def unpushed_scan_filters(plan: str) -> bool:
    """True iff some parquet scan pushed NOTHING (Spark 4 omits the
    PushedFilters line entirely in that case — the round-2 heuristic
    grepped for 'PushedFilters: []' and could never match) while a
    Filter node's condition references one of THAT scan's output
    exprIds. Intentionally an eyeball flag: it also fires on genuinely
    non-pushable predicates (expression filters), which belong in
    _REVIEWED_NONPUSHABLE once reviewed."""
    scans, filters = [], []
    for b in _blocks(plan):
        head = b.splitlines()[0]
        if "Scan parquet" in head and (
            "PushedFilters" not in b or "PushedFilters: []" in b
        ):
            m = re.search(r"Output \[\d+\]: \[(.*?)\]", b, re.S)
            if m:
                scans.append(set(_ID_RE.findall(m.group(1))))
        elif ") Filter" in head:
            m = re.search(r"Condition : (.*)", b)
            if m:
                filters.append(set(_ID_RE.findall(m.group(1))))
    return any(s & f for s in scans for f in filters)


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
    if name not in _REVIEWED_NONPUSHABLE and unpushed_scan_filters(plan):
        flags.append("EMPTY_PUSHDOWN_SCAN")
    return flags


def collect_violations() -> list[str]:
    """AST-scan operator sources: registered builders must not collect
    to the driver outside the O(k) allowlist."""
    builder_names = {spec.builder.__name__ for spec in REGISTRY.values()}
    bad = []
    for path in glob.glob("litebase_spark/operators/**/*.py", recursive=True):
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if not isinstance(node, ast.FunctionDef):
                continue
            if node.name not in builder_names:
                continue
            if node.name in _ALLOWED_COLLECT:
                continue
            for sub in ast.walk(node):
                if (
                    isinstance(sub, ast.Call)
                    and isinstance(sub.func, ast.Attribute)
                    and sub.func.attr
                    in ("collect", "toPandas", "toLocalIterator")
                ):
                    bad.append(f"{node.name} ({path}:{sub.lineno})")
    return bad


def selftest() -> int:
    """The pushdown heuristic must trip on a plan where a pushable
    filter was (deliberately) not pushed, and stay quiet when it is."""
    spark = get_spark("plan-audit-selftest")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    df_path = "/root/testdata/sf0.001/nation.parquet"

    def formatted(df):
        return df._jdf.queryExecution().explainString(
            mode.fromString("formatted")
        )

    from pyspark.sql import functions as F

    # coalesce defeats pushdown (and even the implied IsNotNull), so the
    # scan block carries no PushedFilters line at all — the exact shape
    # the round-2 'PushedFilters: []' grep could never see.
    bad = formatted(
        spark.read.parquet(df_path).filter(
            F.coalesce(F.col("n_regionkey"), F.lit(0)) == 1
        )
    )
    good = formatted(
        spark.read.parquet(df_path).filter(F.col("n_regionkey") == 1)
    )
    assert unpushed_scan_filters(bad), "known-bad plan did not trip the flag"
    assert not unpushed_scan_filters(good), "pushed plan tripped the flag"
    print("selftest ok: unpushed-filter plan trips, pushed plan does not")
    return 0


def main() -> int:
    if "--selftest" in sys.argv:
        return selftest()
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
            rows.append((name, (-1, 0), [f"ERROR: {str(e)[:100]}"]))
            continue
        # exchange NODES from the formatted plan's numbered operator
        # list — "(12) Exchange" appears once per node. The previous
        # plan.count("Exchange") double-counted every node (tree line +
        # detail header) and, worse, lumped BroadcastExchange in with
        # shuffles; a broadcast is not a shuffle and should not be
        # penalized as one.
        n_shuf = len(re.findall(r"\(\d+\) Exchange", plan))
        n_bc = len(re.findall(r"\(\d+\) BroadcastExchange", plan))
        rows.append((name, (n_shuf, n_bc), audit_plan(name, plan, simple)))

    collects = collect_violations()
    flagged = [(n, x, f) for n, x, f in rows if f]
    rows.sort(key=lambda r: (-r[1][0], -r[1][1]))
    with open("PLAN_AUDIT.md", "w") as out:
        out.write(
            "# PLAN_AUDIT — physical-plan scale audit (regression gate)\n\n"
            f"Swept {len(rows)} registered queries at {sf_dir} "
            "(tools/plan_audit.py; exits non-zero on any flag — run per "
            "round like a test).\n\n"
        )
        out.write(f"## Flags ({len(flagged)})\n\n")
        if not flagged:
            out.write("None — every plan is clean under the audit rules.\n")
        for n, x, f in flagged:
            out.write(f"- **{n}**: {', '.join(f)}\n")
        out.write(f"\n## Driver-collect violations ({len(collects)})\n\n")
        if not collects:
            out.write(
                "None. O(k) allowlist: "
                + "; ".join(
                    f"`{k}` ({v})" for k, v in _ALLOWED_COLLECT.items()
                )
                + ".\n"
            )
        for c in collects:
            out.write(f"- {c}\n")
        out.write("\n## Shuffle (Exchange) count, descending\n\n")
        out.write("| query | shuffle exchanges | broadcast exchanges |\n"
                  "|---|---|---|\n")
        for n, x, _ in rows[:25]:
            out.write(f"| {n} | {x[0]} | {x[1]} |\n")
        out.write(
            "\n(Counted as NODES — the `(N) Exchange` operator entries "
            "of the formatted plan; broadcasts are listed separately "
            "because a broadcast is not a shuffle. Earlier rounds "
            "counted raw 'Exchange' substrings, which double-counted "
            "every node and folded broadcasts in — historical numbers "
            "are ~2x+ these. AQE may coalesce or eliminate some at "
            "runtime. Allowed nested-loop and Arrow-Python operators "
            "are listed in the tool.)\n"
        )
    print(
        f"{len(rows)} plans, {len(flagged)} flagged, "
        f"{len(collects)} collect violations -> PLAN_AUDIT.md"
    )
    for n, x, f in flagged:
        print(f"  {n}: {f}")
    for c in collects:
        print(f"  DRIVER_COLLECT: {c}")
    return 1 if (flagged or collects) else 0


if __name__ == "__main__":
    sys.exit(main())
