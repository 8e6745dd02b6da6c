"""Hand-case semantics for the late-round-3 additions: exact
duplicated-substring spans and deterministic weighted sampling."""

from __future__ import annotations

import tempfile

from litebase_spark.functions.portable import h60_py
from litebase_spark.operators.pipeline import pipeline_weighted_sample
from litebase_spark.operators.text import text_substring_dedup


def _uniq(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_substring_dedup_merges_offset_spans(spark):
    # 12 shared tokens at DIFFERENT offsets in two docs: with k=8 the 5
    # anchored grams must merge into ONE 12-token span per doc — the
    # property chunk hashing lacks (offset-independent detection).
    shared = _uniq("s", 12)
    doc1 = shared + " " + _uniq("u", 8)           # span at pos 1
    doc2 = _uniq("v", 4) + " " + shared + " " + _uniq("w", 4)  # at pos 5
    doc3 = _uniq("z", 20)                          # nothing duplicated
    # within-document verbatim repeat: x-block, y-spacer, x-block again
    xs, ys = _uniq("x", 8), _uniq("y", 8)
    doc4 = xs + " " + ys + " " + xs
    docs = spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3), (4, doc4)],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in
               text_substring_dedup(spark, d).collect()}
    assert set(out) == {1, 2, 4}
    for i in (1, 2):
        assert out[i]["n_spans"] == 1
        assert out[i]["dup_tokens"] == 12
        assert out[i]["n_tokens"] == 20
        assert out[i]["dup_frac_e6"] == 600_000
    # the within-doc repeat anchors both copies; spacer keeps them apart
    assert out[4]["n_spans"] == 2
    assert out[4]["dup_tokens"] == 16
    assert out[4]["dup_frac_e6"] == (16 * 1_000_000) // 24


def test_weighted_sample_matches_manual_hash_decision(spark):
    # 40 docs across 2 sources; diversity weight and the md5-derived
    # uniform are both deterministic, so the exact sampled set is
    # computable in plain Python and must match the Spark result.
    rows, expect = [], {}
    for i in range(40):
        src = "web" if i % 2 == 0 else "books"
        if i % 4 < 2:
            text = " ".join(f"t{i}w{j}" for j in range(10))  # distinct
            w_e6 = 1_000_000
        else:
            text = " ".join(["same"] * 10)                   # 1 distinct
            w_e6 = 100_000
        rows.append((i, src, text))
        u = h60_py(str(i)) % 1_000_000
        st = expect.setdefault(src, {"n": 0, "k": 0, "tok": 0})
        st["n"] += 1
        if u < w_e6 // 2:
            st["k"] += 1
            st["tok"] += 10
    docs = spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {r["source"]: r for r in
               pipeline_weighted_sample(spark, d).collect()}
        again = {r["source"]: r for r in
                 pipeline_weighted_sample(spark, d).collect()}
    assert out.keys() == expect.keys()
    for src, st in expect.items():
        assert out[src]["n_docs"] == st["n"]
        assert out[src]["n_sampled"] == st["k"]
        assert out[src]["sampled_tokens"] == st["tok"]
        assert out[src]["realized_e6"] == (st["k"] * 1_000_000) // st["n"]
    # deterministic: a re-run samples the identical set
    assert {s: r.asDict() for s, r in out.items()} == \
        {s: r.asDict() for s, r in again.items()}


def test_asof_nearest_picks_closer_side_with_backward_ties(spark):
    import datetime as dt

    from litebase_spark.operators.asof import join_asof_nearest

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)  # noqa: E731
    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, t(0), 1, "click", 1.0),
        (2, t(10), 1, "click", 2.0),
        (3, t(4), 1, "purchase", 0.0),   # 4 min back vs 6 fwd -> backward
        (4, t(5), 1, "purchase", 0.0),   # 5 vs 5 tie -> backward
        (5, t(7), 1, "purchase", 0.0),   # 7 vs 3 -> forward
        (6, t(1), 2, "purchase", 0.0),   # user 2 has no clicks -> null
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = {r["event_id"]: r for r in
               join_asof_nearest(spark, d).collect()}
    assert out[3]["picked"] == "backward" and out[3]["r_event_id"] == 1
    assert out[4]["picked"] == "backward" and out[4]["r_event_id"] == 1
    assert out[5]["picked"] == "forward" and out[5]["r_event_id"] == 2
    assert out[6]["picked"] is None and out[6]["r_event_id"] is None
