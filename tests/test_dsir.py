"""DSIR importance weights (operators/pipeline.py pipeline_dsir_weights):
score arithmetic hand-recomputed in pure Python on a toy corpus, plus the
single-corpus-scan plan property (ReuseExchange) the 100 TB shape relies
on."""

from __future__ import annotations

import contextlib
import hashlib
import io
import os
import re

import pytest

from litebase_spark.operators.pipeline import (
    _DSIR_BUCKETS,
    _DSIR_TARGET,
    pipeline_dsir_weights,
)

# the toy corpus: 2 target docs, 3 raw docs. Tokenization is the
# shared tokens() rule (lowercase word extraction), so plain lowercase
# words keep the hand model trivial.
_DOCS = [
    # (doc_id, source, text)
    (1, _DSIR_TARGET, "alpha beta gamma"),
    (2, _DSIR_TARGET, "alpha beta beta"),
    (10, "raw", "alpha beta delta"),
    (11, "raw", "epsilon zeta"),
    (12, "raw", "alpha beta alpha beta"),
    (13, "raw", "solo"),  # 1 token -> no bigrams -> excluded
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _expected() -> list[tuple[int, int, int]]:
    """Pure-Python DSIR replica: hashed-bigram buckets, Laplace e9
    ratios, per-doc e6 scores — the same integer arithmetic, written
    as loops instead of relational algebra."""
    B = _DSIR_BUCKETS
    occ = []  # (doc_id, is_target, bucket)
    for doc_id, source, text in _DOCS:
        w = text.split()
        if len(w) < 2:
            continue
        for a, b in zip(w, w[1:]):
            occ.append(
                (doc_id, source == _DSIR_TARGET, _h60(f"{a} {b}") % B)
            )
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for _, is_t, bkt in occ:
        (ct if is_t else cr)[bkt] = (ct if is_t else cr).get(bkt, 0) + 1
    tt, rt = sum(ct.values()), sum(cr.values())
    buckets = set(ct) | set(cr)
    t_e9 = {b: (ct.get(b, 0) + 1) * 10**9 // (tt + B) for b in buckets}
    r_e9 = {
        b: max((cr.get(b, 0) + 1) * 10**9 // (rt + B), 1) for b in buckets
    }
    scores: dict[int, list[int]] = {}
    for doc_id, is_t, bkt in occ:
        if is_t:
            continue
        n, s = scores.get(doc_id, [0, 0])
        scores[doc_id] = [n + 1, s + t_e9[bkt] * 10**6 // r_e9[bkt]]
    return sorted(
        ((d, n, s) for d, (n, s) in scores.items()),
        key=lambda t: (-t[2], t[0]),
    )


@pytest.fixture(scope="module")
def toy_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dsir_toy")
    spark.createDataFrame(
        [
            (doc_id, text, "en", source, len(text))
            for doc_id, source, text in _DOCS
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


def test_dsir_scores_match_hand_model(spark, toy_dir):
    got = [
        (r["doc_id"], r["n_bigrams"], r["score_e6"])
        for r in pipeline_dsir_weights(spark, toy_dir).collect()
    ]
    exp = _expected()
    assert got == exp
    # structural sanity on the hand model itself: target docs excluded,
    # the 1-token doc excluded, doc 12 has 3 bigrams
    ids = [d for d, _, _ in exp]
    assert set(ids) == {10, 11, 12}
    assert dict((d, n) for d, n, _ in exp)[12] == 3
    # doc 12's bigrams (alpha beta / beta alpha / alpha beta) hit
    # target-heavy buckets, doc 11's (epsilon zeta) hits none ->
    # ranking must put 12 above 11
    assert ids.index(12) < ids.index(11)


def test_dsir_single_corpus_scan(spark, sf_dir):
    # exchange reuse is an AQE runtime decision: execute, then read the
    # FINAL adaptive plan
    df = pipeline_dsir_weights(spark, sf_dir)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    final = plan.split("== Initial Plan ==")[0]
    # ONE scan node over documents in the executed plan: the stats
    # branch and the scoring branch share dbc's exchange
    # (ReusedExchange), so the bigram explode — the dominant cost at
    # 100 TB — is paid once
    scans = len(re.findall(r"Scan parquet", final))
    assert scans == 1, f"expected 1 corpus scan, final plan has {scans}"
    assert "ReusedExchange" in final
