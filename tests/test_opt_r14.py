"""Round-14 optimization pins: value-identity of restructured physical
plans (the oracle gate checks the fixtures; these check the branch /
edge cases the fixtures may not cover) and the r14 plan contracts."""

from __future__ import annotations


def test_lsh_verified_early_dedupe_branch_value_identical(spark, sf_dir):
    """r13 forked dedup_embedding_lsh_verified's physical plan on corpus
    size (n > _SRP_EARLY_DEDUPE_N: ids-only dropDuplicates BEFORE the
    wide join-backs; r14 additionally skips the then-redundant
    post-filter distinct). Only the small-n path is driven by the
    fixtures, so drive the large-n branch by lowering the threshold and
    assert the two placements produce identical rows."""
    import litebase_spark.operators.dedup as dd
    from litebase_spark.catalog import REGISTRY

    builder = REGISTRY["dedup_embedding_lsh_verified"].builder
    small = sorted(
        (r["vec_id_a"], r["vec_id_b"], r["cos_sim"])
        for r in builder(spark, sf_dir).collect()
    )
    orig = dd._SRP_EARLY_DEDUPE_N
    dd._SRP_EARLY_DEDUPE_N = 0  # every fixture corpus takes the big path
    try:
        big = sorted(
            (r["vec_id_a"], r["vec_id_b"], r["cos_sim"])
            for r in builder(spark, sf_dir).collect()
        )
    finally:
        dd._SRP_EARLY_DEDUPE_N = orig
    assert big == small and len(big) > 0
    # and the big path emits unique pairs without the post-filter
    # distinct (the early dropDuplicates already ran)
    pairs = [(a, b) for a, b, _ in big]
    assert len(pairs) == len(set(pairs))
