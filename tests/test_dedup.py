"""Dedup operator scale-guard behavior (the oracle pins values; these
pin the skew/cap semantics that only show on adversarial fixtures)."""

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


def test_jaccard_max_group_drops_oversized_group(spark):
    """A (lang, source) group over the cap is excluded wholesale —
    bounded pair work instead of an O(n²) straggler; small groups keep
    identical results."""
    from nobletools_spark.operators.dedup import jaccard_pairs

    big = [(i, "alpha beta gamma delta epsilon zeta", "en", "bulk")
           for i in range(8)]
    small = [(100, "one two three four five six", "en", "niche"),
             (101, "one two three four five seven", "en", "niche")]
    docs = _docs(spark, big + small)
    capped = {(r.doc_a, r.doc_b)
              for r in jaccard_pairs(docs, n=3, threshold=0.1,
                                     max_group=4).collect()}
    assert capped == {(100, 101)}  # 'bulk' group (8 > 4) dropped entirely
    uncapped = {(r.doc_a, r.doc_b)
                for r in jaccard_pairs(docs, n=3, threshold=0.1,
                                       max_group=0).collect()}
    assert (100, 101) in uncapped and len(uncapped) > 1


def test_jaccard_cap_plan_uses_broadcast_anti_join(spark):
    """The guard must be an aggregated-count broadcast anti-join (tiny
    group-key table), not a full-row window shuffle."""
    from nobletools_spark.operators.dedup import jaccard_pairs

    docs = _docs(spark, [(0, "a b c d", "en", "s")])
    plan = jaccard_pairs(docs, max_group=10)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "LeftAnti" in plan


def test_dedup_clusters_planted(spark):
    """Planted near-dups cluster with their source; originals keep."""
    from nobletools_spark.operators.dedup import (
        NEAR_DUP_ID_OFFSET,
        dedup_clusters,
        with_near_duplicates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(50)
    out = {r.doc_id: r for r in
           dedup_clusters(with_near_duplicates(docs),
                          threshold=0.5).collect()}
    n_orig = 50
    assert len(out) == 2 * n_orig
    clustered = 0
    for doc_id, r in out.items():
        if doc_id >= NEAR_DUP_ID_OFFSET:
            src = doc_id - NEAR_DUP_ID_OFFSET
            if r.cluster_id == src:
                clustered += 1
                assert not r.keep                   # clone never keeps
                assert out[src].keep                # original does
    assert clustered >= n_orig * 0.9                # LSH recall on plants
