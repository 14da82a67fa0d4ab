"""Similarity-search tests: LSH ANN recall vs brute force."""

from __future__ import annotations

from arcon_spark.functions.similarity import TOP_K, ann_bruteforce_topk, ann_lsh_bucketed


def test_lsh_ann_returns_subset_ranked_consistently(spark, sf_dir):
    """Every LSH hit must appear in the brute-force full ranking with the
    same cosine (exact integer dots ⇒ equality, not approximation)."""
    bf = {
        (r.query_id, r.candidate_id): r.cosine
        for r in ann_bruteforce_topk(spark, sf_dir).collect()
    }
    lsh = ann_lsh_bucketed(spark, sf_dir).collect()
    assert len(lsh) > 0
    for r in lsh:
        key = (r.query_id, r.candidate_id)
        if key in bf:  # shared pair → cosine must be bit-identical
            assert bf[key] == r.cosine


def test_bruteforce_topk_shape(spark, sf_dir):
    rows = ann_bruteforce_topk(spark, sf_dir).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    for q, rs in by_query.items():
        assert len(rs) == TOP_K
        ranks = sorted(r.rn for r in rs)
        assert ranks == list(range(1, TOP_K + 1))
        ordered = sorted(rs, key=lambda r: r.rn)
        cosines = [r.cosine for r in ordered]
        assert cosines == sorted(cosines, reverse=True)
