"""Dedup semantics tests: MinHash/LSH recall against exact Jaccard,
simhash fingerprint properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from arcon_spark.functions.dedup import (
    dedup_minhash_lsh_pairs,
    dedup_ngram_jaccard,
    dedup_simhash,
)


def test_minhash_lsh_recall_against_exact_jaccard(spark, sf_dir):
    """LSH candidates must recover >=80% of true (jaccard>=0.8) pairs;
    the synthetic corpus plants 25 such pairs at sf0.01 / the scaled
    equivalent elsewhere."""
    truth = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir).filter(F.col("jaccard") >= 0.8).collect()
    }
    cand = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh_pairs(spark, sf_dir).collect()}
    if not truth:
        return  # nothing planted at this sf
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.8, f"LSH recall {recall:.2f} over {len(truth)} true pairs"


def test_simhash_shape_and_determinism(spark, sf_dir):
    rows = dedup_simhash(spark, sf_dir).collect()
    assert all(len(r.simhash_bits) == 64 for r in rows)
    assert all(set(r.simhash_bits) <= {"0", "1"} for r in rows)
    again = {r.doc_id: r.simhash_bits for r in dedup_simhash(spark, sf_dir).collect()}
    assert {r.doc_id: r.simhash_bits for r in rows} == again


def test_near_dup_pairs_have_close_simhash(spark, sf_dir):
    """Planted near-dup pairs (jaccard>=0.8) should have small hamming
    distance between simhash fingerprints — the property that makes
    simhash a dedup signal."""
    jac = dedup_ngram_jaccard(spark, sf_dir).filter(F.col("jaccard") >= 0.8).collect()
    if not jac:
        return
    fp = {r.doc_id: r.simhash_bits for r in dedup_simhash(spark, sf_dir).collect()}
    hams = [
        sum(x != y for x, y in zip(fp[r.doc_a], fp[r.doc_b], strict=True)) for r in jac
    ]
    assert sum(h <= 12 for h in hams) / len(hams) >= 0.8, hams


def test_connected_clusters_group_planted_dups(spark, sf_dir):
    """Cluster formation groups the planted near-dup pairs: every
    jaccard>=0.8 pair must share a cluster id, and cluster ids are the
    component-minimum doc ids."""
    from arcon_spark.functions.dedup import dedup_connected_clusters

    pairs = dedup_ngram_jaccard(spark, sf_dir).filter(F.col("jaccard") >= 0.8).collect()
    labels = {r.doc_id: r.cluster_id for r in dedup_connected_clusters(spark, sf_dir).collect()}
    for p in pairs:
        assert labels[p.doc_a] == labels[p.doc_b], (p.doc_a, p.doc_b)
    assert all(cid <= d for d, cid in labels.items())  # min-id labels


def test_lsh_bucket_cap_inactive_at_test_scale_but_enforced(spark, sf_dir, monkeypatch):
    """The LSH skew guard must (a) not fire at test SFs — bucket sizes
    stay under LSH_BUCKET_CAP so the oracle contract holds — and
    (b) actually truncate when the cap binds (cap=1 → no within-bucket
    pairs can form at all)."""
    from arcon_spark.functions import dedup

    sig = dedup.minhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*[F.expr(e) for e in dedup._band_exprs()])).alias(
            "band_id", "band_hash"
        ),
    )
    max_bucket = (
        bands.groupBy("band_id", "band_hash").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_bucket < dedup.LSH_BUCKET_CAP, (
        f"bucket of {max_bucket} ≥ cap {dedup.LSH_BUCKET_CAP}: the cap would "
        "change results at the oracle scale — raise LSH_BUCKET_CAP"
    )

    baseline = dedup.dedup_minhash_lsh_pairs(spark, sf_dir).count()
    assert baseline > 0
    monkeypatch.setattr(dedup, "LSH_BUCKET_CAP", 1)
    assert dedup.dedup_minhash_lsh_pairs(spark, sf_dir).count() == 0


def test_prefix_filter_equals_inverted_index(spark, sf_dir):
    """The prefix-filtered plan must reproduce the quadratic inverted
    index EXACTLY (no false negatives: prefix theorem; no false
    positives: exact verification)."""
    from arcon_spark.functions.dedup import (
        dedup_ngram_jaccard,
        dedup_prefix_filter_pairs,
    )

    ref = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in dedup_prefix_filter_pairs(spark, sf_dir).collect()
    }
    assert got == ref and len(ref) > 0


def test_simhash_band_pairs_exact_recall_at_threshold(spark, sf_dir):
    """4x16 banding has EXACT recall at hamming<=3 (pigeonhole): the
    banded pair set must equal the brute-force hamming<=3 pair set."""
    from arcon_spark.functions.dedup import dedup_simhash_band_pairs

    fp = {r.doc_id: r.simhash_bits for r in dedup_simhash(spark, sf_dir).collect()}
    ids = sorted(fp)
    truth = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = sum(x != y for x, y in zip(fp[a], fp[b], strict=True))
            if h <= 3:
                truth[(a, b)] = h
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup_simhash_band_pairs(spark, sf_dir).collect()
    }
    assert got == truth


def test_bloom_no_false_negatives(spark, sf_dir):
    """Bloom's one-sided error contract: every exact duplicate must be
    a bloom hit (a false negative would be a filter-logic bug)."""
    from arcon_spark.functions.dedup import bloom_split_membership

    rows = bloom_split_membership(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.exact_dup:
            assert r.bloom_hit, r


def test_weighted_minhash_tile_grid_independence(spark, sf_dir, monkeypatch):
    """The r8 sparse weighted-Jaccard tile (MEASURE.md r8 root-cause)
    must be a LOSSLESS decomposition: the emitted pair set and every
    wj_exact value are identical for any grid side B, because each
    unordered doc pair lands in exactly one tile and integer min-sums
    are order-independent. Runs the query at two forced grid sides and
    compares sorted results exactly — pins the B-independence claim
    the docstring makes against future kernel edits."""
    from arcon_spark.functions import dedup

    def run(forced_b: int):
        monkeypatch.setattr(
            dedup, "tile_grid_side", lambda n, floor=8, tile_rows=4096: forced_b
        )
        rows = dedup.dedup_weighted_minhash(spark, sf_dir).collect()
        monkeypatch.undo()
        return sorted((r.doc_a, r.doc_b, r.wj_exact, r.n_match) for r in rows)

    a, b = run(3), run(7)
    assert a == b
    assert len(a) > 0  # non-degenerate at test scale


def test_large_star_no_distinct_is_duplicate_safe(spark):
    """r10: _cc_large_star dropped its intermediate .distinct() — valid
    because _cc_small_star's min-per-hi aggregate is duplicate-
    insensitive and its own final .distinct() dedups. Pin that on a
    graph engineered to make large-star EMIT duplicates (two u's with
    the same m attach the same hi): the small-star output of the
    dedup-free chain must equal the explicitly-deduped chain."""
    from arcon_spark.functions.dedup import _cc_large_star, _cc_small_star

    edges = spark.createDataFrame(
        [(5, 1), (5, 2), (2, 1), (9, 7), (8, 7)], "hi long, lo long"
    )
    big = _cc_large_star(edges)
    raw = sorted(tuple(r) for r in big.collect())
    dedup = sorted(tuple(r) for r in big.distinct().collect())
    assert len(raw) > len(dedup), "graph must actually exercise duplicates"
    got = sorted(tuple(r) for r in _cc_small_star(big).collect())
    want = sorted(tuple(r) for r in _cc_small_star(big.distinct()).collect())
    assert got == want


def test_cc_twins_identical_labels(spark, sf_dir):
    """r10: dedup_connected_clusters' convergence test became the exact
    monotone label-sum comparison (labels only decrease, so an
    unchanged sum IS the fixpoint). Pin the end result against the
    star-contraction twin, which shares the oracle but terminates via
    edge-set equality — any early-stop bug in either loop splits them."""
    from arcon_spark.functions.dedup import (
        dedup_cc_star_contraction,
        dedup_connected_clusters,
    )

    lp = sorted(tuple(r) for r in dedup_connected_clusters(spark, sf_dir).collect())
    star = sorted(tuple(r) for r in dedup_cc_star_contraction(spark, sf_dir).collect())
    assert lp == star
