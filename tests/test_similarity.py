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


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    """IVF with nprobe=2 must recover a reasonable fraction of the true
    top-k (cells are a crude fixed-sample quantizer, so the bar is
    modest; the plumbing — assignment, probing, re-rank — is what's
    under test, and shared pairs must have identical cosines)."""
    from arcon_spark.functions.similarity import ann_ivf_topk

    bf = {
        (r.query_id, r.candidate_id): r.cosine
        for r in ann_bruteforce_topk(spark, sf_dir).collect()
    }
    ivf_rows = ann_ivf_topk(spark, sf_dir).collect()
    assert ivf_rows, "IVF returned nothing"
    hits = sum(1 for r in ivf_rows if (r.query_id, r.candidate_id) in bf)
    for r in ivf_rows:
        key = (r.query_id, r.candidate_id)
        if key in bf:
            assert bf[key] == r.cosine  # exact integer dots ⇒ equality
    assert hits / len(bf) >= 0.2, f"recall {hits}/{len(bf)}"


def test_int_matrix_rounding_matches_spark_round(spark):
    """Adversarial rounding parity: _int_matrix (numpy, half away from
    zero) must agree with Spark's round() on dyadic m/256-style values
    where numpy's default rint (half-even) would disagree."""
    import pandas as pd

    from pyspark.sql import functions as F

    from arcon_spark.functions.similarity import _SCALE, _int_matrix

    adversarial = [33 / 256, -33 / 256, 1 / 256, 0.0000001, -0.0000001, 0.123456789]
    got = _int_matrix(pd.Series([adversarial]))[0].tolist()
    df = spark.createDataFrame(
        pd.DataFrame({"x": [float(np_v) for np_v in adversarial]})
    ).select(F.expr(f"cast(round(cast(x as double) * {_SCALE}.0) as bigint)").alias("u"))
    want = [r.u for r in df.collect()]
    assert got == want, (got, want)


def test_pq_adc_recall_against_exact_l2(spark, sf_dir):
    """ADC approximates the EXACT-L2 ranking (PQ quantizes L2², not
    cosine — the cosine brute force is the wrong yardstick): a
    reasonable fraction of the true L2 top-k must survive the 4-byte
    quantization, and every ADC distance must be a non-negative exact
    integer."""
    import numpy as np
    import pandas as pd

    from arcon_spark.functions.similarity import (
        TOP_K,
        _int_matrix,
        _query_matrix,
        ann_pq_adc_topk,
    )
    from arcon_spark.io import load_table

    rows = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    X = _int_matrix(pd.Series([r.embedding for r in rows]))
    qids = set(_query_matrix(spark, sf_dir)[0].tolist())
    exact = set()
    for qi in np.nonzero(np.isin(ids, list(qids)))[0]:
        d2 = ((X - X[qi][None, :]) ** 2).sum(axis=1)
        order = sorted(zip(d2, ids), key=lambda t: (t[0], t[1]))
        top = [int(i) for d, i in order if i != ids[qi]][:TOP_K]
        exact.update((int(ids[qi]), c) for c in top)

    adc = ann_pq_adc_topk(spark, sf_dir).collect()
    assert len(adc) > 0
    assert all(r.adc_dist >= 0 for r in adc)
    hits = sum((r.query_id, r.candidate_id) in exact for r in adc)
    # the hash-sampled codebook (8 anchors × 4 subspaces, chosen so the
    # oracle can rebuild it — NOT k-means-trained) is deliberately
    # crude; the meaningful bar is lift over the random baseline
    # TOP_K/(n-1) ≈ 1%: require ≥ 3× random. Production trains the
    # codebook (kmeans_embeddings is that loop) and gets the usual
    # 50%+ recalls with the identical search plan.
    n = len(ids)
    random_recall = TOP_K / (n - 1)
    assert hits / len(exact) >= 3 * random_recall, (
        f"recall {hits}/{len(exact)} vs random {random_recall:.3f}"
    )


def test_ivf_pq_subset_of_ivf_candidates(spark, sf_dir):
    """IVF-PQ scans exactly the IVF candidate set, ranked by ADC instead
    of exact cosine: every returned pair must fall inside some probed
    cell (i.e. appear in the IVF candidate space), and a reasonable
    fraction of the plain-IVF winners must survive PQ compression."""
    from arcon_spark.functions.similarity import ann_ivf_pq_topk, ann_ivf_topk

    ivf = {(r.query_id, r.candidate_id) for r in ann_ivf_topk(spark, sf_dir).collect()}
    rows = ann_ivf_pq_topk(spark, sf_dir).collect()
    assert rows, "IVF-PQ returned nothing"
    assert all(r.adc_dist >= 0 for r in rows)
    hits = sum(1 for r in rows if (r.query_id, r.candidate_id) in ivf)
    # the bar checks PLUMBING (same candidate space, sane ranking),
    # not index quality — the 8-anchor hash-sampled codebook is
    # deliberately crude, and random overlap is TOP_K/(cell occupancy)
    # ≈ 4%; 15% is ~4x random (the r6 fixed-size md5 centroid/query
    # selection landed at 18% where the %-mod sets gave 21%)
    assert hits / len(ivf) >= 0.15, f"overlap {hits}/{len(ivf)}"


def test_hard_negatives_exclude_same_label_and_rank_contiguously(spark, sf_dir):
    """Every mined negative must carry a label different from its
    query's, ranks must be 1..K contiguous per query in descending
    cosine order, and no different-label candidate with a higher cosine
    may exist outside the result (the stratified batch-local pruning
    must be lossless)."""
    from pyspark.sql import functions as F

    from arcon_spark.functions.similarity import (
        _query_matrix,
        hard_negative_mining,
    )
    from arcon_spark.io import load_table

    rows = hard_negative_mining(spark, sf_dir).collect()
    assert len(rows) > 0
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    qids = set(_query_matrix(spark, sf_dir)[0].tolist())
    by_query = {}
    for r in rows:
        assert r.qlabel == labels[r.query_id]
        assert r.clabel == labels[r.candidate_id]
        assert r.qlabel != r.clabel
        assert r.query_id in qids
        by_query.setdefault(r.query_id, []).append(r)
    for q, rs in by_query.items():
        assert sorted(r.rn for r in rs) == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda r: r.rn)
        cosines = [r.cosine for r in ordered]
        assert cosines == sorted(cosines, reverse=True)


def test_driver_collected_artifacts_are_fixed_size(spark):
    """The ANN family's driver-side artifacts (query matrix, IVF
    centroids, PQ anchors) must be CONSTANT-size selections, never a
    corpus-proportional slice: the r5 form (vec_id % 50 == 0) collected
    O(corpus/50) rows to the driver — invisible at sf0.1, an OOM and a
    multi-GB task closure at 100x. Every scale factor must yield
    exactly the same artifact row counts."""
    from arcon_spark.functions.similarity import (
        _IVF_NC,
        _PQ_K,
        _QUERY_N,
        _ivf_assignment,
        _pq_anchor_matrix,
        _query_ids_df,
        _query_matrix,
    )

    from arcon_spark.functions.similarity import _bt_ivf_assign, _bt_ivf_radii

    sizes = {}
    for sf in ("sf0.001", "sf0.01"):
        sf_dir = f"/root/testdata/{sf}"
        qids, Q, qn2 = _query_matrix(spark, sf_dir)
        assert len(qids) == _QUERY_N
        assert Q.shape[0] == _QUERY_N
        assert _query_ids_df(spark, sf_dir).count() == _QUERY_N
        assert _pq_anchor_matrix(spark, sf_dir).shape[0] == _PQ_K
        _assigned, probes = _ivf_assignment(spark, sf_dir)
        # probes is queries x nprobe — also a constant
        assert probes.count() <= _QUERY_N * 2
        # the bitext IVF miner's driver artifacts: per-cell radii are
        # bounded by 2 cells x languages, independent of corpus size
        rad = _bt_ivf_radii(_bt_ivf_assign(spark, sf_dir))
        assert len(rad) <= 2 * _IVF_NC
        sizes[sf] = (len(qids), Q.shape)
    assert sizes["sf0.001"] == sizes["sf0.01"]


def test_tile_grid_side_bounds_block_rows():
    """The block-tile grid side is COMPUTED from the corpus row count
    (r6 had a fixed _BT_BLOCKS=8 with a 'raise for larger corpora'
    docstring note): for any corpus, per-block rows ceil(n/B) stay
    <= TILE_ROWS, so a tile pair never materializes more than
    TILE_ROWS² matmul cells, while small corpora keep the floor-of-8
    grid (identical plans/perf at the tested SFs)."""
    import math

    from arcon_spark.functions.similarity import _BT_BLOCKS
    from arcon_spark.io import TILE_ROWS, tile_grid_side

    # two synthetic corpus sizes well past the floor threshold
    for n in (100_000, 10_000_000):
        b = tile_grid_side(n)
        assert b >= _BT_BLOCKS
        assert math.ceil(n / b) <= TILE_ROWS, (n, b)
        # no gratuitous over-tiling: one fewer block would break the bound
        assert b == _BT_BLOCKS or math.ceil(n / (b - 1)) > TILE_ROWS
    # the tested SFs sit under the floor threshold: grid unchanged vs r6
    for n in (0, 1, 2_801, 8 * TILE_ROWS):
        assert tile_grid_side(n) == _BT_BLOCKS


def test_ivf_centroids_fixed_count(spark, sf_dir):
    """The coarse-centroid collect is bounded by _IVF_NC at any scale
    (the %37 slice it replaced grew with the corpus)."""
    import numpy as np
    import pandas as pd  # noqa: F401

    from pyspark.sql import functions as F

    from arcon_spark.functions.similarity import _IVF_NC
    from arcon_spark.io import load_table

    n = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.md5(F.concat(F.lit("c:"), F.col("vec_id").cast("string"))).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(_IVF_NC)
        .count()
    )
    assert n == _IVF_NC


def test_bitext_ivf_prune_lossless_and_prunes_clustered(spark, tmp_path):
    """The IVF-pruned bitext miner must (a) return EXACTLY the
    exhaustive miner's pairs on a clustered corpus — the prune is
    lossless by the triangle-inequality bound — and (b) actually skip
    most residual (query, cell) tiles there: with orthogonal clusters,
    a foreign cell's upper bound cos(angle - radius) sits far below
    the seed scan's K-th-best lower bound. Isotropic corpora (the
    synthetic testdata) degrade to ~no pruning but keep equality —
    that case is covered by the shared parity oracle at all SFs."""
    import numpy as np
    import pandas as pd

    from arcon_spark.functions.similarity import (
        _bt_ivf_assign,
        _bt_ivf_dir,
        _bt_ivf_radii,
        bitext_margin_mining,
        bitext_margin_mining_ivf,
    )

    rng = np.random.default_rng(11)
    n_per, dims, n_clusters = 20, 64, 6
    centers = np.eye(dims)[:n_clusters]
    vecs, ids, langs = [], [], []
    next_id = 1000
    # per-dim sigma 0.05 over 64 dims -> noise norm ~0.4 against unit
    # centers: tight orthogonal clusters (cross-cluster cos ~0, within
    # ~0.85+); twins at sigma 0.01 sit at cos ~0.997, clearing the 1.06
    # margin over their ~0.87 neighborhoods
    for c in range(n_clusters):
        en = centers[c] + 0.05 * rng.standard_normal((n_per, dims))
        fr = en + 0.01 * rng.standard_normal((n_per, dims))  # planted twins
        for pts, lang in ((en, "en"), (fr, "fr")):
            vecs.append(pts)
            ids.extend(range(next_id, next_id + n_per))
            next_id += n_per + 7
            langs.extend([lang] * n_per)
    V = np.concatenate(vecs).astype(np.float32)
    td = str(tmp_path)
    pd.DataFrame({"vec_id": ids, "embedding": list(V), "label": 0}).to_parquet(
        f"{td}/embeddings.parquet"
    )
    pd.DataFrame(
        {"doc_id": ids, "text": "x", "lang": langs, "source": "t", "n_chars": 1}
    ).to_parquet(f"{td}/documents.parquet")

    exact = sorted(tuple(r) for r in bitext_margin_mining(spark, td).collect())
    pruned = sorted(tuple(r) for r in bitext_margin_mining_ivf(spark, td).collect())
    assert len(exact) >= 3  # non-degenerate: twins must actually mine
    assert pruned == exact

    assigned = _bt_ivf_assign(spark, td)
    rad = _bt_ivf_radii(assigned)
    _, surv_x = _bt_ivf_dir(assigned, "en", "fr", "x", rad)
    n_q = assigned.filter("lang = 'en'").count()
    live_fr = len({c for (lang, c) in rad if lang == "fr"})
    full_fan = n_q * (live_fr - 1)  # every non-seed live cell, no prune
    admitted = surv_x.count()
    assert admitted < 0.5 * full_fan, (admitted, full_fan)
