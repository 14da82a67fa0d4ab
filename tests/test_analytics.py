"""Semantics tests for operators/analytics.py on hand-built frames —
the oracle gate checks engine parity; these pin the operator logic
itself (strict stage ordering, island merging, no-C-between)."""

from __future__ import annotations

from pyspark.sql import functions as F

from arcon_spark.operators import analytics


def _events(spark, rows):
    return spark.createDataFrame(
        [(uid, eid, f"2024-01-01 {t}", et, 0.0, "{}") for uid, eid, t, et in rows],
        "user_id long, event_id long, ts_s string, event_type string, value double, props string",
    ).select(
        "user_id",
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
        "value",
        "props",
    )


def test_funnel_requires_strict_stage_order(spark, monkeypatch, tmp_path):
    # user 1: signup < view < purchase (stage 3)
    # user 2: view BEFORE signup, purchase after signup but no view after
    #         signup → stage 1
    df = _events(
        spark,
        [
            (1, 1, "00:00:00", "signup"),
            (1, 2, "00:10:00", "view"),
            (1, 3, "00:20:00", "purchase"),
            (2, 4, "00:05:00", "view"),
            (2, 5, "00:10:00", "signup"),
            (2, 6, "00:15:00", "purchase"),
        ],
    )
    monkeypatch.setattr(analytics, "load_table", lambda s, d, n: df)
    out = {
        r["user_id"]: r["stage"]
        for r in analytics.funnel_conversion(spark, "unused").collect()
    }
    assert out == {1: 3, 2: 1}


def test_interval_coverage_merges_overlaps(spark, monkeypatch):
    # user 1: events at 0 and 3 min (5-min intervals overlap → one
    # island of 8 min); user 2: events at 0 and 20 min (two islands).
    df = _events(
        spark,
        [
            (1, 1, "00:00:00", "click"),
            (1, 2, "00:03:00", "click"),
            (2, 3, "00:00:00", "click"),
            (2, 4, "00:20:00", "click"),
        ],
    )
    monkeypatch.setattr(analytics, "load_table", lambda s, d, n: df)
    rows = {
        r["user_id"]: (r["n_islands"], r["covered_us"])
        for r in analytics.interval_coverage_users(spark, "unused").collect()
    }
    assert rows[1] == (1, 8 * 60_000_000)
    assert rows[2] == (2, 10 * 60_000_000)


def test_cep_rejects_signup_between(spark, monkeypatch):
    # user 1: purchase → error (10 min gap) → match
    # user 2: purchase → signup → error → rejected (C between)
    # user 3: purchase → error 2h later → rejected (out of bound)
    df = _events(
        spark,
        [
            (1, 1, "00:00:00", "purchase"),
            (1, 2, "00:10:00", "error"),
            (2, 3, "00:00:00", "purchase"),
            (2, 4, "00:05:00", "signup"),
            (2, 5, "00:10:00", "error"),
            (3, 6, "00:00:00", "purchase"),
            (3, 7, "02:00:00", "error"),
        ],
    )
    monkeypatch.setattr(analytics, "load_table", lambda s, d, n: df)
    out = analytics.cep_purchase_error_pattern(spark, "unused").collect()
    assert [(r["user_id"], r["error_id"], r["gap_us"]) for r in out] == [
        (1, 2, 10 * 60_000_000)
    ]


def test_retention_cohort_week_zero_counts_all_users(spark, monkeypatch):
    df = _events(
        spark,
        [
            (1, 1, "00:00:00", "click"),  # week 0 for both users
            (2, 2, "00:00:00", "click"),
        ],
    )
    monkeypatch.setattr(analytics, "load_table", lambda s, d, n: df)
    rows = analytics.retention_cohorts(spark, "unused").collect()
    assert len(rows) == 1 and rows[0]["week_offset"] == 0 and rows[0]["n_users"] == 2


def test_cusum_finds_planted_step(spark, monkeypatch):
    # value steps 0 → 1.0 between hours 01 and 02: max |D| lands on
    # the last pre-change hour (01:00).
    df = _events(
        spark,
        [(1, i, f"{h:02d}:00:00", "click") for i, h in enumerate(range(4))],
    ).withColumn("value", F.when(F.col("event_id") >= 2, 1.0).otherwise(0.0))
    monkeypatch.setattr(analytics, "load_table", lambda s, d, n: df)
    rows = analytics.cusum_changepoint_hourly(spark, "unused").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["change_hour"].hour == 1 and r["score"] == 400 and r["n_hours"] == 4


def test_kmv_theta_intersection_estimates_true_overlap(spark, sf_dir):
    """The theta-intersection estimate must land within KMV's sampling
    error of the exact overlap (k=12 → ~1/sqrt(12) ≈ 29% std error;
    assert a generous 3x band plus sign-correctness)."""
    from arcon_spark.io import load_table
    from arcon_spark.operators.relational import kmv_theta_intersection

    ev = load_table(spark, sf_dir, "events")
    views = {r.user_id for r in ev.filter(F.col("event_type") == "view").select("user_id").distinct().collect()}
    buys = {r.user_id for r in ev.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    exact = len(views & buys)
    row = kmv_theta_intersection(spark, sf_dir).collect()[0]
    assert row.n_common_sample >= 0
    if exact == 0:
        assert row.n_common_sample == 0
    else:
        assert exact / 3 <= row.est_common <= exact * 3, (row.est_common, exact)


def test_acf_alternating_series_is_negative_at_lag1(spark, monkeypatch):
    """A strictly alternating hourly series (+a, -a, +a, ...) has
    ACF(1) = -1 and ACF(2) = +1 exactly — pins the lag join arithmetic
    and the exact-moment Pearson tree."""
    from arcon_spark.operators import maintenance

    rows = [
        (i, 7, f"2024-01-01 {i:02d}:15:00", "view", 10.0 if i % 2 == 0 else 2.0, "{}")
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts_s string, event_type string, value double, props string",
    ).select(
        "event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value", "props"
    )
    monkeypatch.setattr(maintenance, "load_table", lambda s, d, n: df)
    got = {r.lag: r.acf for r in maintenance.acf_hourly_value(spark, "unused").collect()}
    assert abs(got[1] - (-1.0)) < 1e-12, got
    assert abs(got[2] - 1.0) < 1e-12, got


def test_quantile_sketch_within_bin_width_of_exact(spark, sf_dir):
    """The histogram sketch's p50/p90 must land within one bin width
    (4.00) of the exact sorted percentile."""
    from arcon_spark.operators.relational import (
        percentiles_value,
        quantile_histogram_sketch,
    )

    exact = {r.event_type: (r.p50, r.p90) for r in percentiles_value(spark, sf_dir).collect()}
    for r in quantile_histogram_sketch(spark, sf_dir).collect():
        want = exact[r.event_type][0 if r.q == 0.5 else 1]
        assert abs(r.est_value - want) <= 4.0, (r.event_type, r.q, r.est_value, want)


def test_brown_forecast_is_level_plus_trend(spark, monkeypatch):
    """Mechanism pin for Brown's smoothing (the forecast column carried
    only the level 2*S1-S2 through round 5 — both engines agreed, so
    parity could never catch it). On a planted exact line y = 50 + 10*t
    cents: recompute S1/S2 from the literal truncated weights and
    require exact agreement, and require the forecast (3*S1 - 2*S2,
    i.e. level + trend at alpha = 1/2) to predict y_{t+1} strictly
    better than the bare level does."""
    from arcon_spark.operators.analytics import (
        _BROWN_CONV,
        _BROWN_D,
        _BROWN_SUM1,
        _BROWN_SUM2,
        _BROWN_W1,
        brown_trend_forecast,
    )

    n = 2 * _BROWN_D + 4  # a few full-history rows
    rows = [
        (1, t, f"2024-01-01 00:{t:02d}:00", "tick", (50 + 10 * t) / 100.0, "{}")
        for t in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts_s string, event_type string, value double, props string",
    ).select(
        "user_id", "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type", "value", "props",
    )
    from arcon_spark.operators import analytics

    monkeypatch.setattr(analytics, "load_table", lambda s, d, n_: df)
    got = {r.event_id: r for r in brown_trend_forecast(spark, "unused").collect()}
    assert got, "no full-history rows"
    for eid, r in got.items():
        cents = [50 + 10 * (eid - k) for k in range(2 * _BROWN_D - 1)]
        s1 = sum(c * w for c, w in zip(cents, _BROWN_W1)) / _BROWN_SUM1 / 100.0
        s2 = sum(c * w for c, w in zip(cents, _BROWN_CONV)) / _BROWN_SUM2 / 100.0
        assert abs(r.s1 - s1) < 1e-12 and abs(r.s2 - s2) < 1e-12
        assert abs(r.level - (2 * s1 - s2)) < 1e-12
        assert abs(r.trend - (s1 - s2)) < 1e-12
        assert abs(r.forecast - (3 * s1 - 2 * s2)) < 1e-12
        y_next = (50 + 10 * (eid + 1)) / 100.0
        assert abs(r.forecast - y_next) < abs(r.level - y_next)
        # on an exact line the trend estimate must be positive and the
        # forecast within the truncation bias of the true next value
        assert r.trend > 0


def test_two_phase_rank_matches_global_window(spark):
    """io.two_phase_rank / ntile_from_rank (r7): the distributed rank,
    inclusive running sum, and arithmetic NTILE must reproduce the
    single-partition window forms EXACTLY for asc and desc orders —
    they replaced the global windows in corpus_shuffle_rank,
    corpus_pack_bins, histogram_equidepth_value, rfm_customer_segments
    and tokenizer_vocab_coverage, so any divergence is a silent
    corpus-ordering bug."""
    from pyspark.sql import Window, functions as F

    from arcon_spark.io import ntile_from_rank, two_phase_rank

    df = spark.range(0, 4007).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("k"),
        F.pmod(F.col("id") * 37, F.lit(1000)).alias("v"),
    )
    naive = df.select(
        "id",
        F.row_number().over(Window.orderBy("k", "id")).cast("long").alias("rn"),
        F.sum("v")
        .over(Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.ntile(7).over(Window.orderBy("k", "id")).cast("long").alias("b"),
        F.row_number()
        .over(Window.orderBy(F.desc("v"), F.asc("id")))
        .cast("long")
        .alias("rnd"),
    )
    two = two_phase_rank(
        df, [F.col("k"), F.col("id")], rank_name="rn", sum_col="v", sum_name="cum"
    )
    two = (
        two.withColumn("n", F.lit(df.count()))
        .withColumn("b", ntile_from_rank("rn", "n", 7))
        .select("id", "rn", "cum", "b")
    )
    twod = two_phase_rank(
        df, [F.col("v").desc(), F.col("id").asc()], rank_name="rnd"
    ).select("id", "rnd")
    merged = naive.alias("a").join(two.alias("t"), "id").join(twod.alias("d"), "id")
    bad = merged.filter(
        (F.col("a.rn") != F.col("t.rn"))
        | (F.col("a.cum") != F.col("t.cum"))
        | (F.col("a.b") != F.col("t.b"))
        | (F.col("a.rnd") != F.col("d.rnd"))
    ).count()
    assert bad == 0


def test_two_phase_rank_edges(spark):
    """Edge contract: empty input yields an empty frame with the rank
    column; a single-row frame ranks 1; an explicit num_partitions=1
    degenerates to the naive single-partition result."""
    from pyspark.sql import functions as F

    from arcon_spark.io import two_phase_rank

    df = spark.range(0, 5).select(F.col("id"), (F.col("id") * 2).alias("v"))
    empty = two_phase_rank(df.filter("id < 0"), [F.col("id")], rank_name="rn")
    assert empty.count() == 0 and "rn" in empty.columns
    one = two_phase_rank(df.filter("id = 3"), [F.col("id")], rank_name="rn")
    assert [r.rn for r in one.collect()] == [1]
    single = two_phase_rank(
        df, [F.col("id")], rank_name="rn", sum_col="v", sum_name="cum",
        num_partitions=1,
    )
    rows = {r.id: (r.rn, r.cum) for r in single.collect()}
    assert rows == {i: (i + 1, sum(j * 2 for j in range(i + 1))) for i in range(5)}


def test_ntile_from_rank_formula_property():
    """Property check of the closed-form NTILE used by
    io.ntile_from_rank, against the standard SQL definition (first
    n % k buckets get one extra row) evaluated in pure Python — every
    (n, k) shape: n < k, n divisible, ragged remainders."""
    def sql_ntile(rn: int, n: int, k: int) -> int:
        sz, rem = n // k, n % k
        # enumerate boundaries exactly as the spec words it
        bucket, start = 1, 1
        while True:
            width = sz + (1 if bucket <= rem else 0)
            if rn < start + width:
                return bucket
            start += width
            bucket += 1

    def closed_form(rn: int, n: int, k: int) -> int:
        sz, rem = n // k, n % k
        thr = rem * (sz + 1)
        if rn <= thr:
            return (rn - 1) // (sz + 1) + 1
        return rem + (rn - 1 - thr) // sz + 1

    for n in (1, 2, 3, 5, 7, 10, 49, 50, 51, 100, 1007):
        for k in (1, 2, 3, 5, 7, 10):
            if n < k:
                # every row its own bucket (sz = 0 branch never divides)
                for rn in range(1, n + 1):
                    assert closed_form(rn, n, k) == rn == sql_ntile(rn, n, k)
                continue
            for rn in range(1, n + 1):
                assert closed_form(rn, n, k) == sql_ntile(rn, n, k), (rn, n, k)


def test_sax_banded_similarity_quality_vs_exact(spark, sf_dir):
    """Quality audit for the SAX-banded production variant (VERDICT r8
    #6), on both standard ANN metrics because this corpus's user
    profiles are unplanted iid noise (the exact top-10 is a continuum
    of near-ties, so set recall alone under-reads the prune):

    - top-10 set recall vs the exact kernel (measured 0.7 / 0.8 / 0.9
      at sf0.001 / 0.01 / 0.1; floored below that only to absorb
      testdata regeneration);
    - k-th-distance ratio sax_10th/exact_10th (measured 1.073 / 1.035
      / 1.006 — the metric that matters on near-tie corpora);
    - verify-stage exactness: every overlapping pair carries the
      IDENTICAL dist2 (only the candidate SET is approximate)."""
    from arcon_spark.operators.analytics import (
        ts_similarity_topk,
        ts_similarity_topk_sax,
    )

    exact = {
        (r.user_a, r.user_b): r.dist2
        for r in ts_similarity_topk(spark, sf_dir).collect()
    }
    sax = {
        (r.user_a, r.user_b): r.dist2
        for r in ts_similarity_topk_sax(spark, sf_dir).collect()
    }
    assert exact and sax
    hits = set(exact) & set(sax)
    recall = len(hits) / len(exact)
    assert recall >= 0.5, f"SAX-banded recall {recall} vs exact top-10"
    kth_ratio = max(sax.values()) / max(exact.values())
    assert 1.0 <= kth_ratio <= 1.25, f"k-th distance ratio {kth_ratio}"
    for pair in hits:
        assert sax[pair] == exact[pair], (pair, sax[pair], exact[pair])


def test_sax_band_pigeonhole_guarantee(spark, sf_dir):
    """The banding's data-independent contract: with 6 bands, any
    user pair whose sign words differ in <= 5 positions MUST share at
    least one clean band (pigeonhole) and therefore appear in the
    candidate set. Verified directly against the words and candidates
    rebuilt with the registered constants — if a code change breaks
    band alignment (substr off-by-one, wrong band width), this fails
    before the lossy recall number can hide it."""
    import arcon_spark.operators.analytics as A

    prof = A._tss_prof(spark, sf_dir)
    words = {r.user_id: r.word for r in A._sax_words(prof).collect()}
    # the REAL blocking stage (shared with the registered query)
    cands = {
        (r.user_a, r.user_b)
        for r in A._sax_candidates(A._sax_words(prof)).collect()
    }
    users = sorted(words)
    hamming_le = {
        (a, b)
        for i, a in enumerate(users)
        for b in users[i + 1 :]
        if sum(x != y for x, y in zip(words[a], words[b])) <= A._SAX_BANDS - 1
    }
    missing = hamming_le - cands
    assert not missing, (
        f"pigeonhole violated: Hamming<={A._SAX_BANDS - 1} pairs absent "
        f"from the candidate stage: {sorted(missing)[:5]}"
    )
    assert cands, "degenerate: no banded candidates at this SF"


def test_radius_join_is_lossless_vs_bruteforce(spark, sf_dir):
    """ts_similarity_radius_join claims a LOSSLESS norm-band prune
    (reverse triangle inequality, band width isqrt(R)+4): the result
    must equal the brute-force all-pairs radius scan exactly — pair
    set AND dist2 values. Brute force here is an independent driver-
    side numpy recomputation from the profile rows (no banding, no
    arrays code shared), so a band-math bug (off-by-one in D, a
    missing adjacent band, float sqrt rounding) shows as a missing
    pair, not a degraded recall number."""
    import numpy as np

    import arcon_spark.operators.analytics as A

    prof = A._tss_prof(spark, sf_dir).collect()
    users = sorted({r.user_id for r in prof})
    idx = {u: i for i, u in enumerate(users)}
    mat = np.zeros((len(users), 24), dtype=np.int64)
    seen = np.zeros((len(users), 24), dtype=bool)
    for r in prof:
        mat[idx[r.user_id], r.hod] = r.p
        seen[idx[r.user_id], r.hod] = True
    truth = {}
    for i, a in enumerate(users):
        for j in range(i + 1, len(users)):
            if not (seen[i] & seen[j]).any():
                continue  # the oracle's shared-hod contract
            d = mat[i] - mat[j]
            d2 = int((d * d).sum())
            if d2 <= A._TSS_RADIUS:
                truth[(a, users[j])] = d2
    got = {
        (r.user_a, r.user_b): r.dist2
        for r in A.ts_similarity_radius_join(spark, sf_dir).collect()
    }
    assert got == truth, (
        f"lossless violated: missing={sorted(set(truth) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(truth))[:5]}"
    )
    assert truth, "degenerate: radius captures no pairs at this SF"


def test_sax_router_branches_agree_and_route_dense(spark, sf_dir):
    """r10: ts_similarity_topk_sax routes its verify plan from the
    measured banded candidate count (one aggregate over the band
    buckets). Contract: BOTH branches — the banded zip_with verify and
    the tile-matmul verify restricted to the identical candidate set —
    return the same top-K, so routing can never change the result; and
    on this candidate-dense synthetic corpus (measured 35% of all pairs
    at sf0.1) the router must pick the tile branch."""
    import arcon_spark.operators.analytics as A

    prof = A._tss_prof(spark, sf_dir)
    words = A._sax_words(prof)
    n_users, upper = A._sax_router_stats(words)
    assert n_users > 1 and upper > 0
    assert upper * A._TSS_DENSE_ROUTE >= n_users * (n_users - 1) // 2, (
        "router should read this corpus as candidate-dense"
    )
    banded = {
        (r.user_a, r.user_b, r.dist2)
        for r in A._sax_banded_verify(prof, words).collect()
    }
    tiled = {
        (r.user_a, r.user_b, r.dist2)
        for r in A._tss_tile_topk(prof, n_users, words=words).collect()
    }
    assert banded and banded == tiled
