"""Corpus-curation operators for training-data pipelines.

Beyond-reference suite (the reference has no relational/text surface at
all — SURVEY.md §2.9): the standard cleaning passes a 100 TB pretraining
corpus build runs between raw scrape and tokenization:

- PII detection + redaction (regex scrub, counts + redacted digest)
- Gopher-style quality heuristics (repetition / length / symbol rules)
- Cross-split n-gram decontamination (eval passages leaked into train)
- Robust outlier detection (median/MAD, resistant to the heavy tails
  that make mean/stddev filters useless on web data)
- Domain mixture weights (temperature-scaled source sampling)

Design rules shared with the rest of the package: everything is
built-in `pyspark.sql.functions` (JVM codegen, no Python in the hot
path); every float op is either exact-integer-derived or a single
deterministic IEEE op so the DuckDB oracle hash-matches; every shuffle
is on a key that stays bounded at 100 TB (doc_id, ngram hash, source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcon_spark.io import load_table, spread
from arcon_spark.plans.registry import register

_TOKS = "filter(split(lower(text), ' '), x -> x != '')"
_SQL_TOKS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


# ---------------------------------------------------------------------------
# PII detection + redaction
# ---------------------------------------------------------------------------

# The synthetic corpus is PII-free word salad, so the query injects a
# deterministic PII suffix per document (same expression in both
# engines) and then runs the real detection/redaction machinery over
# the combined text. The regex subset used (char classes, bounded
# repetition, \d, word boundary) behaves identically in Java regex
# (Spark) and RE2 (DuckDB).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PHONE_RE = "\\b\\d{3}-\\d{4}\\b"


@register(
    "pii_redact_stats",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example from 10.' || CAST(doc_id % 200 AS VARCHAR)
                  || '.0.' || CAST(doc_id % 250 AS VARCHAR)
                  || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_IPV4_RE}')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_IPV4_RE}', '<IP>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_digest,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_IPV4_RE}', '<IP>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
    FROM aug
    """,
    tags=("curation", "pii", "pipeline"),
)
def pii_redact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count emails / IPv4s / phone fragments per document
    and produce the redacted text (digest + length here so the oracle
    row stays narrow; the full redacted column is the same expression
    minus the md5). Pure codegen projection — one parquet scan, zero
    shuffles, embarrassingly parallel at any scale. Spark-side
    detection uses `regexp_count`/`regexp_replace` (JVM regex); the
    pattern subset is chosen to evaluate identically under RE2 so the
    oracle hash-matches."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(" call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(_IPV4_RE),
            F.lit("<IP>"),
        ),
        F.lit(_PHONE_RE),
        F.lit("<PHONE>"),
    )
    return docs.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(_IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(aug, F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(red).alias("redacted_digest"),
        F.length(red).cast("long").alias("redacted_len"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality heuristics
# ---------------------------------------------------------------------------

_STOP8 = ("the", "a", "and", "of", "to", "in", "is", "it")


@register(
    "gopher_quality_flags",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             {_SQL_TOKS} AS toks,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha
      FROM documents
    ), scored AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(n_alpha AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_word_len,
             CAST(list_max(list_transform(list_distinct(toks),
                  w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS top_word_ratio,
             CAST(len(list_filter(toks,
                  x -> list_contains(['the','a','and','of','to','in','is','it'], x)))
                  AS BIGINT) AS n_stop
      FROM feat WHERE len(toks) > 0
    )
    SELECT doc_id, n_words, mean_word_len, top_word_ratio,
           (n_words BETWEEN 40 AND 100000) AS flag_word_count,
           (mean_word_len BETWEEN 2.0 AND 10.0) AS flag_mean_word_len,
           (top_word_ratio <= 0.20) AS flag_repetition,
           (n_stop >= 2) AS flag_stopwords,
           ((n_words BETWEEN 40 AND 100000)
            AND (mean_word_len BETWEEN 2.0 AND 10.0)
            AND (top_word_ratio <= 0.20)
            AND (n_stop >= 2)) AS keep
    FROM scored
    """,
    tags=("curation", "quality", "pipeline"),
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule document filter (word-count bounds, mean word
    length, top-word repetition ratio, stopword presence) with a
    combined keep decision. The repetition ratio — the mode frequency
    of the token multiset — is computed with higher-order array
    functions entirely inside the row (O(distinct·n) per doc, no
    explode, NO shuffle): at 100 TB this stays a single codegen
    projection over the scan, vs the explode+groupBy formulation whose
    shuffle would carry one row per token. All ratios are single
    IEEE divisions of exact integers → bit-identical to the oracle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feat = docs.select(
        "doc_id",
        F.expr(_TOKS).alias("toks"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("long").alias("n_alpha"),
    ).filter(F.size("toks") > 0)
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in _STOP8) + ")"
    scored = feat.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        (F.col("n_alpha").cast("double") / F.size("toks").cast("double")).alias("mean_word_len"),
        (
            F.expr(
                "cast(array_max(transform(array_distinct(toks),"
                " w -> size(filter(toks, x -> x = w)))) as double)"
            )
            / F.size("toks").cast("double")
        ).alias("top_word_ratio"),
        F.expr(f"cast(size(filter(toks, x -> array_contains({stop_arr}, x))) as bigint)").alias(
            "n_stop"
        ),
    )
    flag_wc = F.col("n_words").between(40, 100000)
    flag_mwl = F.col("mean_word_len").between(2.0, 10.0)
    flag_rep = F.col("top_word_ratio") <= 0.20
    flag_stop = F.col("n_stop") >= 2
    return scored.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "top_word_ratio",
        flag_wc.alias("flag_word_count"),
        flag_mwl.alias("flag_mean_word_len"),
        flag_rep.alias("flag_repetition"),
        flag_stop.alias("flag_stopwords"),
        (flag_wc & flag_mwl & flag_rep & flag_stop).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Cross-split n-gram decontamination
# ---------------------------------------------------------------------------

_NGRAM = 8
# At corpus scale, boilerplate n-grams ("all rights reserved ...")
# appear in millions of docs and would blow up the inverted-index
# join; real decontamination passes drop n-grams above a document-
# frequency cap before joining. Deterministic, encoded in both engines.
_DF_CAP = 1000


@register(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t,
             substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '1a' AS is_eval
      FROM documents
    ), ng AS (
      SELECT DISTINCT doc_id, is_eval, ngram FROM (
        SELECT doc_id, is_eval,
               unnest(list_transform(range(0, greatest(len(t) - {_NGRAM - 1}, 0)),
                      i -> array_to_string(list_slice(t, i + 1, i + {_NGRAM}), ' '))) AS ngram
        FROM toks)
    ), capped AS (
      SELECT doc_id, is_eval, ngram
      FROM (SELECT *, COUNT(*) OVER (PARTITION BY ngram) AS df FROM ng)
      WHERE df <= {_DF_CAP}
    ), sized AS (
      SELECT *, COUNT(*) OVER (PARTITION BY doc_id) AS n_total FROM capped
    )
    SELECT e.doc_id AS eval_doc_id, t.doc_id AS train_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared,
           CAST(COUNT(*) AS DOUBLE) / CAST(MAX(e.n_total) AS DOUBLE) AS containment
    FROM sized e JOIN sized t ON e.ngram = t.ngram AND e.is_eval AND NOT t.is_eval
    GROUP BY e.doc_id, t.doc_id
    """,
    tags=("curation", "decontamination", "pipeline"),
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: (eval_doc, train_doc) pairs sharing
    ≥1 token-8-gram, with containment = shared / eval-doc n-grams —
    the passage-leakage audit run before shipping any benchmark split.

    Plan (r11 posting-list form, guide §2.2/§2.3): one scan → n-grams
    deduped IN-ROW (array_distinct before the explode — per-doc
    distinct needs no Exchange because is_eval is a function of
    doc_id) → ONE groupBy(ngram) aggregate collecting the eval and
    train doc lists with the document-frequency cap as a HAVING
    (collect_list is safe here precisely because the cap bounds every
    surviving list at _DF_CAP; the cap also drops the boilerplate
    n-grams that would make any inverted index quadratic at scale) →
    eval×train pairs exploded JVM-side from the posting lists → pair
    aggregate. The eval-doc n-gram totals are a tiny second aggregate
    off the same checkpointed posting table, joined back without a
    broadcast hint (auto-broadcasts at bench SFs; at corpus scale the
    planner shuffles the far smaller pair table instead — forcing a
    billions-of-eval-docs broadcast would be the §3.1 driver-OOM
    trap). Replaces r10's explode→distinct→df-window→doc-window→
    self-join chain: 6 Exchanges and two full-frame window sorts → 3
    aggregate Exchanges. The split rule is the same md5 hash-split as
    stratified_split, so the audit composes with the registered split
    queries."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = docs.select(
        "doc_id",
        F.expr(_TOKS).alias("t"),
        (
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2
            )
            < "1a"
        ).alias("is_eval"),
    )
    ng = toks.select(
        "doc_id",
        "is_eval",
        # sequence(1, 0) counts DOWN in Spark → slice(start=0) error
        # on docs shorter than the n-gram; guard explicitly.
        F.explode(
            F.expr(
                f"array_distinct(CASE WHEN size(t) >= {_NGRAM} THEN"
                f" transform(sequence(1, size(t) - {_NGRAM - 1}),"
                f" i -> concat_ws(' ', slice(t, i, {_NGRAM})))"
                f" ELSE array() END)"
            )
        ).alias("ngram"),
    )
    # the posting table feeds both the pair explode and the per-eval-
    # doc totals — checkpoint so the big aggregate executes once (house
    # plan-trim pattern); collect_list ignores the NULLs the when()s
    # leave on the other split's rows
    posting = (
        ng.groupBy("ngram")
        .agg(
            F.collect_list(F.when(F.col("is_eval"), F.col("doc_id"))).alias("evals"),
            F.collect_list(F.when(~F.col("is_eval"), F.col("doc_id"))).alias(
                "trains"
            ),
            F.count(F.lit(1)).alias("df"),
        )
        .filter(F.col("df") <= _DF_CAP)
        .localCheckpoint(eager=True)
    )
    n_total = (
        posting.select(F.explode("evals").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    pairs = (
        posting.filter((F.size("evals") > 0) & (F.size("trains") > 0))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(evals,"
                    " e -> transform(trains, t -> struct(e as e, t as t))))"
                )
            ).alias("p")
        )
        .groupBy(
            F.col("p.e").alias("eval_doc_id"), F.col("p.t").alias("train_doc_id")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return pairs.join(n_total, pairs.eval_doc_id == n_total.doc_id).select(
        "eval_doc_id",
        "train_doc_id",
        "n_shared",
        (F.col("n_shared").cast("double") / F.col("n_total").cast("double")).alias(
            "containment"
        ),
    )


# ---------------------------------------------------------------------------
# Robust outlier detection (median / MAD)
# ---------------------------------------------------------------------------


@register(
    "mad_outlier_events",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type, MAX(m.med) AS med,
             median(abs(e.value - m.med)) AS mad
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY e.event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(d.med) AS med,
           MAX(d.mad) AS mad,
           CAST(COUNT(CASE WHEN abs(e.value - d.med) > 3.0 * d.mad THEN 1 END) AS BIGINT)
             AS n_outliers
    FROM events e JOIN mad d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
    tags=("curation", "statistics", "outliers"),
)
def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier census: median + MAD (median absolute
    deviation) per event_type, and the count of values beyond 3 MADs —
    the heavy-tail-resistant filter a data-quality pass uses where
    mean/stddev would be dragged by the outliers it is hunting.

    Exact medians (Spark's sort-based `median`, DuckDB's
    percentile_cont 0.5 — both average the two middle doubles, the
    same IEEE op). Group count is tiny (event types), so the two
    median passes broadcast their results back; the three shuffles all
    carry O(groups) or O(rows-of-one-scan) and AQE folds the joins to
    broadcast at any scale."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("med"),
            F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"),
        )
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.count(
                F.when(F.abs(F.col("value") - F.col("med")) > 3.0 * F.col("mad"), 1)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Domain mixture weights (temperature-scaled source sampling)
# ---------------------------------------------------------------------------


@register(
    "domain_mixture_weights",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), w AS (
      SELECT source, n_docs,
             sqrt(CAST(n_docs AS DOUBLE))
               / SUM(sqrt(CAST(n_docs AS DOUBLE))) OVER () AS weight
      FROM counts
    ), rated AS (
      SELECT source, n_docs, weight,
             CAST(round(weight * (SELECT COUNT(*) FROM documents) * 0.5) AS BIGINT)
               AS target_n
      FROM w
    )
    SELECT d.source, MAX(r.n_docs) AS n_docs, MAX(r.weight) AS weight,
           MAX(r.target_n) AS target_n,
           CAST(COUNT(CASE WHEN
                CAST('0x' || substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 6) AS BIGINT)
                  < least(CAST(r.target_n AS DOUBLE) / CAST(r.n_docs AS DOUBLE), 1.0) * 16777216.0
                THEN 1 END) AS BIGINT) AS sampled_n
    FROM documents d JOIN rated r ON d.source = r.source
    GROUP BY d.source
    """,
    tags=("curation", "mixture", "sampling", "pipeline"),
)
def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (alpha = 0.5): per-source
    sampling weight ∝ n^alpha, a target row budget of half the corpus
    allocated by weight, and the count actually selected under a
    content-hash acceptance rule (md5-uniform < target/n). Hash-based
    acceptance keeps the sample reproducible under repartitioning and
    incremental reprocessing — the same property deterministic_sample
    relies on — so a 100 TB mixture job can restart mid-corpus without
    resampling what it already shipped. Per-source stats are one tiny
    aggregate broadcast back over one scan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    total = docs.count()  # scalar: corpus size (one count scan, cached footer)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    from pyspark.sql import Window as W

    w = counts.withColumn(
        "weight",
        F.sqrt(F.col("n_docs").cast("double"))
        / F.sum(F.sqrt(F.col("n_docs").cast("double"))).over(
            W.partitionBy()
        ),
    ).withColumn(
        "target_n",
        F.round(F.col("weight") * F.lit(float(total)) * 0.5).cast("long"),
    )
    rate = F.least(
        F.col("target_n").cast("double") / F.col("n_docs").cast("double"), F.lit(1.0)
    )
    accept = (
        F.expr("cast(conv(substring(md5(concat('mix:', cast(doc_id as string))), 1, 6), 16, 10) as bigint)")
        < rate * 16777216.0
    )
    return (
        docs.join(F.broadcast(w), "source")
        .groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("weight").alias("weight"),
            F.max("target_n").alias("target_n"),
            F.count(F.when(accept, 1)).cast("long").alias("sampled_n"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership probe
# ---------------------------------------------------------------------------

_BF_M = 1 << 14  # bits
_BF_K = 3  # hash functions


@register(
    "bloom_split_probe",
    oracle=f"""
    WITH train_pos AS (
      SELECT DISTINCT
             CAST('0x' || substring(md5('bf' || CAST(k.i AS VARCHAR) || d.text),
                                    1, 15) AS BIGINT) % {_BF_M} AS pos
      FROM documents d, (SELECT unnest([1, 2, 3]) AS i) k
      WHERE d.doc_id % 10 <> 0
    ),
    train_txt AS (
      SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 10 <> 0
    ),
    probe AS (
      SELECT d.doc_id, md5(d.text) AS digest, k.i,
             CAST('0x' || substring(md5('bf' || CAST(k.i AS VARCHAR) || d.text),
                                    1, 15) AS BIGINT) % {_BF_M} AS pos
      FROM documents d, (SELECT unnest([1, 2, 3]) AS i) k
      WHERE d.doc_id % 10 = 0
    ),
    hits AS (
      SELECT p.doc_id, p.digest,
             CAST(COUNT(tp.pos) AS BIGINT) AS k_hits
      FROM probe p LEFT JOIN train_pos tp ON p.pos = tp.pos
      GROUP BY p.doc_id, p.digest
    )
    SELECT h.doc_id,
           k_hits = {_BF_K} AS bloom_hit,
           t.digest IS NOT NULL AS exact_member,
           (k_hits = {_BF_K}) AND t.digest IS NULL AS false_positive
    FROM hits h LEFT JOIN train_txt t ON h.digest = t.digest
    """,
    tags=("curation", "bloom", "sketch", "membership"),
)
def bloom_split_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership: build a deterministic k=3, m=16384-bit
    filter over the train split's document texts, probe every holdout
    document, and report hit / exact-membership / false-positive per
    probe — the primitive behind shuffle-free "seen before?" passes
    (URL dedup, cross-shard anti-joins, runtime join pruning; the
    engine-internal twin is verified in
    test_runtime_bloom_filter_prunes_probe_side).

    The filter here stays in relational form (distinct bit positions →
    broadcast hash join) rather than packed bytes: the probe side joins
    against at most m=16384 position rows, which Spark broadcasts, so
    probing is a zero-shuffle map pass exactly like a real bitmap
    broadcast. The k_hits == k conjunction and the exact-membership
    join give the classic guarantee check: no false negatives (every
    exact member bloom-hits), quantified false positives.

    Scale: positions are bounded by m regardless of corpus size; the
    exact-membership join is digest-keyed (the 100 TB form reduces each
    side to digests first)."""
    docs = load_table(spark, sf_dir, "documents")
    ks = F.array(*[F.lit(i) for i in range(1, _BF_K + 1)])
    pos = (
        "cast(conv(substring(md5(concat('bf', cast(i as string), text)), 1, 15),"
        f" 16, 10) as bigint) % {_BF_M}"
    )

    def exploded(side: DataFrame) -> DataFrame:
        return side.select(
            "doc_id", F.md5("text").alias("digest"), F.explode(ks).alias("i"), F.col("text")
        ).select("doc_id", "digest", F.expr(pos).alias("pos"))

    train = docs.filter(F.col("doc_id") % 10 != 0)
    train_pos = exploded(train).select("pos").distinct()
    train_txt = train.select(F.md5("text").alias("digest")).distinct()

    probe = exploded(docs.filter(F.col("doc_id") % 10 == 0))
    # digest rides in the grouping key (it is functionally dependent on
    # doc_id): a min(string) aggregate would demote the plan to
    # SortAggregate — grouping keys may be var-width, buffers may not
    hits = (
        probe.alias("p")
        .join(F.broadcast(train_pos.alias("tp")), F.col("p.pos") == F.col("tp.pos"), "left")
        .groupBy("p.doc_id", "p.digest")
        .agg(F.count("tp.pos").alias("k_hits"))
    )
    return (
        hits.alias("h")
        .join(
            F.broadcast(train_txt.alias("t")),
            F.col("h.digest") == F.col("t.digest"),
            "left",
        )
        .select(
            F.col("h.doc_id").alias("doc_id"),
            (F.col("k_hits") == _BF_K).alias("bloom_hit"),
            F.col("t.digest").isNotNull().alias("exact_member"),
            ((F.col("k_hits") == _BF_K) & F.col("t.digest").isNull()).alias(
                "false_positive"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Privacy audits: k-anonymity / l-diversity
# ---------------------------------------------------------------------------

_KANON_K = 5  # minimum acceptable quasi-identifier group size


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS group_size,
             CAST(COUNT(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT) // 100000)
                  AS BIGINT) AS l_diversity
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(group_size) AS BIGINT) AS k_anonymity,
           CAST(COUNT(CASE WHEN group_size < {_KANON_K} THEN 1 END) AS BIGINT)
             AS n_small_groups,
           CAST(SUM(CASE WHEN group_size < {_KANON_K} THEN group_size ELSE 0 END)
                AS BIGINT) AS n_exposed_rows,
           CAST(MIN(l_diversity) AS BIGINT) AS l_diversity_min
    FROM qi
    """,
    tags=("curation", "privacy", "quality", "pipeline"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy re-identification audit before a dataset release:
    k-anonymity (the smallest quasi-identifier group — here
    nation × market segment; any group below {_KANON_K} re-identifies
    its members) and l-diversity (distinct sensitive-value buckets —
    account balance in $1000 bands — within each group; l = 1 means
    the QI discloses the sensitive value even at large k). One hash
    aggregate over the QI columns with an exact distinct count, one
    5-number rollup — the gate a 100 TB release pipeline runs next to
    pii_redact_stats; failing groups get generalized (coarser QI
    bands) or suppressed and re-audited, same query."""
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct(
            F.expr("cast(round(c_acctbal * 100) as bigint) div 100000")
        ).alias("l_diversity"),
    )
    return qi.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("k_anonymity"),
        F.sum(F.when(F.col("group_size") < _KANON_K, 1).otherwise(0))
        .cast("long")
        .alias("n_small_groups"),
        F.sum(
            F.when(F.col("group_size") < _KANON_K, F.col("group_size")).otherwise(0)
        )
        .cast("long")
        .alias("n_exposed_rows"),
        F.min("l_diversity").alias("l_diversity_min"),
    )


# ---------------------------------------------------------------------------
# data-mixture weighting (temperature-scaled multilingual sampling)
# ---------------------------------------------------------------------------


@register(
    "mixture_temperature_sampling",
    oracle=f"""
    WITH n AS (
      SELECT lang, CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    s AS (
      SELECT lang, n_tokens,
             CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
               AS s_micro
      FROM n
    ),
    t AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
             CAST(SUM(s_micro) AS BIGINT) AS stot
      FROM s
    )
    SELECT s.lang, s.n_tokens,
           CAST(s.n_tokens * 10000 // t.tot AS BIGINT) AS p_bp,
           CAST(s.s_micro * 10000 // t.stot AS BIGINT) AS q_bp,
           CAST((s.s_micro * 10000 // t.stot)
                - (s.n_tokens * 10000 // t.tot) AS BIGINT) AS boost_bp
    FROM s, t
    """,
    tags=("curation", "mixture", "sampling", "pipeline"),
)
def mixture_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language-mixture weights — the published
    multilingual sampling correction (exponentiated smoothing q_l ∝
    p_l^α as in mBERT/XLM/mT5): natural token share p_l is flattened
    to q_l so low-resource languages are upsampled. α = 1/2 here
    because sqrt is correctly rounded in BOTH engines (the determinism
    doctrine forbids cross-engine pow); the sqrt is quantized to
    integer micro-units before the normalizing sums, so every output
    share (basis points) is exact integer floor division. boost_bp > 0
    marks upsampled languages.

    Scale shape: one corpus-sized hash aggregate to |langs| rows;
    everything after is arithmetic on a fixed-size frame with a 1-row
    broadcast of the normalizers (allowlisted BNLJ — O(1) forever)."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    n = (
        docs.select("lang", F.expr(f"size({_TOKS})").cast("long").alias("nt"))
        .groupBy("lang")
        .agg(F.sum("nt").cast("long").alias("n_tokens"))
    )
    s = n.withColumn(
        "s_micro",
        F.expr("cast(round(sqrt(cast(n_tokens as double)) * 1000000) as bigint)"),
    )
    t = s.agg(
        F.sum("n_tokens").cast("long").alias("tot"),
        F.sum("s_micro").cast("long").alias("stot"),
    )
    return s.join(F.broadcast(t)).select(
        "lang",
        "n_tokens",
        F.expr("cast(n_tokens * 10000 div tot as bigint)").alias("p_bp"),
        F.expr("cast(s_micro * 10000 div stot as bigint)").alias("q_bp"),
        F.expr(
            "cast((s_micro * 10000 div stot) - (n_tokens * 10000 div tot) as bigint)"
        ).alias("boost_bp"),
    )


# ---------------------------------------------------------------------------
# curation funnel (staged quality gates, counted in one pass)
# ---------------------------------------------------------------------------


_SQL_FUNNEL = f"""
    WITH f AS (
      SELECT
        len(t) AS n,
        (len(t) BETWEEN 30 AND 5000) AS f1,
        (10 * list_sum(list_transform(t, x -> len(x)))
           BETWEEN 3 * 10 * len(t) AND 10 * 10 * len(t)) AS f2,
        (5 * list_max(list_transform(list_distinct(t),
             x -> len(list_filter(t, y -> y = x)))) <= len(t)) AS f3,
        (10 * len(list_distinct(t)) >= 3 * len(t)) AS f4
      FROM (SELECT {_SQL_TOKS} AS t FROM documents)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN f1 THEN 1 END) AS BIGINT) AS pass_length,
           CAST(COUNT(CASE WHEN f1 AND f2 THEN 1 END) AS BIGINT) AS pass_wordlen,
           CAST(COUNT(CASE WHEN f1 AND f2 AND f3 THEN 1 END) AS BIGINT)
             AS pass_repetition,
           CAST(COUNT(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 END) AS BIGINT)
             AS pass_distinct
    FROM f
    """


def _funnel_flags(docs: DataFrame) -> DataFrame:
    """Per-doc quality-gate flags, computed IN the row (one codegen
    projection) — shared by the batch funnel and its streaming twin."""
    return docs.select(
        "doc_id",
        F.expr(f"size({_TOKS})").alias("n"),
        F.expr(f"size({_TOKS}) between 30 and 5000").alias("f1"),
        F.expr(
            f"10 * aggregate({_TOKS}, 0, (a, x) -> a + length(x))"
            f" between 3 * 10 * size({_TOKS}) and 10 * 10 * size({_TOKS})"
        ).alias("f2"),
        F.expr(
            f"5 * array_max(transform(array_distinct({_TOKS}),"
            f" x -> size(filter({_TOKS}, y -> y = x)))) <= size({_TOKS})"
        ).alias("f3"),
        F.expr(
            f"10 * size(array_distinct({_TOKS})) >= 3 * size({_TOKS})"
        ).alias("f4"),
    )


def _funnel_counts(f: DataFrame) -> DataFrame:
    return f.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(F.col("f1"), 1)).cast("long").alias("pass_length"),
        F.count(F.when(F.col("f1") & F.col("f2"), 1))
        .cast("long")
        .alias("pass_wordlen"),
        F.count(F.when(F.col("f1") & F.col("f2") & F.col("f3"), 1))
        .cast("long")
        .alias("pass_repetition"),
        F.count(F.when(F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4"), 1))
        .cast("long")
        .alias("pass_distinct"),
    )


@register(
    "curation_funnel_counts",
    oracle=_SQL_FUNNEL,
    tags=("curation", "quality", "funnel", "pipeline"),
)
def curation_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The staged curation funnel every corpus report opens with —
    Gopher/C4-style quality gates applied in sequence (token count →
    mean word length → top-token repetition → distinct-token ratio),
    each stage's survivor count measured. All four flags are computed
    IN the row with array higher-order functions (integer-scaled
    comparisons, no floats), so the whole funnel is one codegen
    projection plus one global count aggregate: zero joins, zero
    per-stage passes — at 100 TB the funnel costs exactly one scan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _funnel_counts(_funnel_flags(docs))


# ---------------------------------------------------------------------------
# Differentially-private corpus-statistics release
# ---------------------------------------------------------------------------

# A training-corpus build publishes dataset cards (per-domain counts,
# mean lengths, length histograms) over documents whose individual
# presence can be sensitive. The standard fix is an epsilon-DP release:
# clip each contribution to bound sensitivity, add Laplace(b = delta/eps)
# noise to every published aggregate, and account the budget across
# releases. Production DP systems additionally pin the noise RNG seed so
# a release is reproducible for audit; here the noise is DERIVED
# deterministically from md5 of the release key (the house deterministic
# pseudo-randomness pattern), which makes the whole mechanism
# hash-matchable across engines while keeping the exact inverse-CDF
# Laplace shape: u32 = first 8 md5 hex digits, u = (u32 + 0.5) / 2^32,
# noise = -b * sgn(u - 0.5) * ln(1 - 2|u - 0.5|). The quantities
# 2*u32+1 and 1 - 2|u-0.5| = (2^32 - |2*u32+1 - 2^32|) / 2^32 are exact
# dyadic doubles, ln() is quantized to micro-units BEFORE scaling by b
# (per the package-wide micronat rule), so the released values are
# exact BIGINT micro-units in both engines.

_U32_SPARK = "CAST(conv(substring(md5({k}),1,8),16,10) AS BIGINT)"
_U32_DUCK = "CAST('0x' || substring(md5({k}),1,8) AS BIGINT)"


def _lap_noise_mu(key_sql: str, b: int, dialect: str) -> str:
    """SQL fragment: deterministic Laplace(b) noise in micro-units for
    the given key expression — identical formula in both dialects, only
    the hex-to-int idiom differs (Spark conv() vs DuckDB '0x' cast)."""
    tpl = _U32_SPARK if dialect == "spark" else _U32_DUCK
    u32 = tpl.format(k=key_sql)
    return (
        f"(CASE WHEN 2*({u32})+1 >= 4294967296 THEN 1 ELSE -1 END) * "
        f"CAST(round(-ln(CAST(4294967296 - abs(2*({u32})+1 - 4294967296) "
        f"AS DOUBLE) / 4294967296.0) * 1000000.0) AS BIGINT) * {b}"
    )


_DP_EPS_PPM = 1_000_000  # epsilon = 1 per release
_DP_CLIP = 256  # char-count clip cap (sensitivity bound for the mean)
_DP_HIST_W = 64  # histogram bucket width in chars
_DP_HIST_TOP = 9  # buckets 0..9, top bucket open-ended

# PRIVACY CAVEAT shared by every dp_* query below: the noise is seeded
# from md5 of PUBLIC release keys so that the DuckDB oracle can replay
# it bit-for-bit — that determinism exists ONLY as a cross-engine
# parity device. It also means anyone can recompute and subtract the
# noise, so as written these releases provide zero actual differential
# privacy. A production release must fold a SECRET per-release seed
# into the md5 key (kept off the published card); the mechanisms
# themselves (sensitivity bounds, clipping, parallel/sequential budget
# composition, Gumbel-max exponential mechanism) are unchanged by that
# swap.


@register(
    "dp_noisy_domain_counts",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, count(*) AS c FROM documents GROUP BY lang, source
    )
    SELECT lang, source,
           c * 1000000 + ({_lap_noise_mu("'dpc:' || lang || '|' || source", 1, "duck")})
             AS noisy_count_mu,
           round(CAST(c * 1000000 + ({_lap_noise_mu("'dpc:' || lang || '|' || source", 1, "duck")})
                 AS DOUBLE) / 1000000.0, 6) AS noisy_count,
           CAST({_DP_EPS_PPM} AS BIGINT) AS epsilon_ppm
    FROM g
    """,
    tags=("curation", "privacy", "dp", "pipeline"),
)
def dp_noisy_domain_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-DP (eps=1) per-(lang, source) document counts — the
    dataset-card table published without revealing whether any single
    document is in the corpus. A count has sensitivity 1 (one document
    moves one cell by 1, and each document lands in exactly one cell,
    so the per-cell releases compose in PARALLEL: the whole table costs
    eps=1, not eps * n_cells). Laplace(1) noise is derived from md5 of
    the cell key, quantized to micro-units — see the PRIVACY CAVEAT at
    the _DP_* constants: md5 of a public key makes the noise
    recomputable, so a real release needs a secret seed folded into
    the key. Plan: one hash aggregate on
    (lang, source) plus a codegen projection — the release costs
    exactly the scan + one bounded shuffle at any corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "source")
    noise = _lap_noise_mu("'dpc:' || lang || '|' || source", 1, "spark")
    return (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "lang",
            "source",
            F.expr(f"c * 1000000 + ({noise})").alias("noisy_count_mu"),
            F.expr(
                f"round(CAST(c * 1000000 + ({noise}) AS DOUBLE) / 1000000.0, 6)"
            ).alias("noisy_count"),
            F.lit(_DP_EPS_PPM).cast("long").alias("epsilon_ppm"),
        )
    )


@register(
    "dp_clipped_mean_chars",
    oracle=f"""
    WITH g AS (
      SELECT lang,
             CAST(SUM(LEAST(n_chars, {_DP_CLIP})) AS BIGINT) AS s,
             count(*) AS c
      FROM documents GROUP BY lang
    ),
    n AS (
      SELECT lang,
             s * 1000000 + ({_lap_noise_mu("'dps:' || lang", 2 * _DP_CLIP, "duck")})
               AS noisy_sum_mu,
             GREATEST(c * 1000000 + ({_lap_noise_mu("'dpq:' || lang", 2, "duck")}), 1)
               AS noisy_cnt_mu
      FROM g
    )
    SELECT lang, noisy_sum_mu, noisy_cnt_mu,
           round(CAST(noisy_sum_mu AS DOUBLE) / CAST(noisy_cnt_mu AS DOUBLE), 6)
             AS dp_mean_chars,
           CAST({_DP_CLIP} AS BIGINT) AS clip_cap,
           CAST({_DP_EPS_PPM} AS BIGINT) AS epsilon_ppm
    FROM n
    """,
    tags=("curation", "privacy", "dp", "pipeline"),
)
def dp_clipped_mean_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-DP (eps=1 total) mean document length per lang, the
    clip-then-noise recipe: each document's n_chars is clipped to
    256 so the sum's sensitivity is bounded by the cap rather
    than by the longest document (unbounded sensitivity = unbounded
    noise), then the SUM gets Laplace(clip/(eps/2)) and the COUNT gets
    Laplace(1/(eps/2)) — sequential composition splits the budget in
    half because both releases read the same rows. The published mean
    is one exact-BIGINT division of the two noisy micro-unit sums.
    See the PRIVACY CAVEAT at the _DP_* constants — a real release
    seeds the md5 noise keys with a secret. Plan: one hash aggregate
    per lang, noise in the projection."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    ns = _lap_noise_mu("'dps:' || lang", 2 * _DP_CLIP, "spark")
    nc = _lap_noise_mu("'dpq:' || lang", 2, "spark")
    return (
        docs.groupBy("lang")
        .agg(
            F.sum(F.least(F.col("n_chars"), F.lit(_DP_CLIP))).alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .select(
            "lang",
            F.expr(f"s * 1000000 + ({ns})").alias("noisy_sum_mu"),
            F.expr(f"GREATEST(c * 1000000 + ({nc}), 1)").alias("noisy_cnt_mu"),
        )
        .select(
            "lang",
            "noisy_sum_mu",
            "noisy_cnt_mu",
            F.expr(
                "round(CAST(noisy_sum_mu AS DOUBLE) / CAST(noisy_cnt_mu AS DOUBLE), 6)"
            ).alias("dp_mean_chars"),
            F.lit(_DP_CLIP).cast("long").alias("clip_cap"),
            F.lit(_DP_EPS_PPM).cast("long").alias("epsilon_ppm"),
        )
    )


@register(
    "dp_length_histogram",
    oracle=f"""
    WITH spine AS (SELECT bucket FROM range(0, {_DP_HIST_TOP} + 1) t(bucket)),
    g AS (
      SELECT LEAST(n_chars // {_DP_HIST_W}, {_DP_HIST_TOP}) AS bucket,
             count(*) AS c
      FROM documents GROUP BY 1
    )
    SELECT s.bucket,
           COALESCE(g.c, 0) * 1000000
             + ({_lap_noise_mu("'dph:' || CAST(s.bucket AS VARCHAR)", 1, "duck")})
             AS noisy_count_mu,
           round(CAST(COALESCE(g.c, 0) * 1000000
                 + ({_lap_noise_mu("'dph:' || CAST(s.bucket AS VARCHAR)", 1, "duck")})
                 AS DOUBLE) / 1000000.0, 6) AS noisy_count,
           CAST({_DP_EPS_PPM} AS BIGINT) AS epsilon_ppm
    FROM spine s LEFT JOIN g ON g.bucket = s.bucket
    """,
    tags=("curation", "privacy", "dp", "pipeline"),
)
def dp_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-DP (eps=1) histogram of document lengths in 64-char
    buckets. Two release rules the plain count query doesn't exercise:
    the bucket SPINE is fixed a priori and EVERY bucket is published —
    including empty ones, which get pure noise — because suppressing
    empty cells leaks their emptiness; and since the buckets partition
    the documents, parallel composition again prices the whole
    histogram at eps=1. The 10-row spine joins the aggregate by
    broadcast; noise is keyed on the bucket id alone so the release for
    a given spine is reproducible regardless of data partitioning. See
    the PRIVACY CAVEAT at the _DP_* constants — a real release seeds
    the md5 noise keys with a secret."""
    docs = load_table(spark, sf_dir, "documents").select("n_chars")
    spine = spark.range(0, _DP_HIST_TOP + 1).select(F.col("id").alias("bucket"))
    g = (
        docs.select(
            F.expr(f"LEAST(n_chars div {_DP_HIST_W}, {_DP_HIST_TOP})").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    noise = _lap_noise_mu("'dph:' || CAST(bucket AS STRING)", 1, "spark")
    return (
        spine.join(g, "bucket", "left")
        .select(
            "bucket",
            F.expr(f"COALESCE(c, 0) * 1000000 + ({noise})").alias("noisy_count_mu"),
            F.expr(
                f"round(CAST(COALESCE(c, 0) * 1000000 + ({noise}) AS DOUBLE)"
                " / 1000000.0, 6)"
            ).alias("noisy_count"),
            F.lit(_DP_EPS_PPM).cast("long").alias("epsilon_ppm"),
        )
    )


def _gumbel_mu_sql(key_sql: str, dialect: str) -> str:
    """SQL fragment: deterministic standard-Gumbel noise in micro-units
    for the given key — the Gumbel-max trick's randomizer. u is the
    md5-seeded dyadic uniform; G = -ln(-ln(u)), quantized once after
    the full expression (chained ln's agree across engines on the
    micronat grid exactly like the single-ln Laplace quantities)."""
    tpl = _U32_SPARK if dialect == "spark" else _U32_DUCK
    u32 = tpl.format(k=key_sql)
    return (
        f"CAST(round(-ln(-ln((({u32}) + 0.5) / 4294967296.0))"
        f" * 1000000.0) AS BIGINT)"
    )


@register(
    "dp_median_chars",
    oracle=f"""
    WITH vals AS (
      SELECT lang, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2
    ),
    ranked AS (
      SELECT lang, v, c,
             COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             SUM(c) OVER (PARTITION BY lang) AS n
      FROM vals
    ),
    scored AS (
      SELECT lang, v,
             -abs(2 * below + c - n) * 250000 AS score_ppm,
             {_gumbel_mu_sql("'dpm:' || lang || ':' || CAST(v AS VARCHAR)", "duck")} AS g_mu
      FROM ranked
    )
    SELECT lang, v AS dp_median_chars,
           CAST(score_ppm + g_mu AS BIGINT) AS gumbel_key_ppm,
           CAST({_DP_EPS_PPM} AS BIGINT) AS epsilon_ppm
    FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY score_ppm + g_mu DESC, v) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    tags=("curation", "privacy", "dp", "pipeline"),
)
def dp_median_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-DP (eps=1) median document length per lang via the
    EXPONENTIAL MECHANISM — the DP primitive for non-numeric /
    selection queries, where adding Laplace noise to the answer makes
    no sense. Candidates are the observed lengths; utility is the
    negative rank distance to the true median, u(v) = -|rank(v) - n/2|
    (sensitivity 1: one document moves any rank by at most 1; the
    query doubles both terms to stay integer, absorbing the factor
    into eps/2 -> 250000 ppm per rank step); the mechanism samples v
    with probability proportional to exp(eps*u/2), realized
    deterministically by the Gumbel-max trick — argmax of
    score + Gumbel(md5(key)) is an exact sample of the softmax over
    scores, and seeding the Gumbel per (lang, candidate) makes the
    release reproducible and engine-identical (see the PRIVACY CAVEAT
    at the _DP_* constants — a real release seeds the key with a
    secret).

    Plan: one (lang, value) hash aggregate, two windows partitioned by
    lang on the tiny distinct-value relation, one top-1 pick — the
    scan dominates at any corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    vals = docs.groupBy("lang", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("lang")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("lang")
    gm = _gumbel_mu_sql("'dpm:' || lang || ':' || CAST(v AS STRING)", "spark")
    scored = vals.select(
        "lang",
        "v",
        F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("below"),
        F.sum("c").over(wall).alias("n"),
        F.col("c"),
    ).select(
        "lang",
        "v",
        F.expr("-abs(2 * below + c - n) * 250000").alias("score_ppm"),
        F.expr(gm).alias("g_mu"),
    )
    wpick = Window.partitionBy("lang").orderBy(
        F.desc(F.expr("score_ppm + g_mu")), F.asc("v")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "lang",
            F.col("v").alias("dp_median_chars"),
            F.expr("CAST(score_ppm + g_mu AS BIGINT)").alias("gumbel_key_ppm"),
            F.lit(_DP_EPS_PPM).cast("long").alias("epsilon_ppm"),
        )
    )
