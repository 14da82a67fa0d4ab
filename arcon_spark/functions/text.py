"""Text analysis operators for training-data pipelines.

Beyond-reference operator set over the `documents` table: language ID
(stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex), and
document fingerprinting (normalization digest + winnowing-style
min-of-8-gram rolling window hash).

Everything is built-in `pyspark.sql.functions` / higher-order array
functions — JVM-side, whole-stage codegen, zero shuffle per row, no
Python in the hot path. Each query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcon_spark.io import load_table, spread, two_phase_rank
from arcon_spark.plans.registry import register

# Tiny per-language stopword lists (the synthetic corpus vocab is
# English-ish for all langs, so this is a demonstration heuristic; the
# operator shape — N list-overlap scores + argmax — is the real thing).
_STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "en", "que", "un", "una"),
    "fr": ("le", "la", "de", "et", "en", "que", "un", "une"),
    "de": ("der", "die", "das", "und", "in", "zu", "ein", "ist"),
}

_TOKS = "filter(split(lower(text), ' '), x -> x != '')"


def _sql_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS true_lang,
             {", ".join(
                 f"len(list_filter(list_filter(string_split(lower(text), ' '), x -> x <> ''),"
                 f" x -> list_contains({_sql_list(ws)}, x))) AS hits_{lg}"
                 for lg, ws in _STOPWORDS.items()
             )}
      FROM documents
    )
    SELECT doc_id, true_lang,
           CASE
             WHEN hits_en >= hits_es AND hits_en >= hits_fr AND hits_en >= hits_de THEN 'en'
             WHEN hits_es >= hits_fr AND hits_es >= hits_de THEN 'es'
             WHEN hits_fr >= hits_de THEN 'fr'
             ELSE 'de'
           END AS pred_lang,
           CAST(hits_en + hits_es + hits_fr + hits_de AS BIGINT) AS total_hits
    FROM scored
    """,
    tags=("text", "lang_id"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID: stopword-hit count per language, argmax with a fixed
    preference order for ties (en > es > fr > de — encoded identically
    in both engines as a cascade)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    hits = {
        lg: F.expr(
            f"size(filter({_TOKS}, x -> array_contains(array({', '.join(repr(w) for w in ws)}), x)))"
        ).alias(f"hits_{lg}")
        for lg, ws in _STOPWORDS.items()
    }
    scored = docs.select(
        "doc_id", F.col("lang").alias("true_lang"), *hits.values()
    )
    pred = (
        F.when(
            (F.col("hits_en") >= F.col("hits_es"))
            & (F.col("hits_en") >= F.col("hits_fr"))
            & (F.col("hits_en") >= F.col("hits_de")),
            F.lit("en"),
        )
        .when(
            (F.col("hits_es") >= F.col("hits_fr"))
            & (F.col("hits_es") >= F.col("hits_de")),
            F.lit("es"),
        )
        .when(F.col("hits_fr") >= F.col("hits_de"), F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    total = (
        F.col("hits_en") + F.col("hits_es") + F.col("hits_fr") + F.col("hits_de")
    ).cast("long")
    return scored.select(
        "doc_id", "true_lang", pred.alias("pred_lang"), total.alias("total_hits")
    )


@register(
    "text_quality_score",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars_m,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
             CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
             CAST(len(list_filter(string_split(lower(text), ' '),
                  x -> list_contains(['the','a','and','of','to','in','is','it'], x))) AS BIGINT) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars_m, n_tokens, n_punct,
           round(CAST(n_punct AS DOUBLE) / CAST(n_chars_m AS DOUBLE), 6) AS punct_ratio,
           round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stopword_ratio,
           round(CAST(n_chars_m AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS mean_token_len
    FROM feat WHERE n_tokens > 0
    """,
    tags=("text", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features: char/token counts, punctuation ratio, stopword
    ratio, mean token length. Ratios are single double divisions of
    exact integers → deterministic; rounded for stable display."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_chars = F.length("text").cast("long")
    n_tokens = F.expr(f"size({_TOKS})").cast("long")
    n_punct = F.length(F.regexp_replace("text", r"[^.!?,;:]", "")).cast("long")
    stop_list = ", ".join(repr(w) for w in _STOPWORDS["en"])
    n_stop = F.expr(
        f"size(filter({_TOKS}, x -> array_contains(array({stop_list}), x)))"
    ).cast("long")
    feat = docs.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
    ).filter(F.col("n_tokens") > 0)
    return feat.select(
        "doc_id",
        "n_chars_m",
        "n_tokens",
        "n_punct",
        F.round(F.col("n_punct").cast("double") / F.col("n_chars_m").cast("double"), 6).alias(
            "punct_ratio"
        ),
        F.round(F.col("n_stop").cast("double") / F.col("n_tokens").cast("double"), 6).alias(
            "stopword_ratio"
        ),
        F.round(
            F.col("n_chars_m").cast("double") / F.col("n_tokens").cast("double"), 6
        ).alias("mean_token_len"),
    )


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
    tags=("text", "tokens"),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs / digit runs / single symbols — a cheap proxy for
    subword vocabularies when budgeting token counts at corpus scale)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ws = F.expr(r"size(filter(split(text, '\\s+'), x -> x != ''))").cast("long")
    bpe = F.size(
        F.expr(r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")
    ).cast("long")
    return docs.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_ish_tokens")
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH norm AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
      FROM documents
    )
    SELECT doc_id,
           md5(nt) AS content_digest,
           list_min(list_transform(generate_series(1, greatest(length(nt) - 7, 1)),
                                   i -> md5(substr(nt, i, 8)))) AS winnow_min
    FROM norm
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: (a) digest of the normalized text, (b) a
    winnowing-style rolling-window fingerprint = min md5 over all 8-char
    windows of the normalized text (character-level rolling hash,
    order-robust for clustering shifted/duplicated content)."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    winnow = F.expr(
        "array_min(transform(sequence(1, greatest(length(nt) - 7, 1)),"
        " i -> md5(substring(nt, i, 8))))"
    )
    return (
        docs.withColumn("nt", norm)
        .select(
            "doc_id",
            F.md5("nt").alias("content_digest"),
            winnow.alias("winnow_min"),
        )
    )


_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 48  # 16-token overlap


@register(
    "text_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, d.l[u.i] AS tok, CAST(u.i - 1 AS BIGINT) AS pos
      FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
            FROM documents) d,
           UNNEST(generate_series(1, len(d.l))) AS u(i)
    ),
    assigned AS (
      SELECT doc_id, tok, pos, CAST(g.j AS BIGINT) AS chunk_id
      FROM toks, UNNEST(generate_series(
             CAST(greatest(ceil(CAST(pos - {_CHUNK_TOKENS} + 1 AS DOUBLE) / {_CHUNK_STRIDE}), 0) AS BIGINT),
             pos // {_CHUNK_STRIDE})) AS g(j)
      WHERE pos < (pos // {_CHUNK_STRIDE}) * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}
    )
    SELECT doc_id, chunk_id,
           string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM assigned
    GROUP BY doc_id, chunk_id
    """,
    tags=("text", "chunking"),
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token chunks (64 tokens, stride 48 → 16
    overlap) — the standard LLM training-data preprocessing step. A
    token at position p belongs to chunks j with j*stride <= p <
    j*stride + size. Plan: posexplode tokens → small generate_series
    fan-out per token (≤ ceil(size/stride) = 2 chunks) → groupBy
    (doc, chunk) with an ordered string_agg. One shuffle, all codegen."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = docs.select("doc_id", F.posexplode(F.expr(_TOKS)).alias("pos", "tok"))
    first_chunk = F.greatest(
        F.ceil((F.col("pos") - F.lit(_CHUNK_TOKENS - 1)).cast("double") / _CHUNK_STRIDE),
        F.lit(0),
    ).cast("long")
    last_chunk = F.expr(f"pos div {_CHUNK_STRIDE}").cast("long")
    assigned = tok.select(
        "doc_id",
        "tok",
        F.col("pos").cast("long").alias("pos"),
        F.explode(F.sequence(first_chunk, last_chunk)).alias("chunk_id"),
    )
    return assigned.groupBy("doc_id", "chunk_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, tok))),"
            " x -> x.tok), ' ')"
        ).alias("chunk_text"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


@register(
    "stratified_split",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, lang,
             CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'test'
                  WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'val'
                  ELSE 'train' END AS split
      FROM documents
    )
    SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n
    FROM assigned GROUP BY lang, split
    """,
    tags=("split", "sample", "quality"),
)
def stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~90/5/5) by content-hash
    bucketing, reported per language stratum. Hash-based assignment
    (vs df.randomSplit) is stable under repartitioning, engine changes,
    and incremental reprocessing — the property held-out sets need at
    corpus scale. The first hex byte of md5('split:'||id) partitions
    [0,256) into [0,13)=test, [13,26)=val, rest=train."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    h = F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2)
    split = (
        F.when(h < "0d", "test").when(h < "1a", "val").otherwise("train")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "text_repetition_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t
      FROM documents
    ),
    cnt AS (SELECT doc_id, t, COUNT(*) AS c FROM toks GROUP BY doc_id, t)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(c) AS BIGINT) AS top_token_n,
           round(1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS rep_ratio,
           round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS top_ratio
    FROM cnt GROUP BY doc_id
    """,
    tags=("quality", "repetition"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals: per-document duplicate-token
    ratio and most-common-token share — the standard cheap filters for
    boilerplate / degenerate generations in training corpora. Plan:
    explode → two-level hash aggregate ((doc, token) then doc). Both
    levels are map-side-partial codegen aggs keyed by doc_id, so the
    second level reuses the first's partitioning (no extra exchange);
    integer counts make the final ratios deterministic."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(lower(text), ' '), x -> x != '')")).alias("t"),
    )
    cnt = toks.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    n_tokens = F.sum("c").cast("long")
    n_distinct = F.count(F.lit(1)).cast("long")
    top = F.max("c").cast("long")
    return cnt.groupBy("doc_id").agg(
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        top.alias("top_token_n"),
        F.round(1.0 - n_distinct.cast("double") / n_tokens.cast("double"), 6).alias("rep_ratio"),
        F.round(top.cast("double") / n_tokens.cast("double"), 6).alias("top_ratio"),
    )


@register(
    "weighted_sample_docs",
    oracle="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE CAST('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100000
          < n_chars * 50
    """,
    tags=("sample", "weighted"),
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sample: each document kept with
    probability ∝ n_chars (length-weighted sampling — the standard way
    to sample training corpora by token budget rather than doc count).
    The inclusion test is pure integer arithmetic on a salted md5 of
    the doc id: stable under repartitioning and engine changes, no RNG
    state, embarrassingly parallel at any scale. p = n_chars*50/1e5
    (≈15% at the synthetic mean length)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = F.expr(
        "cast(conv(substring(md5(concat('ws:', cast(doc_id as string))), 1, 8), 16, 10)"
        " as bigint) % 100000"
    )
    return docs.filter(u < F.col("n_chars") * 50)


_AES_K = 100  # exact sample size


@register(
    "weighted_sample_without_replacement",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             CAST(round(ln((CAST('0x' || substring(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                            % 1000000 + 1) / 1000001.0) * 1000000) AS BIGINT) AS lnu_micro
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_chars, lnu_micro,
             round(CAST(lnu_micro AS DOUBLE) / n_chars, 6) AS priority,
             row_number() OVER (
               ORDER BY CAST(lnu_micro AS DOUBLE) / n_chars DESC, doc_id) AS rn
      FROM keyed
    )
    SELECT doc_id, n_chars, lnu_micro, priority, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {_AES_K}
    """,
    tags=("sample", "weighted", "topk", "curation"),
)
def weighted_sample_without_replacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-size weighted sample without replacement — the A-ES /
    Efraimidis-Spirakis reservoir (key u^(1/w), keep the k largest),
    the standard way to draw a fixed row budget ∝ length when the
    Bernoulli sampler's variable size won't do. Spark has no native
    equivalent (sample() is unweighted; sampleBy is per-stratum
    Bernoulli).

    Determinism: u comes from a salted md5 of doc_id (no RNG state),
    and the key comparison uses the LOG form — ln(u)/w orders
    identically to u^(1/w) — with ln(u) quantized to integer micronats
    so the per-row priority is ONE correctly-rounded division of exact
    integers, bit-identical across engines (pow() would not be).
    Higher weight divides the negative log toward zero ⇒ higher
    selection probability, exactly A-ES.

    Scale shape: scan → in-row key projection → TakeOrdered(k) — the
    reservoir IS the top-k machinery, no shuffle wider than k rows per
    partition, identical at any corpus size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    lnu = F.expr(
        "cast(round(ln((cast(conv(substring(md5(concat('aes:', cast(doc_id as string))), 1, 8),"
        " 16, 10) as bigint) % 1000000 + 1) / 1000001.0d) * 1000000) as bigint)"
    )
    keyed = docs.select(
        "doc_id",
        "n_chars",
        lnu.alias("lnu_micro"),
    ).withColumn(
        "priority",
        F.round(F.col("lnu_micro").cast("double") / F.col("n_chars"), 6),
    )
    ordered = keyed.orderBy(
        (F.col("lnu_micro").cast("double") / F.col("n_chars")).desc(), F.asc("doc_id")
    ).limit(_AES_K)
    w = Window.orderBy(
        (F.col("lnu_micro").cast("double") / F.col("n_chars")).desc(), F.asc("doc_id")
    )
    return ordered.withColumn("rn", F.row_number().over(w).cast("long"))


@register(
    "corpus_shuffle_rank",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS shuffle_rank
    FROM documents
    """,
    tags=("corpus", "shuffle", "sample"),
)
def corpus_shuffle_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: a reproducible global permutation
    by salted-hash order (doc_id tiebreak). Training pipelines need a
    shuffle that is stable across reruns/engines and cheap to seek into
    — hash-order rank gives both; changing the salt is a fresh epoch
    permutation. The rank column makes the ORDERING itself
    value-checked by the oracle (the driver's hash compare is otherwise
    order-insensitive).

    Scale shape (r7): the rank is io.two_phase_rank — range-exchange
    on the hash key, per-partition row_number, plus a broadcast
    #partitions-row offset table; no single-partition WindowExec
    anywhere near the corpus, so the permutation materializes at any
    scale (through r6 this was a global row_number — the
    oracle-checkable but one-reducer form)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.withColumn(
        "k", F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    )
    return two_phase_rank(
        keyed, [F.col("k"), F.col("doc_id")], rank_name="shuffle_rank"
    ).select("doc_id", "shuffle_rank")


PACK_BUDGET = 2048


@register(
    "corpus_pack_bins",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    ordered AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (
               ORDER BY md5('pack:' || CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
      FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS bin_id
    FROM ordered
    """,
    tags=("corpus", "packing"),
)
def corpus_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: assign documents to ~{PACK_BUDGET}
    -token training bins by contiguous cumulative-sum partitioning over
    a deterministic shuffle order — the standard scalable
    approximation of greedy bin packing (exact greedy is inherently
    sequential; cumsum packing differs only at bin boundaries and
    parallelizes). Integer token counts → the running sum and integer
    division are bit-identical across engines.

    Scale shape (r7): the running sum is io.two_phase_rank's
    per-range-partition cumsum + broadcast partition offsets — the
    exact plan the r6 docstring promised for 100 TB, now the only
    form (no single-partition WindowExec touches the corpus)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.size(F.expr("filter(split(lower(text), ' '), x -> x != '')"))
        .cast("long")
        .alias("n_tokens"),
    )
    keyed = toks.withColumn(
        "k", F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string")))
    )
    cum = two_phase_rank(
        keyed,
        [F.col("k"), F.col("doc_id")],
        rank_name=None,
        sum_col="n_tokens",
        sum_name="cum_incl",
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        (F.col("cum_incl") - F.col("n_tokens")).alias("cum_before"),
    ).select(
        "doc_id",
        "n_tokens",
        # integer `div`, not `/`: long/int goes through a double, which
        # stops being exact past 2^53 cumulative tokens
        F.expr(f"cum_before div {PACK_BUDGET}").alias("bin_id"),
    )


# ---------------------------------------------------------------------------
# vocabulary building + TF-IDF
# ---------------------------------------------------------------------------


@register(
    "vocab_top_tokens",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks WHERE token <> '' GROUP BY token
    )
    SELECT token, cnt FROM counts
    QUALIFY row_number() OVER (ORDER BY cnt DESC, token) <= 100
    """,
    tags=("text", "vocab", "topk"),
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by frequency (ties broken by
    token) — the vocab-counting pass of tokenizer training. Scale shape:
    explode → hash aggregate (map-side partials) → distributed top-k via
    TakeOrderedAndProject (each partition keeps ≤100 candidates; no
    global sort, no single-partition window)."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return counts.orderBy(F.desc("cnt"), F.asc("token")).limit(100)


@register(
    "text_tfidf_topterms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE token <> '' GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT doc_id, token, score FROM (
      SELECT tf.doc_id, tf.token,
             (tf.tf * n.n * 1000000) // dfreq.df AS score,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY (tf.tf * n.n * 1000000) // dfreq.df DESC,
                                         tf.token) AS rn
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    ) WHERE rn <= 3
    """,
    tags=("text", "tfidf", "topk"),
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF. The idf factor
    is the integer rational tf·N·1e6 div df — rank-equivalent to
    tf·(N/df) and bit-identical across engines (a float log() would
    differ in last ulps between libm implementations and is rank-
    equivalent anyway since log is monotone).

    Scale: tf is a (doc_id, token) hash aggregate over the exploded
    corpus; df reuses tf (no second corpus scan); the rank window
    partitions by doc_id so top-k stays fully distributed. The 1-row N
    is a broadcast cross join."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    scored = (
        tf.join(dfreq, "token")
        .join(F.broadcast(n))
        .withColumn("score", F.expr("tf * n * 1000000 div df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "score")
    )


@register(
    "vocab_top_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT t[i] || ' ' || t[i + 1] AS bigram
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    counts AS (
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM grams GROUP BY bigram
    )
    SELECT bigram, cnt FROM counts
    QUALIFY row_number() OVER (ORDER BY cnt DESC, bigram) <= 50
    """,
    tags=("text", "vocab", "topk"),
)
def vocab_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 word bigrams corpus-wide — the n-gram counting pass of
    BPE-merge/vocab induction. Built relationally (posexplode + lead
    window, like the dedup shingles — Spark's array HOFs are
    interpreted, see functions/dedup.py) with the same distributed
    top-k tail as vocab_top_tokens."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.expr("filter(split(lower(text), ' '), x -> x != '')")).alias(
            "i", "t"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    grams = (
        tok.select(
            F.concat_ws(" ", "t", F.lead("t", 1).over(w)).alias("bigram"),
            F.lead("t", 1).over(w).alias("_nxt"),
        )
        .filter(F.col("_nxt").isNotNull())
        .drop("_nxt")
    )
    counts = grams.groupBy("bigram").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return counts.orderBy(F.desc("cnt"), F.asc("bigram")).limit(50)


# confusion matrix over the lang-id predictions: reuse the registered
# query's own oracle as a subquery so both stay in lockstep
from arcon_spark.plans.registry import REGISTRY as _REG  # noqa: E402


@register(
    "lang_id_confusion",
    oracle=f"""
    WITH base AS ({_REG["text_lang_id"].oracle})
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM base GROUP BY 1, 2
    """,
    tags=("text", "lang_id", "evaluation"),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation shape: the lang-id confusion matrix
    (true × predicted counts) — the aggregate every labeling/filtering
    model in a data pipeline gets judged by. Composes the registered
    text_lang_id query, so prediction logic and evaluation can never
    drift apart; one extra hash aggregate over its output."""
    return (
        text_lang_id(spark, sf_dir)
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


_SAMPLE_K = 20


@register(
    "sample_k_per_source",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rk
      FROM documents
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_SAMPLE_K}
    """,
    tags=("sampling", "per_group", "pipeline"),
)
def sample_k_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling (k=20): rank docs within
    each source by a salted content-independent hash and keep the
    first k — the balanced-subsample op for corpus inspection and
    per-domain eval sets. Hash-ranked top-k is a reservoir sample
    that's stable across engines, partitionings, and reruns (unlike
    rand()-based sampling); the plan is one shuffle on source with
    WindowGroupLimit pushing the k-cut below the sort."""
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id")
    h = F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _SAMPLE_K)
    )


# ---------------------------------------------------------------------------
# Distributed BPE merge learning (first-merge pair statistics)
# ---------------------------------------------------------------------------

_BPE_TOP = 50
_SQL_TOKS_LIST = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


@register(
    "bpe_pair_merge_stats",
    oracle=f"""
    WITH vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_SQL_TOKS_LIST}) AS tok FROM documents) GROUP BY tok
    ), pairs AS (
      SELECT substring(tok, i, 2) AS pair, freq, tok
      FROM vocab, UNNEST(generate_series(1, length(tok) - 1)) AS u(i)
      WHERE length(tok) >= 2
    ), agg AS (
      SELECT pair,
             CAST(SUM(freq) AS BIGINT) AS pair_count,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
      FROM pairs GROUP BY pair
    )
    SELECT pair, pair_count, n_types,
           CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS BIGINT) AS rk
    FROM agg
    ORDER BY pair_count DESC, pair
    LIMIT {_BPE_TOP}
    """,
    tags=("text", "bpe", "vocab", "pipeline"),
)
def bpe_pair_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary learning, step 1: the corpus-wide
    adjacent-symbol-pair histogram whose argmax is the first merge
    rule. Formulated the way a 100 TB tokenizer build must be: pair
    statistics are computed over the WORD-FREQUENCY table (vocab-sized,
    millions of rows) rather than the raw token stream (trillions) —
    the corpus touches the cluster once for the word count, and every
    subsequent merge iteration runs on the tiny vocab histogram.
    Occurrences are counted per character position (overlaps included,
    'aaa' → 'aa' twice) weighted by word frequency; n_types counts the
    distinct word shapes a pair appears in. Top-50 by (count desc,
    pair asc) via TakeOrderedAndProject — no full sort."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    vocab = (
        docs.select(F.explode(F.expr(_TOKS)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    pairs = vocab.filter(F.length("tok") >= 2).select(
        "tok",
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("freq").alias("pair_count"),
        F.count_distinct("tok").cast("long").alias("n_types"),
    )
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _BPE_TOP)
        .orderBy(F.desc("pair_count"), F.asc("pair"))
    )


# ---------------------------------------------------------------------------
# Boilerplate passage detection
# ---------------------------------------------------------------------------

_BP_N = 12
_BP_MIN_DOCS = 3


@register(
    "boilerplate_passages",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS_LIST} AS t FROM documents
    ), ng AS (
      SELECT doc_id, ngram, CAST(COUNT(*) AS BIGINT) AS n_in_doc FROM (
        SELECT doc_id,
               unnest(list_transform(range(0, greatest(len(t) - {_BP_N - 1}, 0)),
                      i -> array_to_string(list_slice(t, i + 1, i + {_BP_N}), ' '))) AS ngram
        FROM toks)
      GROUP BY doc_id, ngram
    )
    SELECT ngram AS passage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_in_doc) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS example_doc_id
    FROM ng GROUP BY ngram
    HAVING COUNT(*) >= {_BP_MIN_DOCS}
    """,
    tags=("text", "boilerplate", "dedup", "pipeline"),
)
def boilerplate_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/template detection: token-12-gram passages that
    repeat across ≥3 distinct documents (headers, footers, licence
    blocks — the spans a curation pass strips before dedup so they
    don't glue unrelated documents into one near-dup cluster).
    Passages are built in-row (sequence/slice — zero pre-shuffle),
    pre-aggregated per (doc, passage), then one hash aggregate on the
    passage. At 100 TB the passage key space is long-tailed: the
    per-doc pre-aggregation is the map-side combine that keeps the
    exchange proportional to distinct passages, and a count-min/
    frequent-items sketch would replace the exact count once the tail
    itself stops fitting — the exact form here IS the verifier for
    that approximation."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    # Tokenize in a separate projection: HOF lambdas are interpreted
    # (no CSE), so slice(_TOKS, ...) inline re-splits the text once per
    # n-gram position — O(tokens²) per doc (see dedup._shingle_rows).
    toks = docs.select("doc_id", F.expr(_TOKS).alias("t"))
    ng = (
        toks.select(
            "doc_id",
            # sequence(1, 0) counts DOWN in Spark, so guard short docs
            # with an explicit empty-array branch instead of greatest().
            F.explode(
                F.expr(
                    f"CASE WHEN size(t) >= {_BP_N} THEN"
                    f" transform(sequence(1, size(t) - {_BP_N - 1}),"
                    f" i -> concat_ws(' ', slice(t, i, {_BP_N})))"
                    f" ELSE array() END"
                )
            ).alias("ngram"),
        )
        .groupBy("doc_id", "ngram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_in_doc"))
    )
    return (
        ng.groupBy(F.col("ngram").alias("passage"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_in_doc").alias("n_occurrences"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .filter(F.col("n_docs") >= _BP_MIN_DOCS)
    )


@register(
    "text_trigram_simpson",
    oracle="""
    WITH idx AS (
      SELECT doc_id, text, unnest(generate_series(1, length(text)-2)) AS i
      FROM documents WHERE length(text) >= 4
    ),
    tri AS (SELECT doc_id, substring(text, CAST(i AS INT), 3) AS tg FROM idx),
    c AS (SELECT doc_id, tg, count(*) AS c FROM tri GROUP BY 1, 2),
    num AS (SELECT doc_id, CAST(SUM(c*(c-1)) AS BIGINT) AS simpson_num FROM c GROUP BY 1)
    SELECT d.doc_id, length(d.text) - 2 AS n_trigrams, n.simpson_num,
           CAST(n.simpson_num AS DOUBLE)
             / ((length(d.text) - 2) * (length(d.text) - 3)) AS simpson
    FROM documents d JOIN num n ON d.doc_id = n.doc_id
    WHERE length(d.text) >= 4
    """,
    tags=("text", "quality", "repetition"),
)
def text_trigram_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram Simpson index (collision probability of two
    random trigram draws without replacement): sum c·(c-1) / n·(n-1).
    A log-free repetition/perplexity proxy — exact integer counts, so
    it cross-checks against the oracle bit-for-bit, unlike an entropy
    formula whose ln() would differ in the last ulp.

    Scale shape: no aggregation shuffle. The trigram histogram never
    materializes — the sorted trigram array is walked in-row with an
    aggregate() HOF (run-length accumulator) over the scan (spread()
    inserts the usual raw-input repartition only when the test file's
    single split would serialize the CPU-heavy projection). The HOF is
    interpreted with no CSE, so it is computed ONCE into its own
    projection and the ratio reads the materialized column — inlining
    it twice doubled the whole query (2.5 s → 1.3 s single-core at
    sf0.1). The oracle computes the same number the explode-and-group
    way; matching values prove the fused form."""
    docs = spread(load_table(spark, sf_dir, "documents").filter(F.length("text") >= 4))
    num = F.expr(
        "aggregate("
        " array_sort(transform(sequence(1, length(text)-2),"
        "                      i -> substring(text, i, 3))),"
        " named_struct('prev', cast(null as string), 'run', 0L, 'num', 0L),"
        " (s, x) -> named_struct("
        "   'prev', x,"
        "   'run', IF(x <=> s.prev, s.run + 1L, 1L),"
        "   'num', s.num + IF(x <=> s.prev, 2L * s.run, 0L)),"
        " s -> s.num)"
    )
    n = F.length("text") - F.lit(2)
    staged = docs.select(
        "doc_id", n.cast("long").alias("n_trigrams"), num.alias("simpson_num")
    )
    return staged.select(
        "doc_id",
        "n_trigrams",
        "simpson_num",
        (
            F.col("simpson_num").cast("double")
            / (F.col("n_trigrams") * (F.col("n_trigrams") - F.lit(1))).cast("double")
        ).alias("simpson"),
    )


_BPE_APPLY_K = 5  # merges applied (rank order from bpe_pair_merge_stats)


def _sql_bpe_ranked() -> str:
    return f"""vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_SQL_TOKS_LIST}) AS tok FROM documents) GROUP BY tok
    ), bpairs AS (
      SELECT substring(tok, i, 2) AS pair, freq
      FROM vocab, UNNEST(generate_series(1, length(tok) - 1)) AS u(i)
      WHERE length(tok) >= 2
    ), ranked AS (
      SELECT pair, row_number() OVER (ORDER BY SUM(freq) DESC, pair) AS rk
      FROM bpairs GROUP BY pair
    )"""


@register(
    "bpe_apply_merges",
    oracle=(lambda repl: f"""
    WITH {_sql_bpe_ranked()},
    toks AS (SELECT doc_id, {_SQL_TOKS_LIST} AS t FROM documents),
    tk AS (SELECT doc_id, unnest(t) AS tok FROM toks),
    enc AS (
      SELECT doc_id, length(tok) AS n_before, length({repl}) AS n_after
      FROM tk
    )
    SELECT doc_id,
           CAST(SUM(n_before) AS BIGINT) AS n_symbols_before,
           CAST(SUM(n_after) AS BIGINT) AS n_symbols_after
    FROM enc GROUP BY doc_id
    """)(
        "".join(
            f"replace(" for _ in range(_BPE_APPLY_K)
        )
        + "tok"
        + "".join(
            f", (SELECT pair FROM ranked WHERE rk = {k + 1}), chr({k + 1}))"
            for k in range(_BPE_APPLY_K)
        )
    ),
    tags=("text", "bpe", "tokenizer", "pipeline"),
)
def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE, step 2 — APPLY the learned merges: encode every
    token with the top-{k} merge rules (rank order from
    bpe_pair_merge_stats) and account the symbol compression per doc.
    Each merge is a literal left-to-right non-overlapping replace —
    identical semantics in Spark (Java String.replace) and DuckDB —
    with merged symbols written as control-char placeholders that
    cannot occur in text.

    Scale shape: the merge table is a trained artifact — materialized
    once (driver-side here, a metastore table at 100 TB) and shipped
    to executors as literals in the codegen'd projection, exactly how
    a tokenizer model rides a broadcast. The encode pass itself is
    ZERO shuffle: tokens, replaces, and the per-doc symbol sums all
    happen in-row; only (doc_id, 2 longs) leave the scan."""
    merges = [
        r["pair"]
        for r in bpe_pair_merge_stats(spark, sf_dir)
        .orderBy("rk")
        .limit(_BPE_APPLY_K)
        .collect()
    ]
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.expr(_TOKS).alias("t")).filter(F.expr("size(t) >= 1"))
    chain = "tok"
    for k, pair in enumerate(merges):
        esc = pair.replace("\\", "\\\\").replace("'", "\\'")
        chain = f"replace({chain}, '{esc}', chr({k + 1}))"
    return toks.select(
        "doc_id",
        F.expr("aggregate(t, 0L, (a, tok) -> a + length(tok))").alias(
            "n_symbols_before"
        ),
        F.expr(f"aggregate(t, 0L, (a, tok) -> a + length({chain}))").alias(
            "n_symbols_after"
        ),
    )


_CMS_D = 4  # sketch depth (hash rows)
_CMS_W = 256  # sketch width (buckets per row)
_CMS_TOP = 50


def _cms_bucket(d: int, tok: str) -> str:
    """Spark-side bucket expression for depth row d."""
    return (
        f"cast(conv(substring(md5(concat('cms{d}:', {tok})), 1, 8), 16, 10)"
        f" as bigint) % {_CMS_W}"
    )


def _sql_cms_bucket(d: int, tok: str) -> str:
    return (
        f"CAST('0x' || substring(md5('cms{d}:' || {tok}), 1, 8) AS BIGINT) % {_CMS_W}"
    )


@register(
    "cms_token_counts",
    oracle=f"""
    WITH vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_SQL_TOKS_LIST}) AS tok FROM documents) GROUP BY tok
    ),
    counters AS (
      {" UNION ALL ".join(
          f"SELECT {d} AS d, {_sql_cms_bucket(d, 'tok')} AS bucket,"
          f" CAST(SUM(freq) AS BIGINT) AS cnt FROM vocab GROUP BY 2"
          for d in range(_CMS_D)
      )}
    ),
    top AS (
      SELECT tok, freq,
             row_number() OVER (ORDER BY freq DESC, tok) AS rk
      FROM vocab
    ),
    probes AS (
      {" UNION ALL ".join(
          f"SELECT tok, freq, rk, {d} AS d, {_sql_cms_bucket(d, 'tok')} AS bucket"
          f" FROM top WHERE rk <= {_CMS_TOP}"
          for d in range(_CMS_D)
      )}
    )
    SELECT p.tok, p.freq AS exact_count, MIN(c.cnt) AS cms_estimate,
           MIN(c.cnt) - p.freq AS overcount
    FROM probes p JOIN counters c ON c.d = p.d AND c.bucket = p.bucket
    GROUP BY p.tok, p.freq
    """,
    tags=("text", "sketch", "count-min"),
)
def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream — the mergeable
    fixed-size structure that replaces exact heavy-hitter counts when
    the vocabulary tail stops fitting (the approximation
    boilerplate_passages' docstring points at). Depth {D} md5 hash
    rows × width {W}: estimate = min over rows, always ≥ exact. The
    top-{K} tokens are probed against the sketch and reported with
    exact count, estimate, and overcount, so the driver's gate
    verifies the sketch's deterministic CONTENT, not just its shape.

    Scale: counters aggregate to {D}×{W} longs (broadcastable
    always); the token stream is touched once; estimates need no
    second corpus pass. All hashing is md5 → cross-engine identical.
    THREE shuffles total: the vocab aggregate, ONE (d, bucket)
    aggregate over depth-exploded vocab rows (was one groupBy per
    depth row), and the tiny probe merge; top-K goes through
    TakeOrderedAndProject (per-partition partial top-K), never a
    global row_number sort."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    vocab = (
        docs.select(F.explode(F.expr(_TOKS)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .persist()  # feeds the counter build AND the top-K probe side
    )
    depth_rows = ", ".join(
        f"struct({d}L as d, {_cms_bucket(d, 'tok')} as bucket)" for d in range(_CMS_D)
    )
    counters = (
        vocab.select(F.explode(F.expr(f"array({depth_rows})")).alias("db"), "freq")
        .groupBy(F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
        .agg(F.sum("freq").alias("cnt"))
    )
    top = vocab.orderBy(F.desc("freq"), F.asc("tok")).limit(_CMS_TOP)
    probes = top.select(
        "tok", "freq", F.explode(F.expr(f"array({depth_rows})")).alias("db")
    ).select("tok", "freq", F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("tok", "freq")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            "tok",
            F.col("freq").alias("exact_count"),
            "cms_estimate",
            (F.col("cms_estimate") - F.col("freq")).alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC)
# ---------------------------------------------------------------------------

_CDC_MOD = 8  # boundary gate: E[chunk] = 8 tokens


@register(
    "text_cdc_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, d.l[u.i] AS tok, CAST(u.i - 1 AS BIGINT) AS pos
      FROM (SELECT doc_id, {_SQL_TOKS_LIST} AS l
            FROM documents) d,
           UNNEST(generate_series(1, len(d.l))) AS u(i)
    ),
    g AS (
      SELECT doc_id, tok, pos,
             CASE WHEN CAST('0x' || substring(md5('cdc:' || tok), 1, 4) AS INTEGER)
                       % {_CDC_MOD} = 0
                  THEN 1 ELSE 0 END AS gate
      FROM toks
    ),
    c AS (
      SELECT doc_id, tok, pos,
             COALESCE(SUM(gate) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS chunk_id
      FROM g
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           MIN(pos) AS first_pos,
           md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_digest
    FROM c GROUP BY doc_id, chunk_id
    """,
    tags=("text", "chunking", "cdc", "dedup"),
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED chunking — boundaries fall where a hash of the
    token itself passes a gate (md5 % 8 == 0), not at fixed offsets
    (text_chunking is the fixed-stride counterpart). The property that
    matters for dedup pipelines: inserting a sentence shifts every
    fixed-stride chunk after it, but content-gated boundaries
    re-synchronize immediately, so unchanged regions keep identical
    chunk digests — this is how backup/dedup systems (and chunk-level
    corpus dedup) get stable chunk identities under edits.

    Plan shape: tokenize (in-row), gate (in-row md5), one window
    cumsum + one hash aggregate, both over the same doc_id exchange —
    Spark reuses the partitioning, so the whole operator costs one
    shuffle. The ordered-digest uses the array_sort(collect_list)
    idiom (no SortAggregate demotion)."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = docs.select("doc_id", F.posexplode(F.expr(_TOKS)).alias("pos", "tok"))
    gate = (
        F.expr("cast(conv(substring(md5(concat('cdc:', tok)), 1, 4), 16, 10) as int)")
        % _CDC_MOD
        == 0
    ).cast("int")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = tok.select(
        "doc_id",
        "tok",
        F.col("pos").cast("long").alias("pos"),
        F.coalesce(F.sum(gate).over(w), F.lit(0)).cast("long").alias("chunk_id"),
    )
    return c.groupBy("doc_id", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.min("pos").alias("first_pos"),
        F.md5(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(pos, tok))),"
                " x -> x.tok), ' ')"
            )
        ).alias("chunk_digest"),
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4 user-defined TABLE function) — §2.8's 1→N surface
# ---------------------------------------------------------------------------


@register(
    "udtf_sentence_split",
    oracle="""
    WITH parts AS (SELECT doc_id, string_split(text, '. ') AS p FROM documents)
    SELECT doc_id, CAST(u.i - 1 AS INT) AS sent_idx, p[u.i] AS sentence,
           CAST(len(list_filter(string_split(p[u.i], ' '), x -> x <> ''))
                AS BIGINT) AS n_words,
           CAST(length(p[u.i]) AS BIGINT) AS n_chars
    FROM parts, UNNEST(generate_series(1, len(p))) AS u(i)
    """,
    tags=("text", "udtf", "survey2.8"),
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 4 `@udtf`, Arrow-optimized): one text
    row expands to N sentence rows with word/char counts, invoked
    through a correlated LATERAL join — the 1→N operator surface the
    reference expresses as a FlatMap closure
    (arcon/src/stream/operator/function/flatmap.rs) and that explode()
    covers for array-shaped input; the UDTF form is for expansions
    computed by arbitrary Python per input row.

    Scale honesty: a UDTF is a Python-process stage like any Pandas
    UDF — Arrow-batched here (useArrow), but still off the codegen
    path. flatmap_tokens/text_chunking show the JVM-native expansions
    to prefer when the logic fits expressions; this query pins the API
    + exactly-equal semantics vs the relational oracle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_words long, n_chars long",
          useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            for i, s in enumerate((text or "").split(". ")):
                words = [w for w in s.split(" ") if w]
                yield i, s, len(words), len(s)

    from arcon_spark.io import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence, s.n_words, s.n_chars "
        "FROM documents d, LATERAL sentence_split(d.text) s"
    )


# ---------------------------------------------------------------------------
# Collocations, tokenizer stats, readability, association-score quality
# ---------------------------------------------------------------------------

_PMI_MIN_PAIR = 5
_PMI_TOP = 50

# Adjacent-word bigrams per doc, as 'w1 w2' strings (both engines).
_SQL_BIGRAMS = f"""
  toks AS (SELECT doc_id, {_SQL_TOKS_LIST} AS t FROM documents),
  big AS (
    SELECT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS pair,
           t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
    FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
  )
"""


@register(
    "text_pmi_collocations",
    oracle=f"""
    WITH {_SQL_BIGRAMS},
    pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt_pair FROM big GROUP BY 1, 2),
    uni AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM
        (SELECT unnest({_SQL_TOKS_LIST}) AS tok FROM documents) GROUP BY tok
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_big FROM big)
    SELECT w1, w2, cnt_pair, u1.cnt AS cnt_w1, u2.cnt AS cnt_w2,
           CAST(cnt_pair * n.n_big AS DOUBLE) / CAST(u1.cnt * u2.cnt AS DOUBLE)
             AS pmi_ratio
    FROM pc, n
    JOIN uni u1 ON pc.w1 = u1.tok
    JOIN uni u2 ON pc.w2 = u2.tok
    WHERE cnt_pair >= {_PMI_MIN_PAIR}
    ORDER BY pmi_ratio DESC, w1, w2
    LIMIT {_PMI_TOP}
    """,
    tags=("text", "collocation", "pipeline"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-ranked adjacent-word collocations, log-free: rank by the
    exact PMI *ratio* P(w1,w2)/(P(w1)P(w2)) = cnt_pair·N/(cnt1·cnt2)
    instead of its logarithm — same ordering (log is monotone), but the
    score is BIGINT products (< 2^53, exact as doubles) and ONE
    correctly-rounded division, so it hash-matches the oracle where an
    ln() formula would drift in the last ulp.

    Scale shape: one shuffle for the pair counts (the corpus-sized
    aggregation), the unigram vocabulary is orders smaller and joins
    back as broadcasts; total-N is a broadcast scalar. Top-k by a
    totally-ordered (score, w1, w2) sort of the already-small
    filtered pair table."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = docs.select("doc_id", F.expr(_TOKS).alias("t"))
    big = toks.select(
        F.explode(
            F.expr("if(size(t) < 2, array(),"
                " transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2)))")
        ).alias("b")
    ).select("b.w1", "b.w2")
    big = big.localCheckpoint(eager=True)  # scan leaf: feeds pair counts + the global count
    pc = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt_pair"))
        .filter(F.col("cnt_pair") >= _PMI_MIN_PAIR)
    )
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    n_big = big.count()
    out = (
        pc.join(F.broadcast(uni.withColumnRenamed("tok", "w1").withColumnRenamed("cnt", "cnt_w1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("tok", "w2").withColumnRenamed("cnt", "cnt_w2")), "w2")
        .select(
            "w1",
            "w2",
            "cnt_pair",
            "cnt_w1",
            "cnt_w2",
            (
                (F.col("cnt_pair") * F.lit(n_big)).cast("double")
                / (F.col("cnt_w1") * F.col("cnt_w2")).cast("double")
            ).alias("pmi_ratio"),
        )
        .orderBy(F.desc("pmi_ratio"), "w1", "w2")
        .limit(_PMI_TOP)
    )
    return out


@register(
    "tokenizer_fertility",
    oracle=rf"""
    WITH per_doc AS (
      SELECT source,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tok,
             CAST(len({_SQL_TOKS_LIST}) AS BIGINT) AS n_words,
             CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(n_tok) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE) AS fertility,
           CAST(SUM(n_tok) * 100 AS DOUBLE) / CAST(SUM(n_bytes) AS DOUBLE) AS tokens_per_100_bytes
    FROM per_doc GROUP BY source
    """,
    tags=("text", "tokenizer", "pipeline"),
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per source: BPE-ish tokens per
    whitespace word and per 100 bytes — the compression-rate numbers a
    tokenizer-selection pass computes over a corpus. All-integer sums
    (exact, associative → safe under Spark's partial aggregation at any
    scale); the two ratios are single correctly-rounded divisions.

    Scale shape: per-row codegen token counting over the scan, then one
    tiny shuffle keyed by `source` — map-side partial aggregation means
    bytes-on-the-wire is O(sources × partitions), not O(rows)."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per_doc = docs.select(
        "source",
        F.size(F.expr(r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"))
        .cast("long")
        .alias("n_tok"),
        F.size(F.expr(_TOKS)).cast("long").alias("n_words"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    return per_doc.groupBy("source").agg(
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_bytes").alias("total_bytes"),
        (F.sum("n_tok").cast("double") / F.sum("n_words").cast("double")).alias("fertility"),
        (
            (F.sum("n_tok") * F.lit(100)).cast("double") / F.sum("n_bytes").cast("double")
        ).alias("tokens_per_100_bytes"),
    )


@register(
    "text_readability_flesch",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             CAST(len({_SQL_TOKS_LIST}) AS BIGINT) AS n_words,
             CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sentences,
             CAST(list_sum(list_transform({_SQL_TOKS_LIST},
                    w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))) AS BIGINT)
               AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             AS flesch
    FROM m WHERE n_words >= 1
    """,
    tags=("text", "quality", "readability"),
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with a vowel-group syllable
    heuristic (runs of [aeiouy], min 1 per word) — a standard
    quality-filter feature. Both engines evaluate the identical
    expression tree of correctly-rounded IEEE ops (two divisions, two
    multiplies, two subtractions in fixed order), so the double result
    is bit-identical without any log/exp.

    Scale shape: pure per-row projection over the scan — no shuffle at
    all; at 100 TB this is a map-only pass bounded by scan bandwidth."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m = docs.select(
        "doc_id",
        F.size(F.expr(_TOKS)).cast("long").alias("n_words"),
        F.greatest(F.lit(1), F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")))
        .cast("long")
        .alias("n_sentences"),
        F.expr(
            f"aggregate({_TOKS}, 0L,"
            " (s, w) -> s + greatest(1L, bigint(size(regexp_extract_all(w, '[aeiouy]+', 0)))))"
        ).alias("n_syllables"),
    ).filter(F.col("n_words") >= 1)
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias("flesch"),
    )


_ASSOC_SCALE = 1_000_000  # fixed-point units for the per-doc ratio sum


@register(
    "text_bigram_assoc_score",
    oracle=f"""
    WITH {_SQL_BIGRAMS},
    pc AS (SELECT w1 AS pw1, w2 AS pw2, CAST(COUNT(*) AS BIGINT) AS cnt_pair
           FROM big GROUP BY 1, 2),
    uni AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM
        (SELECT unnest({_SQL_TOKS_LIST}) AS tok FROM documents) GROUP BY tok
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_big FROM big),
    scored AS (
      SELECT big.doc_id,
             CAST(cnt_pair * n.n_big AS DOUBLE) / CAST(u1.cnt * u2.cnt AS DOUBLE) AS r,
             cnt_pair
      FROM big, n
      JOIN pc ON big.w1 = pc.pw1 AND big.w2 = pc.pw2
      JOIN uni u1 ON big.w1 = u1.tok
      JOIN uni u2 ON big.w2 = u2.tok
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN cnt_pair = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax_pairs,
           CAST(SUM(CAST(round(r * {_ASSOC_SCALE}) AS HUGEINT)) AS DOUBLE)
             / {_ASSOC_SCALE}.0 / CAST(COUNT(*) AS DOUBLE) AS assoc_score
    FROM scored GROUP BY doc_id
    """,
    tags=("text", "quality", "lm", "pipeline"),
)
def text_bigram_assoc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document language-model-ish quality score, log-free: the
    mean corpus association ratio cnt(w1,w2)·N/(cnt(w1)·cnt(w2)) over
    the doc's adjacent bigrams (the linear-space analogue of mean
    pointwise mutual information — a perplexity-style fluency filter:
    word salad scores ≈1, fluent text ≫1), plus the hapax-pair count
    (bigrams seen nowhere else — the CCNet-style rarity signal). Each
    per-row ratio is exact-integer products + one rounded division;
    the per-doc mean goes through the msum fixed-point pattern so the
    sum is order-independent across engines.

    Scale shape: the corpus bigram stats are ONE aggregation shuffle;
    the per-doc rejoin broadcasts the unigram vocabulary and
    shuffle-joins the pair counts on (w1,w2); the final per-doc mean
    shuffles on doc_id. The exploded-bigram frame feeds both the
    stats and the rejoin, so it is persisted once (self-join branches
    do not share subtrees — see MEASURE.md recompute audit)."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = docs.select("doc_id", F.expr(_TOKS).alias("t"))
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr("if(size(t) < 2, array(),"
                " transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2)))")
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    big = big.localCheckpoint(eager=True)  # scan leaf: feeds pair counts, the global count AND the scored join
    pc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cnt_pair"))
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    n_big = big.count()
    scored = (
        big.join(pc, ["w1", "w2"])
        .join(F.broadcast(uni.withColumnRenamed("tok", "w1").withColumnRenamed("cnt", "cnt_w1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("tok", "w2").withColumnRenamed("cnt", "cnt_w2")), "w2")
        .select(
            "doc_id",
            "cnt_pair",
            (
                (F.col("cnt_pair") * F.lit(n_big)).cast("double")
                / (F.col("cnt_w1") * F.col("cnt_w2")).cast("double")
            ).alias("r"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("cnt_pair") == 1, 1).otherwise(0)).cast("long").alias("n_hapax_pairs"),
        (
            F.sum(F.round(F.col("r") * _ASSOC_SCALE).cast("decimal(38,0)")).cast("double")
            / F.lit(float(_ASSOC_SCALE))
            / F.count(F.lit(1)).cast("double")
        ).alias("assoc_score"),
    )


# ---------------------------------------------------------------------------
# two-level heavy hitters: shard-local top-m candidate union + exact probe
# ---------------------------------------------------------------------------

_HH_SHARDS = 16
_HH_LOCAL_M = 20
_HH_K = 10


@register(
    "heavy_hitters_shard_union",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id % {_HH_SHARDS} AS shard,
             unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    local AS (
      SELECT shard, token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks WHERE token <> '' GROUP BY shard, token
    ),
    cand AS (
      SELECT DISTINCT token FROM (
        SELECT shard, token,
               row_number() OVER (PARTITION BY shard ORDER BY cnt DESC, token) AS rn
        FROM local
      ) WHERE rn <= {_HH_LOCAL_M}
    ),
    est AS (
      SELECT l.token, CAST(SUM(l.cnt) AS BIGINT) AS cnt,
             row_number() OVER (ORDER BY SUM(l.cnt) DESC, l.token) AS rank
      FROM local l JOIN cand c ON c.token = l.token
      GROUP BY l.token
    ),
    truth AS (
      SELECT token, CAST(SUM(cnt) AS BIGINT) AS cnt,
             row_number() OVER (ORDER BY SUM(cnt) DESC, token) AS rank
      FROM local GROUP BY token
    )
    SELECT e.rank, e.token, e.cnt, t.token AS true_token,
           t.cnt AS true_cnt, e.token = t.token AS hit
    FROM est e JOIN truth t ON t.rank = e.rank
    WHERE e.rank <= {_HH_K}
    """,
    tags=("text", "topk", "heavy_hitters"),
)
def heavy_hitters_shard_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distributed heavy hitters: each of 16 data shards
    (doc_id % 16 — a deterministic stand-in for a scan partition)
    keeps only its local top-20 tokens; the global top-10 is computed
    from the UNION of those candidates, with exact counts re-summed
    from the shard-local partials. Audit columns carry the TRUE
    top-10 alongside (`hit` = candidate method found the same token
    at that rank).

    Why this matters at 100 TB: a naive top-k over token frequency
    hash-aggregates the ENTIRE vocabulary across the wire before
    TakeOrdered can prune. Local-top-m-then-union ships shards×m
    candidate rows + one candidate-filtered re-aggregation (broadcast
    semi-join against a ≤320-token list, so the second pass moves
    almost nothing). The union can miss a global heavy hitter only if
    it is below rank m in EVERY shard — the audit quantifies exactly
    that failure mode, which is the Misra-Gries/space-saving risk
    bound made measurable. All counts are exact integers; ordering is
    totalized by (cnt DESC, token)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        (F.col("doc_id") % _HH_SHARDS).alias("shard"),
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    local = (
        toks.groupBy("shard", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .persist()  # feeds candidates, est-counts, and truth — one compute
    )
    w_shard = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("token"))
    cand = (
        local.withColumn("rn", F.row_number().over(w_shard))
        .filter(F.col("rn") <= _HH_LOCAL_M)
        .select("token")
        .distinct()
    )
    est = (
        local.join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("token")))
        )
        .filter(F.col("rank") <= _HH_K)
    )
    truth = (
        local.groupBy("token")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("token")))
        )
        .filter(F.col("rank") <= _HH_K)
        .select(
            F.col("rank"),
            F.col("token").alias("true_token"),
            F.col("cnt").alias("true_cnt"),
        )
    )
    return est.join(truth, "rank").select(
        "rank", "token", "cnt", "true_token", "true_cnt",
        (F.col("token") == F.col("true_token")).alias("hit"),
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction — stopword-delimited phrases scored by word
# degree/frequency
# ---------------------------------------------------------------------------

_RAKE_STOPS = (
    "the,a,an,of,and,or,to,in,is,are,was,were,for,on,with,as,by,at,"
    "it,its,this,that,be,from,has,have,had,not,but,they,their,we,our"
)
_RAKE_SCALE = 1_000_000
_RAKE_K = 20


@register(
    "text_keywords_rake",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, u.i AS pos, t[u.i] AS token
      FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
            FROM documents),
           UNNEST(generate_series(1, len(t))) AS u(i)
    ),
    marked AS (
      SELECT doc_id, pos, token,
             CASE WHEN list_contains(string_split('{_RAKE_STOPS}', ','), token)
                  THEN 1 ELSE 0 END AS is_stop
      FROM toks
    ),
    islands AS (
      SELECT doc_id, pos, token, is_stop,
             SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS phrase_id
      FROM marked
    ),
    phrase_words AS (
      SELECT doc_id, phrase_id, pos, token FROM islands WHERE is_stop = 0
    ),
    phrases AS (
      SELECT doc_id, phrase_id,
             string_agg(token, ' ' ORDER BY pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS plen
      FROM phrase_words GROUP BY doc_id, phrase_id
    ),
    word_stats AS (
      SELECT w.token,
             SUM(p.plen) AS deg,
             CAST(COUNT(*) AS BIGINT) AS freq
      FROM phrase_words w
      JOIN phrases p ON p.doc_id = w.doc_id AND p.phrase_id = w.phrase_id
      GROUP BY w.token
    ),
    scored AS (
      SELECT p.phrase,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             MAX(ps.score_units) AS score_units
      FROM phrases p
      JOIN (
        SELECT pw.doc_id, pw.phrase_id,
               CAST(SUM(ws.deg * {_RAKE_SCALE} // ws.freq) AS BIGINT) AS score_units
        FROM phrase_words pw JOIN word_stats ws ON ws.token = pw.token
        GROUP BY pw.doc_id, pw.phrase_id
      ) ps ON ps.doc_id = p.doc_id AND ps.phrase_id = p.phrase_id
      GROUP BY p.phrase
    )
    SELECT phrase, n_occurrences, score_units FROM scored
    QUALIFY row_number() OVER (ORDER BY score_units DESC, phrase) <= {_RAKE_K}
    """,
    tags=("text", "keywords", "rake", "topk"),
)
def text_keywords_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al.): candidate phrases are
    maximal stopword-free token runs; each word scores deg/freq (deg =
    Σ lengths of phrases it appears in — co-occurrence degree; freq =
    its occurrence count) and a phrase scores the sum of its words'
    scores. Top-20 phrases corpus-wide. Scores are integer fixed-point
    (deg·10⁶ div freq per word) so every engine and execution order
    produces identical longs — the floor-division trick every ranked
    op here uses.

    Plan shape: phrase segmentation happens IN-ROW (mark stopword
    tokens with a sentinel, array_join, split on sentinel runs) — a
    pure codegen projection with ZERO token-stream shuffle, the same
    rewrite _shingle_rows uses (the posexplode + per-doc running-sum
    window formulation, which the oracle still runs, sorts the whole
    token stream per doc: measured 28 s → ~4 s at sf0.01). Downstream:
    two hash aggregates (phrase occurrences, word stats) and a
    broadcast join of vocabulary-sized word stats back onto phrase
    words. Identical phrase TYPES score identically (scores depend
    only on global word stats), so MAX(score_units) per phrase is a
    no-op dedup, not an approximation."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    stops_sql = ",".join(f"'{w}'" for w in _RAKE_STOPS.split(","))
    phr = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "filter(transform(split(array_join(transform("
                " filter(split(lower(text), ' '), x -> x != ''),"
                f" x -> IF(array_contains(array({stops_sql}), x), chr(0), x)),"
                " ' '), chr(0)), p -> trim(p)), p -> p != '')"
            )
        ).alias("phrase_id", "phrase"),
    ).persist()  # feeds phrase-words, occurrence counts, and scoring
    pw = phr.select(
        "doc_id",
        "phrase_id",
        F.size(F.split("phrase", " ")).cast("long").alias("plen"),
        F.explode(F.split("phrase", " ")).alias("token"),
    )
    word_stats = pw.groupBy("token").agg(
        F.sum("plen").alias("deg"), F.count(F.lit(1)).cast("long").alias("freq")
    )
    ps = (
        pw.join(F.broadcast(word_stats), "token")
        .groupBy("doc_id", "phrase_id")
        .agg(F.sum(F.expr(f"deg * {_RAKE_SCALE} div freq")).alias("score_units"))
    )
    scored = (
        phr.join(ps, ["doc_id", "phrase_id"])
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max("score_units").alias("score_units"),
        )
    )
    return scored.orderBy(F.desc("score_units"), F.asc("phrase")).limit(_RAKE_K)


# ---------------------------------------------------------------------------
# lexicon sentiment scoring (cf. PAPERS.md: "Large Scale Sentiment
# Analysis on Twitter with Spark", EDBT 2016 — lexicon-join approach)
# ---------------------------------------------------------------------------

_POS_WORDS = "good,great,excellent,best,love,happy,fast,easy,nice,clean,fresh,smooth"
_NEG_WORDS = "bad,poor,worst,hate,slow,hard,broken,dirty,late,wrong,noisy,rough"


@register(
    "text_sentiment_lexicon",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '),
                 x -> list_contains(string_split('{_POS_WORDS}', ','), x)))
               AS pos_hits,
             len(list_filter(string_split(lower(text), ' '),
                 x -> list_contains(string_split('{_NEG_WORDS}', ','), x)))
               AS neg_hits
      FROM documents
    )
    SELECT doc_id, CAST(pos_hits AS BIGINT) AS pos_hits,
           CAST(neg_hits AS BIGINT) AS neg_hits,
           CAST(pos_hits - neg_hits AS BIGINT) AS score,
           CASE WHEN pos_hits > neg_hits THEN 'positive'
                WHEN neg_hits > pos_hits THEN 'negative'
                ELSE 'neutral' END AS label
    FROM scored
    """,
    tags=("text", "sentiment", "quality"),
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based sentiment per document — occurrence-counted
    positive/negative word hits, integer score, 3-way label (the
    EDBT'16 Spark-sentiment recipe, which joins tweets to a sentiment
    lexicon; here the lexicon is small enough to inline as a literal
    array, turning the join into an IN-ROW filter-count: ZERO
    shuffle, pure codegen projection over one scan).

    At 100 TB with a real lexicon (SentiWordNet-scale, 10⁵ entries)
    the same plan holds as a broadcast hash join on token — the
    pattern boundary is lexicon size vs literal-array expression
    cost, not data size. Occurrence counting (not distinct matching)
    weights repeated sentiment words, matching the paper's
    term-frequency scoring."""
    pos = F.split(F.lit(_POS_WORDS), ",")
    neg = F.split(F.lit(_NEG_WORDS), ",")
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = F.expr("split(lower(text), ' ')")
    scored = docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.array_contains(pos, x))).cast("long").alias("pos_hits"),
        F.size(F.filter(toks, lambda x: F.array_contains(neg, x))).cast("long").alias("neg_hits"),
    )
    return scored.select(
        "doc_id",
        "pos_hits",
        "neg_hits",
        (F.col("pos_hits") - F.col("neg_hits")).cast("long").alias("score"),
        F.when(F.col("pos_hits") > F.col("neg_hits"), "positive")
        .when(F.col("neg_hits") > F.col("pos_hits"), "negative")
        .otherwise("neutral")
        .alias("label"),
    )


# ---------------------------------------------------------------------------
# full-text search serving: conjunctive (AND) term query + tf-idf ranking
# ---------------------------------------------------------------------------

_SEARCH_TERMS = ("data", "join", "stream")
_SEARCH_K = 15
_IDF_SCALE = 1_000_000


@register(
    "text_search_and_rank",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE token IN ({", ".join(f"'{t}'" for t in _SEARCH_TERMS)})
      GROUP BY doc_id, token
    ),
    n_docs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
    hits AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(t.tf * ((n.n * {_IDF_SCALE}) // d.df)) AS BIGINT) AS score_units
      FROM tf t JOIN dfreq d ON d.token = t.token, n_docs n
      GROUP BY t.doc_id
      HAVING COUNT(*) = {len(_SEARCH_TERMS)}
    )
    SELECT doc_id, score_units FROM hits
    QUALIFY row_number() OVER (ORDER BY score_units DESC, doc_id) <= {_SEARCH_K}
    """,
    tags=("text", "search", "retrieval", "topk"),
)
def text_search_and_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text conjunctive search with tf-idf ranking: docs
    containing ALL query terms ('data' AND 'join' AND 'stream'),
    ranked by Σ tf·idf in integer fixed-point (idf = N·10⁶ div df —
    floor-divided once per TERM, then multiplied by integer tf, so
    scores are exact longs). The serving-side counterpart of the
    indexing passes already registered (vocab/tfidf are the index
    builders; this is the query executor).

    Plan: the term filter is pushed INTO the token explode
    (`token IN (...)` — only query-term postings materialize, the
    inverted-index read amplification model), the AND is a
    HAVING count = |terms| on the per-doc aggregate (no
    |terms|-way self-join), document frequencies are a 3-row
    broadcast, top-k is TakeOrdered. At 100 TB with a prebuilt
    postings table this plan starts at the tf frame — identical from
    there on; 1000 concurrent queries batch as one multi-term scan
    with a query_id column."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    terms = list(_SEARCH_TERMS)
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    hits = (
        tf.join(F.broadcast(dfreq), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(
                F.col("tf") * F.expr(f"({n_docs}L * {_IDF_SCALE}) div df")
            ).alias("score_units"),
        )
        .filter(F.col("n_terms") == len(terms))
    )
    return (
        hits.select("doc_id", "score_units")
        .orderBy(F.desc("score_units"), F.asc("doc_id"))
        .limit(_SEARCH_K)
    )


# BM25 per-doc hit CTE chain — shared verbatim by the ranking oracle
# (text_bm25_rank) and the hybrid lexical+vector fusion oracle
# (similarity.hybrid_search_rrf).
_SQL_BM25_HITS = f"""d AS (
      SELECT doc_id, lower(text) AS lt,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM d
    ),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
      FROM (SELECT doc_id, dl, unnest(string_split(lt, ' ')) AS token FROM d)
      WHERE token IN ({", ".join(f"'{t}'" for t in _SEARCH_TERMS)})
      GROUP BY doc_id, token
    ),
    dfreq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(round(ln(1 + (CAST((SELECT n FROM corpus) AS DOUBLE) - COUNT(*) + 0.5)
                           / (COUNT(*) + 0.5)) * 1000000) AS BIGINT) AS idf_micro
      FROM tf GROUP BY token
    ),
    scored AS (
      SELECT f.doc_id,
             (f.tf * q.idf_micro * (44 * c.t))
               // (20 * f.tf * c.t + 6 * c.t + 18 * f.dl * c.n) AS s
      FROM tf f JOIN dfreq q ON q.token = f.token, corpus c
    ),
    hits AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(s) AS BIGINT) AS score_units
      FROM scored GROUP BY doc_id
    )"""


@register(
    "text_bm25_rank",
    oracle=f"""
    WITH {_SQL_BM25_HITS}
    SELECT doc_id, n_terms, score_units FROM hits
    QUALIFY row_number() OVER (ORDER BY score_units DESC, doc_id) <= {_SEARCH_K}
    """,
    tags=("text", "search", "retrieval", "topk", "pipeline"),
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 serving ranker (k1 = 1.2, b = 0.75) — the standard
    probabilistic relevance score, disjunctive (OR) over the same query
    terms text_search_and_rank ANDs: any matching doc ranks, repeated
    terms saturate (tf/(tf+k1·…)) and long documents are penalized by
    dl/avgdl — the two behaviors plain tf·idf lacks.

    Exactness: with k1 = 6/5, b = 3/4 rational, the per-term score
    idf·tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)) multiplies through by
    20·T (T = corpus token count, avgdl = T/N) into a pure integer
    ratio: idf_micro·tf·44T div (20·tf·T + 6T + 18·dl·N) — floor
    division of exact BIGINTs (both engines truncate toward zero), so
    per-doc sums are exact. idf is Lucene's non-negative form
    ln(1 + (N−df+0.5)/(df+0.5)): the raw Robertson log-odds goes
    NEGATIVE for any term in more than half the corpus (true of every
    query term here), which would invert the ranking into
    anti-relevance — the classic BM25 footgun every production engine
    patches the same way. Int64 headroom: idf ≤ ln(N)·10⁶, tf ≤ dl, so the
    numerator stays < 2⁶³ far past this corpus; a 100 TB deployment
    flips to plain double BM25 (ranking needs no cross-engine hash).

    Plan: dl rides the token explode in-row (no join back to the
    corpus for length), the term filter is pushed into the explode,
    df/idf is a |terms|-row broadcast, top-k is TakeOrdered —
    identical serving shape to the tf-idf executor."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = docs.select(
        "doc_id",
        F.lower("text").alias("lt"),
        F.expr("cast(size(split(lower(text), ' ')) as bigint)").alias("dl"),
    )
    c = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("dl").cast("long").alias("t")
    ).first()
    n, t = int(c["n"]), int(c["t"])
    terms = list(_SEARCH_TERMS)
    tf = (
        d.select("doc_id", "dl", F.explode(F.split("lt", " ")).alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.round(
            F.log(
                F.lit(1.0)
                + (F.lit(float(n)) - F.count(F.lit(1)) + F.lit(0.5))
                / (F.count(F.lit(1)) + F.lit(0.5))
            )
            * F.lit(1000000)
        )
        .cast("long")
        .alias("idf_micro"),
    )
    s = F.expr(f"(tf * idf_micro * (44 * {t}L)) div (20 * tf * {t}L + 6 * {t}L + 18 * dl * {n}L)")
    hits = (
        tf.join(F.broadcast(dfreq), "token")
        .select("doc_id", s.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("s").cast("long").alias("score_units"),
        )
    )
    return hits.orderBy(F.desc("score_units"), F.asc("doc_id")).limit(_SEARCH_K)


# --- CCNet-style LM quality scoring + DSIR importance weights --------------
#
# The two standard model-based corpus-selection signals (public methods:
# CCNet's KenLM perplexity filter, Wenzek et al. 2020; DSIR hashed-ngram
# importance resampling, Xie et al. 2023). Both train their tiny "model"
# from the corpus' own `lang = 'en'` slice (the clean-reference stand-in)
# and score EVERY document against it.
#
# Cross-engine determinism: per-feature log-probabilities are quantized to
# integer MICRONATS (round(ln(p) * 1e6) AS BIGINT) before any aggregation,
# so the per-document reduction is an exact integer sum — order-independent
# and bit-identical across engines. The ≤1-ulp engine difference in ln()
# (~1e-9 micronats) is absorbed by the rounding grid; the only double ops
# in the output are single correctly-rounded divisions of exact integers
# (the same doctrine as plans.compat's exact-cents aggregation).

_LM_TRAIN_LANG = "en"
_DSIR_B = 1024  # hashed-feature buckets


def _dsir_bucket_spark(f: str) -> str:
    return (
        f"cast(conv(substring(md5(concat('dsir:', {f})), 1, 8), 16, 10)"
        f" as bigint) % {_DSIR_B}"
    )


def _dsir_bucket_sql(f: str) -> str:
    return f"CAST('0x' || substring(md5('dsir:' || {f}), 1, 8) AS BIGINT) % {_DSIR_B}"


_SQL_LANG_BIGRAMS = f"""
  toks AS (SELECT doc_id, lang, {_SQL_TOKS_LIST} AS t FROM documents),
  big AS (
    SELECT doc_id, lang, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
    FROM (SELECT doc_id, lang, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks)
  )
"""


# Per-doc LM cross-entropy CTE chain, shared verbatim by the scoring
# oracle (text_lm_perplexity) and the downstream head/middle/tail
# publishing split (ccnet_perplexity_buckets).
_SQL_LM_PERDOC = f"""
    WITH {_SQL_LANG_BIGRAMS},
    c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt12
      FROM big WHERE lang = '{_LM_TRAIN_LANG}' GROUP BY 1, 2
    ),
    c1 AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS cnt1
      FROM big WHERE lang = '{_LM_TRAIN_LANG}' GROUP BY 1
    ),
    v AS (
      SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vsize
      FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = '{_LM_TRAIN_LANG}')
    ),
    q AS (
      SELECT b.doc_id, b.lang,
             CAST(round(ln(
               CAST(COALESCE(c12.cnt12, 0) + 1 AS DOUBLE)
               / CAST(COALESCE(c1.cnt1, 0) + v.vsize AS DOUBLE)
             ) * 1000000) AS BIGINT) AS qn
      FROM big b
      CROSS JOIN v
      LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      LEFT JOIN c1 ON b.w1 = c1.w1
    ),
    perdoc AS (
      SELECT doc_id, lang,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(-SUM(qn) AS BIGINT) AS ce_micronats,
             round(CAST(-SUM(qn) AS DOUBLE)
                   / CAST(COUNT(*) * 1000000 AS DOUBLE), 6) AS cross_entropy
      FROM q GROUP BY doc_id, lang
    )
"""


@register(
    "text_lm_perplexity",
    oracle=f"""{_SQL_LM_PERDOC}
    SELECT doc_id, lang, n_bigrams, ce_micronats, cross_entropy FROM perdoc
    """,
    tags=("text", "curation", "lm", "pipeline"),
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: an add-one-smoothed bigram LM is
    trained on the `lang = 'en'` slice (the clean-reference corpus) and
    every document is scored by its cross-entropy under that model —
    the classic perplexity filter signal (low = reference-like, high =
    junk). P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V) with context counts
    c(w1) = Σ_w2 c(w1,w2) and V = training vocabulary size.

    Per-bigram log-probs are quantized to integer micronats BEFORE the
    per-doc sum (see module note), so `ce_micronats` is an exact BIGINT
    and `cross_entropy` is one correctly-rounded division of exact
    integers — hash-stable across engines.

    Scale shape: model training is ONE hash aggregate over the
    reference slice's bigram stream; the context counts c(w1) are the
    trained table's own marginal (an aggregate of the small count
    table, not a second shuffle of the stream). V is one
    distinct-count scalar.
    Scoring joins the corpus bigram stream to the two count tables on
    their natural keys — shuffle-hash joins keyed by (w1,w2)/(w1) that
    AQE turns into broadcasts whenever the trained tables fit (they do
    here; at 100 TB the reference slice is curated and small while the
    scored corpus is the big side, which is exactly the build/probe
    orientation this plan declares). One final per-doc hash aggregate.
    No Python in the hot path; short docs (<2 tokens) drop out of the
    bigram stream in both engines identically."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text"))
    toks = docs.select("doc_id", "lang", F.expr(_TOKS).alias("t"))
    big = (
        toks.select(
            "doc_id",
            "lang",
            F.explode(
                F.expr("if(size(t) < 2, array(),"
                " transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2)))")
            ).alias("b"),
        )
        .select("doc_id", "lang", "b.w1", "b.w2")
        .persist()
    )
    train = big.filter(F.col("lang") == _LM_TRAIN_LANG)
    c12 = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("cnt12")
    ).persist()
    # context counts are the bigram table's own marginal — aggregating
    # the (small) trained model instead of re-shuffling the full
    # training bigram stream a second time
    c1 = c12.groupBy("w1").agg(F.sum("cnt12").cast("long").alias("cnt1"))
    vsize = int(
        toks.filter(F.col("lang") == _LM_TRAIN_LANG)
        .select(F.explode("t").alias("tok"))
        .agg(F.count_distinct("tok"))
        .first()[0]
    )
    prob = (F.coalesce(F.col("cnt12"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.coalesce(F.col("cnt1"), F.lit(0)) + F.lit(vsize)
    ).cast("double")
    scored = (
        big.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .select(
            "doc_id",
            "lang",
            F.round(F.log(prob) * F.lit(1000000)).cast("long").alias("qn"),
        )
    )
    agg = scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        (-F.sum("qn")).cast("long").alias("ce_micronats"),
    )
    return agg.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "ce_micronats",
        F.round(
            F.col("ce_micronats").cast("double")
            / (F.col("n_bigrams") * F.lit(1000000)).cast("double"),
            6,
        ).alias("cross_entropy"),
    )


@register(
    "ccnet_perplexity_buckets",
    oracle=f"""{_SQL_LM_PERDOC},
    ranked AS (
      SELECT lang, n_bigrams, ce_micronats, cross_entropy,
             ntile(3) OVER (PARTITION BY lang
                            ORDER BY cross_entropy, doc_id) AS tert
      FROM perdoc
    )
    SELECT lang,
           CASE tert WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
           CAST(SUM(ce_micronats) AS BIGINT) AS ce_total_micronats,
           MAX(cross_entropy) AS max_cross_entropy
    FROM ranked GROUP BY 1, 2
    """,
    tags=("text", "curation", "lm", "pipeline"),
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's publishing step downstream of the perplexity filter: per
    language, documents split into head/middle/tail TERTILES by LM
    cross-entropy (head = most reference-like third) — the bucket a
    document lands in is what the released corpus actually records.
    Tertile assignment is ntile(3) ordered by (cross_entropy, doc_id):
    `cross_entropy` is the hash-stable 6-dp division of exact integers
    from text_lm_perplexity, and doc_id breaks ties, so bucket
    membership is cross-engine deterministic. Output is the per-(lang,
    bucket) audit: doc/bigram counts, exact total cross-entropy in
    micronats, and the bucket's upper boundary (its max cross-entropy —
    the published tertile cutoff).

    Scale shape: everything up to per-doc scores is text_lm_perplexity's
    plan (broadcast-joined count tables, one per-doc aggregate); the
    tertile split adds ONE window over per-doc rows partitioned by lang
    (lang cardinality bounds the skew; at 100 TB this is the classic
    per-language sort CCNet itself shards by), then a tiny final
    aggregate. No Python anywhere."""
    perdoc = text_lm_perplexity(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.asc("cross_entropy"), F.asc("doc_id"))
    ranked = perdoc.select(
        "lang", "n_bigrams", "ce_micronats", "cross_entropy", F.ntile(3).over(w).alias("tert")
    )
    bucket = (
        F.when(F.col("tert") == 1, F.lit("head"))
        .when(F.col("tert") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.groupBy("lang", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("n_bigrams"),
        F.sum("ce_micronats").cast("long").alias("ce_total_micronats"),
        F.max("cross_entropy").alias("max_cross_entropy"),
    )


@register(
    "text_unigram_entropy",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS_LIST} AS t FROM documents),
    cnt AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1, 2
    ),
    per AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
                  AS BIGINT) AS sum_clnc_micro
      FROM cnt GROUP BY 1
    ),
    em AS (
      SELECT t.doc_id,
             CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
             CAST(COALESCE(p.n_distinct, 0) AS BIGINT) AS n_distinct,
             CAST(COALESCE(p.sum_clnc_micro, 0) AS BIGINT) AS sum_clnc_micro,
             CAST(CASE WHEN p.n_tokens IS NULL THEN 0
                  ELSE CAST(round(ln(CAST(p.n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
                       - (p.sum_clnc_micro // p.n_tokens)
             END AS BIGINT) AS entropy_micro
      FROM toks t LEFT JOIN per p USING (doc_id)
    )
    SELECT doc_id, n_tokens, n_distinct, sum_clnc_micro, entropy_micro,
           round(CAST(entropy_micro AS DOUBLE) / 1000000, 6) AS entropy
    FROM em
    """,
    tags=("text", "quality", "entropy", "pipeline"),
)
def text_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy — the information-density
    quality signal (near-zero = degenerate repetition, high = diverse
    vocabulary; used alongside the Gopher repetition flags to drop
    machine-generated boilerplate). H = ln N − (Σ_w c_w·ln c_w)/N with
    every ln quantized to integer micronats first, so `entropy_micro`
    is exact BIGINT arithmetic (the division is integer `div`, which
    truncates toward zero identically in both engines).

    Scale shape: ZERO shuffles — the per-token histogram is computed
    IN-ROW (array_sort → run-length boundaries → fold), so the whole
    query is scan → project with no explode and nothing on the
    network: the per-doc twin of a groupBy(doc, token) that would
    shuffle the entire token stream at 100 TB. The relational oracle
    computes the same histogram via unnest + GROUP BY, proving the
    run-length fold equals the aggregate."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.select("doc_id", F.expr(f"array_sort({_TOKS})").alias("s"))
        .select("doc_id", "s", F.expr("size(s)").alias("n"))
        .select(
            "doc_id",
            "n",
            F.expr(
                "if(n = 0, array(), filter(sequence(0, n - 1),"
                " i -> i = n - 1 or s[i] != s[i + 1]))"
            ).alias("ends"),
        )
        .select(
            "doc_id",
            "n",
            F.expr("size(ends)").alias("n_distinct_i"),
            # the empty-array guard matters: sequence(0, -1) is the
            # DESCENDING [0, -1], so an unguarded transform would probe
            # ends[0] of an empty array (ANSI crash) on empty docs
            F.expr(
                "if(size(ends) = 0, array(),"
                " transform(sequence(0, size(ends) - 1),"
                " j -> if(j = 0, ends[0] + 1, ends[j] - ends[j - 1])))"
            ).alias("counts"),
        )
        .select(
            "doc_id",
            "n",
            "n_distinct_i",
            F.expr(
                "aggregate(counts, cast(0 as bigint), (a, c) ->"
                " a + cast(c as bigint)"
                " * cast(round(ln(cast(c as double)) * 1000000) as bigint))"
            ).alias("sum_clnc_micro"),
        )
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.col("n_distinct_i").cast("long").alias("n_distinct"),
            "sum_clnc_micro",
            F.expr(
                "cast(if(n = 0, 0,"
                " cast(round(ln(cast(n as double)) * 1000000) as bigint)"
                " - (sum_clnc_micro div n)) as bigint)"
            ).alias("entropy_micro"),
        )
        .withColumn(
            "entropy",
            F.round(F.col("entropy_micro").cast("double") / F.lit(1000000.0), 6),
        )
    )


def _dsir_features(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket) hashed unigram+bigram feature stream —
    unigrams ++ bigrams materialize in ONE in-row array (a single
    scan/explode instead of a two-branch union re-reading the corpus).
    Shared by the batch scorer and the streaming ingest scorer."""
    toks = docs.select("doc_id", "lang", F.expr(_TOKS).alias("t"))
    return toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "concat(t, if(size(t) < 2, array(),"
                " transform(sequence(1, size(t) - 1),"
                " i -> concat(t[i-1], ' ', t[i]))))"
            )
        ).alias("f"),
    ).select("doc_id", "lang", F.expr(_dsir_bucket_spark("f")).alias("bucket"))


def _dsir_lr(feat: DataFrame) -> DataFrame:
    """(bucket, lr_micro): the fixed 1024-row DSIR bucket model —
    add-one smoothed ln p_target(bucket) − ln p_raw(bucket), quantized
    to integer micronats. Triggers one action (the totals scalar)."""
    raw = feat.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("cr"))
    tgt = (
        feat.filter(F.col("lang") == _LM_TRAIN_LANG)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )
    totals = feat.agg(
        F.count(F.lit(1)).cast("long").alias("tr"),
        F.count(F.when(F.col("lang") == _LM_TRAIN_LANG, 1)).cast("long").alias("tt"),
    ).first()
    tr, tt = int(totals["tr"]), int(totals["tt"])
    lr_micro = F.round(
        (
            F.log(
                (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double")
                / F.lit(float(tt + _DSIR_B))
            )
            - F.log((F.col("cr") + F.lit(1)).cast("double") / F.lit(float(tr + _DSIR_B)))
        )
        * F.lit(1000000)
    ).cast("long")
    return raw.join(tgt, ["bucket"], "left").select("bucket", lr_micro.alias("lr_micro"))


def _dsir_score(feat: DataFrame, lr: DataFrame) -> DataFrame:
    """Score a feature stream against the (broadcast) bucket model:
    per-doc exact BIGINT micronat sum + the rounded log-weight."""
    return (
        feat.join(F.broadcast(lr), ["bucket"])
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lr_micro").cast("long").alias("dsir_micronats"),
        )
        .select(
            "doc_id",
            "lang",
            "n_feats",
            "dsir_micronats",
            F.round(F.col("dsir_micronats").cast("double") / F.lit(1000000.0), 6).alias(
                "log_weight"
            ),
        )
    )


# DSIR per-doc score SQL — shared verbatim by the batch query and the
# streaming ingest scorer (which computes the identical result one
# micro-batch at a time against the same trained model).
_SQL_DSIR_SCORES = f"""
    WITH {_SQL_LANG_BIGRAMS},
    feat AS (
      SELECT doc_id, lang, {_dsir_bucket_sql('f')} AS bucket
      FROM (
        SELECT doc_id, lang, unnest(t) AS f FROM toks
        UNION ALL
        SELECT doc_id, lang, w1 || ' ' || w2 AS f FROM big
      )
    ),
    raw AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM feat GROUP BY 1),
    tgt AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct
      FROM feat WHERE lang = '{_LM_TRAIN_LANG}' GROUP BY 1
    ),
    totals AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS tr,
             CAST(COUNT(*) FILTER (WHERE lang = '{_LM_TRAIN_LANG}') AS BIGINT) AS tt
      FROM feat
    ),
    lr AS (
      SELECT raw.bucket,
             CAST(round((
               ln(CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE) / CAST(totals.tt + {_DSIR_B} AS DOUBLE))
               - ln(CAST(raw.cr + 1 AS DOUBLE) / CAST(totals.tr + {_DSIR_B} AS DOUBLE))
             ) * 1000000) AS BIGINT) AS lr_micro
      FROM raw CROSS JOIN totals LEFT JOIN tgt ON raw.bucket = tgt.bucket
    )
    SELECT f.doc_id, f.lang,
           CAST(COUNT(*) AS BIGINT) AS n_feats,
           CAST(SUM(lr.lr_micro) AS BIGINT) AS dsir_micronats,
           round(CAST(SUM(lr.lr_micro) AS DOUBLE) / 1000000, 6) AS log_weight
    FROM feat f JOIN lr ON f.bucket = lr.bucket
    GROUP BY f.doc_id, f.lang
"""


@register(
    "dsir_importance_weights",
    oracle=_SQL_DSIR_SCORES,
    tags=("text", "curation", "dsir", "pipeline"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling): hashed-n-gram
    importance weights. Each document's unigrams+bigrams hash into
    1024 buckets (md5 → cross-engine identical); a bag-of-buckets
    unigram model is estimated for the target slice (`lang = 'en'`)
    and for the raw corpus, both add-one smoothed, and a document's
    importance weight is the sum over its features of
    ln p_target(bucket) − ln p_raw(bucket). High weight = looks like
    the target distribution; resampling by this weight is the
    published selection procedure.

    Per-bucket log-ratios quantize to integer micronats, so the
    per-doc sum is exact BIGINT arithmetic (module note) and
    `log_weight` is one correctly-rounded division.

    Scale shape: the bucket tables are fixed 1024-row artifacts
    however big the corpus is — the defining trick of DSIR — so the
    scoring join is ALWAYS a broadcast; the two bucket aggregates are
    the only corpus-sized shuffles, and the final per-doc aggregate
    re-uses the feature stream. No Python in the hot path."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text"))
    feat = _dsir_features(docs).localCheckpoint(eager=True)
    return _dsir_score(feat, _dsir_lr(feat))


@register(
    "nb_lang_classifier",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, {_SQL_TOKS_LIST} AS t FROM documents),
    feat AS (
      SELECT doc_id, lang,
             CAST('0x' || substring(md5('nb:' || f), 1, 8) AS BIGINT) % {_DSIR_B} AS bucket
      FROM (SELECT doc_id, lang, unnest(t) AS f FROM toks)
    ),
    ndb AS (
      SELECT doc_id, lang AS true_lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_db
      FROM feat GROUP BY 1, 2, 3
    ),
    clb AS (
      SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS c_lb FROM feat GROUP BY 1, 2
    ),
    tl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS t_l FROM feat GROUP BY 1),
    dl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS d_l FROM documents GROUP BY 1),
    d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    model AS (
      SELECT tl.lang,
             CAST(round(ln(CAST(dl.d_l AS DOUBLE) / CAST(d.n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS prior_micro,
             CAST(round(ln(CAST(tl.t_l + {_DSIR_B} AS DOUBLE)) * 1000000) AS BIGINT) AS tnorm_micro
      FROM tl JOIN dl ON tl.lang = dl.lang CROSS JOIN d
    ),
    qlb AS (
      SELECT lang, bucket,
             CAST(round(ln(CAST(c_lb + 1 AS DOUBLE)) * 1000000) AS BIGINT) AS q_lb
      FROM clb
    ),
    scores AS (
      SELECT ndb.doc_id, ndb.true_lang, m.lang AS cand_lang,
             CAST(ANY_VALUE(m.prior_micro)
                  - CAST(SUM(ndb.n_db) AS BIGINT) * ANY_VALUE(m.tnorm_micro)
                  + CAST(SUM(ndb.n_db * COALESCE(qlb.q_lb, 0)) AS BIGINT) AS BIGINT) AS score_micro
      FROM ndb
      CROSS JOIN model m
      LEFT JOIN qlb ON qlb.lang = m.lang AND qlb.bucket = ndb.bucket
      GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT doc_id, true_lang, cand_lang,
             row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, cand_lang) AS rk
      FROM scores
    ),
    agg AS (
      SELECT true_lang, cand_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(score_micro) AS BIGINT) AS sum_score_micro
      FROM scores GROUP BY 1, 2
    ),
    top1 AS (
      SELECT true_lang, cand_lang, CAST(COUNT(*) AS BIGINT) AS n_top1
      FROM pred WHERE rk = 1 GROUP BY 1, 2
    )
    SELECT agg.true_lang, agg.cand_lang, agg.n_docs, agg.sum_score_micro,
           CAST(COALESCE(top1.n_top1, 0) AS BIGINT) AS n_top1
    FROM agg LEFT JOIN top1
      ON agg.true_lang = top1.true_lang AND agg.cand_lang = top1.cand_lang
    """,
    tags=("text", "curation", "ml", "classifier", "pipeline"),
)
def nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned document classifier — the fastText-style model-based
    filter of LLM curation pipelines, here a multinomial Naive Bayes
    over hashed unigram buckets, trained on the corpus' own language
    labels and read out as the full |langs|² score matrix — exact
    per-(true, candidate) posterior sums plus the argmax confusion
    counts (the learned counterpart of the stopword-heuristic
    `lang_id_confusion`). The synthetic corpus draws text i.i.d.
    regardless of `lang` (max per-token lift ≈ 1.2), so the argmax
    column honestly collapses to the majority class; the score matrix
    is the non-degenerate verification surface — 25 distinct exact
    integers that any scoring/smoothing/hashing slip would move.

    score(d, l) = ln P(l) + Σ_b n_db·ln(c_lb + 1) − N_d·ln(T_l + B)
    — the add-one NB log-posterior DECOMPOSED so unseen (lang, bucket)
    pairs contribute exactly ln(0+1) = 0 and no lang×bucket grid is
    ever materialized. Every ln is quantized to integer micronats
    before use, so scores are exact BIGINT sums/products and the
    argmax (ties → lexicographically first language) is cross-engine
    deterministic.

    Scale shape: the model is |langs| prior rows plus ≤ |langs|×1024
    likelihood rows — fixed-size broadcasts regardless of corpus size.
    ONE corpus-sized shuffle total: the feature stream is hash-
    partitioned by doc_id up front, and because HashPartitioning on a
    SUBSET of the grouping keys satisfies ClusteredDistribution, the
    per-doc bucket histogram, the per-candidate score aggregate AND
    the argmax window all reuse that single exchange shuffle-free.
    The likelihood (clb) and evidence-mass (tl) model stats roll up
    from the persisted ndb PARTIAL — ≤1024 rows per doc-lang — never
    re-aggregating raw features; candidate expansion is an in-row
    explode of the literal language list (|langs|× row growth, NO
    join-based cross product)."""
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text"))
    toks = docs.select("doc_id", "lang", F.expr(_TOKS).alias("t"))
    feat = toks.select("doc_id", "lang", F.explode("t").alias("f")).select(
        "doc_id",
        "lang",
        F.expr(
            f"cast(conv(substring(md5(concat('nb:', f)), 1, 8), 16, 10) as bigint)"
            f" % {_DSIR_B}"
        ).alias("bucket"),
    )
    # eager localCheckpoint (house pattern, cf. kmeans_embeddings):
    # ndb is referenced by scoring AND both model stats — checkpointing
    # cuts the shared lineage so the raw-token explode runs exactly
    # once, and LogicalRDD preserves the doc_id HashPartitioning for
    # the downstream distribution reuse.
    ndb = (
        feat.repartition("doc_id")
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_db"))
        .localCheckpoint(eager=True)
    )
    # model stats fold the ndb partial (Σ n_db ≡ COUNT(*) over feat) —
    # these shuffles move ≤1024 rows per (doc, lang), not raw tokens
    clb = (
        ndb.groupBy(F.col("true_lang").alias("lang"), "bucket")
        .agg(F.sum("n_db").cast("long").alias("c_lb"))
    )
    tl = ndb.groupBy(F.col("true_lang").alias("lang")).agg(
        F.sum("n_db").cast("long").alias("t_l")
    )
    dl = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("d_l"))
    n_docs = docs.count()
    model = tl.join(dl, ["lang"]).select(
        "lang",
        F.round(F.log(F.col("d_l").cast("double") / F.lit(float(n_docs))) * F.lit(1000000))
        .cast("long")
        .alias("prior_micro"),
        F.round(F.log((F.col("t_l") + F.lit(_DSIR_B)).cast("double")) * F.lit(1000000))
        .cast("long")
        .alias("tnorm_micro"),
    )
    qlb = clb.select(
        "lang",
        "bucket",
        F.round(F.log((F.col("c_lb") + F.lit(1)).cast("double")) * F.lit(1000000))
        .cast("long")
        .alias("q_lb"),
    )
    langs = [r["lang"] for r in sorted(model.select("lang").collect(), key=lambda r: r["lang"])]
    cand = ndb.select(
        "doc_id",
        "true_lang",
        "bucket",
        "n_db",
        F.explode(F.array(*[F.lit(lg) for lg in langs])).alias("cand_lang"),
    )
    scores = (
        cand.join(
            F.broadcast(qlb.withColumnRenamed("lang", "cand_lang")),
            ["cand_lang", "bucket"],
            "left",
        )
        .join(F.broadcast(model.withColumnRenamed("lang", "cand_lang")), ["cand_lang"])
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(
            (
                F.first("prior_micro")
                - F.sum("n_db").cast("long") * F.first("tnorm_micro")
                + F.sum(F.col("n_db") * F.coalesce(F.col("q_lb"), F.lit(0))).cast("long")
            )
            .cast("long")
            .alias("score_micro")
        )
    )
    # scores feeds the confusion aggregate and the argmax window —
    # checkpoint (doc×|langs| rows) so neither re-runs the scoring join
    scores = scores.localCheckpoint(eager=True)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("cand_lang"))
    top1 = (
        scores.select(
            "doc_id", "true_lang", "cand_lang", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") == 1)
        .groupBy("true_lang", "cand_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_top1"))
    )
    agg = scores.groupBy("true_lang", "cand_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("score_micro").cast("long").alias("sum_score_micro"),
    )
    return agg.join(F.broadcast(top1), ["true_lang", "cand_lang"], "left").select(
        "true_lang",
        "cand_lang",
        "n_docs",
        "sum_score_micro",
        F.coalesce(F.col("n_top1"), F.lit(0)).cast("long").alias("n_top1"),
    )


# ---------------------------------------------------------------------------
# training-sequence packing (concat-and-chunk audit)
# ---------------------------------------------------------------------------

_PACK_C = 256  # context length in whitespace tokens


@register(
    "pack_concat_chunks",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, len({_SQL_TOKS_LIST}) AS n FROM documents
    ),
    c AS (
      SELECT source, doc_id, n,
             CAST(COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cb
      FROM d WHERE n > 0
    ),
    x AS (
      SELECT source, doc_id, n, cb,
             cb // {_PACK_C} AS c0, (cb + n - 1) // {_PACK_C} AS c1
      FROM c
    ),
    e AS (
      SELECT source, doc_id, n, cb, u.chunk_id
      FROM x, UNNEST(generate_series(x.c0, x.c1)) AS u(chunk_id)
    )
    SELECT source, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN cb >= chunk_id * {_PACK_C} THEN 1 END) AS BIGINT)
             AS n_starts,
           CAST(SUM(LEAST((chunk_id + 1) * {_PACK_C}, cb + n)
                    - GREATEST(chunk_id * {_PACK_C}, cb)) AS BIGINT) AS n_tokens
    FROM e GROUP BY source, chunk_id
    """,
    tags=("text", "packing", "pipeline"),
)
def pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing audit, concat-and-chunk form (the GPT
    data-loader default: concatenate documents in a fixed order, slice
    the token stream into context-length chunks): per (source, chunk)
    — how many documents it touches, how many START in it, and its
    token fill (== context length everywhere but each source's tail
    chunk). The boundary-crossing count is the quantity attention-mask
    / best-fit packing papers optimize against; this query is the
    audit that measures it.

    Exactness: token offsets are pure BIGINT prefix sums; a doc's
    chunk span [cb // C, (cb+n-1) // C] and per-chunk overlap use only
    integer floor division — both engines agree bit-for-bit.

    Scale shape: one prefix-sum window PARTITIONED BY source (each
    source's stream packs independently — at 100 TB the packing key
    widens to (source, shard) so no partition's running sum is
    unbounded), one explode of at most (n // C + 1) chunk rows per
    doc, one hash aggregate on (source, chunk). The window and the
    aggregate share the source key, so the agg reuses the window's
    shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    d = docs.select(
        "doc_id", "source", F.expr(f"size({_TOKS})").cast("long").alias("n")
    ).filter(F.col("n") > 0)
    wv = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn("cb", F.coalesce(F.sum("n").over(wv), F.lit(0)))
    x = c.select(
        "source",
        "doc_id",
        "n",
        "cb",
        F.expr(f"cb div {_PACK_C}").alias("c0"),
        F.expr(f"(cb + n - 1) div {_PACK_C}").alias("c1"),
    )
    e = x.select(
        "source", "n", "cb", F.explode(F.expr("sequence(c0, c1)")).alias("chunk_id")
    )
    return e.groupBy("source", "chunk_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(F.when(F.col("cb") >= F.col("chunk_id") * _PACK_C, 1))
        .cast("long")
        .alias("n_starts"),
        F.sum(
            F.least(
                (F.col("chunk_id") + 1) * _PACK_C, F.col("cb") + F.col("n")
            )
            - F.greatest(F.col("chunk_id") * _PACK_C, F.col("cb"))
        )
        .cast("long")
        .alias("n_tokens"),
    )


_VOCAB_SIZES = (100, 1000, 10000)


@register(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks WHERE token <> '' GROUP BY token
    ),
    ranked AS (
      SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rnk,
             CAST(SUM(cnt) OVER () AS BIGINT) AS total_occ,
             CAST(COUNT(*) OVER () AS BIGINT) AS total_types
      FROM counts
    ),
    sizes AS (SELECT unnest({list(_VOCAB_SIZES)}) AS vocab_size)
    SELECT s.vocab_size,
           CAST(SUM(CASE WHEN r.rnk <= s.vocab_size THEN r.cnt ELSE 0 END)
                AS BIGINT) AS covered_occ,
           MAX(r.total_occ) AS total_occ,
           round(CAST(SUM(CASE WHEN r.rnk <= s.vocab_size THEN r.cnt ELSE 0 END)
                 AS DOUBLE) / MAX(r.total_occ), 6) AS coverage,
           round(1.0 - CAST(SUM(CASE WHEN r.rnk <= s.vocab_size
                 THEN r.cnt ELSE 0 END) AS DOUBLE) / MAX(r.total_occ), 6)
             AS oov_rate,
           MAX(r.total_types) AS total_types
    FROM ranked r JOIN sizes s ON TRUE
    GROUP BY s.vocab_size
    """,
    tags=("text", "tokenizer", "vocab", "pipeline"),
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-size sizing curve for tokenizer design: for each
    candidate vocab size k, the fraction of token OCCURRENCES a top-k
    frequency vocab covers and the residual OOV mass — the curve that
    answers "how large must the vocabulary be" before BPE training
    commits to one (vocab_top_tokens is the k=100 slice; this ranks
    the full type distribution once and evaluates every k in the same
    pass). Counts are exact integers; coverage is one rounded
    division.

    Scale shape: one token hash-aggregate with map-side partials (the
    expensive, data-sized step) → the type-distribution rank via
    io.two_phase_rank (r7: a raw web-scale type table is NOT small —
    junk tokens push |types| toward 1e8-1e9, too big for the r6
    single-partition rank; the distributed rank's only global window
    is its #partitions-row offset table) → 1-row totals and the 3-row
    size spine ride as broadcasts. At 100 TB only the first aggregate
    touches the corpus."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("total_occ"),
        F.count(F.lit(1)).cast("long").alias("total_types"),
    )
    ranked = two_phase_rank(
        counts, [F.col("cnt").desc(), F.col("token").asc()], rank_name="rnk"
    ).join(F.broadcast(totals))
    sizes = spark.createDataFrame(
        [(k,) for k in _VOCAB_SIZES], "vocab_size long"
    )
    covered = F.sum(
        F.when(F.col("rnk") <= F.col("vocab_size"), F.col("cnt")).otherwise(0)
    ).cast("long")
    return (
        ranked.join(F.broadcast(sizes))
        .groupBy("vocab_size")
        .agg(
            covered.alias("covered_occ"),
            F.max("total_occ").alias("total_occ"),
            F.round(covered.cast("double") / F.max("total_occ"), 6).alias("coverage"),
            F.round(
                F.lit(1.0) - covered.cast("double") / F.max("total_occ"), 6
            ).alias("oov_rate"),
            F.max("total_types").alias("total_types"),
        )
    )


# ---------------------------------------------------------------------------
# Mojibake repair (ftfy-style UTF-8/CP1252 double-encoding fix)
# ---------------------------------------------------------------------------

# The classic web-corpus corruption: UTF-8 bytes decoded as CP1252
# ("é" -> "Ã©", "€" -> "â‚¬", "—" -> "â€”"). The repair table is DERIVED
# from the encoding law itself at import time — good.encode('utf-8')
# .decode('cp1252') — and pinned by tests/test_properties.py, so the
# chained-replace chains below cannot drift from the real mapping.
# (Characters whose UTF-8 bytes hit CP1252's five undefined slots, and
# the invisible NBSP/soft-hyphen cases, are deliberately excluded.)
_MOJI_GOODS = "éèêâçôîûùüöäñóáú°«»€–—…"
# goods that appear INSIDE other goods' mojibake forms must corrupt
# first (â and € lead every trigraph; » sits inside û's digraph), so a
# single forward pass is exactly inverted by a single repair pass
_MOJI_CORRUPT_ORDER = "â€«»°" + "".join(
    g for g in _MOJI_GOODS if g not in "â€«»°"
)
_MOJI_PAIRS = [
    (g, g.encode("utf-8").decode("cp1252")) for g in _MOJI_CORRUPT_ORDER
]


def _moji_chain(col: str, pairs) -> str:
    out = col
    for a, b in pairs:
        out = f"replace({out}, '{a}', '{b}')"
    return out


# corrupt: good -> bad in nesting-safe order; repair: bad -> good,
# longest bads first so trigraphs never lose their tail to a digraph
_MOJI_CORRUPT_SQL = _moji_chain("expected", _MOJI_PAIRS)
_MOJI_REPAIR_SQL = _moji_chain(
    "corrupted",
    [(b, g) for g, b in sorted(_MOJI_PAIRS, key=lambda p: -len(p[1]))],
)
_MOJI_SUFFIX = " – café ôté «№» for €42…".replace("№", "n°")


@register(
    "text_mojibake_repair",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             doc_id % 7 = 3 AS planted,
             CASE WHEN doc_id % 7 = 3 THEN text || '{_MOJI_SUFFIX}'
                  ELSE text END AS expected
      FROM documents
    ),
    c AS (
      SELECT doc_id, planted, expected,
             CASE WHEN planted THEN {_MOJI_CORRUPT_SQL}
                  ELSE expected END AS corrupted
      FROM base
    ),
    r AS (
      SELECT doc_id, planted, expected, corrupted,
             {_MOJI_REPAIR_SQL} AS repaired
      FROM c
    )
    SELECT doc_id, planted,
           corrupted <> repaired AS mojibake_detected,
           repaired = expected AS repaired_ok,
           CAST(length(corrupted) - length(repaired) AS BIGINT)
             AS n_chars_collapsed
    FROM r
    """,
    tags=("text", "quality", "encoding", "pipeline"),
)
def text_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ftfy-style mojibake repair: undo the UTF-8-decoded-as-CP1252
    double encoding ('Ã©' -> 'é', 'â‚¬' -> '€', 'â€”' -> '—') with a
    table-driven chained replace whose table is computed from the
    encoding law itself. The corpus is ASCII, so a deterministic slice
    (doc_id % 7 = 3) gets a unicode suffix planted and forward-
    corrupted in-query; repair must invert it exactly (repaired_ok),
    while clean docs must pass through untouched (mojibake_detected
    false, 0 chars collapsed) — the one-sided-repair contract a real
    ingest pipeline needs before dedup/fingerprinting (mojibake splits
    otherwise-identical documents into distinct hash buckets).

    Scale shape: ZERO shuffles — one scan, per-row codegen string
    replaces, no Python, no state; the repair chain is ~23 literal
    replaces that Catalyst folds into one whole-stage-codegen pass.
    Spark and DuckDB execute the IDENTICAL expression strings, so
    parity is by construction; semantics are pinned to the real
    encoding law by tests/test_properties.py."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        "doc_id",
        F.expr("doc_id % 7 = 3").alias("planted"),
        F.expr(
            f"CASE WHEN doc_id % 7 = 3 THEN text || '{_MOJI_SUFFIX}'"
            " ELSE text END"
        ).alias("expected"),
    )
    c = base.select(
        "doc_id",
        "planted",
        "expected",
        F.expr(
            f"CASE WHEN planted THEN {_MOJI_CORRUPT_SQL} ELSE expected END"
        ).alias("corrupted"),
    )
    r = c.select(
        "doc_id",
        "planted",
        "expected",
        "corrupted",
        F.expr(_MOJI_REPAIR_SQL).alias("repaired"),
    )
    return r.select(
        "doc_id",
        "planted",
        (F.col("corrupted") != F.col("repaired")).alias("mojibake_detected"),
        (F.col("repaired") == F.col("expected")).alias("repaired_ok"),
        (F.length("corrupted") - F.length("repaired"))
        .cast("long")
        .alias("n_chars_collapsed"),
    )
