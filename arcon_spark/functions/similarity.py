"""Similarity search over embedding columns.

Beyond-reference operator set (the reference has no vector support):
approximate-nearest-neighbor over `embeddings.embedding`
(array<float>, 64-dim in the test corpus).

- ann_bruteforce_topk — exact cosine top-k per query vector; the
  correctness baseline and the oracle-checked query.
- ann_lsh_bucketed    — random-hyperplane LSH variant: sign-bit
  signature → bucket join → exact re-rank within buckets. The 100 TB
  scale path: candidates come from one shuffle on the signature, and
  the quadratic pair space is never materialized.

Determinism: dot products use integer-scaled components (float32 is
exact at 1e7) so they are exact longs, order-independent, identical in
Spark and DuckDB; the only float ops are one sqrt and one division per
pair (correctly rounded, engine-identical). Top-k ordering tie-breaks
on candidate id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcon_spark.io import load_table
from arcon_spark.plans.registry import register

_SCALE = 10_000_000
TOP_K = 5
_QUERY_MOD = 50  # vec_id % 50 == 0 → query set

_INT_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) ->"
    f" cast(round(cast(x as double) * {_SCALE}.0) as bigint)"
    f" * cast(round(cast(y as double) * {_SCALE}.0) as bigint)),"
    " 0L, (acc, v) -> acc + v)"
)


def _sql_int_dot(a: str, b: str) -> str:
    return (
        f"SUM(CAST(round(CAST({a}[u.i] AS DOUBLE) * {_SCALE}.0) AS BIGINT)"
        f" * CAST(round(CAST({b}[u.i] AS DOUBLE) * {_SCALE}.0) AS BIGINT))"
    )


def _with_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.withColumn("n2", F.expr(_INT_DOT.format(a="embedding", b="embedding")))


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH nrm AS (
      SELECT e.vec_id, e.embedding, {_sql_int_dot('e.embedding', 'e.embedding')} AS n2
      FROM embeddings e, UNNEST(generate_series(1, len(e.embedding))) AS u(i)
      GROUP BY e.vec_id, e.embedding
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
             {_sql_int_dot('q.embedding', 'c.embedding')} AS d,
             MAX(q.n2) AS qn2, MAX(c.n2) AS cn2
      FROM nrm q JOIN nrm c ON q.vec_id % {_QUERY_MOD} = 0 AND c.vec_id <> q.vec_id,
           UNNEST(generate_series(1, len(q.embedding))) AS u(i)
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, candidate_id,
             CAST(d AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS cosine,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY CAST(d AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) DESC,
                        candidate_id) AS rn
      FROM pairs
    )
    SELECT query_id, candidate_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= {TOP_K}
    """,
    tags=("similarity", "ann"),
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: query subset (vec_id % 50 == 0) ×
    all candidates. Plan: the query side is tiny → broadcast it; the
    candidate side streams through one pass — per-row array math in
    codegen, then a per-query top-k (WindowGroupLimit pushes the k-limit
    below the shuffle). Exact integer dots → deterministic ranking."""
    nrm = _with_norm(spark, sf_dir)
    q = nrm.filter((F.col("vec_id") % _QUERY_MOD) == 0).alias("q")
    c = nrm.alias("c")
    dot = F.expr(_INT_DOT.format(a="q.embedding", b="c.embedding"))
    cos = dot.cast("double") / (
        F.sqrt(F.col("q.n2").cast("double")) * F.sqrt(F.col("c.n2").cast("double"))
    )
    pairs = (
        F.broadcast(q)
        .join(c, F.col("c.vec_id") != F.col("q.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("candidate_id"),
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("candidate_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
    )


_N_PLANES = 8
# Deterministic pseudo-random hyperplanes without external RNG: plane p,
# dimension i gets weight in {-1,+1} from bit parity of md5(f"{p}:{i}").
# Signature bit p = sign(sum_i w[p][i] * x[i]).
_PLANE_BIT = (
    "transform(sequence(0, {planes} - 1), p -> "
    " if(aggregate(zip_with(embedding,"
    "              transform(sequence(0, size(embedding) - 1),"
    "                        i -> if((instr('0123456789abcdef',"
    "                                       substring(md5(concat(cast(p as string), ':', cast(i as string))), 1, 1)) - 1) % 2 = 0,"
    "                                1.0D, -1.0D)),"
    "              (x, w) -> cast(round(x * {scale}) as bigint) * cast(w as bigint)),"
    "      0L, (acc, v) -> acc + v) > 0, '1', '0'))"
)


@register(
    "ann_lsh_bucketed",
    oracle=None,  # approximate recall by construction → rows-only check
    tags=("similarity", "ann", "lsh"),
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 8 sign bits (md5-derived ±1
    hyperplanes — deterministic, no RNG state to ship to executors) →
    bucket join on the signature → exact integer-cosine re-rank within
    buckets → top-k per query. One shuffle on the 8-bit signature;
    candidate sets are bucket-local. Approximate (recall < 1), so the
    driver records the rows-only check; tests/test_similarity.py
    asserts recall against ann_bruteforce_topk."""
    sig_expr = F.array_join(
        F.expr(_PLANE_BIT.format(planes=_N_PLANES, scale=_SCALE)), ""
    ).alias("sig")
    nrm = _with_norm(spark, sf_dir).withColumn("sig", sig_expr)
    q = nrm.filter((F.col("vec_id") % _QUERY_MOD) == 0).alias("q")
    c = nrm.alias("c")
    dot = F.expr(_INT_DOT.format(a="q.embedding", b="c.embedding"))
    cos = dot.cast("double") / (
        F.sqrt(F.col("q.n2").cast("double")) * F.sqrt(F.col("c.n2").cast("double"))
    )
    pairs = (
        q.join(
            c,
            (F.col("q.sig") == F.col("c.sig"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("candidate_id"),
            cos.alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("candidate_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
    )


@register(
    "knn_label_majority",
    oracle=f"""
    WITH nrm AS (
      SELECT e.vec_id, e.embedding, e.label, {_sql_int_dot('e.embedding', 'e.embedding')} AS n2
      FROM embeddings e, UNNEST(generate_series(1, len(e.embedding))) AS u(i)
      GROUP BY e.vec_id, e.embedding, e.label
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS candidate_id, MAX(c.label) AS clabel,
             {_sql_int_dot('q.embedding', 'c.embedding')} AS d,
             MAX(q.n2) AS qn2, MAX(c.n2) AS cn2
      FROM nrm q JOIN nrm c ON q.vec_id % {_QUERY_MOD} = 0 AND c.vec_id <> q.vec_id,
           UNNEST(generate_series(1, len(q.embedding))) AS u(i)
      GROUP BY 1, 2
    ),
    topk AS (
      SELECT query_id, candidate_id, clabel
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY CAST(d AS DOUBLE) / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) DESC,
                       candidate_id) AS rn
            FROM pairs) t
      WHERE rn <= {TOP_K}
    )
    SELECT query_id, CAST(clabel AS INTEGER) AS knn_label
    FROM (SELECT query_id, clabel,
                 row_number() OVER (PARTITION BY query_id ORDER BY count(*) DESC, clabel) AS rv
          FROM topk GROUP BY query_id, clabel) t
    WHERE rv = 1
    """,
    tags=("similarity", "knn"),
)
def knn_label_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label vote on top of the exact top-k: majority label among
    the 5 nearest neighbors (tie → smaller label). Demonstrates
    similarity search composing with downstream relational ops."""
    nrm = _with_norm(spark, sf_dir).join(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "label"), "vec_id"
    )
    q = nrm.filter((F.col("vec_id") % _QUERY_MOD) == 0).alias("q")
    c = nrm.alias("c")
    dot = F.expr(_INT_DOT.format(a="q.embedding", b="c.embedding"))
    cos = dot.cast("double") / (
        F.sqrt(F.col("q.n2").cast("double")) * F.sqrt(F.col("c.n2").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("candidate_id"))
    topk = (
        F.broadcast(q)
        .join(c, F.col("c.vec_id") != F.col("q.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("candidate_id"),
            F.col("c.label").alias("clabel"),
            cos.alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
    )
    votes = topk.groupBy("query_id", "clabel").agg(F.count(F.lit(1)).alias("cnt"))
    wv = Window.partitionBy("query_id").orderBy(F.desc("cnt"), F.asc("clabel"))
    return (
        votes.withColumn("rv", F.row_number().over(wv))
        .filter(F.col("rv") == 1)
        .select("query_id", F.col("clabel").cast("int").alias("knn_label"))
    )
