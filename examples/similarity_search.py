"""Similarity-search index progression — one corpus, five search
strategies, measured recall against exact truth:

    brute force     exact cosine top-k           (the truth)
    LSH             sign-bit buckets + re-rank   (1 shuffle)
    IVF             coarse cells, nprobe=2       (cell-bounded pairs)
    PQ/ADC          4-byte codes, table lookups  (compressed scan)
    IVF-PQ          cells + ADC                  (the FAISS shape)

Every strategy is a registered, oracle-checked operator
(arcon_spark.functions.similarity); this file only runs them
side-by-side and prints per-strategy recall@5 — the evaluation a
vector-serving team runs before picking an index.

Recall numbers are corpus-dependent: the synthetic embeddings are
near-random, the hardest case for locality structures — real text
embeddings cluster and recall rises sharply. sf0.001's 15-vector
corpus is too small to bucket at all; default is sf0.01.

Run: python examples/similarity_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcon_spark import get_spark
from arcon_spark.functions.similarity import (
    ann_bruteforce_topk,
    ann_ivf_pq_topk,
    ann_ivf_topk,
    ann_lsh_bucketed,
    ann_pq_adc_topk,
    hard_negative_mining,
    hybrid_search_rrf,
    matryoshka_recall_audit,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("similarity_search_example")

    truth = {
        (r.query_id, r.candidate_id)
        for r in ann_bruteforce_topk(spark, sf_dir).collect()
    }
    print(f"queries x k = {len(truth)} truth pairs (exact cosine)")

    strategies = {
        "lsh": ann_lsh_bucketed,
        "ivf": ann_ivf_topk,
        "pq_adc": ann_pq_adc_topk,
        "ivf_pq": ann_ivf_pq_topk,
    }
    for name, fn in strategies.items():
        got = {(r.query_id, r.candidate_id) for r in fn(spark, sf_dir).collect()}
        hits = len(got & truth)
        print(f"{name:>8}: recall@5 = {hits}/{len(truth)} = {hits / len(truth):.2f}")

    mrl = matryoshka_recall_audit(spark, sf_dir).collect()
    kept = sum(r.n_overlap for r in mrl)
    total = sum(r.k for r in mrl)
    print(f"matryoshka 16/64-dim prefix: overlap@5 = {kept}/{total} = {kept / total:.2f}")

    # serving + training composition on the same corpus: hybrid
    # lexical+vector fusion, and contrastive hard negatives
    fused = hybrid_search_rrf(spark, sf_dir).collect()
    both = sum(1 for r in fused if r.r_lex is not None and r.r_vec is not None)
    print(
        f"hybrid RRF top-{len(fused)}: {both} docs ranked by both lists,"
        f" {len(fused) - both} by one"
    )
    neg = hard_negative_mining(spark, sf_dir).collect()
    print(
        f"hard negatives: {len(neg)} pairs across"
        f" {len({r.query_id for r in neg})} queries,"
        f" hardest cosine {max(r.cosine for r in neg):.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
