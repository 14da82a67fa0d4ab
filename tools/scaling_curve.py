"""Measure the sf0.1 -> sf1 scaling curve for the heaviest operator
families (VERDICT r7 #2: convert SCALE.md's plan-shape arguments into
measurements).

Usage:
    python tools/scaling_curve.py [SF01_DIR SF1_DIR [OUT_JSON]]

For each query: min-of-N wall time at both scale factors through the
noop sink (bench.py's protocol: no driver collect, cache cleared
between runs, warmed JVM/Python/streaming paths), then

    exponent = log10(t_sf1 / t_sf01)        (factor is 10x)

EXPECTED is the query's theoretical exponent from its plan shape:
~1 for linear scans/aggregates/banded LSH (sub-linear readings happen
when fixed session/stage overhead dominates the sf0.1 run), ~2 for the
EXACT pairwise kernels, whose FLOPs are O(n^2) no matter how they are
tiled — their registered sub-quadratic production variants (IVF, LSH,
cluster-scoped) are in the list too, which is the actual 100 TB claim
being tested. A measured exponent materially ABOVE expected is a scale
defect; at-or-below confirms the plan-shape argument.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, expected exponent, passes at sf1)
QUERIES = [
    # two_phase_rank consumers (linear: range exchange + pid windows)
    ("tokenizer_vocab_coverage", 1.0, 2),
    ("rfm_customer_segments", 1.0, 2),
    ("histogram_equidepth_value", 1.0, 2),
    # hash-agg / sketch (linear)
    ("dedup_exact", 1.0, 2),
    ("cms_token_counts", 1.0, 2),
    # banded/bucketed LSH (linear in docs at constant dup rate)
    ("dedup_minhash_lsh_pairs", 1.0, 2),
    ("dedup_weighted_minhash", 1.0, 2),
    # O(log n) star contraction over ~linear edge count
    ("dedup_cc_star_contraction", 1.15, 2),
    # IVF scale paths (sub-quadratic by branch-and-bound / fixed probes)
    ("bitext_margin_mining_ivf", 1.5, 2),
    ("ann_ivf_pq_topk", 1.0, 2),
    # EXACT pairwise kernels (documented O(n^2); tiles bound memory,
    # not total FLOPs — their production variants are the rows above)
    ("dedup_embedding_cosine", 2.0, 1),
    ("semdedup_embeddings", 2.0, 1),
    ("ts_similarity_topk", 2.0, 1),
    # streaming ingestion-time dedup (per-batch probe, linear + floor)
    ("stream_incremental_dedup", 1.0, 1),
]


def _warmup(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from arcon_spark.io import load_table

    load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").count().write.format(
        "noop"
    ).mode("overwrite").save()

    def _ident(it):
        yield from it

    spark.range(0, 64, 1, spark.sparkContext.defaultParallelism).mapInPandas(
        _ident, "id long"
    ).write.format("noop").mode("overwrite").save()


def main() -> int:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "scaling_curve_result.json"

    from arcon_spark.session import get_spark
    from arcon_spark.plans.registry import queries

    spark = get_spark("scaling_curve")
    qmap = queries()

    def run(name: str, sf_dir: str, passes: int) -> float:
        best = math.inf
        for _ in range(passes):
            spark.catalog.clearCache()
            t0 = time.time()
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 2)

    results = {}
    for sf_dir, key in ((sf01, "t_sf01"), (sf1, "t_sf1")):
        _warmup(spark, sf_dir)
        for name, expected, sf1_passes in QUERIES:
            passes = sf1_passes if key == "t_sf1" else 2
            t = run(name, sf_dir, passes)
            results.setdefault(name, {"expected": expected})[key] = t
            print(f"{key:7s} {name:32s} {t:8.2f}s", flush=True)

    for name, r in results.items():
        r["ratio"] = round(r["t_sf1"] / max(r["t_sf01"], 1e-9), 2)
        r["exponent"] = round(math.log10(max(r["ratio"], 1e-9)), 2)
        r["verdict"] = (
            "ok" if r["exponent"] <= r["expected"] + 0.15 else "SUPER-LINEAR"
        )

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)
    bad = [n for n, r in results.items() if r["verdict"] != "ok"]
    print(f"\n{len(results) - len(bad)} ok, {len(bad)} above expected: {bad}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
