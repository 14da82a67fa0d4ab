"""Differentially-private dataset-card release — compose the DP suite
into the dataset-card report a corpus publisher ships:

    documents
      → per-domain counts      (Laplace eps=1, parallel composition)
      → mean length            (clip at 256 + two half-budget draws)
      → length histogram       (fixed spine, empty buckets published)
      → median length          (exponential mechanism via Gumbel-max)

Every number below is reproducible: the noise is md5-seeded from the
release key, so re-running the release — on this engine or on the
DuckDB oracle — yields byte-identical values (the property the
per-query oracles hash-check). Budget accounting: the four releases
read the same documents, so they compose SEQUENTIALLY — this card
costs eps = 4 total (each internal table is itself eps = 1 thanks to
parallel composition over its disjoint cells).

WARNING — the determinism that makes these queries oracle-checkable
also voids the privacy guarantee as written: the noise is derived
from md5 of fully PUBLIC release keys (e.g. 'dpc:'||lang||'|'||
source), so anyone can recompute the noise and subtract it,
recovering the exact counts. A real release MUST seed the noise from
a secret (a random per-release seed folded into the md5 key, kept
off the published card). The mechanisms (sensitivity analysis,
clipping, budget composition, Gumbel-max exponential mechanism) are
the real thing; only the seed-handling here is a cross-engine parity
device, not shippable privacy.

Run: python examples/private_stats_release.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcon_spark.functions.curation import (
    dp_clipped_mean_chars,
    dp_length_histogram,
    dp_median_chars,
    dp_noisy_domain_counts,
)
from arcon_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("private-stats-release")

    print("== per-(lang, source) noisy counts (eps=1, parallel) ==")
    dp_noisy_domain_counts(spark, sf_dir).orderBy("lang", "source").show(10)

    print("== clipped mean length per lang (eps=1: eps/2 sum + eps/2 count) ==")
    dp_clipped_mean_chars(spark, sf_dir).orderBy("lang").show()

    print("== length histogram (eps=1; empty buckets released as pure noise) ==")
    dp_length_histogram(spark, sf_dir).orderBy("bucket").show()

    print("== median length per lang (exponential mechanism, eps=1) ==")
    dp_median_chars(spark, sf_dir).orderBy("lang").show()

    print("card budget: eps = 4 by sequential composition over the four tables")


if __name__ == "__main__":
    main()
