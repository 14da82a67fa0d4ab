"""End-to-end event-stream analytics — the operator families a
state-first streaming engine exists for (reference arcon's stated
domain), composed over the `events` table:

    events
      → funnel            (signup → view → purchase conversion)
      → cohort retention  (first-seen-week × week-offset matrix)
      → CEP               (purchase→error within 60min, no signup between)
      → interval coverage (per-user active-time union)
      → changepoint       (CUSUM argmax per event type)
      → SAX               (symbolic series for motif search)

Every stage is a registered, oracle-checked operator from
arcon_spark.operators.analytics; this file only composes and prints.
Each one is also available as a streaming dual (stream_funnel_*,
stream_cep_*, stream_interval_coverage in streaming/queries.py) whose
state-machine formulation hash-matches the same oracles.

Run: python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arcon_spark import get_spark
from arcon_spark.operators.analytics import (
    cep_purchase_error_pattern,
    cusum_changepoint_hourly,
    funnel_conversion,
    interval_coverage_users,
    retention_cohorts,
    sax_symbolize_hourly,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example_event_analytics")

    funnel = funnel_conversion(spark, sf_dir)
    stages = {r["stage"]: r["n"] for r in funnel.groupBy("stage").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(
        f"funnel: {stages.get(1, 0)} stalled at signup, "
        f"{stages.get(2, 0)} viewed only, {stages.get(3, 0)} converted to purchase"
    )

    ret = retention_cohorts(spark, sf_dir)
    week1 = ret.filter(F.col("week_offset") == 1).agg(F.sum("n_users")).collect()[0][0]
    print(f"retention: {week1} users active in their second week")

    cep = cep_purchase_error_pattern(spark, sf_dir)
    print(f"cep: {cep.count()} purchase→error-within-60min incidents")

    cov = interval_coverage_users(spark, sf_dir)
    top = cov.orderBy(F.desc("covered_us"), "user_id").first()
    print(f"coverage: user {top['user_id']} active {top['covered_us'] / 3.6e9:.1f}h over {top['n_islands']} sessions")

    for r in cusum_changepoint_hourly(spark, sf_dir).orderBy("event_type").collect():
        print(f"changepoint[{r['event_type']}]: {r['change_hour']} (score {r['score']})")

    sax = sax_symbolize_hourly(spark, sf_dir)
    word = "".join(
        r["symbol"]
        for r in sax.filter(F.col("event_type") == "purchase").orderBy("seg_id").limit(16).collect()
    )
    print(f"sax[purchase, first 16 segments]: {word}")


if __name__ == "__main__":
    main()
