"""Spark-only per-query wall times over the full registry.

The parity sweep's per-query seconds conflate the Spark run, the
DuckDB oracle run, and the row-compare (collect + sort + hash), so a
query with a heavy ORACLE (e.g. an UNNEST dot-product matmul in
DuckDB) looks slow even when the Spark plan is fine. This tool times
ONLY the Spark side, materialized through the noop sink exactly like
bench.py — the execution profile a cluster run would have.

Usage: python tools/spark_times.py [sf_dir] [query ...]
  SPARK_GRAFT_TIMES_OUT (default spark_times.json) gets one JSON
  object {name: sec} sorted descending.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcon_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    only = set(args[1:])

    spark = get_spark("arcon_spark_times")
    from arcon_spark.plans.registry import queries

    qmap = queries()
    names = [n for n in qmap if not only or n in only]

    # Same uncounted warmup as bench.py: JVM/codegen/parquet-footer and
    # the Python-worker pool fork (~5-8 s across 32 cores) land here,
    # not on the first measured query — otherwise single-query runs
    # overstate by the session startup cost.
    from pyspark.sql import functions as F

    from arcon_spark.io import load_table

    load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("decimal(38,0)")).alias("u"),
    ).write.format("noop").mode("overwrite").save()

    def _ident(it):
        yield from it

    spark.range(0, 64, 1, spark.sparkContext.defaultParallelism).mapInPandas(
        _ident, "id long"
    ).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
            print(f"OK    {name}: {times[name]}s", flush=True)
        except Exception as exc:  # keep timing the rest
            times[name] = -1.0
            print(f"ERR   {name}: {str(exc)[:200]}", flush=True)

    out = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    path = os.environ.get("SPARK_GRAFT_TIMES_OUT", "spark_times.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"total_sec": round(sum(v for v in out.values() if v > 0), 1)}))


if __name__ == "__main__":
    main()
