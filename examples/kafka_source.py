"""Port of the reference's examples/kafka_source.rs: consume a Kafka
topic as a stream, parse JSON, window it.

The reference (kafka_source.rs) builds a KafkaConsumerConf with a
JsonSchema decode and streams into operators; offsets are tracked in
operator state for replay (kafka.rs:130-137). Here the checkpoint
owns offsets, and the JSON decode is `from_json` with an explicit
schema.

Requires a broker and the spark-sql-kafka connector jar (not in this
container) — run with:
  spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0 \
      examples/kafka_source.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from arcon_spark import get_spark
from arcon_spark.streaming import Stream, Tumbling

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),  # epoch millis
        T.StructField("value", T.DoubleType(), True),
    ]
)


def main() -> None:
    spark = get_spark("example_kafka")
    try:
        s = Stream.from_kafka(spark, "localhost:9092", "events")
    except Exception as e:  # connector jar missing / broker down
        print(f"kafka source unavailable here ({type(e).__name__}); "
              "see module docstring for spark-submit usage")
        return
    parsed = s.map(
        parsed=F.from_json(F.col("value").cast("string"), SCHEMA)
    ).map("parsed.id", "parsed.ts", value=F.col("parsed.value"))
    windowed = (
        parsed.with_timestamp_extractor("ts")
        .window(Tumbling("1 minute", "30 seconds"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    q = windowed.to_console()
    q.awaitTermination()


if __name__ == "__main__":
    main()
