"""A pluggable iterator/collection source via the Spark 4 Python
DataSource API — the reference's iterator source (`to_stream`,
/root/reference/arcon/src/dataflow/source.rs: a Rust IntoIterator
drained into the dataflow, with `SourceConf{time, batch_size}`)
re-expressed as a FIRST-CLASS connector rather than a driver-side
createDataFrame: once registered, `spark.read.format("arcon_collection")`
and `spark.readStream.format("arcon_collection")` both work, the
batch form reads in PARALLEL partitions, and the streaming form
replays deterministic micro-batches with offset tracking (the
reference's batch_size-paced source driver, source.rs conf).

The payload is a deterministic integer sequence (id, payload =
id² mod 97, ts = epoch + id seconds) so results are exactly
reproducible and oracle-checkable from SQL `generate_series` —
swap `_row()` for a real generator (queue poller, API pager) to
build production custom sources; partition planning and offset
semantics stay identical.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SCHEMA = "id bigint, payload bigint, ts timestamp"
_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _row(i: int):
    import datetime

    return (
        i,
        (i * i) % 97,
        datetime.datetime.fromtimestamp(_EPOCH + i, datetime.timezone.utc).replace(
            tzinfo=None
        ),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _CollectionReader(DataSourceReader):
    def __init__(self, n: int, num_partitions: int) -> None:
        self.n = n
        self.num_partitions = num_partitions

    def partitions(self):
        step = max(1, self.n // self.num_partitions)
        return [
            _RangePartition(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class _CollectionStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked replay: each micro-batch advances the offset by
    batch_size ids — the reference source driver's `batch_size` pacing
    (dataflow/source.rs SourceConf). Spark persists the offset in the
    checkpoint; a restarted query resumes exactly."""

    def __init__(self, n: int, batch_size: int) -> None:
        self.n = n
        self.batch_size = batch_size

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + self.batch_size, self.n)
        return iter([_row(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["pos"], end["pos"])])


class CollectionDataSource(DataSource):
    """options: n (row count), partitions (batch), batch_size (stream)."""

    @classmethod
    def name(cls) -> str:
        return "arcon_collection"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _CollectionReader(
            int(self.options.get("n", 1000)),
            int(self.options.get("partitions", 8)),
        )

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _CollectionStreamReader(
            int(self.options.get("n", 1000)),
            int(self.options.get("batch_size", 100)),
        )


def register_collection_source(spark) -> None:
    spark.dataSource.register(CollectionDataSource)


# ---------------------------------------------------------------------------
# registry query over the pluggable source
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from arcon_spark.plans.registry import register  # noqa: E402

_N = 5000


@register(
    "pyds_collection_agg",
    oracle=f"""
    WITH rows AS (
      SELECT u.i AS id, (u.i * u.i) % 97 AS payload,
             TIMESTAMP '2024-01-01 00:00:00' + u.i * INTERVAL 1 SECOND AS ts
      FROM UNNEST(generate_series(0, {_N - 1})) AS u(i)
    )
    SELECT id % 7 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(payload) AS BIGINT) AS sum_payload,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM rows GROUP BY 1
    """,
    tags=("sources", "python_datasource", "survey2.1"),
)
def pyds_collection_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pluggable Python DataSource exercised end-to-end: read
    {_N} rows through `.format("arcon_collection")` across 8 parallel
    range partitions (NOT a driver createDataFrame — each partition's
    iterator runs in an executor Python worker), then a normal
    relational aggregate on top. The oracle regenerates the identical
    deterministic collection in SQL, proving the connector delivers
    exactly the declared rows — the reference's iterator-source
    contract (source.rs: drain the iterator, tag event time) under
    Spark's source API with partition planning the reference never
    had."""
    register_collection_source(spark)
    df = (
        spark.read.format("arcon_collection")
        .option("n", str(_N))
        .option("partitions", "8")
        .load()
    )
    return df.groupBy((F.col("id") % 7).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("payload").alias("sum_payload"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "stream_pyds_collection",
    oracle=f"""
    WITH rows AS (
      SELECT u.i AS id, (u.i * u.i) % 97 AS payload
      FROM UNNEST(generate_series(0, {_N - 1})) AS u(i)
    )
    SELECT id % 7 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(payload) AS BIGINT) AS sum_payload
    FROM rows GROUP BY 1
    """,
    tags=("streaming", "sources", "python_datasource", "survey2.1"),
)
def stream_pyds_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pluggable Python DataSource read THROUGH THE STREAMING
    ENGINE: the offset-paced SimpleDataSourceStreamReader replays the
    deterministic collection in {_N // 1000}-plus micro-batches
    (batch_size 1000), a memory sink accumulates them, and the
    aggregate over everything delivered must equal the batch oracle —
    exactly-once delivery of a custom source under engine offsets.
    availableNow semantics pull only ONE read() from a simple stream
    reader (see MEASURE.md), so the query polls a processing-time
    trigger until the collection is drained — the production stance is
    a continuously-running query where the offset checkpoint resumes
    the sequence."""
    import time

    register_collection_source(spark)
    name = f"pyds_stream_{int(spark.sparkContext.startTime) % 100000}"
    q = (
        spark.readStream.format("arcon_collection")
        .option("n", str(_N))
        .option("batch_size", "1000")
        .load()
        .select("id", "payload")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 180
    while time.time() < deadline:
        if spark.table(name).count() >= _N:
            break
        time.sleep(0.3)
    q.stop()
    return (
        spark.table(name)
        .groupBy((F.col("id") % 7).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("sum_payload"))
    )
