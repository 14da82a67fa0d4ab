"""Arrow IPC table format round-trip tests (reference
arcon/src/table/mod.rs:295-309 write/read of RecordBatch files)."""

from __future__ import annotations

import datetime
import glob
import os
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from arcon_spark.sources.arrow_ipc import from_arrow_ipc, to_arrow_ipc


def _roundtrip(spark, df):
    path = tempfile.mkdtemp(prefix="ipc_test_")
    n_files = to_arrow_ipc(df, path)
    back = from_arrow_ipc(spark, path)
    return n_files, path, back


def test_roundtrip_rich_types_and_nulls(spark):
    """long / double / string / timestamp / array / nested struct
    columns with nulls survive the IPC round trip value-identically."""
    rows = [
        Row(
            i=1,
            x=1.5,
            s="alpha",
            ts=datetime.datetime(2024, 1, 1, 12, 0, 0),
            arr=[1, 2, 3],
            st=Row(a=10, b="x"),
        ),
        Row(i=2, x=None, s=None, ts=None, arr=[], st=Row(a=None, b="y")),
        Row(
            i=3,
            x=-2.25,
            s="béta|碼",
            ts=datetime.datetime(1999, 12, 31, 23, 59, 59, 123456),
            arr=None,
            st=None,
        ),
    ]
    df = spark.createDataFrame(
        rows,
        "i long, x double, s string, ts timestamp, arr array<long>,"
        " st struct<a: long, b: string>",
    )
    _, _, back = _roundtrip(spark, df)
    assert back.schema == df.schema
    assert sorted(map(repr, back.collect())) == sorted(map(repr, df.collect()))


def test_one_file_per_nonempty_partition(spark):
    df = spark.range(0, 1000).repartition(7).withColumn("v", F.col("id") * 2)
    n_files, path, back = _roundtrip(spark, df)
    assert n_files == 7
    assert len(glob.glob(os.path.join(path, "*.arrow"))) == 7
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == 999 * 1000


def test_empty_partitions_are_skipped(spark):
    # 1 row spread over 8 partitions -> only non-empty partitions write
    df = spark.range(0, 1).repartition(8)
    n_files, _, back = _roundtrip(spark, df)
    assert n_files == 1
    assert back.collect() == [Row(id=0)]


def test_read_is_distributed_not_driver_side(spark):
    """The decode plan must contain the Arrow python eval + binaryFile
    scan — i.e. executors decode; no collect-based loopback."""
    df = spark.range(0, 100).repartition(4)
    _, path, back = _roundtrip(spark, df)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInArrow" in plan or "PythonMapInArrow" in plan
    assert "FileScan binaryFile" in plan


def test_empty_frame_roundtrip(spark):
    """An empty DataFrame must round-trip: the writer leaves a
    footer-only file carrying the schema."""
    import tempfile

    from arcon_spark.sources.arrow_ipc import from_arrow_ipc, to_arrow_ipc

    df = spark.createDataFrame([], "a long, b string")
    path = tempfile.mkdtemp(prefix="ipc_empty_") + "/t"
    assert to_arrow_ipc(df, path) == 1
    back = from_arrow_ipc(spark, path)
    assert back.count() == 0
    assert dict(back.dtypes) == {"a": "bigint", "b": "string"}
