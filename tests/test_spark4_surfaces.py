"""Spark 4 SQL-surface coverage: XML file source, SQL pipe syntax,
parameterized SQL. Each is feature-probed — if the running Spark build
lacks the surface, the test skips rather than fails (mirrors the
protobuf gating in streaming/tws.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_xml_source_roundtrip(spark, tmp_path):
    """Built-in XML data source (Spark 4): rowTag-delimited records
    with schema inference — the config-file/feed ingestion path."""
    xml_dir = tmp_path / "xml"
    xml_dir.mkdir()
    (xml_dir / "part.xml").write_text(
        "<rows>"
        + "".join(
            f"<row><id>{i}</id><name>item_{i}</name><qty>{i * 10}</qty></row>"
            for i in range(6)
        )
        + "</rows>"
    )
    try:
        df = spark.read.format("xml").option("rowTag", "row").load(str(xml_dir))
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"xml source unavailable: {type(e).__name__}")
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 6
    assert rows[3]["name"] == "item_3" and rows[3]["qty"] == 30
    # write side
    out = str(tmp_path / "xml_out")
    df.write.format("xml").option("rootTag", "rows").option("rowTag", "row").save(out)
    back = spark.read.format("xml").option("rowTag", "row").load(out)
    assert back.count() == 6


def test_sql_pipe_syntax_matches_classic(spark, sf_dir):
    """SQL pipe syntax (|>): the same aggregation written pipeline-
    style must equal the classic formulation."""
    from arcon_spark.io import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("t_orders_pipe")
    try:
        piped = spark.sql(
            """
            FROM t_orders_pipe
            |> WHERE o_orderstatus = 'O'
            |> AGGREGATE COUNT(*) AS n,
                 SUM(CAST(round(o_totalprice * 100) AS DECIMAL(38,0))) AS cents
               GROUP BY o_orderpriority
            |> ORDER BY o_orderpriority
            """
        ).collect()
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"pipe syntax unavailable: {type(e).__name__}")
    classic = spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(round(o_totalprice * 100) AS DECIMAL(38,0))) AS cents
        FROM t_orders_pipe
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    ).collect()
    assert [tuple(r) for r in piped] == [tuple(r) for r in classic]


def test_parameterized_sql_named_args(spark, sf_dir):
    """spark.sql(query, args): server-side parameter binding — no
    string interpolation, injection-safe by construction."""
    from arcon_spark.io import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("t_events_param")
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM t_events_param WHERE event_type = :et",
        args={"et": "purchase"},
    ).collect()[0]["n"]
    truth = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert got == truth


def test_udtf_polymorphic_analyze(spark):
    """Python UDTF with a static analyze() — the output schema is
    computed FROM THE ARGUMENTS at plan time (polymorphic table
    function), the surface behind pivot-like dynamic-schema TVFs."""
    try:
        from pyspark.sql.functions import udtf
        from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult
    except ImportError:
        pytest.skip("udtf analyze API unavailable")
    from pyspark.sql.types import LongType, StructType

    @udtf
    class Repeat:
        @staticmethod
        def analyze(n: AnalyzeArgument) -> AnalyzeResult:
            # n copies of a long column c0..c{n-1}
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"c{i}", LongType())
            return AnalyzeResult(schema=schema)

        def eval(self, n: int):
            yield tuple(range(n))

    spark.udtf.register("repeat_cols", Repeat)
    r3 = spark.sql("SELECT * FROM repeat_cols(3)")
    assert r3.columns == ["c0", "c1", "c2"]
    assert r3.collect()[0][2] == 2
    r5 = spark.sql("SELECT * FROM repeat_cols(5)")
    assert len(r5.columns) == 5  # schema follows the argument


def test_metadata_columns_expose_file_lineage(spark, sf_dir):
    """The hidden _metadata struct on file scans — per-row file
    lineage (path, size, mtime) without storing it; the provenance
    surface a 100 TB debugging session reaches for first."""
    from arcon_spark.io import load_table

    df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.file_size").alias("fs"),
    )
    rows = df.limit(5).collect()
    assert all(r["fp"].endswith(".parquet") and r["fs"] > 0 for r in rows)
