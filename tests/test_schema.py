"""Schema layer tests — the proto-derive conformance shapes from the
reference's test crate (arcon_tests/src/proto_derive_test.rs, FIXTURES
F5 nested_record): nested structs, Option, bytes, repeated fields,
round-tripped through select/explode/parquet."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from arcon_spark.schema import (
    ArconSchema,
    bytes_,
    int32,
    optional,
    record,
    repeated,
    uint64,
)

Point = record("Point", x=int32(), y=int32())
Advanced = record(
    "Advanced",
    option=optional(uint64()),
    bytes=bytes_(),
    repeated=repeated(Point),
    nested=Point,
)


def test_struct_shapes():
    s = Advanced.struct
    assert s["option"].nullable and s["option"].dataType == T.LongType()
    assert s["bytes"].dataType == T.BinaryType()
    assert isinstance(s["repeated"].dataType, T.ArrayType)
    assert isinstance(s["nested"].dataType, T.StructType)
    assert not s["nested"].nullable


def test_timestamp_convention():
    s = Advanced.with_timestamp()
    f = s.struct["_timestamp"]
    assert f.nullable and f.dataType == T.LongType()
    # idempotent
    assert s.with_timestamp().struct == s.struct


def test_roundtrip_parquet_and_explode(spark):
    rows = [
        (7, b"\x01\x02", [(1, 2), (3, 4)], (9, 9)),
        (None, b"", [], (0, 0)),
    ]
    df = Advanced.create(spark, rows)
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/adv")
        back = spark.read.parquet(f"{d}/adv")
        Advanced.validate(back)
        assert back.count() == 2
        # nested access + explode (reference repeated-field semantics)
        pts = back.select(F.explode("repeated").alias("p")).select("p.x", "p.y")
        assert sorted(tuple(r) for r in pts.collect()) == [(1, 2), (3, 4)]
        assert back.filter(F.col("option").isNull()).count() == 1


def test_validate_rejects_wrong_type(spark):
    df = spark.createDataFrame([(1,)], "x string")
    P = record("P", x=int32())
    with pytest.raises(TypeError):
        P.validate(df.select(F.col("x").cast("string").alias("x")))


def test_validate_rejects_missing_field(spark):
    df = spark.createDataFrame([(1,)], "y int")
    P = record("P", x=int32())
    with pytest.raises(ValueError):
        P.validate(df)


def test_schema_evolution_across_versions(spark, tmp_path):
    """VERSION_ID semantics (reference arcon/src/data/mod.rs:39-43):
    a v2 writer adds a nullable field; readers see one merged schema
    with v1 rows null-filled — parquet schema merge is the engine-level
    replacement for manual version constants."""
    from arcon_spark.schema import int64, record

    v1 = record("Point", version=1, x=int64(), y=int64())

    out = str(tmp_path / "evo")
    spark.createDataFrame([(1, 2), (3, 4)], "x long, y long").write.parquet(f"{out}/v=1")
    spark.createDataFrame(
        [(5, 6, "a")], "x long, y long, label string"
    ).write.parquet(f"{out}/v=2")

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) >= {"x", "y", "label"}
    rows = {(r.x, r.y): r.label for r in merged.collect()}
    assert rows[(1, 2)] is None and rows[(5, 6)] == "a"
    assert v1.struct.fieldNames() == ["x", "y"]
