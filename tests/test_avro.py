"""Avro object-container codec (arcon_spark/sources/avro_io.py) —
spec conformance pinned against the JVM Avro library that ships on
Spark's classpath (avro-1.12.x): the JVM DataFileReader reads our
files, and our reader decodes JVM-written files. Plus distributed
write/read round trips through Spark.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from arcon_spark.sources.avro_io import (
    _read_container,
    avro_schema_json,
    from_avro,
    to_avro,
)

ROWS = [
    (1, 2.5, "hello", True, b"\x00\xff"),
    (-7, -0.125, "unicode ✓ λ", False, b""),
    (2**62, 1e300, "", None, None),
    (None, None, None, True, b"xyz"),
]
SCHEMA = "a long, b double, c string, d boolean, e binary"


def _write_dir(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).repartition(2)
    path = tempfile.mkdtemp(prefix="arcon_avro_t_") + "/t"
    n_files = to_avro(df, path)
    assert n_files >= 1
    return df, path


def test_roundtrip_through_spark(spark):
    df, path = _write_dir(spark)
    back = from_avro(spark, path)
    assert dict(back.dtypes) == dict(df.dtypes)
    got = {tuple(r) for r in back.collect()}
    want = {tuple(r) for r in df.collect()}
    assert got == want


def test_jvm_reads_our_files(spark):
    """The JVM GenericDatumReader must parse our container byte-for-
    byte: counts, schema, nulls, negative zigzag longs, utf-8."""
    _, path = _write_dir(spark)
    jvm = spark._jvm
    total = []
    for fn in sorted(os.listdir(path)):
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(os.path.join(path, fn)),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        while reader.hasNext():
            rec = reader.next()
            a = rec.get("a")
            c = rec.get("c")
            e = rec.get("e")
            total.append(
                (
                    None if a is None else int(a),
                    rec.get("b"),
                    None if c is None else c.toString(),
                    rec.get("d"),
                    None
                    if e is None
                    else bytes(jvm.java.util.Arrays.copyOfRange(e.array(), 0, e.remaining())),
                )
            )
        reader.close()
    assert {t[:4] for t in total} == {r[:4] for r in ROWS}
    assert sorted(t[4] or b"" for t in total) == sorted(r[4] or b"" for r in ROWS if True)


def _jvm_record_from_json(jvm, schema, payload: dict):
    """Build a GenericRecord via avro's OWN json decoder — sidesteps
    py4j's Long→int auto-unboxing, which silently re-boxes as Integer
    and fails union resolution."""
    import json as _json

    def wrap(v, t):
        if v is None:
            return None
        if t == "bytes":  # avro JSON encodes bytes as ISO-8859-1 chars
            return {"bytes": "".join(chr(b) for b in v)}
        return {t: v}

    line = _json.dumps(
        {
            "a": wrap(payload["a"], "long"),
            "b": wrap(payload["b"], "double"),
            "c": wrap(payload["c"], "string"),
            "d": wrap(payload["d"], "boolean"),
            "e": wrap(payload["e"], "bytes"),
        }
    )
    decoder = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(schema, line)
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    return reader.read(None, decoder)


def test_our_reader_decodes_jvm_written_file(spark):
    """Reverse direction: org.apache.avro DataFileWriter output parses
    through _read_container with identical values."""
    jvm = spark._jvm
    df = spark.createDataFrame(ROWS, SCHEMA)
    schema_json = avro_schema_json(df)
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    path = tempfile.mkdtemp(prefix="arcon_avro_jvm_") + "/jvm.avro"
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(path))
    for a, b, c, d, e in ROWS:
        writer.append(
            _jvm_record_from_json(
                jvm, schema, {"a": a, "b": b, "c": c, "d": d, "e": e}
            )
        )
    writer.close()
    with open(path, "rb") as fh:
        schema_back, rows = _read_container(fh.read())
    assert rows == ROWS
    assert '"name": "a"' in schema_back or '"name":"a"' in schema_back


def test_deflate_codec_read(spark):
    """Our reader also handles deflate-codec containers (JVM-written):
    the spec's raw-deflate block compression."""
    jvm = spark._jvm
    df = spark.createDataFrame(ROWS, SCHEMA)
    schema = jvm.org.apache.avro.Schema.Parser().parse(avro_schema_json(df))
    path = tempfile.mkdtemp(prefix="arcon_avro_defl_") + "/defl.avro"
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(schema, jvm.java.io.File(path))
    writer.append(
        _jvm_record_from_json(
            jvm, schema, {"a": 42, "b": 2.25, "c": "deflated", "d": True, "e": b"zz"}
        )
    )
    writer.close()
    with open(path, "rb") as fh:
        _, rows = _read_container(fh.read())
    assert rows == [(42, 2.25, "deflated", True, b"zz")]


def test_unsupported_type_raises(spark):
    df = spark.createDataFrame([(1, [1, 2])], "a long, xs array<long>")
    with pytest.raises(TypeError):
        avro_schema_json(df)


def test_large_long_and_nan_null_distinction(spark):
    """Regression: the pandas write path upcast nullable bigint columns
    to float64, rounding longs above 2^53 (2**62+1 round-tripped to
    2**62) and writing genuine NaN doubles as null. The Arrow path
    must keep exact int64 and the NaN/null distinction both ways."""
    import math

    rows = [
        (2**53 + 1, float("nan")),
        (None, None),
        (-(2**62) - 3, 0.0),
    ]
    df = spark.createDataFrame(rows, "a long, b double").repartition(2)
    path = tempfile.mkdtemp(prefix="arcon_avro_t_") + "/big"
    to_avro(df, path)
    got = sorted(
        ((r["a"], r["b"]) for r in from_avro(spark, path).collect()),
        key=repr,
    )
    by_a = {a: b for a, b in got}
    assert 2**53 + 1 in by_a and math.isnan(by_a[2**53 + 1])
    assert -(2**62) - 3 in by_a and by_a[-(2**62) - 3] == 0.0
    assert None in by_a and by_a[None] is None


def test_empty_frame_roundtrip(spark):
    """write∘read = identity for an empty frame: to_avro writes one
    header-only container so from_avro can resolve the schema."""
    df = spark.createDataFrame([], "a long, b string")
    path = tempfile.mkdtemp(prefix="arcon_avro_t_") + "/empty"
    assert to_avro(df, path) == 1
    back = from_avro(spark, path)
    assert dict(back.dtypes) == dict(df.dtypes)
    assert back.count() == 0
