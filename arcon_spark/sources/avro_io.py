"""Avro object-container persistence — pure-Python binary codec,
distributed write/read, cross-validated against the JVM Avro library.

The container carries no spark-avro datasource jar, so the Avro
capability is built the same way as the repo's protobuf/PNG/WAV
codecs: implemented from the PUBLIC Avro 1.x specification
(https://avro.apache.org/docs/current/specification/ — object
container format: `Obj\\x01` magic, file-metadata map with
avro.schema/avro.codec, 16-byte sync marker, blocks of
<count, byte-size, payload, sync>; binary encoding: zigzag-varint
longs, little-endian IEEE doubles, length-prefixed strings/bytes,
union index before value). Spark-side the shape mirrors
sources/arrow_ipc.py: `to_avro` writes one container file per
partition through `mapInArrow` (executor-side, driver sees only the
manifest), `from_avro` distributes decode across executors via the
`binaryFile` source.

Conformance is pinned two ways in tests/test_avro.py: the JVM's
org.apache.avro DataFileReader (from the avro jar already on Spark's
classpath) reads our files, and our reader decodes files written by
the JVM's DataFileWriter — byte-level spec agreement in both
directions, the same methodology as the protobuf shim's JVM
cross-checks.

Type subset (all fields written as nullable unions ["null", T], the
Spark-default nullability): long, double, string, boolean, bytes.
"""

from __future__ import annotations

from arcon_spark.scratch import scratch_dir

import io
import json
import os
import struct
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["to_avro", "from_avro", "avro_schema_json"]

_MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    "bigint": "long",
    "long": "long",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}


def avro_schema_json(df: DataFrame, name: str = "Row") -> str:
    """Avro record schema for a DataFrame (nullable-union fields)."""
    fields = []
    for fname, dtype in df.dtypes:
        if dtype not in _SPARK_TO_AVRO:
            raise TypeError(f"avro_io supports {sorted(set(_SPARK_TO_AVRO))}, got {dtype}")
        fields.append(
            {"name": fname, "type": ["null", _SPARK_TO_AVRO[dtype]], "default": None}
        )
    return json.dumps(
        {"type": "record", "name": name, "namespace": "arcon", "fields": fields}
    )


# -------------------------------------------------------------- encoding

def _w_zigzag_long(buf: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63)
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _r_zigzag_long(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (result >> 1) ^ -(result & 1), pos


def _w_bytes(buf: bytearray, raw: bytes) -> None:
    _w_zigzag_long(buf, len(raw))
    buf += raw


def _r_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _r_zigzag_long(data, pos)
    return data[pos : pos + n], pos + n


def _encode_value(buf: bytearray, avro_type: str, v) -> None:
    if avro_type == "long":
        _w_zigzag_long(buf, int(v))
    elif avro_type == "double":
        buf += struct.pack("<d", float(v))
    elif avro_type == "string":
        _w_bytes(buf, v.encode("utf-8"))
    elif avro_type == "boolean":
        buf.append(1 if v else 0)
    elif avro_type == "bytes":
        _w_bytes(buf, bytes(v))
    else:  # pragma: no cover
        raise TypeError(avro_type)


def _decode_value(avro_type: str, data: bytes, pos: int):
    if avro_type == "long":
        return _r_zigzag_long(data, pos)
    if avro_type == "double":
        return struct.unpack("<d", data[pos : pos + 8])[0], pos + 8
    if avro_type == "string":
        raw, pos = _r_bytes(data, pos)
        return raw.decode("utf-8"), pos
    if avro_type == "boolean":
        return bool(data[pos]), pos + 1
    if avro_type == "bytes":
        return _r_bytes(data, pos)
    raise TypeError(avro_type)  # pragma: no cover


def _record_types(schema_json: str) -> list[tuple[str, str]]:
    """[(field, concrete_type)] — fields are ["null", T] unions."""
    schema = json.loads(schema_json)
    out = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            concrete = [x for x in t if x != "null"][0]
        else:
            concrete = t
        out.append((f["name"], concrete))
    return out


def _write_header(fh, schema_json: str, sync: bytes) -> None:
    header = bytearray()
    header += _MAGIC
    # metadata map: one block of 2 entries, then terminator 0
    _w_zigzag_long(header, 2)
    _w_bytes(header, b"avro.schema")
    _w_bytes(header, schema_json.encode("utf-8"))
    _w_bytes(header, b"avro.codec")
    _w_bytes(header, b"null")
    _w_zigzag_long(header, 0)
    header += sync
    fh.write(bytes(header))


def _write_block(fh, types, sync: bytes, rows) -> None:
    payload = bytearray()
    for row in rows:
        for (_fname, ftype), v in zip(types, row):
            if v is None:
                _w_zigzag_long(payload, 0)  # union branch: null
            else:
                _w_zigzag_long(payload, 1)  # union branch: value
                _encode_value(payload, ftype, v)
    block = bytearray()
    _w_zigzag_long(block, len(rows))
    _w_zigzag_long(block, len(payload))
    block += payload
    block += sync
    fh.write(bytes(block))


def _write_container(fh, schema_json: str, sync: bytes, batches) -> int:
    """Write header + one block per non-empty row batch. `batches`
    yields lists of row tuples matching the schema field order."""
    types = _record_types(schema_json)
    _write_header(fh, schema_json, sync)
    total = 0
    for rows in batches:
        if not rows:
            continue
        _write_block(fh, types, sync, rows)
        total += len(rows)
    return total


def _read_container(data: bytes) -> tuple[str, list[tuple]]:
    if data[:4] != _MAGIC:
        raise ValueError("not an avro object container (bad magic)")
    pos = 4
    meta: dict[bytes, bytes] = {}
    while True:
        n, pos = _r_zigzag_long(data, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte size
            n = -n
            _, pos = _r_zigzag_long(data, pos)
        for _ in range(n):
            k, pos = _r_bytes(data, pos)
            v, pos = _r_bytes(data, pos)
            meta[k] = v
    schema_json = meta[b"avro.schema"].decode("utf-8")
    codec = meta.get(b"avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = data[pos : pos + 16]
    pos += 16
    types = _record_types(schema_json)
    rows: list[tuple] = []
    end = len(data)
    while pos < end:
        count, pos = _r_zigzag_long(data, pos)
        size, pos = _r_zigzag_long(data, pos)
        payload = data[pos : pos + size]
        pos += size
        if codec == b"deflate":
            import zlib

            payload = zlib.decompress(payload, wbits=-15)
        p = 0
        for _ in range(count):
            vals = []
            for fname, ftype in types:
                branch, p = _r_zigzag_long(payload, p)
                if branch == 0:
                    vals.append(None)
                else:
                    v, p = _decode_value(ftype, payload, p)
                    vals.append(v)
            rows.append(tuple(vals))
        if data[pos : pos + 16] != sync:
            raise ValueError("avro block sync mismatch")
        pos += 16
    return schema_json, rows


# ------------------------------------------------------------ DataFrame

def to_avro(df: DataFrame, path: str) -> int:
    """Write `df` as a directory of Avro object-container files, one
    per partition (executor-side writers, null codec). Returns the
    number of files written.

    Values are taken straight off the Arrow batches (mapInArrow), never
    through pandas: the Arrow→pandas conversion upcasts a nullable
    bigint column to float64, silently rounding longs above 2^53 and
    making genuine NaN doubles indistinguishable from nulls. Arrow
    `to_pylist` keeps int64 exact, null as None, and NaN as a real
    float — null and NaN round-trip as the distinct values they are."""
    os.makedirs(path, exist_ok=True)
    schema_json = avro_schema_json(df)
    run_id = uuid.uuid4().hex[:12]

    def write_partition(batches):
        import hashlib

        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}-{run_id}.avro")
        sync = hashlib.md5(fname.encode()).digest()
        types = _record_types(schema_json)
        fh = None
        n = 0
        try:
            # stream one block per Arrow batch — partition rows never
            # accumulate in Python memory
            for rb in batches:
                col_vals = [rb.column(i).to_pylist() for i in range(rb.num_columns)]
                rows = list(zip(*col_vals))
                if not rows:
                    continue
                if fh is None:
                    fh = open(fname, "wb")
                    _write_header(fh, schema_json, sync)
                _write_block(fh, types, sync, rows)
                n += len(rows)
        finally:
            if fh is not None:
                fh.close()
        if n:
            yield pa.RecordBatch.from_arrays(
                [pa.array([fname], pa.string()), pa.array([n], pa.int64())],
                names=["file", "n_rows"],
            )

    manifest = df.mapInArrow(write_partition, "file string, n_rows long").collect()
    if not manifest:
        # empty frame: every partition yielded nothing, so no file
        # carries the schema. Write one header-only container
        # driver-side so write∘read = identity holds for empty frames
        # (same footer-only fix as arrow_ipc).
        import hashlib

        fname = os.path.join(path, f"part-empty-{run_id}.avro")
        with open(fname, "wb") as fh:
            _write_header(fh, schema_json, hashlib.md5(fname.encode()).digest())
        return 1
    return len(manifest)


_AVRO_TO_PA = {
    "long": "int64",
    "double": "float64",
    "string": "string",
    "boolean": "bool_",
    "bytes": "binary",
}


def from_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read a `to_avro` directory back as a DataFrame. Schema resolves
    from ONE file header driver-side; decode distributes via the
    binaryFile source + mapInArrow (explicitly-typed Arrow arrays, so
    a long column with nulls never passes through pandas float64)."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(path, "*.avro")))
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        head = fh.read(1 << 20)
    schema_json, _ = _read_container(_header_only(head))
    types = _record_types(schema_json)
    back = {"long": "long", "double": "double", "string": "string",
            "boolean": "boolean", "bytes": "binary"}
    spark_schema = ", ".join(f"{n} {back[t]}" for n, t in types)

    def decode(batches):
        import pyarrow as pa

        pa_types = {n: getattr(pa, _AVRO_TO_PA[t])() for n, t in types}
        for rb in batches:
            for blob in rb.column(rb.schema.get_field_index("content")).to_pylist():
                _, rows = _read_container(bytes(blob))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([r[i] for r in rows], type=pa_types[n])
                        for i, (n, _t) in enumerate(types)
                    ],
                    names=[n for n, _t in types],
                )

    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )
    return src.mapInArrow(decode, spark_schema)


def _header_only(data: bytes) -> bytes:
    """Truncate a container to header + zero blocks so _read_container
    can resolve the schema without the whole file."""
    pos = 4
    while True:
        n, pos = _r_zigzag_long(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _r_zigzag_long(data, pos)
        for _ in range(n):
            _, pos = _r_bytes(data, pos)
            _, pos = _r_bytes(data, pos)
    return data[: pos + 16]


# ---------------------------------------------------------------- query

def _register_roundtrip_query() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from arcon_spark.io import load_table
    from arcon_spark.plans.compat import EVENTS_NORM
    from arcon_spark.plans.registry import register

    @register(
        "source_avro_roundtrip",
        oracle=f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(user_id) AS BIGINT) AS sum_user,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
               CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total_rows
        FROM {EVENTS_NORM}
        GROUP BY event_type
        """,
        tags=("source", "avro", "codec", "survey2.1"),
    )
    def source_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Avro object-container round trip on the events table: rows
        are written to per-partition .avro files by the pure-Python
        spec codec and read back through the distributed binaryFile
        decoder; the decoded stream aggregates per type against the
        raw-parquet oracle — a hash-match proves write∘read = identity
        on real data (longs, unicode strings, full-precision doubles).
        Same query shape as source_protobuf_roundtrip / the Arrow IPC
        roundtrip, completing the interchange-format set."""
        from arcon_spark.io import spread

        # spread: the single-file test table is ONE input split, which
        # serialized the python Avro writer onto one core AND produced
        # one .avro container — so the binaryFile decode side was one
        # task too (guide §2.5 input skew; measured 2.37 s → ~1 s at
        # sf0.1). At real scale the scan is already multi-split and
        # this is a no-op; output file count then tracks partitions,
        # the same sizing rule as any sink (guide §6).
        ev = spread(
            load_table(spark, sf_dir, "events").select(
                "event_id",
                "user_id",
                "event_type",
                "value",
                F.expr("unix_micros(ts)").alias("ts_us"),
            )
        )
        out = scratch_dir("arcon_avro_") + "/events"
        to_avro(ev, out)
        dec = from_avro(spark, out)
        from pyspark.sql.window import Window

        agg = dec.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("user_id").cast("long").alias("sum_user"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("cents"),
            F.max("ts_us").alias("max_ts_us"),
        )
        # global cardinality in the value: record loss flips every hash
        return agg.withColumn(
            "total_rows", F.sum("n").over(Window.partitionBy())
        )


_register_roundtrip_query()
