"""Typed record schema layer — the ArconType system on Spark.

The reference's data model (SURVEY.md §1.1-1.5): records are statically
typed Protobuf structs declared with ``#[arcon::proto] #[derive(Arcon)]``
(arcon_macros/src/lib.rs:34-37); every Arrow schema gets a nullable
``_timestamp`` UInt64 column appended (arcon_macros/src/arrow.rs:31-43);
supported shapes are primitives, nested structs, ``Option<T>``,
``Vec<u8>`` bytes and repeated fields (arcon_tests/src/proto_derive_test.rs).

Here the same declaration surface is a small Python DSL over StructType:

    Point = record("Point", x=int32(), y=int32())
    Advanced = record(
        "Advanced",
        option=optional(uint64()),     # Option<u64>  -> nullable long
        bytes=bytes_(),                # Vec<u8>      -> binary
        repeated=repeated(Point),      # Vec<Point>   -> array<struct>
        nested=Point,
    )

``record(...)`` returns an ArconSchema carrying the StructType (with
the ``_timestamp`` convention applied by ``with_timestamp()``), plus
helpers to build DataFrames and validate conformance. The reference's
``RELIABLE_SER_ID/VERSION_ID`` (data/mod.rs:39-43) becomes an explicit
``version`` attribute — schema evolution is parquet's problem here.

Type mapping (reference arcon/src/data/arrow.rs:56-64): u64→long*,
u32→long, i64→long, i32→int, f64→double, f32→float, bool→boolean,
String→string, Vec<u8>→binary. (*Spark has no unsigned types; u64
values beyond 2^63 were unsupported by the reference's hashing anyway.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TIMESTAMP_FIELD = "_timestamp"  # reference arcon_macros/src/arrow.rs:31-43


def uint64() -> T.DataType:
    return T.LongType()


def uint32() -> T.DataType:
    return T.LongType()


def int64() -> T.DataType:
    return T.LongType()


def int32() -> T.DataType:
    return T.IntegerType()


def float64() -> T.DataType:
    return T.DoubleType()


def float32() -> T.DataType:
    return T.FloatType()


def boolean() -> T.DataType:
    return T.BooleanType()


def string() -> T.DataType:
    return T.StringType()


def bytes_() -> T.DataType:
    return T.BinaryType()


@dataclass(frozen=True)
class _Optional:
    inner: object


def optional(t) -> _Optional:
    """Option<T> → nullable field."""
    return _Optional(t)


@dataclass(frozen=True)
class _Repeated:
    inner: object


def repeated(t) -> _Repeated:
    """Vec<T> / repeated field → ArrayType."""
    return _Repeated(t)


class ArconSchema:
    """A named, versioned record schema (≅ ArconType impl)."""

    def __init__(self, name: str, struct: T.StructType, version: int = 1) -> None:
        self.name = name
        self.struct = struct
        self.version = version

    def with_timestamp(self) -> "ArconSchema":
        """Append the nullable event-time column every reference Arrow
        schema carries (`_timestamp`, arrow.rs:31-43)."""
        if TIMESTAMP_FIELD in self.struct.fieldNames():
            return self
        fields = list(self.struct.fields) + [
            T.StructField(TIMESTAMP_FIELD, T.LongType(), True)
        ]
        return ArconSchema(self.name, T.StructType(fields), self.version)

    def create(self, spark: SparkSession, rows) -> DataFrame:
        return spark.createDataFrame(rows, self.struct)

    def validate(self, df: DataFrame, strict_nullability: bool = False) -> None:
        """Conformance check: field names and types must match; with
        strict_nullability a non-null field rejects nullable data.
        (Default lax because Spark's parquet reader marks every column
        nullable regardless of writer schema.)"""
        got = {f.name: f for f in df.schema.fields}
        for f in self.struct.fields:
            if f.name not in got:
                raise ValueError(f"{self.name}: missing field {f.name!r}")
            g = got[f.name]
            if _strip_nullability(g.dataType) != _strip_nullability(f.dataType):
                raise TypeError(
                    f"{self.name}.{f.name}: expected {f.dataType}, got {g.dataType}"
                )
            if strict_nullability and g.nullable and not f.nullable:
                raise TypeError(f"{self.name}.{f.name}: non-null field got nullable data")


def _strip_nullability(dt: T.DataType) -> T.DataType:
    """Structural type equality ignoring nested nullability flags."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _strip_nullability(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_strip_nullability(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _strip_nullability(dt.keyType), _strip_nullability(dt.valueType), True
        )
    return dt


def _to_dtype(t) -> tuple[T.DataType, bool]:
    """→ (dtype, nullable)."""
    if isinstance(t, _Optional):
        inner, _ = _to_dtype(t.inner)
        return inner, True
    if isinstance(t, _Repeated):
        inner, _ = _to_dtype(t.inner)
        return T.ArrayType(inner, containsNull=False), False
    if isinstance(t, ArconSchema):
        return t.struct, False
    if isinstance(t, T.DataType):
        return t, False
    raise TypeError(f"unsupported field spec: {t!r}")


def record(name: str, version: int = 1, **fields) -> ArconSchema:
    """Declare a record type (≅ #[arcon::proto] #[derive(Arcon)]).

    Field order follows declaration order — the reference auto-assigns
    protobuf tags in the same way (arcon_macros/src/lib.rs:136-139)."""
    sfields = []
    for fname, spec in fields.items():
        dtype, nullable = _to_dtype(spec)
        sfields.append(T.StructField(fname, dtype, nullable))
    return ArconSchema(name, T.StructType(sfields), version)
