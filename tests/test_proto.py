"""Protobuf wire-format codec tests.

Golden byte vectors come from the PUBLIC protobuf encoding
documentation (developers.google.com/protocol-buffers/docs/encoding) —
they pin our from-scratch codec to the real wire format, not merely to
its own round trip."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from arcon_spark.proto import (
    Field,
    MessageType,
    decode_message,
    encode_message,
    message_from_spark_schema,
    oneof_message,
)

T1 = MessageType("Test1", [Field(1, "a", "int32")])
T2 = MessageType("Test2", [Field(2, "b", "string")])
T3 = MessageType("Test3", [Field(3, "c", "message", message=T1)])
T4 = MessageType("Test4", [Field(4, "d", "int32", repeated=True)])


def test_golden_varint_150():
    # spec example: Test1{a:150} == 08 96 01
    assert encode_message(T1, {"a": 150}) == bytes.fromhex("089601")
    assert decode_message(T1, bytes.fromhex("089601")) == {"a": 150}


def test_golden_string_testing():
    # spec example: Test2{b:"testing"} == 12 07 74 65 73 74 69 6e 67
    wire = bytes.fromhex("120774657374696e67")
    assert encode_message(T2, {"b": "testing"}) == wire
    assert decode_message(T2, wire) == {"b": "testing"}


def test_golden_nested_message():
    # spec example: Test3{c:{a:150}} == 1a 03 08 96 01
    wire = bytes.fromhex("1a03089601")
    assert encode_message(T3, {"c": {"a": 150}}) == wire
    assert decode_message(T3, wire) == {"c": {"a": 150}}


def test_golden_packed_repeated():
    # spec example: Test4{d:[3,270,86942]} == 22 06 03 8e 02 9e a7 05
    wire = bytes.fromhex("2206038e029ea705")
    assert encode_message(T4, {"d": [3, 270, 86942]}) == wire
    assert decode_message(T4, wire) == {"d": [3, 270, 86942]}


def test_negative_int64_is_ten_byte_varint():
    # spec: negative int32/int64 use the 64-bit two's complement varint
    m = MessageType("N", [Field(1, "a", "int64")])
    wire = encode_message(m, {"a": -2})
    assert wire == bytes.fromhex("08feffffffffffffffff01")
    assert decode_message(m, wire) == {"a": -2}


def test_zigzag_sint():
    # spec zigzag table: 0->0, -1->1, 1->2, -2->3
    m = MessageType("Z", [Field(1, "s", "sint64")])
    assert encode_message(m, {"s": -1}) == bytes.fromhex("0801")
    assert encode_message(m, {"s": 1}) == bytes.fromhex("0802")
    assert decode_message(m, bytes.fromhex("0803")) == {"s": -2}


def test_proto3_defaults_omitted_and_restored():
    m = MessageType(
        "D",
        [
            Field(1, "i", "int64"),
            Field(2, "s", "string"),
            Field(3, "b", "bool"),
            Field(4, "r", "int64", repeated=True),
            Field(5, "m", "message", message=T1),
        ],
    )
    assert encode_message(m, {"i": 0, "s": "", "b": False, "r": [], "m": None}) == b""
    assert decode_message(m, b"") == {"i": 0, "s": "", "b": False, "r": [], "m": None}


def test_unknown_tags_skipped():
    # encode with a superset schema, decode with a subset -> unknown
    # fields of every wire type are skipped (forward compatibility)
    sup = MessageType(
        "Sup",
        [
            Field(1, "keep", "int64"),
            Field(2, "v", "int64"),
            Field(3, "d", "double"),
            Field(4, "s", "string"),
            Field(5, "f", "float"),
        ],
    )
    sub = MessageType("Sub", [Field(1, "keep", "int64")])
    wire = encode_message(sup, {"keep": 7, "v": 99, "d": 1.5, "s": "x", "f": 2.0})
    assert decode_message(sub, wire) == {"keep": 7}


def test_unpacked_repeated_scalar_decode():
    # decoders must accept the unpacked form of a packed-declared field
    wire = bytes.fromhex("2003" "208e02")  # two separate tag-4 varints: 3, 270
    assert decode_message(T4, wire) == {"d": [3, 270]}


@settings(max_examples=200, deadline=None)
@given(
    i=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    s=st.text(max_size=40),
    d=st.floats(allow_nan=False),
    b=st.binary(max_size=32),
    r=st.lists(st.integers(min_value=0, max_value=2**32), max_size=8),
)
def test_roundtrip_property(i, s, d, b, r):
    m = MessageType(
        "P",
        [
            Field(1, "i", "int64"),
            Field(2, "s", "string"),
            Field(3, "d", "double"),
            Field(4, "b", "bytes"),
            Field(5, "r", "uint64", repeated=True),
        ],
    )
    rec = {"i": i, "s": s, "d": d, "b": b, "r": r}
    out = decode_message(m, encode_message(m, rec))
    assert out == rec


# --- oneof (the reference's `#[arcon::proto] enum` derive:
# arcon_tests/src/proto_derive_test.rs basic/nested_enums — prost maps
# `enum Foo { Bar(i32), Baz(f32) }` to `oneof this { int32 bar = 1;
# float baz = 2; }` with tags in declaration order) ---

FOO = MessageType(
    "Foo",
    [
        Field(1, "bar", "int32", oneof="this"),
        Field(2, "baz", "float", oneof="this"),
    ],
)
B_MSG = MessageType("B", [Field(1, "v", "int32")])
C_MSG = MessageType("C", [])  # the reference's empty struct C {}
A_MSG = oneof_message("A", [("b", B_MSG), ("c", C_MSG)])


def test_golden_oneof_scalar_variants():
    # FooEnum::Bar(5) -> field 1 varint: 08 05
    assert encode_message(FOO, {"bar": 5, "baz": None}) == bytes.fromhex("0805")
    # FooEnum::Baz(5.0) -> field 2 float LE: 15 00 00 a0 40
    assert encode_message(FOO, {"bar": None, "baz": 5.0}) == bytes.fromhex("150000a040")
    assert decode_message(FOO, bytes.fromhex("0805")) == {"bar": 5, "baz": None}
    assert decode_message(FOO, bytes.fromhex("150000a040")) == {"bar": None, "baz": 5.0}


def test_oneof_default_value_still_serialized():
    # proto3 oneof presence: a SET member serializes even at its
    # default (unlike a plain scalar field) so Bar(0) != unset
    assert encode_message(FOO, {"bar": 0, "baz": None}) == bytes.fromhex("0800")
    assert decode_message(FOO, bytes.fromhex("0800")) == {"bar": 0, "baz": None}
    # fully-unset oneof encodes to nothing and decodes to all-None
    assert encode_message(FOO, {"bar": None, "baz": None}) == b""
    assert decode_message(FOO, b"") == {"bar": None, "baz": None}


def test_golden_oneof_message_variants():
    # A{this: Some(AEnum::B(B{v:3}))} -> 0a 02 08 03
    wire_b = bytes.fromhex("0a020803")
    assert encode_message(A_MSG, {"b": {"v": 3}, "c": None}) == wire_b
    assert decode_message(A_MSG, wire_b) == {"b": {"v": 3}, "c": None}
    # A{this: Some(AEnum::C(C{}))} -> empty nested message STILL framed:
    # 12 00 (the nested_enums test case: presence of the empty variant)
    wire_c = bytes.fromhex("1200")
    assert encode_message(A_MSG, {"b": None, "c": {}}) == wire_c
    assert decode_message(A_MSG, wire_c) == {"b": None, "c": {}}


def test_oneof_both_set_rejected():
    import pytest

    with pytest.raises(ValueError, match="both 'bar' and 'baz'"):
        encode_message(FOO, {"bar": 1, "baz": 2.0})


def test_oneof_decode_last_one_wins():
    # spec: when a wire stream carries several members of one oneof,
    # the last one wins and clears its siblings
    wire = bytes.fromhex("0a020803") + bytes.fromhex("1200")
    assert decode_message(A_MSG, wire) == {"b": None, "c": {}}
    wire2 = bytes.fromhex("1200") + bytes.fromhex("0a020803")
    assert decode_message(A_MSG, wire2) == {"b": {"v": 3}, "c": None}


def test_oneof_message_tags_in_declaration_order():
    assert [(f.tag, f.name, f.oneof) for f in A_MSG.fields] == [
        (1, "b", "this"),
        (2, "c", "this"),
    ]


def test_schema_autotag_from_spark_schema(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.0, [1, 2], (5, "y"))],
        "id long, name string, score double, arr array<long>,"
        " nest struct<a: long, b: string>",
    )
    m = message_from_spark_schema("Rec", df.schema)
    assert [(f.tag, f.name, f.kind, f.repeated) for f in m.fields] == [
        (1, "id", "int64", False),
        (2, "name", "string", False),
        (3, "score", "double", False),
        (4, "arr", "int64", True),
        (5, "nest", "message", False),
    ]
    assert m.fields[4].message.fields[0].name == "a"


def test_spark_encode_decode_roundtrip(spark):
    from arcon_spark.proto import proto_decode, proto_encode

    df = spark.createDataFrame(
        [(1, "alpha", 1.25), (2, "", 0.0), (3, None, -3.5)],
        "id long, name string, score double",
    )
    m = message_from_spark_schema("Rec", df.schema)
    enc = proto_encode(df, m)
    dec = proto_decode(enc, m, "proto", "id long, name string, score double")
    got = sorted(dec.collect())
    # proto3 folds None -> default "" for strings
    assert [tuple(r) for r in got] == [(1, "alpha", 1.25), (2, "", 0.0), (3, "", -3.5)]


# ------------------------------------------------- r10 vectorized encoder


def test_batch_arrow_encoder_bytes_equal_per_row():
    """The vectorized Arrow batch encoder must produce byte-identical
    framed messages to per-row encode_message for every flat-scalar
    shape: defaults omitted (0 / "" / false / 0.0 and -0.0), negatives
    as 10-byte two's-complement varints, NaN treated as missing (the
    pandas-NA behaviour of the per-row path), unicode strings, nulls."""
    import math

    import pyarrow as pa

    from arcon_spark.proto import (
        Field,
        MessageType,
        _batch_encodable,
        _encode_batch_arrow,
        encode_message,
    )

    msg = MessageType(
        "T",
        [
            Field(1, "a", "int64"),
            Field(2, "b", "uint64"),
            Field(3, "c", "double"),
            Field(4, "d", "string"),
            Field(5, "e", "bool"),
            Field(6, "f", "bytes"),
        ],
    )
    assert _batch_encodable(msg)
    rows = [
        {"a": 0, "b": 0, "c": 0.0, "d": "", "e": False, "f": b""},
        {"a": 1, "b": 1, "c": -0.0, "d": "x", "e": True, "f": b"\x00"},
        {"a": -1, "b": -(1 << 63), "c": 1.5, "d": "héllo ⚡", "e": False, "f": b"\xff" * 3},
        {"a": None, "b": None, "c": None, "d": None, "e": None, "f": None},
        {"a": 127, "b": 128, "c": float("inf"), "d": "a" * 200, "e": True, "f": b"b" * 130},
        {"a": -(1 << 62), "b": (1 << 62) - 1, "c": float("nan"), "d": "\x00z", "e": False, "f": b""},
        {"a": 300, "b": 2, "c": -2.75, "d": "", "e": True, "f": b"q"},
    ]
    batch = pa.RecordBatch.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("a", pa.int64()),
                ("b", pa.int64()),
                ("c", pa.float64()),
                ("d", pa.string()),
                ("e", pa.bool_()),
                ("f", pa.binary()),
            ]
        ),
    )
    got = _encode_batch_arrow(msg, batch).to_pylist()
    for row, enc in zip(rows, got):
        ref_row = {
            k: (None if isinstance(v, float) and math.isnan(v) else v)
            for k, v in row.items()
        }
        assert enc == encode_message(msg, ref_row), row


def test_batch_arrow_encoder_random_roundtrip():
    """Property check on bulk random data: fast-path bytes == per-row
    bytes AND decode recovers the values."""
    import random

    import pyarrow as pa

    from arcon_spark.proto import (
        Field,
        MessageType,
        _encode_batch_arrow,
        decode_message,
        encode_message,
    )

    rng = random.Random(1234)
    msg = MessageType(
        "R",
        [
            Field(1, "i", "int64"),
            Field(2, "u", "uint64"),
            Field(3, "x", "double"),
            Field(4, "s", "string"),
        ],
    )
    rows = []
    for _ in range(500):
        rows.append(
            {
                "i": rng.choice(
                    [None, 0, rng.randint(-(1 << 63), (1 << 63) - 1)]
                ),
                "u": rng.choice([None, 0, rng.randint(0, (1 << 63) - 1)]),
                "x": rng.choice([None, 0.0, rng.uniform(-1e9, 1e9)]),
                "s": rng.choice(
                    [None, "", "".join(chr(rng.randint(32, 0x2FFF)) for _ in range(rng.randint(1, 40)))]
                ),
            }
        )
    batch = pa.RecordBatch.from_pylist(
        rows,
        schema=pa.schema(
            [("i", pa.int64()), ("u", pa.int64()), ("x", pa.float64()), ("s", pa.string())]
        ),
    )
    got = _encode_batch_arrow(msg, batch).to_pylist()
    for row, enc in zip(rows, got):
        assert enc == encode_message(msg, row), row
        dec = decode_message(msg, enc)
        want_i = row["i"] or 0
        assert dec["i"] == want_i
        assert dec["s"] == (row["s"] or "")


# ------------------------------------------------- r10 vectorized decoder


def test_batch_arrow_decoder_values_equal_per_row():
    """The vectorized Arrow batch decoder must be value-identical to
    per-row decode_message on every flat-scalar shape: absent fields
    default-filled, duplicate tags last-one-wins, out-of-order fields,
    negatives as 10-byte varints, unicode, empty messages."""
    import random

    import pyarrow as pa

    from arcon_spark.proto import (
        Field,
        MessageType,
        _decode_batch_arrow,
        _key,
        _write_varint,
        decode_message,
        encode_message,
    )

    msg = MessageType(
        "T",
        [
            Field(1, "a", "int64"),
            Field(2, "b", "uint64"),
            Field(3, "c", "double"),
            Field(4, "d", "string"),
            Field(5, "e", "bool"),
            Field(6, "f", "bytes"),
        ],
    )
    rng = random.Random(99)
    encs = []
    for _ in range(400):
        row = {
            "a": rng.choice([None, 0, -1, 1, -(1 << 63), (1 << 63) - 1,
                             rng.randint(-(1 << 63), (1 << 63) - 1)]),
            "b": rng.choice([None, 0, 127, 128, (1 << 62)]),
            "c": rng.choice([None, 0.0, -0.0, 1.5, -2.75e300, float("inf")]),
            "d": rng.choice([None, "", "x", "ünïcødé ⚡", "y" * 200]),
            "e": rng.choice([None, True, False]),
            "f": rng.choice([None, b"", b"\x00\xff", bytes(range(130))]),
        }
        encs.append(encode_message(msg, row))
    # hand-built edges: empty message; duplicate tag (last wins);
    # out-of-order fields (string tag 4 before int tag 1)
    encs.append(b"")
    encs.append(bytes.fromhex("0805") + bytes.fromhex("0809"))
    buf = bytearray()
    _write_varint(buf, _key(4, 2))
    _write_varint(buf, 2)
    buf += b"hi"
    _write_varint(buf, _key(1, 0))
    _write_varint(buf, 42)
    encs.append(bytes(buf))

    arrs = _decode_batch_arrow(msg, pa.array(encs, type=pa.binary()))
    assert arrs is not None
    ref = [decode_message(msg, e) for e in encs]
    for j, f in enumerate(msg.fields):
        assert arrs[j].to_pylist() == [r[f.name] for r in ref], f.name


def test_batch_arrow_decoder_bails_to_reference():
    """Anything the fast path does not prove — unknown tags, multi-byte
    keys, truncated or overlong varints, payloads crossing the row end,
    null rows — must return None so the caller runs the per-row
    reference path (identical results AND error behaviour)."""
    import pyarrow as pa

    from arcon_spark.proto import (
        Field,
        MessageType,
        _decode_batch_arrow,
        encode_message,
    )

    msg = MessageType(
        "T", [Field(1, "a", "int64"), Field(3, "d", "string"), Field(4, "c", "double")]
    )
    good = encode_message(msg, {"a": 7, "d": "ok", "c": 2.5})
    bad_cases = [
        bytes.fromhex("7801"),  # tag 15 unknown (per-row skips it)
        bytes.fromhex("800101"),  # tag 16: multi-byte key
        bytes.fromhex("08ff"),  # varint truncated at row end
        bytes.fromhex("21cdcc"),  # double payload crosses row end
        bytes.fromhex("1a05") + b"ab",  # declared len 5, 2 bytes left
        bytes.fromhex("08") + b"\xff" * 9 + b"\x02",  # overlong varint
        # declared string length 2^63: a VALID 10-byte varint whose
        # int64 cast wraps negative — must bail, not corrupt the walk
        # (ADVICE r10; the per-row path clamp-slices it w/o error)
        bytes.fromhex("1a") + b"\x80" * 9 + b"\x01",
        # non-UTF-8 string payload: per-row raises UnicodeDecodeError,
        # so the fast path must bail rather than raise ArrowInvalid
        bytes.fromhex("1a02") + b"\xff\xfe",
        None,  # null row
    ]
    for bad in bad_cases:
        got = _decode_batch_arrow(msg, pa.array([good, bad], type=pa.binary()))
        assert got is None, bad


def test_huge_declared_length_matches_per_row_reference():
    """The 2^63-length row from the bail list decodes WITHOUT error on
    the per-row reference path (python slices clamp), yielding the
    defaults + empty string — the behaviour the batch bail preserves."""
    from arcon_spark.proto import Field, MessageType, decode_message

    msg = MessageType(
        "T", [Field(1, "a", "int64"), Field(3, "d", "string"), Field(4, "c", "double")]
    )
    row = decode_message(msg, bytes.fromhex("1a") + b"\x80" * 9 + b"\x01")
    assert row == {"a": 0, "d": "", "c": 0.0}


def test_invalid_utf8_raises_unicode_error_on_reference_path():
    """Non-UTF-8 string payloads fail with UnicodeDecodeError on the
    per-row path — the error surface the docstring promises; the fast
    path bails so the whole batch reaches this path."""
    import pytest

    from arcon_spark.proto import Field, MessageType, decode_message

    msg = MessageType("T", [Field(3, "d", "string")])
    with pytest.raises(UnicodeDecodeError):
        decode_message(msg, bytes.fromhex("1a02") + b"\xff\xfe")


def test_spark_decode_falls_back_per_batch(spark):
    """End-to-end: a batch holding a message with an unknown tag takes
    the per-row path inside the plan and still yields the reference
    result (unknown tag skipped, declared fields decoded)."""
    from arcon_spark.proto import Field, MessageType, encode_message, proto_decode

    msg = MessageType("T", [Field(1, "a", "int64"), Field(2, "d", "string")])
    clean = encode_message(msg, {"a": 5, "d": "x"})
    with_unknown = bytes.fromhex("7801") + clean  # tag 15 then known fields
    df = spark.createDataFrame([(clean,), (with_unknown,)], "proto binary")
    out = sorted(
        tuple(r) for r in proto_decode(df, msg, "proto", "a long, d string").collect()
    )
    assert out == [(5, "x"), (5, "x")]
