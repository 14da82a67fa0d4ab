"""Wire-format conformance for the vendored protobuf runtime
(arcon_spark/protoshim) — golden vectors pinned to the public encoding
spec (https://protobuf.dev/programming-guides/encoding/), exercised
through the REAL generated pyspark StateMessage_pb2 module, plus a
hand-encoded FileDescriptorProto covering the numeric types
StateMessage.proto doesn't use.

The end-to-end proof (Python worker <-> JVM state server, real Java
protobuf on the other side) is tests/test_tws.py and the
stream_first_seen_tws parity row.
"""

from __future__ import annotations

import pytest

from arcon_spark.protoshim import ensure_protobuf

pytestmark = pytest.mark.skipif(not ensure_protobuf(), reason="protobuf bootstrap failed")


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


# ---------------------------------------------------------------- golden

def test_golden_handle_state():
    sm = _sm()
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    # field1 varint 2 = 08 02 ; nested: SetHandleState{state=1} = 08 01,
    # wrapped at tag1 (0A 02 ...), wrapped at tag2 (12 04 ...)
    assert req.SerializeToString() == bytes.fromhex("080212040a020801")


def test_golden_default_enum_omitted():
    sm = _sm()
    # PRE_INIT = 0 is the proto3 default -> zero bytes on the wire
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""
    # ...but the containing message still emits the (empty) submessage
    call = sm.StatefulProcessorCall(setHandleState=sm.SetHandleState(state=sm.PRE_INIT))
    assert call.SerializeToString() == bytes.fromhex("0a00")


def test_golden_negative_int64_ten_bytes():
    sm = _sm()
    t = sm.TimerInfo(timestampMs=-1)
    # field2 varint: two's-complement 64-bit -1 = ten 0xff.. bytes
    assert t.SerializeToString() == bytes.fromhex("10ffffffffffffffffff01")
    back = sm.TimerInfo()
    back.ParseFromString(t.SerializeToString())
    assert back.timestampMs == -1


def test_golden_string_and_bytes():
    sm = _sm()
    cmd = sm.StateCallCommand(stateName="ab")
    assert cmd.SerializeToString() == b"\x0a\x02ab"
    k = sm.SetImplicitKey(key=b"\x00\xff")
    assert k.SerializeToString() == b"\x0a\x02\x00\xff"


# ------------------------------------------------------------ round-trip

def test_roundtrip_repeated_bytes_and_oneof():
    sm = _sm()
    put = sm.ListStatePut(value=[b"aa", b"", b"ccc"], fetchWithArrow=True)
    call = sm.ListStateCall(stateName="s", listStatePut=put)
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(listStateCall=call)
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.WhichOneof("method") == "stateVariableRequest"
    got = back.stateVariableRequest.listStateCall
    assert got.stateName == "s"
    assert got.WhichOneof("method") == "listStatePut"
    assert list(got.listStatePut.value) == [b"aa", b"", b"ccc"]
    assert got.listStatePut.fetchWithArrow is True


def test_roundtrip_repeated_message_with_optional_presence():
    sm = _sm()
    resp = sm.StateResponseWithTimer(statusCode=0, requireNextFetch=True)
    resp.timer.append(sm.TimerInfo(key=b"k1", timestampMs=10))
    resp.timer.append(sm.TimerInfo(timestampMs=-7))
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(t.timestampMs, t.HasField("key"), t.key) for t in back.timer] == [
        (10, True, b"k1"),
        (-7, False, b""),
    ]
    assert back.requireNextFetch is True
    assert back.errorMessage == ""  # unset -> default


def test_oneof_switch_clears_sibling():
    sm = _sm()
    req = sm.ImplicitGroupingKeyRequest(setImplicitKey=sm.SetImplicitKey(key=b"x"))
    assert req.WhichOneof("method") == "setImplicitKey"
    # constructing with the other member replaces; simulate via merge-parse
    other = sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    req.ParseFromString(other.SerializeToString())
    assert req.WhichOneof("method") == "removeImplicitKey"
    assert not req.HasField("setImplicitKey")


def test_attribute_set_after_construction():
    sm = _sm()
    cmd = sm.StateCallCommand()
    cmd.stateName = "myState"
    cmd.schema = '{"fields":[]}'
    cmd.mapStateValueSchema = "v"
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert (back.stateName, back.schema, back.mapStateValueSchema) == (
        "myState",
        '{"fields":[]}',
        "v",
    )


def test_unknown_field_skipped():
    sm = _sm()
    # TimerInfo has no field 9: varint 9<<3|0 = 0x48, then payload 5;
    # field 15 wire2: 0x7a len2; field 2 (timestampMs) = 42
    raw = bytes.fromhex("4805") + bytes.fromhex("7a026869") + bytes.fromhex("102a")
    t = sm.TimerInfo()
    t.ParseFromString(raw)
    assert t.timestampMs == 42


def test_composite_assignment_rejected():
    sm = _sm()
    req = sm.StateRequest()
    with pytest.raises(AttributeError):
        req.statefulProcessorCall = sm.StatefulProcessorCall()
    with pytest.raises((ValueError, AttributeError)):
        sm.StateRequest(nonexistent=1)


def test_copy_from_and_clear():
    sm = _sm()
    a = sm.StateCallCommand(stateName="a", schema="s")
    b = sm.StateCallCommand()
    b.CopyFrom(a)
    assert b.SerializeToString() == a.SerializeToString()
    b.Clear()
    assert b.SerializeToString() == b""
    # kwarg submessage is copied, not aliased
    call = sm.StatefulProcessorCall(getValueState=a)
    a.stateName = "mutated"
    assert call.getValueState.stateName == "a"


def test_enum_wrapper_api():
    sm = _sm()
    assert sm.HandleState.Name(sm.DATA_PROCESSED) == "DATA_PROCESSED"
    assert sm.HandleState.Value("CLOSED") == sm.CLOSED == 5
    assert dict(sm.HandleState.items())["TIMER_PROCESSED"] == 4


# ------------------------------------------- synthetic numeric coverage

def _encode_field_proto(name: str, number: int, ftype: int, label: int) -> bytes:
    from google.protobuf.internal import wire_format as w

    buf = bytearray()
    raw = name.encode()
    w.write_varint(buf, w.make_tag(1, 2)); w.write_varint(buf, len(raw)); buf.extend(raw)
    w.write_varint(buf, w.make_tag(3, 0)); w.write_varint(buf, number)
    w.write_varint(buf, w.make_tag(4, 0)); w.write_varint(buf, label)
    w.write_varint(buf, w.make_tag(5, 0)); w.write_varint(buf, ftype)
    return bytes(buf)


def _synthetic_numeric_message():
    """Hand-encode a FileDescriptorProto for
        message Nums { repeated int64 xs=1; repeated sint64 zs=2;
                       double d=3; float f=4; fixed64 x64=5;
                       sfixed32 s32=6; uint64 u=7; sint32 z32=8; }
    covering every numeric kind StateMessage.proto lacks."""
    from google.protobuf import descriptor_pool
    from google.protobuf.internal import python_message
    from google.protobuf.internal import wire_format as w

    fields = [
        _encode_field_proto("xs", 1, 3, 3),   # repeated int64
        _encode_field_proto("zs", 2, 18, 3),  # repeated sint64
        _encode_field_proto("d", 3, 1, 1),    # double
        _encode_field_proto("f", 4, 2, 1),    # float
        _encode_field_proto("x64", 5, 6, 1),  # fixed64
        _encode_field_proto("s32", 6, 15, 1), # sfixed32
        _encode_field_proto("u", 7, 4, 1),    # uint64
        _encode_field_proto("z32", 8, 17, 1), # sint32
    ]
    msg = bytearray()
    raw = b"Nums"
    w.write_varint(msg, w.make_tag(1, 2)); w.write_varint(msg, len(raw)); msg.extend(raw)
    for f in fields:
        w.write_varint(msg, w.make_tag(2, 2)); w.write_varint(msg, len(f)); msg.extend(f)
    file_pb = bytearray()
    raw = b"arcon_shim_test/nums.proto"
    w.write_varint(file_pb, w.make_tag(1, 2)); w.write_varint(file_pb, len(raw)); file_pb.extend(raw)
    raw = b"shimtest"
    w.write_varint(file_pb, w.make_tag(2, 2)); w.write_varint(file_pb, len(raw)); file_pb.extend(raw)
    w.write_varint(file_pb, w.make_tag(4, 2)); w.write_varint(file_pb, len(msg)); file_pb.extend(msg)
    fd = descriptor_pool.Default().AddSerializedFile(bytes(file_pb))
    return python_message.build_message_class(fd.message_types_by_name["Nums"])


def test_numeric_kinds_roundtrip():
    Nums = _synthetic_numeric_message()
    m = Nums(
        xs=[1, -2, 3_000_000_000],
        zs=[-1, 0, 7],
        d=-2.5,
        f=1.5,
        x64=2**63 + 9,
        s32=-12,
        u=2**64 - 1,
        z32=-2**31,
    )
    back = Nums()
    back.ParseFromString(m.SerializeToString())
    assert list(back.xs) == [1, -2, 3_000_000_000]
    assert list(back.zs) == [-1, 0, 7]
    assert back.d == -2.5 and back.f == 1.5
    assert back.x64 == 2**63 + 9
    assert back.s32 == -12
    assert back.u == 2**64 - 1
    assert back.z32 == -(2**31)


def test_packed_and_unpacked_repeated_decode():
    from google.protobuf.internal import wire_format as w

    Nums = _synthetic_numeric_message()
    # packed: tag1 wire2, payload = varints 4, 5
    packed = bytes([w.make_tag(1, 2), 2, 4, 5])
    # unpacked old-style: tag1 wire0 each
    unpacked = bytes([w.make_tag(1, 0), 6, w.make_tag(1, 0), 7])
    m = Nums()
    m.ParseFromString(packed + unpacked)
    assert list(m.xs) == [4, 5, 6, 7]
    # serializer emits proto3 packed form
    out = Nums(xs=[4, 5]).SerializeToString()
    assert out == packed


def test_zigzag_golden():
    from google.protobuf.internal import wire_format as w

    # spec examples: 0->0, -1->1, 1->2, -2->3, 2147483647->4294967294
    assert w.zigzag_encode(0) == 0
    assert w.zigzag_encode(-1) == 1
    assert w.zigzag_encode(1) == 2
    assert w.zigzag_encode(-2) == 3
    assert w.zigzag_encode32(2147483647) == 4294967294
    assert w.zigzag_decode(w.zigzag_encode(-(2**62))) == -(2**62)


# --------------------------- cross-codec conformance (vs arcon_spark.proto)

_KIND_TO_TYPE = {
    "double": 1, "float": 2, "int64": 3, "uint64": 4, "int32": 5,
    "fixed64": 6, "fixed32": 7, "bool": 8, "string": 9, "message": 11,
    "bytes": 12, "uint32": 13, "enum": 14, "sfixed32": 15, "sfixed64": 16,
    "sint32": 17, "sint64": 18,
}


def _file_pb_from_message_type(msg, package="xcodec"):
    """Serialize a FileDescriptorProto describing an arcon_spark.proto
    MessageType (same tags/kinds/labels), so the shim builds a message
    class with the identical wire schema. Nested message types become
    sibling top-level messages referenced by type_name."""
    from google.protobuf.internal import wire_format as w

    messages = []

    def emit(m):
        fields = []
        for f in m.fields:
            buf = bytearray()
            raw = f.name.encode()
            w.write_varint(buf, w.make_tag(1, 2)); w.write_varint(buf, len(raw)); buf.extend(raw)
            w.write_varint(buf, w.make_tag(3, 0)); w.write_varint(buf, f.tag)
            w.write_varint(buf, w.make_tag(4, 0)); w.write_varint(buf, 3 if f.repeated else 1)
            w.write_varint(buf, w.make_tag(5, 0)); w.write_varint(buf, _KIND_TO_TYPE[f.kind])
            if f.kind == "message":
                emit(f.message)
                tn = f".{package}.{f.message.name}".encode()
                w.write_varint(buf, w.make_tag(6, 2)); w.write_varint(buf, len(tn)); buf.extend(tn)
            fields.append(bytes(buf))
        mb = bytearray()
        raw = m.name.encode()
        w.write_varint(mb, w.make_tag(1, 2)); w.write_varint(mb, len(raw)); mb.extend(raw)
        for fb in fields:
            w.write_varint(mb, w.make_tag(2, 2)); w.write_varint(mb, len(fb)); mb.extend(fb)
        messages.append(bytes(mb))

    emit(msg)
    fp = bytearray()
    raw = f"xcodec/{msg.name}.proto".encode()
    w.write_varint(fp, w.make_tag(1, 2)); w.write_varint(fp, len(raw)); fp.extend(raw)
    raw = package.encode()
    w.write_varint(fp, w.make_tag(2, 2)); w.write_varint(fp, len(raw)); fp.extend(raw)
    for mb in messages:
        w.write_varint(fp, w.make_tag(4, 2)); w.write_varint(fp, len(mb)); fp.extend(mb)
    return bytes(fp)


def _shim_class_for(msg):
    from google.protobuf import descriptor_pool
    from google.protobuf.internal import python_message

    fd = descriptor_pool.Default().AddSerializedFile(_file_pb_from_message_type(msg))
    return python_message.build_message_class(fd.message_types_by_name[msg.name])


def _xcodec_message_type():
    from arcon_spark.proto import Field, MessageType

    inner = MessageType(
        "XInner",
        [Field(1, "s", "string"), Field(2, "n", "int64")],
    )
    return MessageType(
        "XRec",
        [
            Field(1, "i64", "int64"),
            Field(2, "u64", "uint64"),
            Field(3, "flag", "bool"),
            Field(4, "d", "double"),
            Field(5, "f32", "float"),
            Field(6, "s", "string"),
            Field(7, "raw", "bytes"),
            Field(8, "z64", "sint64"),
            Field(9, "fx32", "fixed32"),
            Field(10, "xs", "int64", repeated=True),
            Field(11, "tags", "string", repeated=True),
            Field(12, "sub", "message", message=inner),
        ],
    )


def _record_strategy():
    import hypothesis.strategies as st

    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    u64 = st.integers(min_value=0, max_value=2**64 - 1)
    return st.fixed_dictionaries(
        {
            "i64": st.none() | i64,
            "u64": st.none() | u64,
            "flag": st.none() | st.booleans(),
            "d": st.none() | st.floats(allow_nan=False),
            "f32": st.none() | st.floats(allow_nan=False, width=32),
            "s": st.none() | st.text(max_size=40),
            "raw": st.none() | st.binary(max_size=40),
            "z64": st.none() | i64,
            "fx32": st.none() | st.integers(min_value=0, max_value=2**32 - 1),
            "xs": st.lists(i64, max_size=6),
            "tags": st.lists(st.text(max_size=10), max_size=4),
            "sub": st.none()
            | st.fixed_dictionaries(
                {"s": st.text(max_size=20), "n": i64}
            ),
        }
    )


def test_cross_codec_identical_bytes_and_roundtrip():
    """The repo carries two INDEPENDENT protobuf implementations —
    arcon_spark.proto (schema-driven codec) and the protoshim runtime
    (generated-module style). Same schema + same record must yield
    byte-identical wire output, and each must parse the other's bytes
    back to the same values. Hypothesis drives the value space
    (full-range ints, float32/64, unicode, binary, repeated, nested)."""
    from hypothesis import given, settings

    from arcon_spark.proto import decode_message, encode_message

    msg = _xcodec_message_type()
    cls = _shim_class_for(msg)

    @settings(max_examples=300, deadline=None)
    @given(_record_strategy())
    def check(rec):
        py_bytes = encode_message(msg, rec)
        kwargs = {k: v for k, v in rec.items() if v is not None}
        if "sub" in kwargs:
            from google.protobuf.internal import python_message

            sub_cls = python_message.build_message_class(
                cls.DESCRIPTOR.fields_by_name["sub"].message_type
            )
            kwargs["sub"] = sub_cls(**kwargs["sub"])
        shim_msg = cls(**kwargs)
        shim_bytes = shim_msg.SerializeToString()
        assert shim_bytes == py_bytes, (shim_bytes.hex(), py_bytes.hex())

        # shim parses codec bytes
        back = cls()
        back.ParseFromString(py_bytes)
        for name in ("i64", "u64", "flag", "z64", "fx32"):
            expect = rec[name]
            if expect is None or (name != "flag" and expect == 0) or expect is False:
                continue
            assert getattr(back, name) == expect
        if rec["d"] not in (None, 0.0):
            assert back.d == rec["d"]
        if rec["s"]:
            assert back.s == rec["s"]
        assert list(back.xs) == rec["xs"]
        assert list(back.tags) == rec["tags"]
        if rec["sub"] is not None:
            assert back.sub.s == rec["sub"]["s"] and back.sub.n == rec["sub"]["n"]

        # codec parses shim bytes (decode fills declared defaults)
        dec = decode_message(msg, shim_bytes)
        for name, expect in rec.items():
            if name == "sub":
                continue
            got = dec[name]
            if expect is None:
                continue  # defaults filled; skip unset comparisons
            if isinstance(expect, float) and expect == 0.0:
                continue  # implicit presence drops 0.0 in both engines
            if expect in (0, False, "", b"") and not isinstance(expect, list):
                continue
            assert got == expect, (name, got, expect)

    check()


# ------------------------------------------------------------- map fields

def _map_message():
    """message M { map<string,int64> counts = 1; map<int64,string> names = 2; }
    — map fields compile to repeated synthetic *Entry messages with
    options.map_entry=true (public descriptor.proto contract)."""
    from google.protobuf import descriptor_pool
    from google.protobuf.internal import python_message
    from google.protobuf.internal import wire_format as w

    def entry_msg(name, ktype, vtype):
        mb = bytearray()
        raw = name.encode()
        w.write_varint(mb, w.make_tag(1, 2)); w.write_varint(mb, len(raw)); mb.extend(raw)
        for fb in (_encode_field_proto("key", 1, ktype, 1),
                   _encode_field_proto("value", 2, vtype, 1)):
            w.write_varint(mb, w.make_tag(2, 2)); w.write_varint(mb, len(fb)); mb.extend(fb)
        opts = bytearray()
        w.write_varint(opts, w.make_tag(7, 0)); w.write_varint(opts, 1)  # map_entry
        w.write_varint(mb, w.make_tag(7, 2)); w.write_varint(mb, len(opts)); mb.extend(opts)
        return bytes(mb)

    def map_field(name, number, entry_full):
        from google.protobuf.internal import wire_format as w2

        buf = bytearray(_encode_field_proto(name, number, 11, 3))  # repeated message
        tn = entry_full.encode()
        w2.write_varint(buf, w2.make_tag(6, 2)); w2.write_varint(buf, len(tn)); buf.extend(tn)
        return bytes(buf)

    mb = bytearray()
    raw = b"M"
    w.write_varint(mb, w.make_tag(1, 2)); w.write_varint(mb, len(raw)); mb.extend(raw)
    for fb in (map_field("counts", 1, ".maptest.M.CountsEntry"),
               map_field("names", 2, ".maptest.M.NamesEntry")):
        w.write_varint(mb, w.make_tag(2, 2)); w.write_varint(mb, len(fb)); mb.extend(fb)
    for nb in (entry_msg("CountsEntry", 9, 3), entry_msg("NamesEntry", 3, 9)):
        w.write_varint(mb, w.make_tag(3, 2)); w.write_varint(mb, len(nb)); mb.extend(nb)

    fp = bytearray()
    raw = b"maptest/m.proto"
    w.write_varint(fp, w.make_tag(1, 2)); w.write_varint(fp, len(raw)); fp.extend(raw)
    raw = b"maptest"
    w.write_varint(fp, w.make_tag(2, 2)); w.write_varint(fp, len(raw)); fp.extend(raw)
    w.write_varint(fp, w.make_tag(4, 2)); w.write_varint(fp, len(mb)); fp.extend(mb)
    fd = descriptor_pool.Default().AddSerializedFile(bytes(fp))
    return python_message.build_message_class(fd.message_types_by_name["M"])


def test_map_field_golden_and_roundtrip():
    M = _map_message()
    m = M(counts={"a": 1})
    # entry body: key tag1 wire2 len1 'a' = 0A 01 61 ; value tag2 varint 1 = 10 01
    # wrapped at field 1 wire2 len5
    assert m.SerializeToString() == bytes.fromhex("0a050a0161" + "1001")
    m2 = M(counts={"a": 1, "b": -2, "": 0}, names={7: "seven", -1: ""})
    back = M()
    back.ParseFromString(m2.SerializeToString())
    assert dict(back.counts) == {"a": 1, "b": -2, "": 0}
    assert dict(back.names) == {7: "seven", -1: ""}
    # auto-vivified map writes persist and serialize
    m3 = M()
    m3.counts["x"] = 9
    b3 = M(); b3.ParseFromString(m3.SerializeToString())
    assert dict(b3.counts) == {"x": 9}
    # default key/value omitted from entry bodies, parsed back as defaults
    assert M(counts={"": 0}).SerializeToString() == bytes.fromhex("0a00")


def test_submessage_write_through_registers_presence():
    """Real-runtime semantics: `msg.sub.x = 1` on an UNSET sub-message
    must register the sub on the parent (presence + serialization),
    not mutate a discarded default view."""
    sm = _sm()
    req = sm.StateRequest()
    call = req.statefulProcessorCall  # unset default view
    assert not req.HasField("statefulProcessorCall")
    cmd = call.getValueState  # nested unset view
    cmd.stateName = "s1"  # deep write attaches the whole chain
    assert req.HasField("statefulProcessorCall")
    assert req.WhichOneof("method") == "statefulProcessorCall"
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.statefulProcessorCall.getValueState.stateName == "s1"
    # reading alone never sets presence
    fresh = sm.StateRequest()
    _ = fresh.statefulProcessorCall.getValueState.stateName
    assert not fresh.HasField("statefulProcessorCall")
    assert fresh.SerializeToString() == b""
