"""Optional protobuf wire mirror of the structured-event stream.

Reference: dbt serializes every fired event as a protobuf message whose
``info`` field is the ``proto_types.CoreEventInfo`` message (public schema,
core/dbt/events/core_types.proto:9-20: name=1, code=2, msg=3, level=4,
invocation_id=5, pid=6, thread=7, ts=8 Timestamp, extra=9 map, category=10);
consumers ingest the generated core_types_pb2 classes.

This module does NOT vendor generated pb2 code. When ``google.protobuf`` is
importable it builds the CoreEventInfo descriptor dynamically (same package,
message name, field names/numbers/types → wire-compatible with the published
schema: a pipeline deserializing with dbt's generated classes reads these
bytes), and the EventBus appends each event length-delimited (varint-prefixed,
the ``writeDelimitedTo`` framing) to ``<log>.pb`` beside the JSON lines.

Absent protobuf (this container), a pure-Python encoder takes over: the
proto3 wire format for this message needs only varints and length-delimited
fields (strings, one int32, one nested Timestamp), all specified publicly
(protobuf.dev/programming-guides/encoding). ``_encode_pure`` emits fields in
ascending number order and skips default values — byte-identical to the
canonical protobuf serialization of the same message — so the .pb stream is
wire-compatible with dbt's generated classes either way.
"""

from __future__ import annotations

from typing import Any, Callable, Optional


def have_protobuf() -> bool:
    try:
        from google.protobuf import descriptor_pb2  # noqa: F401

        return True
    except ImportError:
        return False


_factory_cache: dict = {}


def core_event_info_class():
    """Build (once) the dynamic CoreEventInfo message class, wire-compatible
    with proto_types.CoreEventInfo."""
    if "cls" in _factory_cache:
        return _factory_cache["cls"]
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    pool = descriptor_pool.Default()
    try:
        # already registered (e.g. a real core_types_pb2 import happened)
        desc = pool.FindMessageTypeByName("proto_types.CoreEventInfo")
        cls = message_factory.GetMessageClass(desc)
        _factory_cache["cls"] = cls
        return cls
    except KeyError:
        pass

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "dbt_spark_core_event_info.proto"
    fdp.package = "proto_types"
    fdp.syntax = "proto3"
    fdp.dependency.append("google/protobuf/timestamp.proto")
    # ensure the well-known Timestamp file is in the pool
    from google.protobuf import timestamp_pb2  # noqa: F401

    msg = fdp.message_type.add()
    msg.name = "CoreEventInfo"
    F = descriptor_pb2.FieldDescriptorProto
    fields = [
        ("name", 1, F.TYPE_STRING, None),
        ("code", 2, F.TYPE_STRING, None),
        ("msg", 3, F.TYPE_STRING, None),
        ("level", 4, F.TYPE_STRING, None),
        ("invocation_id", 5, F.TYPE_STRING, None),
        ("pid", 6, F.TYPE_INT32, None),
        ("thread", 7, F.TYPE_STRING, None),
        ("ts", 8, F.TYPE_MESSAGE, ".google.protobuf.Timestamp"),
        # extra=9 (map<string,string>) omitted from the dynamic build: map
        # fields need a synthesized nested entry type; proto3 skips absent
        # fields on the wire, so readers of the published schema still parse
        ("category", 10, F.TYPE_STRING, None),
    ]
    for fname, num, ftype, type_name in fields:
        f = msg.field.add()
        f.name, f.number, f.type = fname, num, ftype
        f.label = F.LABEL_OPTIONAL
        if type_name:
            f.type_name = type_name
    file_desc = pool.Add(fdp)
    cls = message_factory.GetMessageClass(
        file_desc.message_types_by_name["CoreEventInfo"]
    )
    _factory_cache["cls"] = cls
    return cls


# -- pure-Python proto3 wire fallback ---------------------------------------
# CoreEventInfo uses only two wire types: VARINT (0) for int32 pid and the
# Timestamp's seconds/nanos, and LEN (2) for strings + the nested Timestamp.

_STRING_FIELDS = [  # (field number, info key) in ascending number order
    (1, "name"), (2, "code"), (3, "msg"), (4, "level"),
    (5, "invocation_id"), (7, "thread"), (10, "category"),
]


def _varint(n: int) -> bytes:
    # protobuf encodes negative int32/int64 as the 10-byte varint of the
    # value's unsigned 64-bit two's complement (encoding spec, "signed
    # integers"); mask so a pre-1970 Timestamp.seconds or negative pid
    # terminates (and matches the canonical bytes) instead of looping on
    # Python's infinite-precision negative right shift
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _signed64(n: int) -> int:
    """Undo the unsigned-64 wire representation of a negative int32/int64."""
    return n - (1 << 64) if n >= (1 << 63) else n


def _ts_parts(ts: str) -> tuple[int, int]:
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(str(ts).replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    # protobuf Timestamp nanos from the datetime's microseconds (exact;
    # timestamp() floats would wobble the last digits)
    return int(dt.replace(microsecond=0).timestamp()), dt.microsecond * 1000


def _encode_pure(info: dict) -> bytes:
    parts: list[bytes] = []
    by_num: dict[int, bytes] = {}
    for num, key in _STRING_FIELDS:
        val = str(info.get(key, "") or "")
        if val:  # proto3 canonical: skip default (empty) values
            raw = val.encode("utf-8")
            by_num[num] = _varint(num << 3 | 2) + _varint(len(raw)) + raw
    pid = int(info.get("pid", 0) or 0)
    if pid:
        by_num[6] = _varint(6 << 3 | 0) + _varint(pid)
    ts = info.get("ts")
    if ts:
        seconds, nanos = _ts_parts(str(ts))
        nested = b""
        if seconds:
            nested += _varint(1 << 3 | 0) + _varint(seconds)
        if nanos:
            nested += _varint(2 << 3 | 0) + _varint(nanos)
        by_num[8] = _varint(8 << 3 | 2) + _varint(len(nested)) + nested
    for num in sorted(by_num):
        parts.append(by_num[num])
    return b"".join(parts)


def _decode_pure(data: bytes) -> dict:
    from datetime import datetime, timezone

    names = {num: key for num, key in _STRING_FIELDS}
    out: dict = {key: "" for _, key in _STRING_FIELDS}
    out["pid"] = 0
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        num, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(data, pos)
            if num == 6:
                out["pid"] = _signed64(val)
        elif wt == 2:
            size, pos = _read_varint(data, pos)
            raw = data[pos:pos + size]
            pos += size
            if num in names:
                out[names[num]] = raw.decode("utf-8")
            elif num == 8:
                seconds = nanos = 0
                p = 0
                while p < len(raw):
                    t2, p = _read_varint(raw, p)
                    v2, p = _read_varint(raw, p)
                    if t2 >> 3 == 1:
                        seconds = _signed64(v2)
                    elif t2 >> 3 == 2:
                        nanos = v2
                out["ts"] = datetime.fromtimestamp(
                    seconds, tz=timezone.utc
                ).replace(microsecond=nanos // 1000, tzinfo=None).isoformat()
        else:  # pragma: no cover - CoreEventInfo never emits other wire types
            raise ValueError(f"unsupported wire type {wt} (field {num})")
    return out


def encode_event_info(info: dict) -> bytes:
    """dict (the JSON line's ``info`` object) → CoreEventInfo wire bytes."""
    from datetime import datetime

    if not have_protobuf():
        return _encode_pure(info)
    cls = core_event_info_class()
    m = cls()
    for k in ("name", "code", "msg", "level", "invocation_id", "thread",
              "category"):
        setattr(m, k, str(info.get(k, "") or ""))
    m.pid = int(info.get("pid", 0) or 0)
    ts = info.get("ts")
    if ts:
        m.ts.FromDatetime(datetime.fromisoformat(str(ts).replace("Z", "+00:00")))
    return m.SerializeToString()


def decode_event_info(data: bytes) -> dict:
    """Wire bytes → dict (round-trip check / consumer convenience)."""
    if not have_protobuf():
        return _decode_pure(data)
    cls = core_event_info_class()
    m = cls()
    m.ParseFromString(data)
    out = {
        "name": m.name, "code": m.code, "msg": m.msg, "level": m.level,
        "invocation_id": m.invocation_id, "pid": m.pid, "thread": m.thread,
        "category": m.category,
    }
    if m.HasField("ts"):
        out["ts"] = m.ts.ToDatetime().isoformat()
    return out


def delimited_writer(path: str) -> Callable[[dict], None]:
    """Returns an append-one-event callable (varint-length-delimited
    framing). Routes through google.protobuf when importable, else the
    pure-Python wire encoder — same bytes either way. The file handle is
    opened once and kept (open-per-event was ~1/3 of the event-log cost at
    2,000-model scale); each event is flushed so the stream survives a
    crash like the open-per-append form did."""
    fh = open(path, "ab")

    def write(info: dict) -> None:
        payload = encode_event_info(info)
        fh.write(_varint(len(payload)))
        fh.write(payload)
        fh.flush()

    return write


def read_delimited(path: str) -> "list[dict]":
    """Read back all length-delimited CoreEventInfo messages from a .pb log."""
    out = []
    with open(path, "rb") as f:
        buf = f.read()
    pos = 0
    while pos < len(buf):
        size, pos = _read_varint(buf, pos)
        out.append(decode_event_info(buf[pos:pos + size]))
        pos += size
    return out
