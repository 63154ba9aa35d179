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
Absent protobuf (this container), the JSON path is the only emitter — same
events, different encoding, no behavioral difference.
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


def encode_event_info(info: dict) -> bytes:
    """dict (the JSON line's ``info`` object) → CoreEventInfo wire bytes."""
    from datetime import datetime

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


def delimited_writer(path: str) -> Optional[Callable[[dict], None]]:
    """Returns an append-one-event callable (varint-length-delimited framing),
    or None when protobuf is unavailable."""
    if not have_protobuf():
        return None
    from google.protobuf.internal import encoder

    def write(info: dict) -> None:
        payload = encode_event_info(info)
        with open(path, "ab") as f:
            f.write(encoder._VarintBytes(len(payload)))
            f.write(payload)

    return write


def read_delimited(path: str) -> "list[dict]":
    """Read back all length-delimited CoreEventInfo messages from a .pb log."""
    from google.protobuf.internal import decoder

    out = []
    with open(path, "rb") as f:
        buf = f.read()
    pos = 0
    while pos < len(buf):
        size, pos = decoder._DecodeVarint(buf, pos)
        out.append(decode_event_info(buf[pos:pos + size]))
        pos += size
    return out
