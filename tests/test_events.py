"""Structured-event compatibility: a `run` emits reference-named events with
the reference's stable codes (core/dbt/events/types.py) in dbt's published
structured-log JSON-line shape ({"data": ..., "info": {name, code, level,
msg, ts, invocation_id, pid, thread, ...}}), parseable by key."""

import json
import os

import pytest

from dbt_spark.events import EVENT_CODES, EventBus
from dbt_spark.runner import Engine

FILES = {
    "dbt_project.yml": "name: evproj\nmodel-paths: ['models']\nseed-paths: ['seeds']\n",
    "seeds/raw_items.csv": "id,val\n1,10\n2,20\n3,\n",
    "models/items.sql": "select id, val from {{ ref('raw_items') }}",
    "models/schema.yml": """
version: 2
models:
  - name: items
    columns:
      - name: id
        data_tests: [not_null, unique]
      - name: val
        data_tests:
          - not_null:
              config: {severity: warn}
""",
}


@pytest.fixture()
def log_lines(project_dir, spark):
    root = project_dir(FILES)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["build"]).success
    path = os.path.join(root, "target", "logs", "dbt.log.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_run_emits_reference_named_events(log_lines):
    names = [ln["info"]["name"] for ln in log_lines]
    # startup sequence (A001, W006, Q027)
    assert "MainReportVersion" in names
    assert "FoundStats" in names
    assert "ConcurrencyLine" in names
    # node lifecycle (Q024/Q030/Q031/Q025) for the model
    for expected in ("NodeStart", "NodeCompiling", "NodeExecuting",
                     "NodeFinished"):
        assert any(
            ln["info"]["name"] == expected
            and ln["data"].get("node_id") == "model.evproj.items"
            for ln in log_lines
        ), expected
    # per-resource result lines: Q012 for the model, Q016 seed, Q007 tests
    assert any(ln["info"]["name"] == "LogModelResult"
               and ln["data"]["node_id"] == "model.evproj.items"
               for ln in log_lines)
    assert any(ln["info"]["name"] == "LogSeedResult" for ln in log_lines)
    test_results = [ln for ln in log_lines
                    if ln["info"]["name"] == "LogTestResult"]
    assert len(test_results) == 3
    # the warn-severity not_null(val) test surfaces status=warn
    assert {ln["data"]["status"] for ln in test_results} == {"pass", "warn"}
    # end-of-run summary (Z023/Z030/Q039)
    stats = next(ln for ln in log_lines if ln["info"]["name"] == "StatsLine")
    assert stats["data"]["stats"]["warn"] == 1
    assert stats["data"]["stats"]["error"] == 0
    summary = next(ln for ln in log_lines
                   if ln["info"]["name"] == "EndOfRunSummary")
    assert summary["data"]["num_warnings"] == 1
    assert names[-1] == "CommandCompleted"


def test_event_codes_match_reference(log_lines):
    # every registered event carries its types.py code; spot-check pins
    for ln in log_lines:
        name, code = ln["info"]["name"], ln["info"]["code"]
        if name in EVENT_CODES:
            assert code == EVENT_CODES[name][0]
    pins = {"MainReportVersion": "A001", "LogTestResult": "Q007",
            "LogModelResult": "Q012", "NodeStart": "Q024",
            "NodeFinished": "Q025", "ConcurrencyLine": "Q027",
            "CommandCompleted": "Q039", "FoundStats": "W006",
            "StatsLine": "Z023", "EndOfRunSummary": "Z030"}
    for name, code in pins.items():
        assert EVENT_CODES[name][0] == code


def test_log_line_shape_matches_published_format(log_lines):
    for ln in log_lines:
        assert set(ln) == {"data", "info"}
        info = ln["info"]
        for key in ("category", "code", "extra", "invocation_id", "level",
                    "msg", "name", "pid", "thread", "ts"):
            assert key in info, key
        assert info["level"] in ("debug", "info", "warn", "error", "test")
    # one invocation_id across the whole run
    assert len({ln["info"]["invocation_id"] for ln in log_lines}) == 1


def test_bus_callbacks_and_levels(tmp_path):
    bus = EventBus(str(tmp_path / "logs" / "x.jsonl"))
    seen = []
    bus.callbacks.append(lambda ev: seen.append(ev))
    ev = bus.fire("NodeFinished", node_id="model.p.m")
    assert ev.level == "debug" and ev.code == "Q025"
    assert ev.msg == "Finished running node model.p.m"
    # explicit level overrides the registry default
    ev2 = bus.fire("NodeFinished", level="error", node_id="model.p.m")
    assert ev2.level == "error"
    # unregistered names still fire with empty code
    ev3 = bus.fire("AdHocThing", payload=1)
    assert ev3.code == ""
    assert len(seen) == 3


def test_nothing_to_do_event_on_empty_selection(project_dir, spark):
    root = project_dir(FILES)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["run", "--select", "tag:no_such_tag"]).success
    path = os.path.join(root, "target", "logs", "dbt.log.jsonl")
    lines = [json.loads(l) for l in open(path) if l.strip()]
    ntd = [e for e in lines if e["info"]["name"] == "NothingToDo"]
    assert ntd and ntd[0]["info"]["code"] == "Q035"
    assert ntd[0]["info"]["level"] == "warn"


DEPRECATION_FILES = {
    "dbt_project.yml": "name: depproj\nmodel-paths: ['models']\n",
    "models/orders_v1.sql": "select 1 as id",
    "models/orders_v2.sql": "select 1 as id, 'x' as status",
    "models/consumer.sql": "select * from {{ ref('orders', v=1) }}",
    "models/schema.yml": """
version: 2
models:
  - name: orders
    latest_version: 2
    deprecation_date: "2020-01-01"
""",
}


def test_model_deprecation_events(project_dir, spark):
    """Past-deprecation models fire DeprecatedModel I065 and their model
    children DeprecatedReference I067 at parse (reference
    check_for_model_deprecations, core/dbt/parser/manifest.py:588-594)."""
    root = project_dir(DEPRECATION_FILES)
    eng = Engine(root, spark=spark)
    seen = []
    eng.events.callbacks.append(lambda ev: seen.append(ev))
    m = eng.parse()

    # first-class version fields (nodes.py:503,523)
    v1 = m.nodes["model.depproj.orders_v1"]
    v2 = m.nodes["model.depproj.orders_v2"]
    assert (v1.version, v1.latest_version) == (1, 2)
    assert not v1.is_latest_version and v2.is_latest_version
    assert v1.is_past_deprecation_date

    dep = [e for e in seen if e.name == "DeprecatedModel"]
    assert len(dep) == 2  # both versions are past the date
    assert dep[0].code == "I065" and dep[0].level == "warn"
    assert "has passed its deprecation date" in dep[0].msg
    refs = [e for e in seen if e.name == "DeprecatedReference"]
    assert refs and refs[0].code == "I067"
    assert refs[0].data["model_name"] == "consumer"
    assert refs[0].data["ref_model_name"] == "orders_v1"

    # manifest.json carries the fields
    man = json.loads(open(os.path.join(root, "target", "manifest.json")).read())
    entry = man["nodes"]["model.depproj.orders_v1"]
    assert entry["version"] == 1 and entry["latest_version"] == 2
    assert entry["deprecation_date"].startswith("2020-01-01")


def test_upcoming_deprecation_and_warn_error_interplay(project_dir, spark):
    """A future deprecation_date fires UpcomingReferenceDeprecation I066 on
    children only; --warn-error-options can promote/silence by name."""
    files = dict(DEPRECATION_FILES)
    files["models/schema.yml"] = """
version: 2
models:
  - name: orders
    latest_version: 2
    deprecation_date: "2999-01-01"
"""
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    seen = []
    eng.events.callbacks.append(lambda ev: seen.append(ev))
    eng.parse()
    names = [e.name for e in seen]
    assert "UpcomingReferenceDeprecation" in names
    assert "DeprecatedModel" not in names  # not past the date yet

    # promotion by name fails the run at parse
    r = eng.invoke(["run", "--warn-error-options",
                    '{"error": ["UpcomingReferenceDeprecation"]}'])
    assert not r.success

    # silencing the name lets --warn-error pass and suppresses the event
    seen.clear()
    r2 = eng.invoke(["run", "--warn-error", "--warn-error-options",
                     '{"silence": ["UpcomingReferenceDeprecation"]}'])
    assert r2.success
    assert "UpcomingReferenceDeprecation" not in [e.name for e in seen]


def test_spark_job_description_tags_nodes(project_dir, spark):
    """Query-comment analog (reference core/dbt/context/query_header.py):
    while a node materializes, the worker thread's Spark job group/
    description carry '<unique_id> invocation_id=<id>' so the Spark UI
    attributes stages to the model; cleared once the node finishes."""
    root = project_dir({
        "dbt_project.yml": "name: jd\n",
        "models/m1.sql": "select 1 as id",
    })
    eng = Engine(root, spark=spark)
    during, after = {}, {}

    def cb(ev):
        prop = spark.sparkContext.getLocalProperty("spark.job.description")
        if ev.name == "NodeExecuting":
            during[ev.data["node_id"]] = prop
        elif ev.name == "NodeFinished":
            after[ev.data["node_id"]] = prop

    eng.events.callbacks.append(cb)
    assert eng.invoke(["run"]).success
    desc = during["model.jd.m1"]
    assert desc is not None and desc.startswith("model.jd.m1 invocation_id=")
    assert eng.events.invocation_id in desc
    assert after["model.jd.m1"] in (None, "")


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor_pb2  # noqa: F401

        return True
    except ImportError:
        return False


def test_protobuf_wire_roundtrip(project_dir, spark):
    """The bus writes length-delimited CoreEventInfo messages
    (wire-compatible field numbers/types with
    core/dbt/events/core_types.proto:9-20) to dbt.log.pb — via
    google.protobuf when importable, else the vendored pure-Python wire
    encoder (same bytes); round-trip one."""
    from dbt_spark.protowire import read_delimited

    root = project_dir({
        "dbt_project.yml": "name: pbw\n",
        "models/m1.sql": "select 1 as id",
    })
    eng = Engine(root, spark=spark)
    assert eng.invoke(["run"]).success
    msgs = read_delimited(
        os.path.join(root, "target", "logs", "dbt.log.pb"))
    jlines = [json.loads(l) for l in open(
        os.path.join(root, "target", "logs", "dbt.log.jsonl")) if l.strip()]
    assert len(msgs) == len(jlines)
    by_name = {m["name"]: m for m in msgs}
    mrv = by_name["MainReportVersion"]
    assert mrv["code"] == "A001" and mrv["invocation_id"] == eng.events.invocation_id
    assert by_name["NodeFinished"]["code"] == "Q025"


def test_protowire_writes_pb_with_or_without_protobuf(tmp_path):
    """The wire mirror no longer gates on google.protobuf: the pure-Python
    encoder takes over when the library is absent, so the .pb stream is
    always produced beside the JSON lines."""
    from dbt_spark.protowire import read_delimited

    bus = EventBus(str(tmp_path / "logs" / "x.jsonl"))
    bus.fire("NodeStart", node_id="model.p.m")
    pb_path = str(tmp_path / "logs" / "x.pb")
    assert os.path.exists(pb_path)
    msgs = read_delimited(pb_path)
    assert len(msgs) == 1 and msgs[0]["name"] == "NodeStart"
    assert msgs[0]["code"] == "Q024"
    assert msgs[0]["invocation_id"] == bus.invocation_id


def test_pure_wire_encoder_roundtrip_and_layout():
    """The pure-Python proto3 encoder: byte-level layout checks derived from
    the public wire spec (field 1 string → tag 0x0A, field 6 varint → tag
    0x30, field 8 nested Timestamp → tag 0x42), default-value skipping, and
    full round-trip through the pure decoder."""
    from dbt_spark.protowire import _decode_pure, _encode_pure

    info = {
        "name": "MainReportVersion", "code": "A001", "msg": "hi",
        "level": "info", "invocation_id": "abc-123", "pid": 77,
        "thread": "MainThread", "ts": "2026-01-02T03:04:05.123456+00:00",
        "category": "",
    }
    data = _encode_pure(info)
    # field 1 (name, LEN): tag byte = (1<<3)|2 = 0x0A, then length, then utf8
    assert data[0] == 0x0A and data[1] == len("MainReportVersion")
    assert data[2:2 + data[1]] == b"MainReportVersion"
    # structural walk of the top-level fields: numbers, wire types, order
    from dbt_spark.protowire import _read_varint

    seen = []
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        num, wt = tag >> 3, tag & 7
        seen.append((num, wt))
        if wt == 0:
            val, pos = _read_varint(data, pos)
            if num == 6:
                assert val == 77  # pid as varint
        else:
            assert wt == 2
            size, pos = _read_varint(data, pos)
            pos += size
    # ascending field order; pid=6 varint; ts=8 nested LEN;
    # category (10) absent because empty (proto3 default skipping)
    assert seen == [(1, 2), (2, 2), (3, 2), (4, 2), (5, 2), (6, 0),
                    (7, 2), (8, 2)]

    back = _decode_pure(data)
    for k in ("name", "code", "msg", "level", "invocation_id", "thread"):
        assert back[k] == info[k], k
    assert back["pid"] == 77
    assert back["ts"] == "2026-01-02T03:04:05.123456"
    assert back["category"] == ""


def test_pure_wire_encoder_varint_boundaries():
    from dbt_spark.protowire import _read_varint, _varint

    for n in (0, 1, 127, 128, 300, 2**21 - 1, 2**35 + 7):
        buf = _varint(n)
        val, pos = _read_varint(buf, 0)
        assert val == n and pos == len(buf)
    assert _varint(127) == b"\x7f" and _varint(128) == b"\x80\x01"


def test_pure_wire_encoder_negative_values():
    """Negative int32/int64 encode as the 10-byte two's-complement varint
    (public encoding spec) — a pre-1970 ts or negative pid must terminate
    and round-trip, not hang the event bus."""
    from dbt_spark.protowire import (_decode_pure, _encode_pure,
                                     _read_varint, _varint)

    # wire-level: -1 is ten 0xFF-ish bytes, reads back as 2^64-1
    buf = _varint(-1)
    assert len(buf) == 10
    val, pos = _read_varint(buf, 0)
    assert val == (1 << 64) - 1 and pos == 10

    # message-level: negative pid and pre-1970 timestamp round-trip
    info = {"name": "E", "code": "Z", "msg": "m", "level": "info",
            "invocation_id": "iv", "pid": -7, "thread": "t",
            "ts": "1969-12-31T23:59:59.500000+00:00", "category": ""}
    back = _decode_pure(_encode_pure(info))
    assert back["pid"] == -7
    assert back["ts"] == "1969-12-31T23:59:59.500000"


GOLDEN_PB = os.path.join(os.path.dirname(__file__), "fixtures",
                         "golden_events.pb")

GOLDEN_INFOS = [
    {"name": "MainReportVersion", "code": "A001", "msg": "Running dbt",
     "level": "info", "invocation_id": "0f7a3e2b", "pid": 4242,
     "thread": "MainThread", "ts": "2026-03-04T05:06:07.000008+00:00",
     "category": ""},
    # negative pid + pre-1970 ts: the 10-byte two's-complement varints
    {"name": "E", "code": "Z", "msg": "m", "level": "info",
     "invocation_id": "iv", "pid": -7, "thread": "t",
     "ts": "1969-12-31T23:59:59.500000+00:00", "category": ""},
]


def test_pure_wire_encoder_matches_golden_pb_bytes():
    """ALWAYS-ON canonical-bytes check: the committed fixture
    tests/fixtures/golden_events.pb holds the length-delimited canonical
    proto3 serialization of two CoreEventInfo messages, derived from the
    published wire spec (protobuf.dev/programming-guides/encoding) by an
    INDEPENDENT byte-by-byte construction (tag/varint/length arithmetic
    written separately from dbt_spark.protowire, not by the code under
    test). The pure encoder must reproduce each framed message
    byte-for-byte — including the 10-byte two's-complement varints of a
    negative pid and a pre-1970 Timestamp.seconds — and the delimited
    reader must parse the stream back to the source dicts."""
    from dbt_spark import protowire

    with open(GOLDEN_PB, "rb") as f:
        blob = f.read()
    # parse the varint-length framing and compare message bytes exactly
    msgs, pos = [], 0
    while pos < len(blob):
        ln, pos = protowire._read_varint(blob, pos)
        msgs.append(blob[pos:pos + ln])
        pos += ln
    assert len(msgs) == len(GOLDEN_INFOS)
    for info, golden in zip(GOLDEN_INFOS, msgs):
        assert protowire._encode_pure(info) == golden, info["name"]
    # the delimited reader consumes the committed stream
    decoded = protowire.read_delimited(GOLDEN_PB)
    assert [d["name"] for d in decoded] == ["MainReportVersion", "E"]
    assert decoded[0]["pid"] == 4242 and decoded[1]["pid"] == -7
    assert decoded[1]["ts"].startswith("1969-12-31T23:59:59.500000")
    # where google.protobuf IS installed, additionally require the
    # library's own serialization of the same messages to equal the fixture
    if _has_protobuf():
        for info, golden in zip(GOLDEN_INFOS, msgs):
            assert protowire.encode_event_info(info) == golden
