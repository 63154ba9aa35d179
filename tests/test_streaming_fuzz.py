"""Differential fuzzing for Structured Streaming window semantics.

Seeded random event streams run through REAL readStream pipelines
(file source forced into multiple micro-batches via maxFilesPerTrigger,
availableNow trigger, memory/parquet sinks) and compared exactly against
pure-python replays:

- session   session_window(gap): sessions split on > gap silence; Spark's
            session end = last event + gap
- tumbling  window(W): start = floor(ts / W) * W
- hopping   window(W, S): an event joins every window whose span covers it
- dedup     dropDuplicatesWithinWatermark(key): one survivor per key when
            duplicates arrive inside the watermark horizon

Fixed seeds; family base 180k rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random
import tempfile
from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

BASEDT = datetime(2024, 3, 1, 0, 0, 0)
_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 180_000


def _gen_events(rng, n=40):
    """[(event_id, user, ts, value)] within a 4-hour span, minute-aligned."""
    out = []
    for i in range(n):
        out.append((
            i,
            rng.randrange(1, 5),
            BASEDT + timedelta(minutes=rng.randrange(0, 240)),
            rng.randrange(1, 100),
        ))
    return out


def _write_stream_source(spark, events, n_files=3):
    src = tempfile.mkdtemp(prefix="dbt_spark_stfuzz_")
    df = spark.createDataFrame(
        [(e, u, t, v) for (e, u, t, v) in events],
        "event_id long, user_id long, ts timestamp, value long",
    )
    per = max(1, len(events) // n_files)
    for i in range(n_files):
        chunk = events[i * per:(i + 1) * per if i < n_files - 1 else None]
        if not chunk:
            continue
        spark.createDataFrame(
            chunk, "event_id long, user_id long, ts timestamp, value long"
        ).coalesce(1).write.mode("append").parquet(src)
    return src, df.schema


def _run_stream(spark, src, schema, build, name):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = build(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"select * from {name}")


def _sessions(events, user, gap_min):
    ts = sorted(t for (_, u, t, _) in events if u == user)
    vals = sorted((t, v) for (_, u, t, v) in events if u == user)
    if not ts:
        return []
    out = []
    cur = [vals[0]]
    for t, v in vals[1:]:
        if (t - cur[-1][0]).total_seconds() > gap_min * 60:
            out.append(cur)
            cur = []
        cur.append((t, v))
    out.append(cur)
    return [
        (min(t for t, _ in s),
         max(t for t, _ in s) + timedelta(minutes=gap_min),
         len(s), sum(v for _, v in s))
        for s in out
    ]


@pytest.mark.parametrize("seed", range(16))
def test_streaming_window_differential(spark, seed):
    rng = random.Random(_BASE + _OFF + seed)
    kind = ["session", "tumbling", "hopping", "dedup"][seed % 4]
    events = _gen_events(rng)
    name = f"stfuzz_{seed}_{_OFF}"

    if kind == "dedup":
        # duplicate ~half the events (same event_id/ts), all within horizon
        dupes = [e for e in events if rng.random() < 0.5]
        src, schema = _write_stream_source(spark, events + dupes)
        from dbt_spark.streaming.stateful import streaming_dedup

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        out_dir = tempfile.mkdtemp(prefix="dbt_spark_stfuzzo_")
        ckpt = tempfile.mkdtemp(prefix="dbt_spark_stfuzzc_")
        deduped = streaming_dedup(
            stream, ["event_id"], event_time="ts", watermark="24 hours")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_dir).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        got = sorted(
            (r["event_id"], r["user_id"], r["value"])
            for r in spark.read.parquet(out_dir).collect()
        )
        want = sorted((e, u, v) for (e, u, t, v) in events)
        assert got == want, f"seed={seed}"
        return

    src, schema = _write_stream_source(spark, events)
    gap = rng.choice([15, 30])
    win = rng.choice([30, 60])
    slide = win // 2

    if kind == "session":
        def build(stream):
            return (
                stream.groupBy(
                    "user_id", F.session_window("ts", f"{gap} minutes"))
                .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
                .select(
                    "user_id",
                    F.col("session_window.start").alias("st"),
                    F.col("session_window.end").alias("en"),
                    "n", "s")
            )
        got = sorted(
            (r["user_id"], r["st"], r["en"], r["n"], r["s"])
            for r in _run_stream(spark, src, schema, build, name).collect()
        )
        want = sorted(
            (u, st, en, n, s)
            for u in range(1, 5)
            for (st, en, n, s) in _sessions(events, u, gap)
        )
        assert got == want, f"seed={seed} gap={gap}"
        return

    if kind == "tumbling":
        def build(stream):
            return (
                stream.groupBy(F.window("ts", f"{win} minutes").alias("w"))
                .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
                .select(F.col("w.start").alias("st"), "n", "s")
            )
        buckets: dict = {}
        for (_, _, t, v) in events:
            mins = int((t - BASEDT).total_seconds() // 60)
            st = BASEDT + timedelta(minutes=(mins // win) * win)
            n, s = buckets.get(st, (0, 0))
            buckets[st] = (n + 1, s + v)
    else:  # hopping
        def build(stream):
            return (
                stream.groupBy(
                    F.window("ts", f"{win} minutes",
                             f"{slide} minutes").alias("w"))
                .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
                .select(F.col("w.start").alias("st"), "n", "s")
            )
        buckets = {}
        for (_, _, t, v) in events:
            mins = int((t - BASEDT).total_seconds() // 60)
            # windows with start in (mins - win, mins] stepped by slide
            first = (mins // slide) * slide
            starts = []
            st = first
            while st > mins - win:
                starts.append(st)
                st -= slide
            for sm in starts:
                key = BASEDT + timedelta(minutes=sm)
                n, s = buckets.get(key, (0, 0))
                buckets[key] = (n + 1, s + v)
    got = sorted(
        (r["st"], r["n"], r["s"])
        for r in _run_stream(spark, src, schema, build, name).collect()
    )
    want = sorted((st, n, s) for st, (n, s) in buckets.items())
    assert got == want, f"seed={seed} win={win} slide={slide}"
