"""Streaming operators as oracle-checked queries.

- streaming_ingest_checkpoint drives the REAL streaming_table materializer
  over a two-batch landing directory: the checkpoint must make run 2 process
  only batch 2's files. Oracle: the union of both batches.
- session_window_agg: Spark's session_window vs the classic gaps-and-islands
  SQL (LAG + cumulative flag) — proving the streaming-native operator agrees
  with its pure-SQL semantics.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_spark.session import read_parquet

GAP_MIN = 30


def streaming_ingest_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_spark.queries.materializations import _mini_ctx, _model_node
    from dbt_spark.plans.manifest import ManifestNode, NodeType
    from dbt_spark.streaming.stream import materialize_streaming

    ctx = _mini_ctx(spark)
    landing = tempfile.mkdtemp(prefix="dbt_spark_landing_")
    events = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    mid = events.agg(F.max("event_id")).collect()[0][0] // 2

    src = ManifestNode(
        unique_id="source.matq.landing.events",
        name="events",
        package_name="matq",
        path="models/sources.yml",
        resource_type=NodeType.Source,
        source_name="landing",
    )
    src.config.meta["location"] = landing
    ctx.manifest.add(src)

    node = _model_node(
        "events_stream",
        "SELECT event_id, user_id, ts, event_type, value "
        "FROM {{ source('landing', 'events') }}",
        materialized="streaming_table",
    )
    node.sources = [("landing", "events")]
    node.depends_on = [src.unique_id]
    ctx.manifest.add(node)

    # batch 1 → run; batch 2 → run again (checkpoint skips batch 1's files)
    events.filter(F.col("event_id") <= mid).write.mode("append").parquet(landing)
    materialize_streaming(ctx, node)
    events.filter(F.col("event_id") > mid).write.mode("append").parquet(landing)
    materialize_streaming(ctx, node)
    return ctx.store.read("main", "events_stream")


def session_window_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_spark.streaming.stateful import session_window_agg

    events = read_parquet(spark, os.path.join(sf_dir, "events.parquet")).select(
        "user_id", "ts", "value"
    )
    sess = session_window_agg(events, "user_id", "ts", gap=f"{GAP_MIN} minutes")
    return sess.select(
        "user_id", "session_start", "session_end",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("total_value").cast("double").alias("total_value"),
    )


ORACLES = {
    "streaming_ingest_checkpoint": """
        SELECT event_id, user_id, ts, event_type, value FROM events
    """,
    # gaps-and-islands: a new session starts when the gap from the previous
    # event (per user) exceeds GAP_MIN; session_window's end = last_ts + gap
    "session_window_agg": f"""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             <= INTERVAL '{GAP_MIN}' MINUTE
                        THEN 0 ELSE 1 END AS new_session
            FROM events
        ),
        islands AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '{GAP_MIN}' MINUTE AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(value) AS DOUBLE) AS total_value
        FROM islands
        GROUP BY user_id, session_id
    """,
}

QUERIES = {
    "streaming_ingest_checkpoint": streaming_ingest_checkpoint,
    "session_window_agg": session_window_agg_q,
}
