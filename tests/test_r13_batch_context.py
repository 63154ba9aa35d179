"""Round-13: {{ model.batch }} Jinja context during microbatch runs +
first/last-batch hook gating.

Reference parity: core/dbt/contracts/graph/nodes.py:448-470 (BatchContext:
id / event_time_start / event_time_end, set per batch at
core/dbt/task/run.py:354) and core/dbt/task/run.py:829-833 (pre_hook only
with the FIRST batch, post_hook only with the LAST).
"""

from __future__ import annotations

from datetime import datetime

from dbt_spark.runner import Engine

STREAM_CSV = (
    "id,ts,val\n"
    "1,2020-01-01 05:00:00,1\n"
    "2,2020-01-01 06:00:00,2\n"
    "3,2020-01-02 05:00:00,3\n"
    "4,2020-01-03 05:00:00,4\n"
)

BATCH_MODEL = """
{{ config(materialized='incremental', incremental_strategy='microbatch',
          event_time='ts', batch_size='day', begin='2020-01-01') }}
select id, ts, val,
       '{{ model.batch.id }}' as batch_id,
       timestamp'{{ model.batch.event_time_start }}' as b_start,
       timestamp'{{ model.batch.event_time_end }}' as b_end
from {{ ref('stream') }}
"""


def test_model_batch_visible_in_user_sql(project_dir, spark):
    files = {
        "dbt_project.yml": "name: mbctx\n",
        "seeds/stream.csv": STREAM_CSV,
        "models/target.sql": BATCH_MODEL,
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["run"], now=datetime(2020, 1, 3, 12))
    assert r.success, [x.message for x in r.results]
    rows = eng.store.read("main", "target").collect()
    assert sorted(x["id"] for x in rows) == [1, 2, 3, 4]
    for x in rows:
        # every row landed in the batch whose window contains its ts
        assert x["b_start"] <= x["ts"] < x["b_end"]
        assert x["batch_id"] == x["b_start"].strftime("%Y%m%dT%H%M%S")
    # three day-batches processed -> three distinct batch ids
    assert len({x["batch_id"] for x in rows}) == 3


def test_model_batch_is_none_outside_microbatch(project_dir, spark):
    files = {
        "dbt_project.yml": "name: nobatch\n",
        "models/plain.sql": (
            "{% if model.batch is none %}select 1 as ok"
            "{% else %}select 0 as ok{% endif %}"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["run"]).success
    assert eng.store.read("main", "plain").collect()[0]["ok"] == 1


HOOKED_MODEL = """
{{{{ config(materialized='incremental', incremental_strategy='microbatch',
          event_time='ts', batch_size='day', begin='2020-01-01',
          pre_hook="INSERT INTO {tbl} VALUES ('pre')",
          post_hook="INSERT INTO {tbl} VALUES ('post')") }}}}
select id, ts, val from {{{{ ref('stream') }}}}
"""


def test_microbatch_hooks_fire_once_across_batches(project_dir, spark):
    """A 3-batch run must execute pre_hook exactly once (first batch) and
    post_hook exactly once (last batch) — not once per batch, and not once
    per node-wrapper around the whole loop AND per batch."""
    tbl = "hook_log_r13_once"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"CREATE TABLE {tbl} (tag STRING) USING parquet")
    try:
        files = {
            "dbt_project.yml": "name: mbhooks\n",
            "seeds/stream.csv": STREAM_CSV,
            "models/target.sql": HOOKED_MODEL.format(tbl=tbl),
        }
        eng = Engine(project_dir(files), spark=spark)
        assert eng.invoke(["seed"]).success
        r = eng.invoke(["run"], now=datetime(2020, 1, 3, 12))
        assert r.success, [x.message for x in r.results]
        tags = sorted(x["tag"] for x in spark.table(tbl).collect())
        assert tags == ["post", "pre"], tags
        # incremental follow-up run (lookback window): again exactly once each
        r2 = eng.invoke(["run"], now=datetime(2020, 1, 4, 12))
        assert r2.success
        tags = sorted(x["tag"] for x in spark.table(tbl).collect())
        assert tags == ["post", "post", "pre", "pre"], tags
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_microbatch_hooks_once_parallel_path(project_dir, spark):
    """Same hook-once invariant on the PARALLEL orchestration path
    (partitioned table, >2 batches: first/last sequential, middle pooled)."""
    tbl = "hook_log_r13_par"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"CREATE TABLE {tbl} (tag STRING) USING parquet")
    try:
        files = {
            "dbt_project.yml": "name: mbhookpar\n",
            "seeds/stream.csv": (
                "id,ts,val\n"
                "1,2020-01-01 05:00:00,1\n"
                "2,2020-01-02 06:00:00,2\n"
                "3,2020-01-03 05:00:00,3\n"
                "4,2020-01-04 05:00:00,4\n"
                "5,2020-01-05 05:00:00,5\n"
            ),
            "models/target.sql": (
                "{{ config(materialized='incremental', "
                "incremental_strategy='microbatch', event_time='ts', "
                "batch_size='day', begin='2020-01-01', "
                "partition_by='event_date', "
                f"pre_hook=\"INSERT INTO {tbl} VALUES ('pre')\", "
                f"post_hook=\"INSERT INTO {tbl} VALUES ('post')\") "
                "}}\nselect id, ts, cast(ts as date) as event_date, val "
                "from {{ ref('stream') }}"
            ),
        }
        eng = Engine(project_dir(files), spark=spark)
        assert eng.invoke(["seed"]).success
        r = eng.invoke(["run"], now=datetime(2020, 1, 5, 12))  # 5 batches
        assert r.success, [x.message for x in r.results]
        assert eng.store.read("main", "target").count() == 5
        tags = sorted(x["tag"] for x in spark.table(tbl).collect())
        assert tags == ["post", "pre"], tags
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_non_microbatch_hooks_unchanged(project_dir, spark):
    """Plain table models keep the once-per-node hook behavior."""
    tbl = "hook_log_r13_plain"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"CREATE TABLE {tbl} (tag STRING) USING parquet")
    try:
        files = {
            "dbt_project.yml": "name: plainhooks\n",
            "models/t.sql": (
                "{{ config(materialized='table', "
                f"pre_hook=\"INSERT INTO {tbl} VALUES ('pre')\", "
                f"post_hook=\"INSERT INTO {tbl} VALUES ('post')\") "
                "}}\nselect 1 as x"
            ),
        }
        eng = Engine(project_dir(files), spark=spark)
        assert eng.invoke(["run"]).success
        tags = sorted(x["tag"] for x in spark.table(tbl).collect())
        assert tags == ["post", "pre"], tags
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_microbatch_hooks_see_model_batch(project_dir, spark):
    """Hook SQL renders {{ model.batch.* }} of the batch it fires with:
    pre_hook sees the FIRST batch, post_hook the LAST (the reference's
    batch runner compiles hooks on the node copy whose .batch is set)."""
    tbl = "hook_log_r13_batchctx"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"CREATE TABLE {tbl} (tag STRING, bid STRING) USING parquet")
    try:
        files = {
            "dbt_project.yml": "name: mbhookctx\n",
            "seeds/stream.csv": STREAM_CSV,
            "models/target.sql": (
                "{{ config(materialized='incremental', "
                "incremental_strategy='microbatch', event_time='ts', "
                "batch_size='day', begin='2020-01-01', "
                f"pre_hook=\"INSERT INTO {tbl} VALUES "
                "('pre', '{{ model.batch.id }}')\", "
                f"post_hook=\"INSERT INTO {tbl} VALUES "
                "('post', '{{ model.batch.id }}')\") }}\n"
                "select id, ts, val from {{ ref('stream') }}"
            ),
        }
        eng = Engine(project_dir(files), spark=spark)
        assert eng.invoke(["seed"]).success
        r = eng.invoke(["run"], now=datetime(2020, 1, 3, 12))  # 3 batches
        assert r.success, [x.message for x in r.results]
        got = {x["tag"]: x["bid"] for x in spark.table(tbl).collect()}
        assert got == {"pre": "20200101T000000", "post": "20200103T000000"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
