"""Incremental strategies: append, merge, delete+insert, insert_overwrite,
microbatch, is_incremental() gating, on_schema_change."""

import os
from datetime import datetime

import pytest

from pyspark.sql import functions as F

from dbt_spark.runner import Engine

EVENTS_CSV = (
    "id,day,val\n"
    "1,1,10\n2,1,20\n3,2,30\n4,2,40\n5,3,50\n6,3,60\n"
)


def make_engine(project_dir, spark, model_sql, vars=None, extra_files=None):
    files = {
        "dbt_project.yml": "name: incr\n",
        "seeds/events.csv": EVENTS_CSV,
        "models/target.sql": model_sql,
    }
    files.update(extra_files or {})
    root = project_dir(files)
    return root, Engine(root, spark=spark, vars=vars or {})


MERGE_SQL = """
{{ config(materialized='incremental', incremental_strategy='merge', unique_key='id') }}
select id, day, val * {{ var('mult', 1) }} as val
from {{ ref('events') }}
where day <= {{ var('upto', 3) }}
"""


def test_merge_upsert(project_dir, spark):
    root, eng = make_engine(project_dir, spark, MERGE_SQL, vars={"upto": 2, "mult": 1})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    rows = {r["id"]: r["val"] for r in eng.store.read("main", "target").collect()}
    assert rows == {1: 10, 2: 20, 3: 30, 4: 40}
    # second run: days 1-3, values x10 -> matched rows updated, new inserted
    eng2 = Engine(root, spark=spark, vars={"upto": 3, "mult": 10})
    assert eng2.invoke(["run"]).success
    rows = {r["id"]: r["val"] for r in eng2.store.read("main", "target").collect()}
    assert rows == {1: 100, 2: 200, 3: 300, 4: 400, 5: 500, 6: 600}


def test_append(project_dir, spark):
    sql = """
{{ config(materialized='incremental', incremental_strategy='append') }}
select id, day, val from {{ ref('events') }} where day = {{ var('d') }}
"""
    root, eng = make_engine(project_dir, spark, sql, vars={"d": 1})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    eng2 = Engine(root, spark=spark, vars={"d": 2})
    assert eng2.invoke(["run"]).success
    rows = sorted(r["id"] for r in eng2.store.read("main", "target").collect())
    assert rows == [1, 2, 3, 4]


def test_delete_insert(project_dir, spark):
    sql = MERGE_SQL.replace("'merge'", "'delete+insert'")
    root, eng = make_engine(project_dir, spark, sql, vars={"upto": 2})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    eng2 = Engine(root, spark=spark, vars={"upto": 3, "mult": 100})
    assert eng2.invoke(["run"]).success
    rows = {r["id"]: r["val"] for r in eng2.store.read("main", "target").collect()}
    assert rows[1] == 1000 and rows[6] == 6000 and len(rows) == 6


def test_insert_overwrite_partitions(project_dir, spark):
    sql = """
{{ config(materialized='incremental', incremental_strategy='insert_overwrite',
          partition_by='day') }}
select id, val, day from {{ ref('events') }} where day in ({{ var('days') }})
"""
    root, eng = make_engine(project_dir, spark, sql, vars={"days": "1, 2"})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    # overwrite ONLY day 2; day 1 rows must survive untouched
    eng2 = Engine(root, spark=spark, vars={"days": "2"})
    assert eng2.invoke(["run"]).success
    rows = sorted(r["id"] for r in eng2.store.read("main", "target").collect())
    assert rows == [1, 2, 3, 4]


def test_is_incremental_gate_with_this(project_dir, spark):
    sql = """
{{ config(materialized='incremental', incremental_strategy='append') }}
select id, day, val from {{ ref('events') }}
where day <= {{ var('upto') }}
{% if is_incremental() %}
  and day > (select max(day) from {{ this }})
{% endif %}
"""
    root, eng = make_engine(project_dir, spark, sql, vars={"upto": 1})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    assert eng.store.read("main", "target").count() == 2
    # rerun with upto=3: gate only selects day > 1 -> no duplicates of day 1
    eng2 = Engine(root, spark=spark, vars={"upto": 3})
    r = eng2.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    assert eng2.store.read("main", "target").count() == 6
    # full refresh rebuilds from scratch
    eng3 = Engine(root, spark=spark, vars={"upto": 1})
    assert eng3.invoke(["run", "--full-refresh"]).success
    assert eng3.store.read("main", "target").count() == 2


def test_on_schema_change_fail_and_append_new(project_dir, spark):
    sql = """
{{ config(materialized='incremental', incremental_strategy='merge', unique_key='id',
          on_schema_change='fail') }}
select id, day, val{% if var('extra', false) %}, val * 2 as val2{% endif %}
from {{ ref('events') }} where day <= 2
"""
    root, eng = make_engine(project_dir, spark, sql)
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    eng2 = Engine(root, spark=spark, vars={"extra": True})
    r = eng2.invoke(["run"])
    assert not r.success
    assert "on_schema_change=fail" in r.results[-1].message
    # append_new_columns: old rows get NULL for the new column
    sql2 = sql.replace("'fail'", "'append_new_columns'")
    (pytest.importorskip("pathlib").Path(root) / "models" / "target.sql").write_text(sql2)
    eng3 = Engine(root, spark=spark, vars={"extra": True})
    r3 = eng3.invoke(["run"])
    assert r3.success, [x.message for x in r3.results]
    df = eng3.store.read("main", "target")
    assert "val2" in df.columns


MICROBATCH_SQL = """
{{ config(materialized='incremental', incremental_strategy='microbatch',
          event_time='ts', batch_size='day', begin='2020-01-01', lookback=1) }}
select id, ts, val from {{ ref('stream') }}
"""

STREAM_CSV = (
    "id,ts,val\n"
    "1,2020-01-01 05:00:00,1\n"
    "2,2020-01-01 06:00:00,2\n"
    "3,2020-01-02 05:00:00,3\n"
    "4,2020-01-03 05:00:00,4\n"
)


def test_microbatch_backfill_and_incremental(project_dir, spark):
    files = {
        "dbt_project.yml": "name: mb\n",
        "seeds/stream.csv": STREAM_CSV,
        "models/target.sql": MICROBATCH_SQL,
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    # initial backfill as of Jan 2: batches Jan1, Jan2
    r = eng.invoke(["run"], now=datetime(2020, 1, 2, 12))
    assert r.success, [x.message for x in r.results]
    assert eng.store.read("main", "target").count() == 3
    # next day: lookback=1 reprocesses Jan2 + Jan3 -> row 4 arrives, no dupes
    r2 = eng.invoke(["run"], now=datetime(2020, 1, 3, 12))
    assert r2.success
    rows = sorted(x["id"] for x in eng.store.read("main", "target").collect())
    assert rows == [1, 2, 3, 4]


def test_microbatch_builder_grid():
    from dbt_spark.operators.microbatch import MicrobatchBuilder

    b = MicrobatchBuilder(
        event_time="ts",
        begin=datetime(2020, 1, 1),
        batch_size="day",
        lookback=1,
        now=datetime(2020, 1, 3, 12),
    )
    full = b.build_batches(is_incremental=False)
    assert [x.start.day for x in full] == [1, 2, 3]
    incr = b.build_batches(is_incremental=True)
    assert [x.start.day for x in incr] == [2, 3]
    # month grain is calendar-aware
    bm = MicrobatchBuilder(
        event_time="ts",
        begin=datetime(2019, 11, 15),
        batch_size="month",
        now=datetime(2020, 2, 10),
    )
    months = [(x.start.year, x.start.month) for x in bm.build_batches(False)]
    assert months == [(2019, 11), (2019, 12), (2020, 1), (2020, 2)]


def test_microbatch_parallel_partitioned(project_dir, spark):
    """Partitioned microbatch runs middle batches concurrently
    (task/run.py:744-815: first/last sequential, middle parallel) and lands
    the same final state as the sequential path."""
    from dbt_spark.session import read_parquet
    from tests.conftest import SF_DIR

    files = {
        "dbt_project.yml": "name: mbp\n",
        "models/sources.yml": f"""
sources:
  - name: tpch
    tables:
      - name: events
        meta: {{location: "{SF_DIR}/events.parquet"}}
""",
        "models/daily_events.sql": """
{{ config(materialized='incremental', incremental_strategy='microbatch',
          event_time='ts', batch_size='day', begin='2024-01-01', lookback=1,
          partition_by='event_date') }}
select event_id, ts, cast(ts as date) as event_date, event_type, value
from {{ source('tpch', 'events') }}
""",
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    # events span several days from 2024-01-01; backfill as of Jan 5 noon →
    # 5 day-batches: first/last sequential, middle three parallel
    r = eng.invoke(["run"], now=datetime(2024, 1, 5, 12))
    assert r.success, [x.message for x in r.results]
    got = eng.store.read("main", "daily_events")
    expect = (
        read_parquet(spark, f"{SF_DIR}/events.parquet")
        .filter("ts < timestamp'2024-01-06'")
    )
    assert got.count() == expect.count()
    assert got.select("event_id").distinct().count() == expect.count()


def test_incremental_predicates_scope_merge(project_dir, spark):
    """incremental_predicates bound the target-side match scan; excluded rows
    pass through unchanged (the keep-merge-off-cold-history knob)."""
    from tests.conftest import SF_DIR

    files = {
        "dbt_project.yml": "name: ipred\n",
        "models/sources.yml": f"""
sources:
  - name: tpch
    tables:
      - name: orders
        meta: {{location: "{SF_DIR}/orders.parquet"}}
""",
        "models/tgt.sql": """
{{ config(materialized='incremental', incremental_strategy='merge',
          unique_key='o_orderkey',
          incremental_predicates=["o_orderdate >= timestamp'1998-01-01'"]) }}
select o_orderkey, o_orderstatus, o_orderdate from {{ source('tpch','orders') }}
{% if is_incremental() %} where 1 = 0 {% endif %}
""",
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    before = eng.store.read("main", "tgt")
    n_total = before.count()
    n_cold = before.filter("o_orderdate < timestamp'1998-01-01'").count()
    assert n_cold > 0
    # incremental run with an empty batch: nothing matched, nothing lost
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    after = eng.store.read("main", "tgt")
    assert after.count() == n_total
    assert after.filter("o_orderdate < timestamp'1998-01-01'").count() == n_cold


POISON_MB_SQL = """
{{ config(materialized='incremental', incremental_strategy='microbatch',
          event_time='ts', batch_size='day', begin='2020-01-01', lookback=1) }}
select id, ts,
  case when {{ var('poison', 'false') }} and date(ts) = date'2020-01-02'
       then cast(raise_error('poison batch') as int) else val end as val
from {{ ref('stream') }}
"""


def test_microbatch_partial_failure_and_batch_retry(project_dir, spark):
    """A failed batch yields PARTIAL SUCCESS with structured batch_results in
    run_results.json, and `dbt retry` replays ONLY the failed batch
    (reference: previous_batch_results, core/dbt/task/run.py:578-592)."""
    import json as _json

    files = {
        "dbt_project.yml": "name: mbr\n",
        "seeds/stream.csv": STREAM_CSV,
        "models/target.sql": POISON_MB_SQL,
    }
    root = project_dir(files)
    now = datetime(2020, 1, 3, 12)
    eng = Engine(root, spark=spark, vars={"poison": "true"})
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["run"], now=now)
    assert not r.success
    res = [x for x in r.results if x.unique_id.endswith("target")][0]
    assert res.status == "partial success"
    assert res.batch_results["successful"] == ["20200101T000000", "20200103T000000"]
    assert res.batch_results["failed"] == ["20200102T000000"]
    assert res.batch_results["failed_windows"]["20200102T000000"] == [
        "2020-01-02T00:00:00", "2020-01-03T00:00:00"
    ]
    # the successful windows landed; the poisoned day is absent
    assert sorted(
        x["id"] for x in eng.store.read("main", "target").collect()
    ) == [1, 2, 4]
    with open(os.path.join(root, "target", "run_results.json")) as f:
        doc = _json.load(f)
    rec = [x for x in doc["results"] if x["unique_id"].endswith("target")][0]
    # v5-strict results carry no extra keys — batch_results live under args
    stored = doc["args"]["batch_results"][rec["unique_id"]]
    assert stored["failed"] == ["20200102T000000"]

    # retry without the poison: only the failed batch re-runs, no dupes
    eng2 = Engine(root, spark=spark, vars={"poison": "false"})
    r2 = eng2.invoke(["retry"], now=now)
    assert r2.success, [x.message for x in r2.results]
    assert sorted(
        x["id"] for x in eng2.store.read("main", "target").collect()
    ) == [1, 2, 3, 4]


def test_compact_operation_merges_small_files(project_dir, spark):
    """run-operation compact: incremental appends accrete small files; the
    built-in compaction rewrites them near target size (OPTIMIZE analog)."""
    files = {
        "dbt_project.yml": "name: cmp\n",
        "seeds/stream.csv": STREAM_CSV,
        "models/acc.sql": (
            "{{ config(materialized='incremental', incremental_strategy='append') }}"
            "select id, ts, val from {{ ref('stream') }}"
            "{% if is_incremental() %} where 1 = 0 {% endif %}"
        ),
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    for _ in range(4):
        assert eng.invoke(["run"]).success  # appends (empty after first, still files)
    rel = eng.store.get("main", "acc")
    n_before = sum(
        1 for _, _, fs in os.walk(rel.path) for f in fs if f.endswith(".parquet")
    )
    assert n_before > 1
    rows_before = sorted(x["id"] for x in eng.store.read("main", "acc").collect())
    r = eng.invoke(["run-operation", "compact", "--args", "{relation: acc}"])
    assert r.success, r.results[0].message
    assert "-> 1 files" in r.results[0].message
    assert sorted(x["id"] for x in eng.store.read("main", "acc").collect()) == rows_before


def test_microbatch_explicit_event_time_window(project_dir, spark):
    """--event-time-start/--event-time-end pin the batch grid to an explicit
    backfill window (reference flags): only that window is reprocessed."""
    files = {
        "dbt_project.yml": "name: mbw\n",
        "seeds/stream.csv": STREAM_CSV,
        "models/target.sql": MICROBATCH_SQL,
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"], now=datetime(2020, 1, 3, 12)).success
    assert eng.store.read("main", "target").count() == 4

    # corrupt one day, then backfill ONLY that day via the explicit window
    tgt = eng.store.read("main", "target")
    broken = tgt.filter("date(ts) <> date'2020-01-01'")
    eng.store.write_table("main", "target", broken, kind="incremental")
    assert eng.store.read("main", "target").count() == 2

    r = eng.invoke(
        ["run", "--event-time-start", "2020-01-01", "--event-time-end", "2020-01-02"],
        now=datetime(2020, 1, 3, 12),
    )
    assert r.success, [x.message for x in r.results]
    rows = sorted(x["id"] for x in eng.store.read("main", "target").collect())
    assert rows == [1, 2, 3, 4]


def test_microbatch_retry_outside_lookback(project_dir, spark):
    """A failed batch OLDER than the lookback window still replays on retry:
    the grid regenerates from `begin`, not from the incremental checkpoint."""
    files = {
        "dbt_project.yml": "name: mbo\n",
        "seeds/stream.csv": STREAM_CSV,
        "models/target.sql": POISON_MB_SQL,
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark, vars={"poison": "true"})
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["run"], now=datetime(2020, 1, 3, 12))
    assert [x.status for x in r.results] == ["partial success"]

    # retry SIX days later: Jan 2 is far outside lookback=1
    eng2 = Engine(root, spark=spark, vars={"poison": "false"})
    r2 = eng2.invoke(["retry"], now=datetime(2020, 1, 9, 12))
    assert r2.success, [x.message for x in r2.results]
    rows = sorted(x["id"] for x in eng2.store.read("main", "target").collect())
    assert rows == [1, 2, 3, 4]


def test_compact_preserves_bucket_spec(project_dir, spark):
    """compact() on a bucketed table rewrites THROUGH the bucketed writer —
    the CLUSTERED BY declaration stays truthful and co-bucketed joins still
    elide their exchanges afterwards."""
    from tests.conftest import SF_DIR

    files = {
        "dbt_project.yml": "name: cbk\n",
        "models/sources.yml": f"""
sources:
  - name: tpch
    tables:
      - name: orders
        meta: {{location: "{SF_DIR}/orders.parquet"}}
""",
        "models/bo.sql": (
            "{{ config(materialized='table', bucket_by='o_custkey', buckets=4) }}"
            "select o_orderkey, o_custkey from {{ source('tpch','orders') }}"
        ),
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["run"]).success
    n_before = eng.store.read("main", "bo").count()
    r = eng.invoke(["run-operation", "compact", "--args", "{relation: bo}"])
    assert r.success, r.results[0].message
    df = eng.store.read("main", "bo")
    assert df.count() == n_before
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = df.join(df.selectExpr("o_custkey as ck").distinct(),
                         df.o_custkey == F.col("ck"))
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides read the same (still-)bucketed table: no shuffle at all
        assert "Bucketed: true" in plan and plan.count("Exchange") == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_event_time_end_clamps_mid_grain(project_dir, spark):
    """--event-time-end inside a grain CLAMPS the final batch: rows at/after
    the cutoff are neither reprocessed nor deleted."""
    files = {
        "dbt_project.yml": "name: mbc\n",
        "seeds/stream.csv": STREAM_CSV,
        "models/target.sql": MICROBATCH_SQL,
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"], now=datetime(2020, 1, 3, 12)).success

    def drop_jan2():
        tgt = eng.store.read("main", "target")
        eng.store.write_table(
            "main", "target",
            tgt.filter("date(ts) <> date'2020-01-02'"), kind="incremental",
        )

    # cutoff BEFORE the missing row (05:00): clamped window has nothing
    drop_jan2()
    r = eng.invoke(
        ["run", "--event-time-start", "2020-01-02", "--event-time-end",
         "2020-01-02T04:00:00"], now=datetime(2020, 1, 3, 12))
    assert r.success
    assert sorted(x["id"] for x in eng.store.read("main", "target").collect()) == [1, 2, 4]

    # cutoff AFTER the missing row: it comes back, later rows untouched
    r = eng.invoke(
        ["run", "--event-time-start", "2020-01-02", "--event-time-end",
         "2020-01-02T06:00:00"], now=datetime(2020, 1, 3, 12))
    assert r.success
    assert sorted(x["id"] for x in eng.store.read("main", "target").collect()) == [1, 2, 3, 4]


def test_event_time_end_clamp_partitioned(project_dir, spark):
    """The mid-grain clamp also holds for PARTITIONED microbatch models:
    the clamped batch must not dynamic-overwrite the whole partition (which
    would delete rows at/after the cutoff)."""
    files = {
        "dbt_project.yml": "name: mbcp\n",
        "seeds/stream.csv": STREAM_CSV,
        "models/target.sql": (
            "{{ config(materialized='incremental', "
            "incremental_strategy='microbatch', event_time='ts', "
            "batch_size='day', begin='2020-01-01', lookback=1, "
            "partition_by='day') }}"
            "select id, ts, cast(date(ts) as string) as day, val "
            "from {{ ref('stream') }}"
        ),
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"], now=datetime(2020, 1, 3, 12)).success
    assert eng.store.read("main", "target").count() == 4

    # backfill Jan 1 with a cutoff BETWEEN the two Jan 1 rows (05:00, 06:00):
    # the 06:00 row is at/after the cutoff and must survive
    r = eng.invoke(
        ["run", "--event-time-start", "2020-01-01", "--event-time-end",
         "2020-01-01T05:30:00"], now=datetime(2020, 1, 3, 12))
    assert r.success, [x.message for x in r.results]
    rows = sorted(x["id"] for x in eng.store.read("main", "target").collect())
    assert rows == [1, 2, 3, 4]


MERGE_PARTIAL_SQL = """
{{ config(materialized='incremental', incremental_strategy='merge',
          unique_key='id', merge_update_columns=['val']) }}
select id, day * {{ var('daymult', 1) }} as day, val * {{ var('mult', 1) }} as val
from {{ ref('events') }}
where day <= {{ var('upto', 3) }}
"""


def test_merge_update_columns_partial_update(project_dir, spark):
    """merge_update_columns=['val']: matched rows take val from the source
    but KEEP the target's day; inserts take the full source row
    (v1/config.py:106-109 MergeConfig semantics)."""
    root, eng = make_engine(
        project_dir, spark, MERGE_PARTIAL_SQL, vars={"upto": 2})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    # second run rewrites day (x100) and val (x10) — only val may change on
    # matched ids; the new id 5/6 rows insert with the rewritten day
    eng2 = Engine(root, spark=spark, vars={"upto": 3, "mult": 10, "daymult": 100})
    assert eng2.invoke(["run"]).success
    rows = {r["id"]: (r["day"], r["val"])
            for r in eng2.store.read("main", "target").collect()}
    assert rows == {
        1: (1, 100), 2: (1, 200), 3: (2, 300), 4: (2, 400),   # day untouched
        5: (300, 500), 6: (300, 600),                          # fresh inserts
    }


def test_merge_exclude_columns_and_mutual_exclusion(spark):
    from dbt_spark.operators.incremental import IncrementalError, merge_upsert

    t = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], ["id", "tag", "val"])
    s = spark.createDataFrame([(2, "B", 99), (3, "c", 30)], ["id", "tag", "val"])
    # exclude tag -> matched row 2 updates val only; row 3 inserts fully
    out = {r["id"]: (r["tag"], r["val"])
           for r in merge_upsert(t, s, ["id"], exclude_columns=["tag"]).collect()}
    assert out == {1: ("a", 10), 2: ("b", 99), 3: ("c", 30)}
    import pytest as _pytest
    with _pytest.raises(IncrementalError, match="mutually exclusive"):
        merge_upsert(t, s, ["id"], update_columns=["val"], exclude_columns=["tag"])
    with _pytest.raises(IncrementalError, match="not in target schema"):
        merge_upsert(t, s, ["id"], update_columns=["nope"])


@pytest.mark.parametrize("strategy", ["merge", "delete+insert"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_incremental_merge_batch_equivalence(project_dir, spark, seed, strategy, tmp_path):
    """Property: a merge-strategy incremental fed the events table in K
    random day-batches converges to exactly the one-shot full build — order
    of arrival and batch boundaries must not matter (upserts are keyed)."""
    import random

    rng = random.Random(seed)
    days = [1, 2, 3]
    rng.shuffle(days)
    cut = rng.randrange(1, len(days))
    batches = [days[:cut], days[cut:]]

    sql = (
        "{{ config(materialized='incremental', incremental_strategy='"
        + strategy
        + "', unique_key='id') }}\n"
        "select id, day, val from {{ ref('events') }}\n"
        "where day in ({{ var('days') }})\n"
    )
    root, eng = make_engine(project_dir, spark, sql,
                            vars={"days": ",".join(map(str, batches[0]))})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    for batch in batches[1:]:
        e = Engine(root, spark=spark, vars={"days": ",".join(map(str, batch))})
        assert e.invoke(["run"]).success

    got = {(r["id"], r["day"], r["val"])
           for r in eng.store.read("main", "target").collect()}

    # one-shot reference build in a sibling project
    root2, eng2 = make_engine(
        lambda files: _build_into(tmp_path / f"oneshot{strategy[0]}{seed}", files),
        spark, sql, vars={"days": "1,2,3"})
    assert eng2.invoke(["seed"]).success
    assert eng2.invoke(["run"]).success
    want = {(r["id"], r["day"], r["val"])
            for r in eng2.store.read("main", "target").collect()}
    assert got == want


def _build_into(base, files):
    import os as _os
    for rel, content in files.items():
        p = _os.path.join(str(base), rel)
        _os.makedirs(_os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(content)
    return str(base)


def test_python_model_incremental_merge(project_dir, spark):
    """A Python model (def model(dbt, session)) under
    materialized='incremental' + merge: dbt.is_incremental gates the batch
    filter, upserts converge like the SQL twin."""
    py = '''
def model(dbt, session):
    dbt.config(materialized="incremental", incremental_strategy="merge",
               unique_key="id")
    from pyspark.sql import functions as F
    df = dbt.ref("events")
    hi = int(dbt.config.get("meta", {}).get("hi", 0) or 0) or None
    upto = 2 if not dbt.is_incremental else 3
    mult = 1 if not dbt.is_incremental else 10
    return (df.filter(F.col("day") <= upto)
              .select("id", "day", (F.col("val") * mult).alias("val")))
'''
    files = {
        "dbt_project.yml": "name: pyinc\n",
        "seeds/events.csv": EVENTS_CSV,
        "models/target.py": py,
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    rows = {r["id"]: r["val"] for r in eng.store.read("main", "target").collect()}
    assert rows == {1: 10, 2: 20, 3: 30, 4: 40}
    eng2 = Engine(root, spark=spark)
    assert eng2.invoke(["run"]).success
    rows = {r["id"]: r["val"] for r in eng2.store.read("main", "target").collect()}
    # incremental pass: days 1-3 at x10, matched rows updated, 5/6 inserted
    assert rows == {1: 100, 2: 200, 3: 300, 4: 400, 5: 500, 6: 600}


def test_bucketed_incremental_merge_keeps_layout(project_dir, spark):
    """config(bucket_by=..., materialized='incremental', merge): the merged
    relation keeps its bucket spec across runs — bucket-key aggregation
    stays exchange-free after the second (merge) run."""
    sql = """
{{ config(materialized='incremental', incremental_strategy='merge',
          unique_key='id', bucket_by='id', buckets=4) }}
select id, day, val * {{ var('mult', 1) }} as val
from {{ ref('events') }}
where day <= {{ var('upto', 3) }}
"""
    root, eng = make_engine(project_dir, spark, sql, vars={"upto": 2})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    eng2 = Engine(root, spark=spark, vars={"upto": 3, "mult": 10})
    assert eng2.invoke(["run"]).success
    rows = {r["id"]: r["val"] for r in eng2.store.read("main", "target").collect()}
    assert rows == {1: 100, 2: 200, 3: 300, 4: 400, 5: 500, 6: 600}
    rel = eng2.store.get("main", "target")
    assert rel.meta.get("buckets") == 4 and rel.meta.get("bucket_by") == ["id"]
    # bucket-key aggregation needs no exchange (spec survived the rewrite)
    agg = spark.table(rel.identifier).groupBy("id").count()
    plan = agg._sc._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "simple")
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_incremental_append_preserves_spec(project_dir, spark):
    sql = """
{{ config(materialized='incremental', incremental_strategy='append',
          bucket_by='id', buckets=4) }}
select id, day, val from {{ ref('events') }} where day = {{ var('d') }}
"""
    root, eng = make_engine(project_dir, spark, sql, vars={"d": 1})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    eng2 = Engine(root, spark=spark, vars={"d": 2})
    assert eng2.invoke(["run"]).success
    got = sorted(r["id"] for r in eng2.store.read("main", "target").collect())
    assert got == [1, 2, 3, 4]
    rel = eng2.store.get("main", "target")
    agg = spark.table(rel.identifier).groupBy("id").count()
    plan = agg._sc._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "simple")
    assert "Exchange hashpartitioning" not in plan, plan


def test_csv_append_schema_evolution(project_dir, spark):
    """CSV targets read positionally against the persisted schema. A
    schema-evolving incremental append (on_schema_change=sync_all_columns
    dropping a column) now rewrites the WHOLE target once — the warehouse
    ALTER TABLE analog — so the table stays positionally consistent with
    the column removed everywhere instead of erroring or shift-misreading
    older files. Same-schema appends stay fast appends."""
    sql = """
{{ config(materialized='incremental', incremental_strategy='append',
          file_format='csv', on_schema_change='sync_all_columns') }}
select id, day{{ ", val" if not var('dropcol', false) else "" }}
from {{ ref('events') }} where day = {{ var('day', 1) }}
"""
    root, eng = make_engine(project_dir, spark, sql)
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    r = eng.invoke(["run"], )
    assert r.success  # same schema appends fine
    eng.vars = {"dropcol": True, "day": 2}
    r2 = eng.invoke(["run"])
    assert r2.success, [x.message for x in r2.results]
    out = spark.sql("select * from main__target")
    assert out.columns == ["id", "day"]  # dropped everywhere, no mixed files
    assert {row.day for row in out.collect()} == {1, 2}


def test_csv_append_new_tail_column(project_dir, spark):
    """csv + append_new_columns adding a tail column: target rewrites once,
    old rows read as trailing null, new rows carry the value."""
    sql_add = """
{{ config(materialized='incremental', incremental_strategy='append',
          file_format='csv', on_schema_change='append_new_columns') }}
select id, day, val{{ ", 'x' as tag" if var('addcol', false) else "" }}
from {{ ref('events') }} where day = {{ var('day', 1) }}
"""
    root, eng = make_engine(project_dir, spark, sql_add)
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    eng2 = Engine(root, spark=spark, vars={"addcol": True, "day": 2})
    r3 = eng2.invoke(["run"])
    assert r3.success, [x.message for x in r3.results]
    rows = spark.sql("select * from main__target").collect()
    tags = {row.id: row.tag for row in rows}
    assert tags[3] == "x" and tags[1] is None  # old rows: trailing null


def test_compact_with_zorder(project_dir, spark):
    """run-operation compact --args '{relation: t, zorder_by: [a, b]}':
    the rewrite re-clusters accreted appends in Morton order (OPTIMIZE
    ZORDER BY analog) — after compaction every file covers a narrow range
    of BOTH keyed columns; values unchanged."""
    import pyarrow.parquet as pq

    sql = """
{{ config(materialized='incremental', incremental_strategy='append') }}
select id, day, val from {{ ref('events') }} where day = {{ var('day', 1) }}
"""
    root, eng = make_engine(project_dir, spark, sql)
    assert eng.invoke(["seed"]).success
    for day in (1, 2, 3):
        eng.vars = {"day": day}
        assert eng.invoke(["run"]).success
    before = spark.sql("select * from main__target").collect()

    r = eng.invoke(["run-operation", "compact",
                    "--args", '{relation: target, zorder_by: [id, val]}'])
    assert r.success, r.results[0].message

    path = os.path.join(root, "target", "warehouse", "main", "target")
    for dp, _d, fs in os.walk(path):
        for fn in fs:
            if not fn.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(dp, fn))
            names = md.schema.to_arrow_schema().names
            assert "id" in names and "val" in names
    got = sorted((r.id, r.day, r.val)
                 for r in eng.store.read("main", "target").collect())
    assert got == sorted((r.id, r.day, r.val) for r in before)


# ---- round-11: custom incremental strategies (get_incremental_<name>_sql) ----
# Reference: adapter.get_incremental_strategy_macro resolves any non-builtin
# strategy name to a macro get_incremental_<name>_sql (normalizing '+' to '_'),
# exercised by tests/functional/materializations/test_incremental.py:33-53 and
# the microbatch lookup core/dbt/contracts/graph/manifest.py:1763.

INSERT_ONLY_NEW_MACRO = """
{% macro get_incremental_insert_only_new_sql(arg_dict) %}
{% set t = arg_dict['target_relation'] %}
{% set s = arg_dict['temp_relation'] %}
{% set k = arg_dict['unique_key'] %}
INSERT INTO {{ t }}
SELECT {{ arg_dict['dest_columns'] | map(attribute='quoted') | join(', ') }}
FROM {{ s }}
WHERE {{ k }} NOT IN (SELECT {{ k }} FROM {{ t }})
{% endmacro %}
"""

CUSTOM_STRAT_SQL = """
{{ config(materialized='incremental', incremental_strategy='insert_only_new',
          unique_key='id') }}
select id, day, val * {{ var('mult', 1) }} as val
from {{ ref('events') }}
where day <= {{ var('upto', 3) }}
"""


def test_custom_incremental_strategy_e2e(project_dir, spark):
    """A project-defined get_incremental_insert_only_new_sql macro drives the
    incremental run: first-write-wins — existing keys are NOT updated, only
    brand-new keys insert (so run 2's x10 values appear only on new ids)."""
    root, eng = make_engine(
        project_dir, spark, CUSTOM_STRAT_SQL,
        vars={"upto": 2, "mult": 1},
        extra_files={"macros/strategy.sql": INSERT_ONLY_NEW_MACRO},
    )
    assert eng.invoke(["seed"]).success
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    rows = {r["id"]: r["val"] for r in eng.store.read("main", "target").collect()}
    assert rows == {1: 10, 2: 20, 3: 30, 4: 40}
    eng2 = Engine(root, spark=spark, vars={"upto": 3, "mult": 10})
    r = eng2.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    rows = {r["id"]: r["val"] for r in eng2.store.read("main", "target").collect()}
    # ids 1-4 keep their first-run values; only 5,6 arrive (at x10)
    assert rows == {1: 10, 2: 20, 3: 30, 4: 40, 5: 500, 6: 600}


def test_custom_incremental_strategy_multi_statement(project_dir, spark):
    """A strategy macro may return multiple ';'-separated statements — each
    executes in order (delete-flavored emulation: append markers twice)."""
    macro = """
{% macro get_incremental_double_append_sql(arg_dict) %}
{% set t = arg_dict['target_relation'] %}
{% set s = arg_dict['temp_relation'] %}
INSERT INTO {{ t }} SELECT id, day, val FROM {{ s }};
INSERT INTO {{ t }} SELECT id + 1000 as id, day, val FROM {{ s }}
{% endmacro %}
"""
    sql = """
{{ config(materialized='incremental', incremental_strategy='double_append') }}
select id, day, val from {{ ref('events') }} where day = {{ var('d') }}
"""
    root, eng = make_engine(project_dir, spark, sql, vars={"d": 1},
                            extra_files={"macros/strategy.sql": macro})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success  # first run: plain create (2 rows)
    eng2 = Engine(root, spark=spark, vars={"d": 2})
    r = eng2.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    ids = sorted(r["id"] for r in eng2.store.read("main", "target").collect())
    assert ids == [1, 2, 3, 4, 1003, 1004]


def test_unknown_incremental_strategy_names_macro(project_dir, spark):
    """Error-message parity: an unknown strategy names the macro dbt would
    have dispatched (get_incremental_<name>_sql) and the builtin list."""
    sql = CUSTOM_STRAT_SQL.replace("insert_only_new", "no_such_thing")
    root, eng = make_engine(project_dir, spark, sql, vars={"upto": 2})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success  # first run never dispatches a strategy
    eng2 = Engine(root, spark=spark, vars={"upto": 3})
    r = eng2.invoke(["run"])
    assert not r.success
    msgs = " ".join(x.message or "" for x in r.results)
    assert "get_incremental_no_such_thing_sql" in msgs
    assert "unknown incremental_strategy" in msgs


def test_custom_strategy_must_return_sql(project_dir, spark):
    """A strategy macro that return()s a non-string fails loudly."""
    macro = """
{% macro get_incremental_broken_sql(arg_dict) %}
{{ return({'not': 'sql'}) }}
{% endmacro %}
"""
    sql = CUSTOM_STRAT_SQL.replace("insert_only_new", "broken")
    root, eng = make_engine(project_dir, spark, sql, vars={"upto": 2},
                            extra_files={"macros/strategy.sql": macro})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success
    eng2 = Engine(root, spark=spark, vars={"upto": 3})
    r = eng2.invoke(["run"])
    assert not r.success
    msgs = " ".join(x.message or "" for x in r.results)
    assert "must return() the SQL" in msgs


def test_custom_strategy_receives_incremental_predicates(project_dir, spark):
    """arg_dict['incremental_predicates'] reaches the strategy macro
    (reference arg_dict contract) and can scope its DML."""
    macro = """
{% macro get_incremental_pred_append_sql(arg_dict) %}
{% set t = arg_dict['target_relation'] %}
{% set s = arg_dict['temp_relation'] %}
{% set preds = arg_dict['incremental_predicates'] %}
INSERT INTO {{ t }}
SELECT id, day, val FROM {{ s }}
{% if preds %}WHERE {{ preds | join(' AND ') }}{% endif %}
{% endmacro %}
"""
    sql = """
{{ config(materialized='incremental', incremental_strategy='pred_append',
          unique_key='id', incremental_predicates=['day = 2']) }}
select id, day, val from {{ ref('events') }} where day <= {{ var('upto') }}
"""
    root, eng = make_engine(project_dir, spark, sql, vars={"upto": 1},
                            extra_files={"macros/strategy.sql": macro})
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["run"]).success  # first run: plain create (day 1)
    eng2 = Engine(root, spark=spark, vars={"upto": 3})
    r = eng2.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    days = sorted(r["day"] for r in eng2.store.read("main", "target").collect())
    # run 2 offered days 1-3 but the predicate admitted only day 2
    assert days == [1, 1, 2, 2]
