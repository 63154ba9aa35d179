"""Sources: declared external tables resolve in models; freshness evaluation."""

from datetime import datetime

from dbt_spark.runner import Engine
from dbt_spark.sources.freshness import check_freshness
from dbt_spark.operators.materialize import ExecutionContext

SOURCES_YML = """
sources:
  - name: tpch
    tables:
      - name: orders
        meta: {location: "/root/testdata/sf0.001/orders.parquet"}
      - name: events
        loaded_at_field: ts
        freshness:
          warn_after: {count: 1, period: day}
          error_after: {count: 30, period: day}
        meta: {location: "/root/testdata/sf0.001/events.parquet"}
"""

MODEL = """
{{ config(materialized='table') }}
select o_orderpriority, count(*) as n
from {{ source('tpch', 'orders') }}
group by o_orderpriority
"""


def test_source_resolution(project_dir, spark):
    root = project_dir({
        "dbt_project.yml": "name: srcs\n",
        "models/prio.sql": MODEL,
        "models/sources.yml": SOURCES_YML,
    })
    eng = Engine(root, spark=spark)
    manifest = eng.parse()
    assert "source.srcs.tpch.orders" in manifest.sources
    node = manifest.nodes["model.srcs.prio"]
    assert "source.srcs.tpch.orders" in node.depends_on
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    assert eng.store.read("main", "prio").count() == 5


def test_source_freshness(project_dir, spark):
    root = project_dir({
        "dbt_project.yml": "name: srcs\n",
        "models/sources.yml": SOURCES_YML,
    })
    eng = Engine(root, spark=spark)
    manifest = eng.parse()
    node = manifest.sources["source.srcs.tpch.events"]
    ctx = ExecutionContext(
        spark=spark, store=eng.store, manifest=manifest, project=eng.project
    )
    # events ts is 2024-era synthetic data: stale vs 2026-01-01 by far
    res = check_freshness(ctx, node, now=datetime(2026, 1, 1))
    assert res.max_loaded_at is not None
    assert res.status in ("warn", "error")
    # generous `now` right after the data's max ts -> pass
    res2 = check_freshness(ctx, node, now=res.max_loaded_at)
    assert res2.status == "pass"
    assert res2.age_seconds == 0.0


def test_external_source_block_with_partitions(project_dir, spark, tmp_path):
    """external: block (ExternalTable, reference v1/source_definition.py:37-49):
    location/file_format/partitions declare an externally-managed table;
    hive-style partition dirs are discovered by the scan and the partition
    filter prunes directories."""
    import os

    ext_dir = str(tmp_path / "ext_events")
    spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-01"),
         (3, "c", "2024-01-02")],
        "id long, v string, ds string",
    ).write.partitionBy("ds").mode("overwrite").parquet(ext_dir)
    root = project_dir({
        "dbt_project.yml": "name: ext\n",
        "models/day1.sql": (
            "{{ config(materialized='table') }}\n"
            "select id, v from {{ source('raw', 'events') }} "
            "where ds = '2024-01-01'"
        ),
        "models/sources.yml": f"""
sources:
  - name: raw
    tables:
      - name: events
        external:
          location: "{ext_dir}"
          file_format: parquet
          partitions:
            - {{name: ds, data_type: string}}
""",
    })
    eng = Engine(root, spark=spark)
    manifest = eng.parse()
    src = manifest.sources["source.ext.raw.events"]
    assert src.config.meta["location"] == ext_dir
    assert src.config.meta["external_partitions"] == ["ds"]
    r = eng.invoke(["run"])
    assert r.success, [x.message for x in r.results]
    assert eng.store.read("main", "day1").count() == 2


def test_external_partition_validation(project_dir, spark):
    from dbt_spark.plans.compile import CompilationError
    import pytest

    root = project_dir({
        "dbt_project.yml": "name: ext2\n",
        "models/sources.yml": """
sources:
  - name: raw
    tables:
      - name: bad
        external:
          location: "/tmp/x"
          partitions:
            - {name: ds}
""",
    })
    with pytest.raises(CompilationError, match="names and data types"):
        Engine(root, spark=spark).parse()


def test_source_freshness_project_hooks_flag_on(project_dir, spark):
    """flags: source_freshness_run_project_hooks — `source freshness` runs
    project on-run-start/end hooks iff the flag is set (reference
    core/dbt/task/freshness.py:271-276 get_hooks_by_type,
    core/dbt/contracts/project.py:344 ProjectFlags default False).
    Observable: a failing hook propagates when the flag is on."""
    import pytest as _pytest

    root = project_dir({
        "dbt_project.yml": (
            "name: srcs\n"
            "flags: {source_freshness_run_project_hooks: true}\n"
            "on-run-start: ['select * from definitely_missing_table']\n"),
        "models/sources.yml": SOURCES_YML,
    })
    eng = Engine(root, spark=spark)
    with _pytest.raises(RuntimeError, match="on-run-start hook failed"):
        eng.invoke(["source", "freshness"])


def test_source_freshness_project_hooks_flag_off_fires_d017(project_dir, spark):
    """Flag unset (default): hooks do NOT run — the same failing hook is
    skipped, freshness succeeds, and the D017
    SourceFreshnessProjectHooksNotRun deprecation fires."""
    root = project_dir({
        "dbt_project.yml": (
            "name: srcs\n"
            "on-run-start: ['select * from definitely_missing_table']\n"),
        "models/sources.yml": SOURCES_YML,
    })
    eng = Engine(root, spark=spark)
    seen = []
    eng.events.callbacks.append(lambda ev: seen.append((ev.name, ev.code)))
    # must NOT raise the hook failure; the stale fixture data itself may
    # yield error-status freshness rows, which is fine here
    r = eng.invoke(["source", "freshness"])
    assert all("hook" not in (x.message or "") for x in r.results)
    assert ("SourceFreshnessProjectHooksNotRun", "D017") in seen


def test_freshness_threshold_loosened_validation():
    """A warn_after/error_after missing count or period is NO threshold,
    not a parse error — reference Time.exceeded returns False when either
    is None (v1/components.py:117-129; validation loosened by
    Fixes-20250128-135509 for previously-wrong-but-harmless configs)."""
    from dbt_spark.sources.freshness import _threshold_seconds

    assert _threshold_seconds(None) is None
    assert _threshold_seconds({}) is None
    assert _threshold_seconds({"count": 2}) is None          # period missing
    assert _threshold_seconds({"period": "hour"}) is None    # count missing
    assert _threshold_seconds({"count": 2, "period": "hour"}) == 7200
    # unknown period never parsed in any version: still an error
    import pytest as _pt
    with _pt.raises(KeyError):
        _threshold_seconds({"count": 1, "period": "fortnight"})
