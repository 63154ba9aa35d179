"""Round-13 parity with the reference's unreleased fixes:

- I074 MicrobatchModelNoEventTimeInputs fires when no input of a
  microbatch model carries event_time (always fired —
  Fixes-20241209-113806; reference parser/manifest.py:1499-1520)
- I075 InvalidConcurrentBatchesConfig fires when concurrent_batches:
  true is forced on a model that cannot run batches concurrently
  (reference parser/manifest.py:1478-1497)
- non-string event_time on a microbatch input is a parse error
- dbt show --limit -1 means NO limit (task/show.py:29,131 maps
  negative to None instead of passing a negative int)
"""

from __future__ import annotations

from datetime import datetime

import pytest

from dbt_spark.runner import Engine

STREAM_CSV = (
    "id,ts,val\n"
    "1,2020-01-01 05:00:00,1\n"
    "2,2020-01-02 05:00:00,2\n"
)

MB_NOFILTER = """
{{ config(materialized='incremental', incremental_strategy='microbatch',
          event_time='ts', batch_size='day', begin='2020-01-01') }}
select id, ts, val from {{ ref('stream') }}
"""


def _events_named(eng, name):
    return [e for e in eng.events.captured if e.name == name]


class _Capture:
    def __init__(self, eng):
        self.eng = eng
        eng.events.captured = []
        eng.events.callbacks.append(
            lambda ev: eng.events.captured.append(ev))


def test_microbatch_no_event_time_inputs_warns(project_dir, spark):
    files = {
        "dbt_project.yml": "name: mbwarn\n",
        "seeds/stream.csv": STREAM_CSV,
        "models/target.sql": MB_NOFILTER,
    }
    eng = Engine(project_dir(files), spark=spark)
    _Capture(eng)
    eng.parse()
    evs = _events_named(eng, "MicrobatchModelNoEventTimeInputs")
    assert len(evs) == 1
    assert evs[0].data["model_name"] == "target"
    assert evs[0].code == "I074"


def test_microbatch_filtered_input_does_not_warn(project_dir, spark):
    files = {
        "dbt_project.yml": "name: mbok\n",
        "seeds/stream.csv": STREAM_CSV,
        "seeds/schema.yml": (
            "seeds:\n  - name: stream\n    config:\n      event_time: ts\n"
        ),
        "models/target.sql": MB_NOFILTER,
    }
    eng = Engine(project_dir(files), spark=spark)
    _Capture(eng)
    eng.parse()
    assert _events_named(eng, "MicrobatchModelNoEventTimeInputs") == []


def test_invalid_concurrent_batches_warns(project_dir, spark):
    """concurrent_batches=true on an UNPARTITIONED microbatch model (which
    this engine always runs sequentially) warns I075."""
    files = {
        "dbt_project.yml": "name: mbconc\n",
        "seeds/stream.csv": STREAM_CSV,
        "seeds/schema.yml": (
            "seeds:\n  - name: stream\n    config:\n      event_time: ts\n"
        ),
        "models/target.sql": MB_NOFILTER.replace(
            "begin='2020-01-01'",
            "begin='2020-01-01', concurrent_batches=true"),
    }
    eng = Engine(project_dir(files), spark=spark)
    _Capture(eng)
    eng.parse()
    evs = _events_named(eng, "InvalidConcurrentBatchesConfig")
    assert len(evs) == 1 and evs[0].data["num_models"] == 1


def test_nonstring_event_time_on_input_errors(project_dir, spark):
    from dbt_spark.plans.compile import CompilationError

    files = {
        "dbt_project.yml": "name: mbbad\n",
        "seeds/stream.csv": STREAM_CSV,
        "seeds/schema.yml": (
            "seeds:\n  - name: stream\n    config:\n      event_time: 123\n"
        ),
        "models/target.sql": MB_NOFILTER,
    }
    eng = Engine(project_dir(files), spark=spark)
    with pytest.raises(CompilationError, match="non-string"):
        eng.parse()


def test_show_limit_minus_one_means_unlimited(project_dir, spark):
    files = {
        "dbt_project.yml": "name: showall\n",
        "models/nums.sql": (
            "select * from (values (1),(2),(3),(4),(5),(6),(7),(8),(9),(10),"
            "(11),(12)) as t(n)"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    r = eng.invoke(["show", "--select", "nums", "--limit", "-1"])
    assert r.success
    assert len(r.preview) == 12
    r5 = eng.invoke(["show", "--select", "nums", "--limit", "5"])
    assert len(r5.preview) == 5


def test_retry_respects_threads_override(project_dir, spark):
    """Reference Fixes-20240822-122132: dbt retry ignored --threads. The
    replayed command must run with the retry invocation's --threads."""
    files = {
        "dbt_project.yml": "name: rthreads\n",
        "models/bad.sql": (
            "{{ config(materialized='table') }}\n"
            "select {{ var('boom', 'cast(null as int)') }} as x "
            "{% if var('fail', true) %} from nonexistent_table_xyz "
            "{% endif %}"
        ),
    }
    root = project_dir(files)
    eng = Engine(root, spark=spark, vars={"fail": True})
    assert not eng.invoke(["run"]).success
    eng2 = Engine(root, spark=spark, vars={"fail": False})
    seen = []
    eng2.events.callbacks.append(
        lambda ev: seen.append(ev.data.get("num_threads"))
        if ev.name == "ConcurrencyLine" else None)
    r = eng2.invoke(["retry", "--threads", "7"])
    assert r.success, [x.message for x in r.results]
    assert 7 in seen, seen


def test_microbatch_batch_events_fire(project_dir, spark):
    """Q045 LogStartBatch / Q046 LogBatchResult fire once per batch with
    1-based index/total (reference events/types.py:1731-1773)."""
    files = {
        "dbt_project.yml": "name: mbev\n",
        "seeds/stream.csv": STREAM_CSV,
        "seeds/schema.yml": (
            "seeds:\n  - name: stream\n    config:\n      event_time: ts\n"
        ),
        "models/target.sql": MB_NOFILTER,
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["seed"]).success
    _Capture(eng)
    r = eng.invoke(["run"], now=datetime(2020, 1, 2, 12))  # 2 batches
    assert r.success
    starts = _events_named(eng, "LogStartBatch")
    results = _events_named(eng, "LogBatchResult")
    assert [e.data["batch_index"] for e in starts] == [1, 2]
    assert all(e.data["total_batches"] == 2 for e in starts)
    assert [e.data["status"] for e in results] == ["success", "success"]
    assert all(e.code == "Q046" for e in results)


def test_microbatch_single_batch_runs_exactly_once(project_dir, spark):
    """One grid window → exactly ONE batch executes and pre/post hooks each
    fire once (first batch == last batch). Pins the reference's
    single-batch fix (Fixes-20241209-133317: an extra 'last' batch ran
    when there was only one batch)."""
    files = {
        "dbt_project.yml": "name: mb1\n",
        "seeds/stream.csv": STREAM_CSV,
        "seeds/schema.yml": (
            "seeds:\n  - name: stream\n    config:\n      event_time: ts\n"
        ),
        "models/target.sql": MB_NOFILTER.replace(
            "{{ config(", "{{ config(pre_hook='select 1 as pre_probe', "
            "post_hook='select 1 as post_probe', "),
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["seed"]).success
    _Capture(eng)
    # now inside day 1 → the grid holds exactly one window
    r = eng.invoke(["run"], now=datetime(2020, 1, 1, 23))
    assert r.success
    starts = _events_named(eng, "LogStartBatch")
    results = _events_named(eng, "LogBatchResult")
    assert [e.data["batch_index"] for e in starts] == [1]
    assert all(e.data["total_batches"] == 1 for e in starts)
    assert len(results) == 1
    rows = eng.store.read("main", "target").count()
    assert rows == 1  # only the 2020-01-01 event landed


def test_ls_output_json_microbatch_model(project_dir, spark):
    """`dbt ls --output json` on a microbatch model serializes cleanly
    (reference Fixes-20250109-123309: batch objects broke list --output
    json) and carries the microbatch config keys."""
    import json as _json

    files = {
        "dbt_project.yml": "name: mbls\n",
        "seeds/stream.csv": STREAM_CSV,
        "seeds/schema.yml": (
            "seeds:\n  - name: stream\n    config:\n      event_time: ts\n"
        ),
        "models/target.sql": MB_NOFILTER,
    }
    eng = Engine(project_dir(files), spark=spark)
    res = eng.invoke(["ls", "--output", "json", "--select", "target"])
    assert res.success
    [line] = [x.message for x in res.results]
    d = _json.loads(line)
    assert d["name"] == "target"
    cfg = d["config"]
    assert cfg["incremental_strategy"] == "microbatch"
    assert cfg["event_time"] == "ts"
    assert cfg["batch_size"] == "day"


def test_secondary_profiles_resolution(project_dir, spark, tmp_path):
    """`secondary_profiles:` on the selected output resolve into
    Project.secondary_profiles with the reference's rules (config/
    profile.py:305-362): target override > entry target > single-output
    inference; nesting and duplicate names are profile errors."""
    import pytest as _pt

    from dbt_spark.project import Project, _parse_secondary_profiles

    root = project_dir({
        "dbt_project.yml": "name: secp\nprofile: main_prof\n",
        "models/m.sql": "select 1 as x",
        "profiles.yml": (
            "main_prof:\n"
            "  target: dev\n"
            "  outputs:\n"
            "    dev:\n"
            "      schema: dev_sch\n"
            "      secondary_profiles:\n"
            "        - warehouse_b:\n"
            "            outputs:\n"
            "              only: {schema: b_sch}\n"
            "        - warehouse_c:\n"
            "            target: t2\n"
            "            outputs:\n"
            "              t1: {schema: c1}\n"
            "              t2: {schema: c2}\n"
        ),
    })
    proj = Project.load(root)
    # the execution profile stays a flat credentials dict
    assert "secondary_profiles" not in proj.profile
    assert proj.profile["schema"] == "dev_sch"
    sec = proj.secondary_profiles
    # single-output target-name inference
    assert sec["warehouse_b"]["schema"] == "b_sch"
    assert sec["warehouse_b"]["target_name"] == "only"
    # entry's own target key picks the output
    assert sec["warehouse_c"]["schema"] == "c2"

    # duplicate name -> error
    with _pt.raises(ValueError, match="already defined"):
        _parse_secondary_profiles(
            {"secondary_profiles": [{"a": {"schema": "x"}},
                                    {"a": {"schema": "y"}}]}, None)
    # nested secondary profiles -> error
    with _pt.raises(ValueError, match="nested"):
        _parse_secondary_profiles(
            {"secondary_profiles": [
                {"a": {"schema": "x",
                       "secondary_profiles": [{"b": {"schema": "y"}}]}}]},
            None)
