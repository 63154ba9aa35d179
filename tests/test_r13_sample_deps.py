"""Round-13: sample-mode dependency coverage parity with the 1.10
changelog (reference .changes/unreleased/Features-20250212-173743 'Allow
for sampling of ref'd seeds', Features-20250214-152957 'Allow sampling
nodes snapshots depend on and of snapshots as a dependency',
Features-20250213-182932 'Enable sample mode for build').

--sample '<n> <grain>' pushes a trailing event-time window into every
event_time-configured ref/source scan — these tests prove the push-down
reaches SEED refs and SNAPSHOT refs, and works under `build`.
"""

from __future__ import annotations

from datetime import datetime

from dbt_spark.runner import Engine

SEED_CSV = (
    "id,ts,val\n"
    "1,2020-01-01 01:00:00,10\n"
    "2,2020-01-05 01:00:00,20\n"
    "3,2020-01-09 01:00:00,30\n"
)


def test_sample_filters_ref_d_seed(project_dir, spark):
    files = {
        "dbt_project.yml": "name: sampseed\n",
        "seeds/ev.csv": SEED_CSV,
        "seeds/schema.yml": (
            "seeds:\n  - name: ev\n    config:\n      event_time: ts\n"
        ),
        "models/latest.sql": (
            "{{ config(materialized='table') }}\n"
            "select id, ts, val from {{ ref('ev') }}"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["seed"]).success
    # trailing 2-day window as of Jan 10: only id=3 (Jan 9) survives
    r = eng.invoke(["run", "--sample", "2 days"],
                   now=datetime(2020, 1, 10, 12))
    assert r.success, [x.message for x in r.results]
    rows = eng.store.read("main", "latest").collect()
    assert sorted(x["id"] for x in rows) == [3]
    # without --sample the full seed flows through
    assert eng.invoke(["run"]).success
    assert eng.store.read("main", "latest").count() == 3


def test_sample_filters_snapshot_as_dependency_under_build(project_dir, spark):
    """A downstream model ref'ing a SNAPSHOT gets the sample window pushed
    into the snapshot scan (snapshot rows carry the source event_time
    column), and the whole path runs under `build`."""
    files = {
        "dbt_project.yml": "name: sampsnap\n",
        "seeds/ev.csv": SEED_CSV,
        "snapshots/snap_ev.sql": (
            "{% snapshot snap_ev %}\n"
            "{{ config(unique_key='id', strategy='timestamp', "
            "updated_at='ts', event_time='ts') }}\n"
            "select id, ts, val from {{ ref('ev') }}\n"
            "{% endsnapshot %}\n"
        ),
        "models/from_snap.sql": (
            "{{ config(materialized='table') }}\n"
            "select id, ts, val from {{ ref('snap_ev') }}"
        ),
    }
    eng = Engine(project_dir(files), spark=spark)
    assert eng.invoke(["seed"]).success
    assert eng.invoke(["snapshot"]).success
    r = eng.invoke(["build", "--select", "from_snap", "--sample", "2 days"],
                   now=datetime(2020, 1, 10, 12))
    assert r.success, [x.message for x in r.results]
    rows = eng.store.read("main", "from_snap").collect()
    assert sorted(x["id"] for x in rows) == [3]
