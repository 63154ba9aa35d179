"""Differential fuzzing for microbatch incremental semantics.

Seeded random upstream-version sequences run through the REAL microbatch
runner (operators/microbatch.py::run_microbatch): a full build at now1
over upstream v1, then the upstream mutates (updates/inserts/deletes) and
an incremental run at now2 reprocesses only the trailing lookback+1 day
windows. Compared exactly against a window-replacement replay oracle:
each day window holds the upstream version current at the LAST run that
processed it (reference batch semantics:
core/dbt/materializations/incremental/microbatch.py grid + per-batch
replaceWhere).

Fixed seeds; family base 150k rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random
import tempfile
from datetime import datetime, timedelta

import pytest

from dbt_spark.catalog import RelationStore
from dbt_spark.operators.materialize import ExecutionContext
from dbt_spark.operators.microbatch import run_microbatch
from dbt_spark.plans.manifest import Manifest, ManifestNode, NodeConfig, NodeType
from dbt_spark.project import Project

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 150_000

BEGIN = datetime(2024, 1, 1)


def _gen_case(seed: int):
    """(lookback, [(now_i, v_i), ...]) — a full build then 1-2 incremental
    runs, the upstream mutating (update/delete/insert) between each; rows
    are (k, ts, v)."""
    rng = random.Random(_BASE + _OFF + seed)
    lookback = rng.randrange(0, 3)
    now = datetime(2024, 1, rng.randrange(3, 6), 12)
    v = []
    next_k = 1
    for _ in range(14):
        # event times from Dec 30 (before begin: must never appear) through
        # beyond the last grid (appears only once its window is processed)
        day = rng.randrange(-2, 9)
        ts = BEGIN + timedelta(days=day, hours=rng.randrange(0, 24))
        v.append((next_k, ts, rng.randrange(100)))
        next_k += 1
    runs = [(now, list(v))]
    for _ in range(rng.randrange(1, 3)):
        now = now + timedelta(days=rng.randrange(1, 4))
        nv = []
        for (k, ts, val) in v:
            r = rng.random()
            if r < 0.2:
                continue  # deleted upstream
            if r < 0.5:
                nv.append((k, ts, val + 1000))  # updated value
            else:
                nv.append((k, ts, val))  # unchanged
        for _ in range(rng.randrange(1, 5)):  # late-arriving inserts
            day = rng.randrange(0, 9)
            ts = BEGIN + timedelta(days=day, hours=rng.randrange(0, 24))
            nv.append((next_k, ts, rng.randrange(100)))
            next_k += 1
        v = nv
        runs.append((now, list(v)))
    return lookback, runs


def _windows(now: datetime) -> list[datetime]:
    """Day-grain grid starts from BEGIN through trunc(now), inclusive."""
    out = []
    d = BEGIN
    while d <= now.replace(hour=0, minute=0, second=0, microsecond=0):
        out.append(d)
        d += timedelta(days=1)
    return out


def _replay_oracle(lookback, runs):
    """{window_start: rows}: each window holds the upstream version of the
    LAST run that processed it. Run 0 = full build; later runs reprocess
    only the trailing lookback+1 day windows of their grid."""
    win_rows: dict[datetime, list] = {}

    def window_of(ts):
        return ts.replace(hour=0, minute=0, second=0, microsecond=0)

    for i, (now, v) in enumerate(runs):
        if i == 0:
            wins = _windows(now)
        else:
            inc_start = now.replace(
                hour=0, minute=0, second=0, microsecond=0
            ) - timedelta(days=lookback)
            wins = [w for w in _windows(now) if w >= inc_start]
        for w in wins:
            win_rows[w] = [r for r in v if window_of(r[1]) == w]
    return sorted(
        (k, ts.strftime("%Y-%m-%d %H:%M:%S"), v)
        for rows in win_rows.values() for (k, ts, v) in rows
    )


def _values_sql(rows, view: str) -> str:
    if not rows:
        return (
            f"SELECT CAST(NULL AS BIGINT) AS k, CAST(NULL AS TIMESTAMP) AS ts,"
            f" CAST(NULL AS BIGINT) AS v WHERE 1=0"
        )
    lits = ", ".join(
        f"({k}, TIMESTAMP '{ts.strftime('%Y-%m-%d %H:%M:%S')}', {v})"
        for (k, ts, v) in rows
    )
    return (
        f"SELECT CAST(k AS BIGINT) AS k, ts, CAST(v AS BIGINT) AS v "
        f"FROM (VALUES {lits}) AS t(k, ts, v)"
    )


@pytest.mark.parametrize("seed", range(16))
def test_microbatch_differential(spark, seed):
    lookback, runs = _gen_case(seed)
    tmp = tempfile.mkdtemp(prefix="dbt_spark_mbfuzz_")
    project = Project(
        name="mbfuzz",
        root=tmp,
        profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                 "threads": 2},
    )
    ctx = ExecutionContext(
        spark=spark,
        store=RelationStore(spark, project.profile["warehouse"]),
        manifest=Manifest(project_name="mbfuzz"),
        project=project,
    )
    node = ManifestNode(
        unique_id=f"model.mbfuzz.m{seed}",
        name=f"m{seed}",
        package_name="mbfuzz",
        path=f"models/m{seed}.sql",
        resource_type=NodeType.Model,
        raw_code="",
        config=NodeConfig().merged(
            materialized="incremental",
            incremental_strategy="microbatch",
            event_time="ts",
            batch_size="day",
            begin="2024-01-01",
            lookback=lookback,
        ),
    )
    for i, (now, v) in enumerate(runs):
        node.raw_code = _values_sql(v, f"v{i}")
        run_microbatch(ctx, node, now=now)
    got = sorted(
        (r["k"], r["ts"].strftime("%Y-%m-%d %H:%M:%S"), r["v"])
        for r in ctx.store.read("main", node.name).collect()
    )
    want = _replay_oracle(lookback, runs)
    assert got == want, (
        f"seed={seed} lookback={lookback} "
        f"runs={[(str(n), len(v)) for n, v in runs]}"
    )
