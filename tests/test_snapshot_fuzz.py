"""Differential fuzzing for snapshot SCD2 semantics.

Seeded random state sequences of a small dimension (keys appearing,
changing value, vanishing, reappearing) run through the REAL snapshot
materializer (operators/snapshot.py::materialize_snapshot) under both
strategies (check / timestamp) and both executable hard_deletes modes
(ignore / invalidate), compared exactly against a pure-python SCD2 replay
oracle (reference semantics: snapshot strategy docs +
core snapshot materialization — close at the new version's timestamp,
valid_from = version timestamp, vanished keys closed at run_ts under
invalidate).

Same discipline as tests/test_differential_fuzz.py: fixed seeds, family
base rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random
import tempfile

import pytest

from dbt_spark.catalog import RelationStore
from dbt_spark.operators.materialize import ExecutionContext
from dbt_spark.operators.snapshot import materialize_snapshot
from dbt_spark.plans.manifest import Manifest, ManifestNode, NodeConfig, NodeType
from dbt_spark.project import Project

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 140_000  # family seed base (after the incremental-fuzz 130k block)

TS = [f"2024-01-0{i} 00:00:00" for i in range(1, 7)]
VALUES = ["red", "green", "blue"]


def _gen_states(seed: int):
    """(strategy, hard_deletes, [(ts, {k: (v, updated_at)})...])."""
    rng = random.Random(_BASE + _OFF + seed)
    strategy = "check" if seed % 2 == 0 else "timestamp"
    hard_deletes = ["ignore", "invalidate"][(seed // 2) % 2]
    n_batches = rng.randrange(2, 5)
    last: dict[int, tuple[str, str]] = {}
    batches = []
    for b in range(n_batches):
        ts = TS[b]
        state = {}
        for k in range(1, 7):
            if rng.random() < 0.75:
                if k in last and rng.random() < 0.5:
                    v, ua = last[k]  # unchanged value, unchanged updated_at
                else:
                    v = rng.choice(VALUES)
                    prev = last.get(k)
                    # bump updated_at when (and only when) we emit a change;
                    # occasionally bump it with the SAME value (timestamp
                    # strategy must re-version, check must not)
                    ua = ts
                    if prev is not None and v == prev[0] and rng.random() < 0.5:
                        ua = prev[1]
                state[k] = (v, ua)
                last[k] = (v, ua)
        batches.append((ts, state))
    return strategy, hard_deletes, batches


def _replay_oracle(strategy, hard_deletes, batches):
    """Pure-python SCD2 replay. Rows: [k, v, valid_from, valid_to]."""
    rows: list[list] = []  # mutable [k, v, ua, valid_from, valid_to]
    current: dict[int, list] = {}
    first = True
    for ts, state in batches:
        if first:
            for k, (v, ua) in state.items():
                vf = ua if strategy == "timestamp" else ts
                r = [k, v, ua if strategy == "timestamp" else ts, vf, None]
                rows.append(r)
                current[k] = r
            first = False
            continue
        for k, (v, ua) in state.items():
            cur = current.get(k)
            if cur is None:
                vf = ua if strategy == "timestamp" else ts
                r = [k, v, ua if strategy == "timestamp" else ts, vf, None]
                rows.append(r)
                current[k] = r
                continue
            if strategy == "timestamp":
                changed = ua > cur[2]
                version_ts = ua
            else:
                changed = v != cur[1]
                version_ts = ts
            if changed:
                cur[4] = version_ts  # close old at the new version's ts
                r = [k, v, ua if strategy == "timestamp" else ts,
                     version_ts, None]
                rows.append(r)
                current[k] = r
        if hard_deletes == "invalidate":
            for k in list(current):
                if k not in state and current[k][4] is None:
                    current[k][4] = ts
                    del current[k]
    return sorted(
        (r[0], r[1], r[3], r[4] or "") for r in rows
    )


def _batch_sql(strategy, state) -> str:
    if not state:
        return (
            "SELECT CAST(NULL AS BIGINT) AS k, CAST(NULL AS STRING) AS v"
            + (", CAST(NULL AS TIMESTAMP) AS updated_at"
               if strategy == "timestamp" else "")
            + " WHERE 1=0"
        )
    rows = ", ".join(
        f"({k}, '{v}'" + (f", TIMESTAMP '{ua}'" if strategy == "timestamp"
                          else "") + ")"
        for k, (v, ua) in sorted(state.items())
    )
    cols = "k, v" + (", updated_at" if strategy == "timestamp" else "")
    return (
        f"SELECT CAST(k AS BIGINT) AS k, v"
        + (", updated_at" if strategy == "timestamp" else "")
        + f" FROM (VALUES {rows}) AS t({cols})"
    )


@pytest.mark.parametrize("seed", range(20))
def test_snapshot_scd2_differential(spark, seed):
    strategy, hard_deletes, batches = _gen_states(seed)
    tmp = tempfile.mkdtemp(prefix="dbt_spark_snapfuzz_")
    project = Project(
        name="snapfuzz",
        root=tmp,
        profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                 "threads": 2},
    )
    ctx = ExecutionContext(
        spark=spark,
        store=RelationStore(spark, project.profile["warehouse"]),
        manifest=Manifest(project_name="snapfuzz"),
        project=project,
    )
    cfg = {
        "materialized": "snapshot",
        "unique_key": "k",
        "strategy": strategy,
        "hard_deletes": hard_deletes,
    }
    if strategy == "timestamp":
        cfg["updated_at"] = "updated_at"
    else:
        cfg["check_cols"] = ["v"]
    node = ManifestNode(
        unique_id=f"snapshot.snapfuzz.s{seed}",
        name=f"s{seed}",
        package_name="snapfuzz",
        path=f"snapshots/s{seed}.sql",
        resource_type=NodeType.Snapshot,
        raw_code="",
        config=NodeConfig().merged(**cfg),
    )
    for ts, state in batches:
        ctx.snapshot_ts = ts
        node.raw_code = _batch_sql(strategy, state)
        materialize_snapshot(ctx, node)
    got = sorted(
        (r["k"], r["v"],
         r["dbt_valid_from"].strftime("%Y-%m-%d %H:%M:%S"),
         r["dbt_valid_to"].strftime("%Y-%m-%d %H:%M:%S")
         if r["dbt_valid_to"] is not None else "")
        for r in ctx.store.read("main", node.name).collect()
    )
    want = _replay_oracle(strategy, hard_deletes, batches)
    assert got == want, (
        f"seed={seed} strategy={strategy} hard_deletes={hard_deletes} "
        f"batches={batches}"
    )


MIMIC_CHECK_MACRO = """
{% macro snapshot_mimic_check_strategy(node, snapshotted_rel, current_rel, model_config, target_exists) %}
{{ return({
    'unique_key': model_config['unique_key'],
    'row_changed': current_rel ~ '.v <> ' ~ snapshotted_rel ~ '.v'
}) }}
{% endmacro %}
"""


@pytest.mark.parametrize("seed", [s for s in range(12) if s % 2 == 0][:6])
def test_custom_strategy_equals_builtin_check(spark, seed):
    """A custom strategy macro that reproduces the check strategy's
    row_changed expression must produce the IDENTICAL SCD2 table —
    meta columns included — through the snapshot_<name>_strategy
    dispatch path (custom strategies default version_ts to run_ts, the
    same as check)."""
    strategy, hard_deletes, batches = _gen_states(seed)
    assert strategy == "check"  # even seeds

    def run(strategy_name: str, macros: dict) -> list:
        tmp = tempfile.mkdtemp(prefix=f"dbt_spark_snapcust_{strategy_name}_")
        project = Project(
            name="snapfuzz",
            root=tmp,
            profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                     "threads": 2},
        )
        manifest = Manifest(project_name="snapfuzz")
        manifest.macros.update(macros)
        ctx = ExecutionContext(
            spark=spark,
            store=RelationStore(spark, project.profile["warehouse"]),
            manifest=manifest,
            project=project,
        )
        cfg = {
            "materialized": "snapshot",
            "unique_key": "k",
            "strategy": strategy_name,
            "hard_deletes": hard_deletes,
        }
        if strategy_name == "check":
            cfg["check_cols"] = ["v"]
        node = ManifestNode(
            unique_id=f"snapshot.snapfuzz.c{seed}",
            name=f"c{seed}",
            package_name="snapfuzz",
            path=f"snapshots/c{seed}.sql",
            resource_type=NodeType.Snapshot,
            raw_code="",
            config=NodeConfig().merged(**cfg),
        )
        for ts, state in batches:
            ctx.snapshot_ts = ts
            node.raw_code = _batch_sql("check", state)
            materialize_snapshot(ctx, node)
        return sorted(
            tuple(r[c] for c in ("k", "v", "dbt_valid_from", "dbt_valid_to",
                                 "dbt_updated_at", "dbt_scd_id"))
            for r in ctx.store.read("main", node.name).collect()
        )

    builtin = run("check", {})
    custom = run("mimic_check",
                 {"snapshot_mimic_check_strategy": MIMIC_CHECK_MACRO})
    assert builtin == custom, f"seed={seed} hard_deletes={hard_deletes}"
