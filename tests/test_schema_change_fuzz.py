"""Differential fuzzing for on_schema_change semantics.

Seeded random batch sequences whose SCHEMA evolves between runs (columns
added, and for sync_all_columns also dropped) run through the REAL
incremental materializer under append and merge, compared exactly against
a pure-pandas replay oracle encoding the reference semantics
(core incremental schema-change docs / adapters' process_schema_changes):

- ignore              target schema frozen; batch extras dropped
- append_new_columns  target gains batch-new columns (old rows NULL)
- sync_all_columns    target takes the batch's exact column set
- fail                any drift raises

Fixed seeds; family base 160k rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random
import tempfile

import pandas as pd
import pytest

from dbt_spark.catalog import RelationStore
from dbt_spark.operators.incremental import IncrementalError, materialize_incremental
from dbt_spark.operators.materialize import ExecutionContext
from dbt_spark.plans.manifest import Manifest, ManifestNode, NodeConfig, NodeType
from dbt_spark.project import Project

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 160_000

EXTRAS = ["e1", "e2"]


def _gen_case(seed: int):
    """(strategy, policy, batches) — batch = list of row dicts sharing the
    batch's column set."""
    rng = random.Random(_BASE + _OFF + seed)
    strategy = ["append", "merge", "delete+insert", "insert_overwrite"][
        seed % 4]
    policy = ["ignore", "append_new_columns", "sync_all_columns"][
        (seed // 4) % 3]
    n_batches = rng.randrange(2, 5)
    batches = []
    cols = ["k", "v"]
    for b in range(n_batches):
        if policy == "ignore":
            # batch 0 pins the target schema; later batches may carry
            # extras (dropped) but must keep supplying the target columns
            cols = (["k", "v"] if b == 0
                    else ["k", "v"] + [e for e in EXTRAS if rng.random() < 0.4])
        elif policy == "append_new_columns":
            # strictly growing column set
            for e in EXTRAS:
                if e not in cols and rng.random() < 0.4:
                    cols.append(e)
        else:  # sync_all_columns: free add/drop of extras
            cols = ["k", "v"] + [e for e in EXTRAS if rng.random() < 0.5]
        ks = rng.sample(range(1, 8), rng.randrange(1, 5))
        rows = []
        for i, k in enumerate(ks):
            r = {"k": k, "v": (seed + 1) * 100 + b * 10 + i,
                 "part": f"p{k % 3}"}
            for e in cols:
                if e in EXTRAS:
                    r[e] = b * 1000 + k
            rows.append(r)
        batches.append((["part"] + list(cols), rows))
    return strategy, policy, batches


def _replay_oracle(strategy, policy, batches):
    """Rows as {col: val} dicts; missing col == NULL."""
    state: list[dict] = []
    target_cols: list[str] = []
    for bi, (cols, rows) in enumerate(batches):
        if bi == 0:
            target_cols = list(cols)
            state = [dict(r) for r in rows]
            continue
        if policy == "ignore":
            batch = [{c: r[c] for c in target_cols} for r in rows]
        elif policy == "append_new_columns":
            for c in cols:
                if c not in target_cols:
                    target_cols.append(c)
            batch = [{c: r.get(c) for c in target_cols} for r in rows]
        else:  # sync_all_columns
            target_cols = list(cols)
            state = [{c: r.get(c) for c in target_cols} for r in state]
            batch = [{c: r.get(c) for c in target_cols} for r in rows]
        if strategy == "append":
            state = [{c: r.get(c) for c in target_cols} for r in state]
            state.extend(batch)
        elif strategy == "insert_overwrite":
            touched = {r["part"] for r in batch}
            state = [
                {c: r.get(c) for c in target_cols}
                for r in state if r["part"] not in touched
            ]
            state.extend(batch)
        else:  # merge / delete+insert on k (identical with unique keys)
            keys = {r["k"] for r in batch}
            state = [
                {c: r.get(c) for c in target_cols}
                for r in state if r["k"] not in keys
            ]
            state.extend(batch)
    return target_cols, state


def _canon(target_cols, rows):
    cols = sorted(target_cols)
    out = []
    for r in rows:
        out.append(tuple(
            None if r.get(c) is None or pd.isna(r.get(c))
            else r.get(c) if isinstance(r.get(c), str)
            else int(r.get(c))
            for c in cols))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def _batch_sql(cols, rows) -> str:
    def lit(r, c):
        return f"'{r[c]}'" if isinstance(r[c], str) else str(r[c])

    lits = ", ".join(
        "(" + ", ".join(lit(r, c) for c in cols) + ")" for r in rows
    )
    casts = ", ".join(
        f"{c}" if c == "part" else f"CAST({c} AS BIGINT) AS {c}"
        for c in cols
    )
    return f"SELECT {casts} FROM (VALUES {lits}) AS t({', '.join(cols)})"


@pytest.mark.parametrize("seed", range(24))
def test_schema_change_differential(spark, seed):
    strategy, policy, batches = _gen_case(seed)
    tmp = tempfile.mkdtemp(prefix="dbt_spark_scfuzz_")
    project = Project(
        name="scfuzz",
        root=tmp,
        profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                 "threads": 2},
    )
    ctx = ExecutionContext(
        spark=spark,
        store=RelationStore(spark, project.profile["warehouse"]),
        manifest=Manifest(project_name="scfuzz"),
        project=project,
    )
    cfg = {
        "materialized": "incremental",
        "incremental_strategy": strategy,
        "on_schema_change": policy,
    }
    if strategy in ("merge", "delete+insert"):
        cfg["unique_key"] = "k"
    if strategy == "insert_overwrite":
        cfg["partition_by"] = "part"
    node = ManifestNode(
        unique_id=f"model.scfuzz.t{seed}",
        name=f"t{seed}",
        package_name="scfuzz",
        path=f"models/t{seed}.sql",
        resource_type=NodeType.Model,
        raw_code="",
        config=NodeConfig().merged(**cfg),
    )
    for cols, rows in batches:
        node.raw_code = _batch_sql(cols, rows)
        materialize_incremental(ctx, node)
    target_cols, state = _replay_oracle(strategy, policy, batches)
    got_df = ctx.store.read("main", node.name).toPandas()
    assert sorted(got_df.columns) == sorted(target_cols), (
        f"seed={seed} strategy={strategy} policy={policy}: "
        f"columns {sorted(got_df.columns)} != {sorted(target_cols)}"
    )
    got = _canon(target_cols, got_df.to_dict("records"))
    want = _canon(target_cols, state)
    assert got == want, (
        f"seed={seed} strategy={strategy} policy={policy} "
        f"batches={[(c, len(r)) for c, r in batches]}"
    )


def test_schema_change_fail_policy(spark):
    tmp = tempfile.mkdtemp(prefix="dbt_spark_scfail_")
    project = Project(
        name="scfuzz", root=tmp,
        profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                 "threads": 2},
    )
    ctx = ExecutionContext(
        spark=spark, store=RelationStore(spark, project.profile["warehouse"]),
        manifest=Manifest(project_name="scfuzz"), project=project,
    )
    node = ManifestNode(
        unique_id="model.scfuzz.failcase", name="failcase",
        package_name="scfuzz", path="models/failcase.sql",
        resource_type=NodeType.Model, raw_code="",
        config=NodeConfig().merged(
            materialized="incremental", incremental_strategy="append",
            on_schema_change="fail"),
    )
    node.raw_code = "SELECT CAST(1 AS BIGINT) AS k, CAST(2 AS BIGINT) AS v"
    materialize_incremental(ctx, node)
    node.raw_code = (
        "SELECT CAST(1 AS BIGINT) AS k, CAST(2 AS BIGINT) AS v, "
        "CAST(3 AS BIGINT) AS e1")
    with pytest.raises(IncrementalError, match="on_schema_change=fail"):
        materialize_incremental(ctx, node)
