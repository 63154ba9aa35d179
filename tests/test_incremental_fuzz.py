"""Differential fuzzing for incremental-strategy semantics.

Seeded random batch sequences (overlapping keys / partitions, occasional
empty batches) run through the REAL incremental materializer
(operators/incremental.py::materialize_incremental) for every strategy,
then the final table is compared exactly against a pure-pandas replay
oracle implementing the reference semantics
(core/dbt/../incremental strategy docs; merge = upsert all columns on
unique_key, delete+insert = delete batch keys then insert, insert_overwrite
= replace touched partitions, append = blind concat).

Same discipline as tests/test_differential_fuzz.py: fixed seeds, family
base rotated by DBT_SPARK_FUZZ_OFFSET.
"""

from __future__ import annotations

import os
import random
import tempfile

import pandas as pd
import pytest

from dbt_spark.catalog import RelationStore
from dbt_spark.operators.incremental import materialize_incremental
from dbt_spark.operators.materialize import ExecutionContext
from dbt_spark.plans.manifest import Manifest, ManifestNode, NodeConfig, NodeType
from dbt_spark.project import Project

_OFF = int(os.environ.get("DBT_SPARK_FUZZ_OFFSET", "0"))
_BASE = 130_000  # family seed base (next free 10k block after the r7 families)

STRATS = ["append", "merge", "delete+insert", "insert_overwrite"]
PARTS = ["p0", "p1", "p2", "p3"]


def _gen_batches(seed: int) -> tuple[str, list[pd.DataFrame]]:
    """(strategy, batches) — each batch a small frame with engineered
    key/partition collisions across batches."""
    rng = random.Random(_BASE + _OFF + seed)
    strategy = STRATS[seed % len(STRATS)]
    n_batches = rng.randrange(2, 5)
    batches = []
    for b in range(n_batches):
        if b > 0 and rng.random() < 0.15:
            batches.append(pd.DataFrame(columns=["k", "part", "val", "b"]))
            continue
        n = rng.randrange(1, 7)
        ks = rng.sample(range(1, 9), n)  # unique k within a batch
        rows = [
            {
                "k": k,
                "part": rng.choice(PARTS),
                "val": (seed + 1) * 100 + b * 10 + i,
                "b": b,
            }
            for i, k in enumerate(ks)
        ]
        batches.append(pd.DataFrame(rows))
    return strategy, batches


def _replay_oracle(strategy: str, batches: list[pd.DataFrame]) -> pd.DataFrame:
    """Pure-pandas reference replay of the strategy semantics."""
    state = pd.DataFrame(columns=["k", "part", "val", "b"])
    for batch in batches:
        if strategy == "append":
            state = pd.concat([state, batch], ignore_index=True)
        elif strategy == "merge":
            if len(batch):
                state = state[~state["k"].isin(set(batch["k"]))]
                state = pd.concat([state, batch], ignore_index=True)
        elif strategy == "delete+insert":
            if len(batch):
                state = state[~state["k"].isin(set(batch["k"]))]
                state = pd.concat([state, batch], ignore_index=True)
        elif strategy == "insert_overwrite":
            if len(batch):
                state = state[~state["part"].isin(set(batch["part"]))]
                state = pd.concat([state, batch], ignore_index=True)
    return state


def _batch_sql(batch: pd.DataFrame) -> str:
    if not len(batch):
        return (
            "SELECT CAST(NULL AS BIGINT) AS k, CAST(NULL AS STRING) AS part, "
            "CAST(NULL AS BIGINT) AS val, CAST(NULL AS BIGINT) AS b WHERE 1=0"
        )
    rows = ", ".join(
        f"({r.k}, '{r.part}', {r.val}, {r.b})" for r in batch.itertuples()
    )
    return (
        f"SELECT CAST(k AS BIGINT) AS k, part, CAST(val AS BIGINT) AS val, "
        f"CAST(b AS BIGINT) AS b FROM (VALUES {rows}) AS t(k, part, val, b)"
    )


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [
        tuple(None if pd.isna(v) else int(v) if isinstance(v, float) else v
              for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("seed", range(24))
def test_incremental_strategy_differential(spark, seed):
    strategy, batches = _gen_batches(seed)
    tmp = tempfile.mkdtemp(prefix="dbt_spark_incfuzz_")
    project = Project(
        name="incfuzz",
        root=tmp,
        profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                 "threads": 2},
    )
    ctx = ExecutionContext(
        spark=spark,
        store=RelationStore(spark, project.profile["warehouse"]),
        manifest=Manifest(project_name="incfuzz"),
        project=project,
    )
    cfg = {"materialized": "incremental", "incremental_strategy": strategy}
    if strategy in ("merge", "delete+insert"):
        cfg["unique_key"] = "k"
    if strategy == "insert_overwrite":
        cfg["partition_by"] = "part"
    node = ManifestNode(
        unique_id=f"model.incfuzz.t{seed}",
        name=f"t{seed}",
        package_name="incfuzz",
        path=f"models/t{seed}.sql",
        resource_type=NodeType.Model,
        raw_code="",
        config=NodeConfig().merged(**cfg),
    )
    for batch in batches:
        node.raw_code = _batch_sql(batch)
        materialize_incremental(ctx, node)
    got = ctx.store.read("main", node.name).toPandas()
    want = _replay_oracle(strategy, batches)
    assert _canon(got) == _canon(want), (
        f"seed={seed} strategy={strategy} "
        f"batches={[len(b) for b in batches]}"
    )


@pytest.mark.parametrize("seed", range(8))
def test_incremental_merge_predicates_differential(spark, seed):
    """incremental_predicates scope the MERGE match set (reference
    v1/config.py incremental_predicates — the bound that keeps a 100 TB
    merge from scanning history): target rows outside the predicate pass
    through untouched even when their key matches, so a batch row with
    that key INSERTS beside them. Replayed against a pure-pandas oracle
    encoding exactly that."""
    rng = random.Random(_BASE + _OFF + 5000 + seed)
    pred_b = rng.randrange(0, 3)
    n_batches = rng.randrange(2, 5)
    batches = []
    for b in range(n_batches):
        n = rng.randrange(1, 7)
        ks = rng.sample(range(1, 9), n)
        batches.append(pd.DataFrame([
            {"k": k, "part": PARTS[k % len(PARTS)],
             "val": (seed + 1) * 100 + b * 10 + i, "b": b}
            for i, k in enumerate(ks)
        ]))

    # oracle: merge where only rows with b >= pred_b are match candidates
    state = pd.DataFrame(columns=["k", "part", "val", "b"])
    for batch in batches:
        if not len(state):
            state = batch.copy()
            continue
        scoped = state[state["b"] >= pred_b]
        untouched = state[~(state["b"] >= pred_b)]
        scoped = scoped[~scoped["k"].isin(set(batch["k"]))]
        state = pd.concat([scoped, untouched, batch], ignore_index=True)

    tmp = tempfile.mkdtemp(prefix="dbt_spark_incpred_")
    project = Project(
        name="incpred", root=tmp,
        profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                 "threads": 2},
    )
    ctx = ExecutionContext(
        spark=spark, store=RelationStore(spark, project.profile["warehouse"]),
        manifest=Manifest(project_name="incpred"), project=project,
    )
    cfg = NodeConfig().merged(
        materialized="incremental", incremental_strategy="merge",
        unique_key="k")
    cfg.meta["incremental_predicates"] = [f"b >= {pred_b}"]
    node = ManifestNode(
        unique_id=f"model.incpred.t{seed}", name=f"t{seed}",
        package_name="incpred", path=f"models/t{seed}.sql",
        resource_type=NodeType.Model, raw_code="", config=cfg,
    )
    for batch in batches:
        node.raw_code = _batch_sql(batch)
        materialize_incremental(ctx, node)
    got = ctx.store.read("main", node.name).toPandas()
    assert _canon(got) == _canon(state), (
        f"seed={seed} pred_b={pred_b} batches={[len(b) for b in batches]}"
    )


# ---- round-11: custom strategy seeds (get_incremental_<name>_sql dispatch) ----

_CUSTOM_MACRO = """
{% macro get_incremental_insert_only_new_sql(arg_dict) %}
{% set t = arg_dict['target_relation'] %}
{% set s = arg_dict['temp_relation'] %}
INSERT INTO {{ t }}
SELECT {{ arg_dict['dest_columns'] | map(attribute='quoted') | join(', ') }}
FROM {{ s }}
WHERE k NOT IN (SELECT k FROM {{ t }})
{% endmacro %}
"""


def _replay_insert_only_new(batches: list[pd.DataFrame]) -> pd.DataFrame:
    """First-write-wins: a key's first-seen row is never updated."""
    state = pd.DataFrame(columns=["k", "part", "val", "b"])
    first = True
    for batch in batches:
        if first:
            # first run is a plain create (strategy not dispatched)
            state = batch.copy()
            first = False
        elif len(batch):
            fresh = batch[~batch["k"].isin(set(state["k"]))]
            state = pd.concat([state, fresh], ignore_index=True)
    return state


@pytest.mark.parametrize("seed", range(8))
def test_incremental_custom_strategy_differential(spark, seed):
    """Seeded batch sequences through the REAL materializer with a
    user-defined strategy macro vs the pure-pandas first-write-wins replay."""
    rng = random.Random(_BASE + _OFF + 7000 + seed)
    n_batches = rng.randrange(2, 5)
    batches = []
    for b in range(n_batches):
        if b > 0 and rng.random() < 0.15:
            batches.append(pd.DataFrame(columns=["k", "part", "val", "b"]))
            continue
        n = rng.randrange(1, 7)
        ks = rng.sample(range(1, 9), n)
        batches.append(pd.DataFrame([
            {"k": k, "part": rng.choice(PARTS),
             "val": (seed + 1) * 100 + b * 10 + i, "b": b}
            for i, k in enumerate(ks)
        ]))
    tmp = tempfile.mkdtemp(prefix="dbt_spark_inccustom_")
    project = Project(
        name="inccustom", root=tmp,
        profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                 "threads": 2},
    )
    manifest = Manifest(project_name="inccustom")
    manifest.macros["get_incremental_insert_only_new_sql"] = _CUSTOM_MACRO
    ctx = ExecutionContext(
        spark=spark,
        store=RelationStore(spark, project.profile["warehouse"]),
        manifest=manifest,
        project=project,
    )
    node = ManifestNode(
        unique_id=f"model.inccustom.t{seed}", name=f"t{seed}",
        package_name="inccustom", path=f"models/t{seed}.sql",
        resource_type=NodeType.Model, raw_code="",
        config=NodeConfig().merged(
            materialized="incremental",
            incremental_strategy="insert_only_new", unique_key="k"),
    )
    for batch in batches:
        node.raw_code = _batch_sql(batch)
        materialize_incremental(ctx, node)
    got = ctx.store.read("main", node.name).toPandas()
    want = _replay_insert_only_new(batches)
    assert _canon(got) == _canon(want), (
        f"seed={seed} batches={[len(b) for b in batches]}")


_TAGGED_MACRO = """
{% macro get_incremental_tagged_append_sql(arg_dict) %}
{% set t = arg_dict['target_relation'] %}
{% set s = arg_dict['temp_relation'] %}
INSERT INTO {{ t }} SELECT k, part, val, b FROM {{ s }};
INSERT INTO {{ t }} SELECT k + 1000 AS k, part, val, b FROM {{ s }}
{% endmacro %}
"""


def _replay_tagged_append(batches: list[pd.DataFrame]) -> pd.DataFrame:
    """First run creates; each later batch appends itself AND a k+1000
    tagged copy (the two-statement shape: both statements must run, in
    order, on every incremental run)."""
    state = pd.DataFrame(columns=["k", "part", "val", "b"])
    first = True
    for batch in batches:
        if first:
            state = batch.copy()
            first = False
        elif len(batch):
            tagged = batch.copy()
            tagged["k"] = tagged["k"] + 1000
            state = pd.concat([state, batch, tagged], ignore_index=True)
    return state


@pytest.mark.parametrize("seed", range(6))
def test_incremental_custom_multistatement_differential(spark, seed):
    """';'-separated multi-statement strategy DML: every statement runs on
    every incremental run, verified against a pure-pandas replay."""
    rng = random.Random(_BASE + _OFF + 8000 + seed)
    n_batches = rng.randrange(2, 4)
    batches = []
    for b in range(n_batches):
        n = rng.randrange(1, 6)
        ks = rng.sample(range(1, 9), n)
        batches.append(pd.DataFrame([
            {"k": k, "part": rng.choice(PARTS),
             "val": (seed + 1) * 100 + b * 10 + i, "b": b}
            for i, k in enumerate(ks)
        ]))
    tmp = tempfile.mkdtemp(prefix="dbt_spark_incmulti_")
    project = Project(
        name="incmulti", root=tmp,
        profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                 "threads": 2},
    )
    manifest = Manifest(project_name="incmulti")
    manifest.macros["get_incremental_tagged_append_sql"] = _TAGGED_MACRO
    ctx = ExecutionContext(
        spark=spark,
        store=RelationStore(spark, project.profile["warehouse"]),
        manifest=manifest, project=project,
    )
    node = ManifestNode(
        unique_id=f"model.incmulti.t{seed}", name=f"t{seed}",
        package_name="incmulti", path=f"models/t{seed}.sql",
        resource_type=NodeType.Model, raw_code="",
        config=NodeConfig().merged(
            materialized="incremental",
            incremental_strategy="tagged_append"),
    )
    for batch in batches:
        node.raw_code = _batch_sql(batch)
        materialize_incremental(ctx, node)
    got = ctx.store.read("main", node.name).toPandas()
    want = _replay_tagged_append(batches)
    assert _canon(got) == _canon(want), (
        f"seed={seed} batches={[len(b) for b in batches]}")


# ---- round-12: quote-aware DML splitting + predicate-scoped custom strategy ----

def test_split_dml_statements_lexical_classes():
    """ADVICE r11: ';' inside string literals / comments / backtick
    identifiers must not split; doubled-quote and backslash escapes stay
    inside the literal."""
    from dbt_spark.operators.incremental import split_dml_statements as split

    assert split("select 1; select 2") == ["select 1", "select 2"]
    assert split("select 'a;b'; select 2") == ["select 'a;b'", "select 2"]
    assert split('select "x;y"; select 2') == ['select "x;y"', "select 2"]
    assert split("select `c;1` from t; select 2") == [
        "select `c;1` from t", "select 2"]
    # doubled-quote escape keeps the literal open across the would-be close
    assert split("select 'it''s;fine'; select 2") == [
        "select 'it''s;fine'", "select 2"]
    # backslash escape
    assert split(r"select 'a\';b'; select 2") == [r"select 'a\';b'", "select 2"]
    # line comment swallows its ';' to end-of-line only
    assert split("select 1 -- no;split\n; select 2") == [
        "select 1 -- no;split", "select 2"]
    # block comment swallows ';' until */
    assert split("select 1 /* a;b */; select 2") == [
        "select 1 /* a;b */", "select 2"]
    # trailing semicolon / blanks produce no empty statements
    assert split("select 1; ;\n;") == ["select 1"]
    assert split("") == []


_LIT_SEMI_MACRO = """
{% macro get_incremental_lit_semicolon_sql(arg_dict) %}
{% set t = arg_dict['target_relation'] %}
{% set s = arg_dict['temp_relation'] %}
INSERT INTO {{ t }} SELECT k, 'x;y' AS part, val, b FROM {{ s }};
-- comment with ; semicolons stays attached to statement two
INSERT INTO {{ t }} SELECT k + 1000 AS k, part, val, b FROM {{ s }}
WHERE part <> 'a;b'
{% endmacro %}
"""


def _replay_lit_semicolon(batches: list[pd.DataFrame]) -> pd.DataFrame:
    """First run creates; each later batch appends a part='x;y' copy plus a
    k+1000 tagged copy (the WHERE never filters: parts are p0..p3)."""
    state = pd.DataFrame(columns=["k", "part", "val", "b"])
    first = True
    for batch in batches:
        if first:
            state = batch.copy()
            first = False
        elif len(batch):
            lit = batch.copy()
            lit["part"] = "x;y"
            tagged = batch.copy()
            tagged["k"] = tagged["k"] + 1000
            state = pd.concat([state, lit, tagged], ignore_index=True)
    return state


@pytest.mark.parametrize("seed", range(4))
def test_incremental_custom_semicolon_literal_differential(spark, seed):
    """ADVICE r11 end-to-end: custom-strategy DML whose first statement
    contains a ';' inside a string literal (and a ';' in a line comment)
    must execute as exactly two statements."""
    rng = random.Random(_BASE + _OFF + 9000 + seed)
    n_batches = rng.randrange(2, 4)
    batches = []
    for b in range(n_batches):
        n = rng.randrange(1, 6)
        ks = rng.sample(range(1, 9), n)
        batches.append(pd.DataFrame([
            {"k": k, "part": rng.choice(PARTS),
             "val": (seed + 1) * 100 + b * 10 + i, "b": b}
            for i, k in enumerate(ks)
        ]))
    tmp = tempfile.mkdtemp(prefix="dbt_spark_inclitsemi_")
    project = Project(
        name="inclitsemi", root=tmp,
        profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                 "threads": 2},
    )
    manifest = Manifest(project_name="inclitsemi")
    manifest.macros["get_incremental_lit_semicolon_sql"] = _LIT_SEMI_MACRO
    ctx = ExecutionContext(
        spark=spark, store=RelationStore(spark, project.profile["warehouse"]),
        manifest=manifest, project=project,
    )
    node = ManifestNode(
        unique_id=f"model.inclitsemi.t{seed}", name=f"t{seed}",
        package_name="inclitsemi", path=f"models/t{seed}.sql",
        resource_type=NodeType.Model, raw_code="",
        config=NodeConfig().merged(
            materialized="incremental",
            incremental_strategy="lit_semicolon"),
    )
    for batch in batches:
        node.raw_code = _batch_sql(batch)
        materialize_incremental(ctx, node)
    got = ctx.store.read("main", node.name).toPandas()
    want = _replay_lit_semicolon(batches)
    assert _canon(got) == _canon(want), (
        f"seed={seed} batches={[len(b) for b in batches]}")


_PRED_SCOPED_MACRO = """
{% macro get_incremental_pred_append_sql(arg_dict) %}
{% set t = arg_dict['target_relation'] %}
{% set s = arg_dict['temp_relation'] %}
INSERT INTO {{ t }}
SELECT k, part, val, b FROM {{ s }}
WHERE {{ arg_dict['incremental_predicates'] | join(' AND ') }}
{% endmacro %}
"""


def _replay_pred_append(batches: list[pd.DataFrame], parity: int) -> pd.DataFrame:
    """First run creates unfiltered; later batches append only rows whose
    val has the configured parity (the predicate the macro consumed)."""
    state = pd.DataFrame(columns=["k", "part", "val", "b"])
    first = True
    for batch in batches:
        if first:
            state = batch.copy()
            first = False
        elif len(batch):
            keep = batch[batch["val"] % 2 == parity]
            state = pd.concat([state, keep], ignore_index=True)
    return state


@pytest.mark.parametrize("seed", range(6))
def test_incremental_custom_strategy_consumes_predicates(spark, seed):
    """VERDICT r11 #6: incremental_predicates flow through arg_dict into a
    custom strategy's DML and actually scope it — differential vs a
    pure-pandas replay that applies the same predicate."""
    rng = random.Random(_BASE + _OFF + 9500 + seed)
    parity = seed % 2
    n_batches = rng.randrange(2, 5)
    batches = []
    for b in range(n_batches):
        n = rng.randrange(1, 7)
        ks = rng.sample(range(1, 9), n)
        batches.append(pd.DataFrame([
            {"k": k, "part": rng.choice(PARTS),
             "val": (seed + 1) * 100 + b * 10 + i, "b": b}
            for i, k in enumerate(ks)
        ]))
    tmp = tempfile.mkdtemp(prefix="dbt_spark_incpredcust_")
    project = Project(
        name="incpredcust", root=tmp,
        profile={"warehouse": os.path.join(tmp, "wh"), "schema": "main",
                 "threads": 2},
    )
    manifest = Manifest(project_name="incpredcust")
    manifest.macros["get_incremental_pred_append_sql"] = _PRED_SCOPED_MACRO
    ctx = ExecutionContext(
        spark=spark, store=RelationStore(spark, project.profile["warehouse"]),
        manifest=manifest, project=project,
    )
    cfg = NodeConfig().merged(
        materialized="incremental", incremental_strategy="pred_append")
    cfg.meta["incremental_predicates"] = [f"val % 2 = {parity}"]
    node = ManifestNode(
        unique_id=f"model.incpredcust.t{seed}", name=f"t{seed}",
        package_name="incpredcust", path=f"models/t{seed}.sql",
        resource_type=NodeType.Model, raw_code="", config=cfg,
    )
    for batch in batches:
        node.raw_code = _batch_sql(batch)
        materialize_incremental(ctx, node)
    got = ctx.store.read("main", node.name).toPandas()
    want = _replay_pred_append(batches, parity)
    assert _canon(got) == _canon(want), (
        f"seed={seed} parity={parity} batches={[len(b) for b in batches]}")
