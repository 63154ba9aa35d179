"""defer / clone / --empty / metadata-only nodes.

Parity map:
- --defer --state: core/dbt/context/providers.py:634-655
- clone:           core/dbt/task/clone.py:19-99 (SHALLOW CLONE semantics)
- --empty:         providers.py:242-243 (limit-0 refs, schema-only dry run)
- exposures etc.:  schema_yaml_readers.py + no_op_runner.py
"""

import os

import pytest

from dbt_spark.runner import Engine

from tests.conftest import SF_DIR


PROD = {
    "dbt_project.yml": "name: dfr\n",
    "models/sources.yml": """
sources:
  - name: tpch
    tables:
      - name: orders
        meta: {location: "__SF__/orders.parquet"}
""".replace("__SF__", SF_DIR),
    "models/base_orders.sql": (
        "{{ config(materialized='table') }} "
        "select o_orderkey, o_custkey, o_totalprice from {{ source('tpch','orders') }}"
    ),
    "models/order_rollup.sql": (
        "select o_custkey, count(*) as n from {{ ref('base_orders') }} group by o_custkey"
    ),
}


def _mk(tmp_path, name, files):
    root = tmp_path / name
    for rel, content in files.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    return str(root)


def test_defer_resolves_unbuilt_upstream_to_state(tmp_path, spark):
    prod_dir = _mk(tmp_path, "prod", PROD)
    prod = Engine(prod_dir, spark=spark)
    assert prod.invoke(["run"]).success

    # dev checkout: same project, separate target; build ONLY the downstream
    # model, deferring base_orders to prod's warehouse
    dev_dir = _mk(tmp_path, "dev", PROD)
    dev = Engine(dev_dir, spark=spark)
    r = dev.invoke([
        "run", "--select", "order_rollup",
        "--defer", "--state", os.path.join(prod_dir, "target"),
    ])
    assert r.success, [x.message for x in r.results]
    assert dev.store.read("main", "order_rollup").count() > 0
    # base_orders was NOT built in dev
    assert dev.store.get("main", "base_orders") is None


def test_clone_zero_copy_from_state(tmp_path, spark):
    prod_dir = _mk(tmp_path, "prod", PROD)
    prod = Engine(prod_dir, spark=spark)
    assert prod.invoke(["run"]).success

    dev_dir = _mk(tmp_path, "dev", PROD)
    dev = Engine(dev_dir, spark=spark)
    r = dev.invoke(["clone", "--state", os.path.join(prod_dir, "target")])
    assert r.success
    statuses = {x.unique_id: x.status for x in r.results}
    assert statuses["model.dfr.base_orders"] == "success"
    # cloned relation readable without running anything
    assert dev.store.read("main", "base_orders").count() == \
        prod.store.read("main", "base_orders").count()
    # catalog entry shares prod's data files (zero-copy)
    assert dev.store.get("main", "base_orders").path == \
        prod.store.get("main", "base_orders").path


def test_empty_flag_builds_schema_only(tmp_path, spark):
    pdir = _mk(tmp_path, "empty", PROD)
    eng = Engine(pdir, spark=spark)
    r = eng.invoke(["run", "--empty"])
    assert r.success, [x.message for x in r.results]
    df = eng.store.read("main", "base_orders")
    assert df.columns == ["o_orderkey", "o_custkey", "o_totalprice"]
    assert df.count() == 0


def test_metadata_nodes_parse_and_noop(tmp_path, spark):
    files = dict(PROD)
    files["models/semantic.yml"] = """
exposures:
  - name: finance_dashboard
    type: dashboard
    owner: {email: fin@example.com}
    depends_on: ["ref('order_rollup')"]
semantic_models:
  - name: sem_orders
    model: "ref('order_rollup')"
    measures:
      - name: n_orders
        agg: sum
        expr: 1
metrics:
  - name: order_count
    label: Order count
    type: simple
    type_params: {measure: n_orders}
groups:
  - name: core_team
    owner: {name: Core}
"""
    pdir = _mk(tmp_path, "meta", files)
    eng = Engine(pdir, spark=spark)
    m = eng.parse()
    assert "exposure.dfr.finance_dashboard" in m.nodes
    assert "metric.dfr.order_count" in m.nodes
    assert "model.dfr.order_rollup" in m.nodes["exposure.dfr.finance_dashboard"].depends_on
    r = eng.invoke(["build"])
    assert r.success
    noop = r.by_id("exposure.dfr.finance_dashboard")
    assert noop is not None and noop.message == "NO-OP"
    # exposure selectable with graph operator: +exposure pulls its ancestry
    r = eng.invoke(["ls", "--select", "+finance_dashboard"])
    ids = {x.unique_id for x in r.results}
    assert "model.dfr.order_rollup" in ids and "model.dfr.base_orders" in ids


def test_state_modified_contract(tmp_path, spark):
    """state:modified.contract fires on a column data_type change in a
    contracted model's YAML (raw_code untouched, so modified.body stays
    quiet) and stays quiet on a description-only change — reference
    same_contract semantics (nodes.py:697)."""
    import shutil

    schema_yml = """
models:
  - name: base_orders
    config: {contract: {enforced: true}}
    columns:
      - name: o_orderkey
        data_type: bigint
      - name: o_custkey
        data_type: bigint
      - name: o_totalprice
        data_type: double
        description: "{DESC}"
"""
    files = dict(PROD)
    files["models/schema.yml"] = schema_yml.replace("{DESC}", "total")
    root = _mk(tmp_path, "contractp", files)
    eng = Engine(root, spark=spark)
    assert eng.invoke(["run"]).success, "contracted model should build"
    state = str(tmp_path / "cstate")
    os.makedirs(state, exist_ok=True)
    shutil.copy(os.path.join(root, "target", "manifest.json"), state)

    # unchanged → quiet
    r = eng.invoke(["ls", "--select", "state:modified.contract", "--state", state])
    assert [x.unique_id for x in r.results] == []

    # description-only change → still quiet (not part of the contract)
    with open(os.path.join(root, "models", "schema.yml"), "w") as f:
        f.write(schema_yml.replace("{DESC}", "reworded"))
    r = Engine(root, spark=spark).invoke(
        ["ls", "--select", "state:modified.contract", "--state", state])
    assert [x.unique_id for x in r.results] == []

    # data_type change → contract modified (and the modified umbrella too)
    with open(os.path.join(root, "models", "schema.yml"), "w") as f:
        f.write(schema_yml.replace("{DESC}", "total")
                .replace("data_type: double", "data_type: decimal(18,2)"))
    eng3 = Engine(root, spark=spark)
    r = eng3.invoke(["ls", "--select", "state:modified.contract", "--state", state])
    assert [x.unique_id for x in r.results] == ["model.dfr.base_orders"]
    r = eng3.invoke(["ls", "--select", "state:modified", "--state", state])
    assert "model.dfr.base_orders" in [x.unique_id for x in r.results]


def test_favor_state_prefers_state_for_unselected(tmp_path, spark):
    """--favor-state: an UNSELECTED upstream resolves to the state namespace
    even though a (stale) local build exists; without the flag the local one
    wins (providers.py:636-646)."""
    prod_dir = _mk(tmp_path, "prod_fs", PROD)
    prod = Engine(prod_dir, spark=spark)
    assert prod.invoke(["run"]).success
    prod_rows = prod.store.read("main", "base_orders").count()

    # dev: build base_orders from a DIFFERENT (restricted) source slice, so
    # the local relation is distinguishable from prod's
    dev_files = dict(PROD)
    dev_files["models/base_orders.sql"] = (
        "{{ config(materialized='table') }} "
        "select o_orderkey, o_custkey, o_totalprice from "
        "{{ source('tpch','orders') }} where o_orderkey < 100"
    )
    dev_dir = _mk(tmp_path, "dev_fs", dev_files)
    dev = Engine(dev_dir, spark=spark)
    assert dev.invoke(["run"]).success  # local (restricted) build exists
    local_rows = dev.store.read("main", "base_orders").count()
    assert local_rows < prod_rows

    state = os.path.join(prod_dir, "target")
    # plain --defer: local relation exists -> local wins
    assert dev.invoke(["run", "--select", "order_rollup",
                       "--defer", "--state", state]).success
    n_local = dev.store.read("main", "order_rollup").count()
    # --favor-state: unselected base_orders resolves to PROD despite local
    assert dev.invoke(["run", "--select", "order_rollup",
                       "--defer", "--favor-state", "--state", state]).success
    n_state = dev.store.read("main", "order_rollup").count()
    base_prod = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    import pyspark.sql.functions as F
    assert n_state == base_prod.select("o_custkey").distinct().count()
    assert n_local == base_prod.filter(F.col("o_orderkey") < 100)\
        .select("o_custkey").distinct().count()
    assert n_state > n_local


def test_state_modified_on_latest_version_bump(tmp_path, spark):
    """Bumping latest_version in schema YAML (no SQL change) marks every
    sibling version state:modified — the version surface is first-class
    node state, not config.meta (reference ModelNode.latest_version,
    nodes.py:503; same_contents covers it)."""
    files = {
        "dbt_project.yml": "name: vb\n",
        "models/api_v1.sql": "select 1 as id",
        "models/api_v2.sql": "select 1 as id, 'x' as status",
        "models/other.sql": "select 42 as answer",
        "models/schema.yml": (
            "version: 2\nmodels:\n  - name: api\n    latest_version: 1\n"
        ),
    }
    prod_dir = _mk(tmp_path, "prod", files)
    prod = Engine(prod_dir, spark=spark)
    assert prod.invoke(["run"]).success

    # same checkout, latest_version bumped 1 -> 2
    dev_files = dict(files)
    dev_files["models/schema.yml"] = (
        "version: 2\nmodels:\n  - name: api\n    latest_version: 2\n"
    )
    dev_dir = _mk(tmp_path, "dev", dev_files)
    dev = Engine(dev_dir, spark=spark)
    state = os.path.join(prod_dir, "target")
    r = dev.invoke(["ls", "--select", "state:modified", "--state", state])
    names = {x.message for x in r.results}
    assert "vb.api_v1" in names and "vb.api_v2" in names
    assert "vb.other" not in names

    # version:latest now selects v2 (was v1 before the bump)
    r2 = dev.invoke(["ls", "--select", "version:latest"])
    assert {x.message for x in r2.results} == {"vb.api_v2"}
    prod_latest = prod.invoke(["ls", "--select", "version:latest"])
    assert {x.message for x in prod_latest.results} == {"vb.api_v1"}


def test_deferred_state_view_reads_state_namespace(tmp_path, spark):
    """A deferred VIEW must resolve its upstream identifiers in the STATE
    namespace (defer__), never against same-named local relations
    (providers.py:634-655): prod's view-over-table chain returns prod's
    data even when dev has rebuilt the base table with different values."""
    files = {
        "dbt_project.yml": "name: dsv\n",
        "models/base.sql": "{{ config(materialized='table') }} select 1 as v",
        "models/vw.sql": "select v * 10 as v10 from {{ ref('base') }}",
        "models/downstream.sql": (
            "{{ config(materialized='table') }} "
            "select v10 from {{ ref('vw') }}"
        ),
    }
    prod_dir = _mk(tmp_path, "prod", files)
    prod = Engine(prod_dir, spark=spark)
    assert prod.invoke(["run"]).success

    dev_files = dict(files)
    dev_files["models/base.sql"] = (
        "{{ config(materialized='table') }} select 2 as v")
    dev_dir = _mk(tmp_path, "dev", dev_files)
    dev = Engine(dev_dir, spark=spark)
    # dev builds ONLY base (locally v=2); vw + downstream defer to state
    assert dev.invoke(["run", "--select", "base"]).success
    r = dev.invoke([
        "run", "--select", "downstream", "--defer", "--favor-state",
        "--state", os.path.join(prod_dir, "target"),
    ])
    assert r.success, [x.message for x in r.results]
    got = spark.sql(
        f"select v10 from parquet.`{os.path.join(dev_dir, 'target', 'warehouse', 'main', 'downstream')}`"
    ).collect()
    # state's vw over state's base: 1*10 — NOT dev's rebuilt base (2*10)
    assert [row.v10 for row in got] == [10]


def test_state_modified_compare_vars(tmp_path, spark):
    """Behavior flag state_modified_compare_vars (reference ProjectFlags):
    a var() value change marks exactly the nodes that reference the var as
    state:modified; without the flag the change is invisible."""
    files = {
        "dbt_project.yml": (
            "name: smv\n"
            "vars: {cutoff: 10}\n"
            "flags: {state_modified_compare_vars: true}\n"
        ),
        "models/uses_var.sql": (
            "select 1 as x where 1 <= {{ var('cutoff') }}"
        ),
        "models/no_var.sql": "select 2 as y",
    }
    prod_dir = _mk(tmp_path, "prod", files)
    prod = Engine(prod_dir, spark=spark)
    assert prod.invoke(["run"]).success
    state = os.path.join(prod_dir, "target")

    # same vars -> nothing modified
    dev = Engine(_mk(tmp_path, "dev", files), spark=spark)
    r = dev.invoke(["ls", "--select", "state:modified", "--state", state])
    assert [x.unique_id for x in r.results] == []

    # changed var -> only the referencing model is modified
    dev2 = Engine(_mk(tmp_path, "dev2", files), spark=spark,
                  vars={"cutoff": 99})
    r2 = dev2.invoke(["ls", "--select", "state:modified", "--state", state])
    assert [x.unique_id for x in r2.results] == ["model.smv.uses_var"]

    # flag off -> var change invisible
    files_off = dict(files)
    files_off["dbt_project.yml"] = "name: smv\nvars: {cutoff: 10}\n"
    dev3 = Engine(_mk(tmp_path, "dev3", files_off), spark=spark,
                  vars={"cutoff": 99})
    r3 = dev3.invoke(["ls", "--select", "state:modified", "--state", state])
    assert [x.unique_id for x in r3.results] == []


def test_state_modified_catches_freshness_and_time_spine_changes(tmp_path, spark):
    """Model-level freshness: and time_spine: configs ride config.meta, so
    editing them marks the model state:modified (the reference compares
    unrendered configs the same way)."""
    files = dict(PROD)
    files["models/schema.yml"] = """
version: 2
models:
  - name: base_orders
    freshness:
      build_after: {count: 2, period: hour}
"""
    prod_dir = _mk(tmp_path, "prod", files)
    prod = Engine(prod_dir, spark=spark)
    assert prod.invoke(["run"]).success
    state = os.path.join(prod_dir, "target")

    # unchanged: nothing modified
    r = prod.invoke(["ls", "--select", "state:modified", "--state", state])
    assert r.success
    assert [x.unique_id for x in r.results] == []

    # change the freshness window only -> modified
    dev = dict(files)
    dev["models/schema.yml"] = files["models/schema.yml"].replace(
        "count: 2", "count: 8")
    dev_dir = _mk(tmp_path, "dev", dev)
    eng = Engine(dev_dir, spark=spark)
    r = eng.invoke(["ls", "--select", "state:modified.configs",
                    "--state", state])
    assert r.success
    assert [x.unique_id for x in r.results] == ["model.dfr.base_orders"]


def test_state_modified_compare_more_unrendered_values(tmp_path, spark, monkeypatch):
    """Behavior flag state_modified_compare_more_unrendered_values
    (reference ProjectFlags + manifest unrendered_config): with the flag,
    a schema-YAML config whose UNRENDERED template is unchanged does not
    mark the node modified even when an env_var() inside it renders
    differently between environments; editing the template itself does."""
    yml = (
        "models:\n"
        "  - name: m\n"
        "    config: {meta: {loc: \"{{ env_var('SMU_LOC', 'x') }}\"}}\n"
    )
    files = {
        "dbt_project.yml": (
            "name: smu\n"
            "flags: {state_modified_compare_more_unrendered_values: true}\n"
        ),
        "models/m.sql": "select 1 as x",
        "models/schema.yml": yml,
    }
    monkeypatch.setenv("SMU_LOC", "prod-bucket")
    prod_dir = _mk(tmp_path, "prod", files)
    prod = Engine(prod_dir, spark=spark)
    assert prod.invoke(["run"]).success
    state = os.path.join(prod_dir, "target")

    # different env rendering, same template -> NOT modified (flag on)
    monkeypatch.setenv("SMU_LOC", "dev-bucket")
    dev = Engine(_mk(tmp_path, "dev", files), spark=spark)
    r = dev.invoke(["ls", "--select", "state:modified", "--state", state])
    assert [x.unique_id for x in r.results] == []

    # flag off -> the rendered difference IS a modification
    files_off = dict(files)
    files_off["dbt_project.yml"] = "name: smu\n"
    dev2 = Engine(_mk(tmp_path, "dev2", files_off), spark=spark)
    r2 = dev2.invoke(["ls", "--select", "state:modified", "--state", state])
    assert [x.unique_id for x in r2.results] == ["model.smu.m"]

    # editing the TEMPLATE is a modification even with the flag
    files_edit = dict(files)
    files_edit["models/schema.yml"] = yml.replace("SMU_LOC", "SMU_OTHER")
    monkeypatch.setenv("SMU_OTHER", "prod-bucket")
    dev3 = Engine(_mk(tmp_path, "dev3", files_edit), spark=spark)
    r3 = dev3.invoke(["ls", "--select", "state:modified", "--state", state])
    assert [x.unique_id for x in r3.results] == ["model.smu.m"]
