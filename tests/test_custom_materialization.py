"""Custom {% materialization %} execution (operators/custom_mat.py).

Reference: materializations are Jinja macros receiving the compiled
SELECT, issuing DDL via {% call statement('main') %}, returning
{'relations': [...]} (core/dbt/task/run.py:305-334); dispatch
specificity adapter > default (manifest.py:1005-1046); package
overrides of builtin names gated on
require_explicit_package_overrides_for_builtin_materializations
(manifest.py:1026-1044, default True = blocked).
"""

import os

import pytest

from dbt_spark.runner import Engine

CUSTOM_MAT = """
{% materialization annotated_table, default %}
  {% call statement('main') %}
    {{ create_table_as(False, this, sql) }}
  {% endcall %}
  {{ return({'relations': [this]}) }}
{% endmaterialization %}
"""

BASE = {
    "dbt_project.yml": "name: cm\n",
    "macros/annotated.sql": CUSTOM_MAT,
    "models/m1.sql": (
        "{{ config(materialized='annotated_table') }} select 1 as id"
    ),
    "models/child.sql": "select id + 1 as id2 from {{ ref('m1') }}",
}


def test_custom_materialization_end_to_end(project_dir, spark):
    pdir = project_dir(BASE)
    eng = Engine(pdir, spark=spark)
    r = eng.invoke(["run"])
    assert r.success, [getattr(x, "message", None) for x in r.results]
    assert [row["id"] for row in eng.store.read("main", "m1").collect()] == [1]
    # downstream ref over the adopted relation
    assert [row["id2"] for row in
            eng.store.read("main", "child").collect()] == [2]
    rel = eng.store.get("main", "m1")
    assert rel.kind == "table" and rel.meta.get("custom_materialization")
    # files live under the engine warehouse (adopted, not copied)
    assert rel.path.startswith(eng.store.warehouse)
    # rebuild is idempotent (pre-clear of stale files + catalog entries)
    assert eng.invoke(["run"]).success


def test_adapter_variant_beats_default(project_dir, spark):
    files = dict(BASE)
    files["macros/annotated.sql"] = CUSTOM_MAT + """
{% materialization annotated_table, adapter='spark' %}
  {% call statement('main') %}
    {{ create_table_as(False, this, "select 'spark' as flavor, id from (" ~ sql ~ ")") }}
  {% endcall %}
  {{ return({'relations': [this]}) }}
{% endmaterialization %}
"""
    pdir = project_dir(files)
    eng = Engine(pdir, spark=spark)
    assert eng.invoke(["run", "--select", "m1"]).success
    row = eng.store.read("main", "m1").collect()[0]
    assert row["flavor"] == "spark"


def test_statement_fetch_result_and_load_result(project_dir, spark):
    files = dict(BASE)
    files["macros/annotated.sql"] = """
{% materialization annotated_table, default %}
  {% call statement('probe', fetch_result=True) %}
    select 41 as answer
  {% endcall %}
  {% set probe = load_result('probe') %}
  {% call statement('main') %}
    {{ create_table_as(False, this, 'select ' ~ (probe.rows[0][0] + 1) ~ ' as id') }}
  {% endcall %}
  {{ return({'relations': [this]}) }}
{% endmaterialization %}
"""
    pdir = project_dir(files)
    eng = Engine(pdir, spark=spark)
    assert eng.invoke(["run", "--select", "m1"]).success
    assert eng.store.read("main", "m1").collect()[0]["id"] == 42


PKG_OVERRIDE = {
    "dbt_project.yml": "name: cm\n",
    "packages.yml": "packages:\n  - local: pkgs/matpack\n",
    "pkgs/matpack/dbt_project.yml": "name: matpack\n",
    "pkgs/matpack/macros/mat.sql": """
{% materialization view, default %}
  {% call statement('main') %}
    {{ create_table_as(False, this, "select 'hijacked' as who") }}
  {% endcall %}
  {{ return({'relations': [this]}) }}
{% endmaterialization %}
""",
    "models/m1.sql": "select 1 as id",
}


def test_package_builtin_override_blocked_by_default(project_dir, spark):
    """Default flag TRUE: a package materialization named after a builtin
    is ignored — the native view operator runs."""
    pdir = project_dir(PKG_OVERRIDE)
    eng = Engine(pdir, spark=spark)
    assert eng.invoke(["run"]).success
    assert eng.store.read("main", "m1").columns == ["id"]


def test_package_builtin_override_allowed_with_legacy_flag(project_dir, spark):
    files = dict(PKG_OVERRIDE)
    files["dbt_project.yml"] = (
        "name: cm\nflags:\n"
        "  require_explicit_package_overrides_for_builtin_materializations:"
        " false\n"
    )
    pdir = project_dir(files)
    eng = Engine(pdir, spark=spark)
    assert eng.invoke(["run"]).success
    assert eng.store.read("main", "m1").collect()[0]["who"] == "hijacked"


def test_root_project_may_override_builtin(project_dir, spark):
    files = dict(BASE)
    files["macros/annotated.sql"] = """
{% materialization view, default %}
  {% call statement('main') %}
    {{ create_table_as(False, this, "select 'rooted' as who") }}
  {% endcall %}
  {{ return({'relations': [this]}) }}
{% endmaterialization %}
"""
    files["models/m1.sql"] = "select 1 as id"
    del files["models/child.sql"]
    pdir = project_dir(files)
    eng = Engine(pdir, spark=spark)
    assert eng.invoke(["run"]).success
    assert eng.store.read("main", "m1").collect()[0]["who"] == "rooted"


def test_no_statements_is_an_error(project_dir, spark):
    files = dict(BASE)
    files["macros/annotated.sql"] = """
{% materialization annotated_table, default %}
  {{ return({'relations': []}) }}
{% endmaterialization %}
"""
    del files["models/child.sql"]
    pdir = project_dir(files)
    eng = Engine(pdir, spark=spark)
    r = eng.invoke(["run", "--select", "m1"])
    assert not r.success
    msg = [x.message for x in r.results if x.status == "error"][0]
    assert "no" in msg and "statement" in msg
