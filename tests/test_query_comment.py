"""query-comment config: audit attribution on every executed statement.

Reference: core/dbt/config/project.py:208 (_query_comment_from_cfg),
core/dbt/context/query_header.py + MacroQueryStringSetter semantics
(prepend `/* ... */\\n`, `append: true` trails it). Spark mapping: the
comment rides the executed SQL (persisted under target/run/) and the
node id becomes the Spark job description (UI attribution).
"""

import json
import os

import pytest

from dbt_spark.runner import Engine

BASE = {
    "models/m1.sql": "select 1 as id",
}


def _run(project_dir, spark, proj_yml):
    files = dict(BASE)
    files["dbt_project.yml"] = proj_yml
    pdir = project_dir(files)
    eng = Engine(pdir, spark=spark)
    r = eng.invoke(["run"])
    assert r.success, [getattr(x, "message", None) for x in r.results]
    run_artifact = os.path.join(pdir, "target", "run", "models", "m1.sql")
    with open(run_artifact) as f:
        executed = f.read()
    return pdir, executed


def test_default_comment_prepends_json_header(project_dir, spark):
    pdir, executed = _run(project_dir, spark, "name: qc\n")
    head, _, body = executed.partition("\n")
    assert head.startswith("/*") and head.endswith("*/")
    payload = json.loads(head[2:-2])
    assert payload["app"] == "dbt"
    assert payload["node_id"] == "model.qc.m1"
    assert payload["target_name"]
    # a view's executed statement is its registration DDL
    assert body.strip() == "CREATE OR REPLACE VIEW main.m1 AS select 1 as id"
    # compiled artifact stays comment-free (the comment is an EXECUTION
    # layer concern; target/compiled is the rendered model)
    compiled = os.path.join(pdir, "target", "compiled", "models", "m1.sql")
    if os.path.exists(compiled):
        assert "/*" not in open(compiled).read()


def test_string_template_renders_node_aware(project_dir, spark):
    _, executed = _run(
        project_dir, spark,
        'name: qc\nquery-comment: "node {{ node.unique_id }} for {{ target.name }}"\n',
    )
    assert executed.splitlines()[0] == "/* node model.qc.m1 for spark */"


def test_append_mode_trails_comment(project_dir, spark):
    _, executed = _run(
        project_dir, spark,
        "name: qc\nquery-comment:\n  comment: tail-marker\n  append: true\n",
    )
    assert executed.rstrip().endswith("/* tail-marker */")
    assert not executed.startswith("/*")


def test_empty_string_disables_comment(project_dir, spark):
    _, executed = _run(project_dir, spark, 'name: qc\nquery-comment: ""\n')
    assert "/*" not in executed
    assert executed.strip() == "CREATE OR REPLACE VIEW main.m1 AS select 1 as id"


def _ctx(project_dir, spark, proj_yml):
    # setJobDescription is THREAD-local; the engine's pool workers own it
    # during a run, so the UI-description tests drive the ExecutionContext
    # layer directly from this thread.
    from dbt_spark.operators.materialize import ExecutionContext
    from dbt_spark.plans.manifest import ManifestNode, NodeType

    files = dict(BASE)
    files["dbt_project.yml"] = proj_yml
    pdir = project_dir(files)
    eng = Engine(pdir, spark=spark)
    manifest = eng.parse()
    node = manifest.nodes["model.qc.m1"]
    ctx = ExecutionContext(
        spark=spark, store=eng.store, manifest=manifest, project=eng.project
    )
    return ctx, node


def test_job_description_set_for_spark_ui(project_dir, spark):
    ctx, node = _ctx(project_dir, spark, "name: qc\n")
    ctx.record_execution("select 1 as id", node=node)
    desc = spark.sparkContext.getLocalProperty("spark.job.description")
    assert desc == "dbt: model.qc.m1"


def test_job_label_extends_description_with_comment(project_dir, spark):
    ctx, node = _ctx(
        project_dir, spark,
        "name: qc\nquery-comment:\n  comment: ci-run-42\n  job-label: true\n",
    )
    ctx.record_execution("select 1 as id", node=node)
    desc = spark.sparkContext.getLocalProperty("spark.job.description")
    assert desc == "dbt: model.qc.m1 ci-run-42"


def test_comment_terminator_sanitized(project_dir, spark):
    _, executed = _run(
        project_dir, spark,
        'name: qc\nquery-comment: "evil */ select 1; --"\n',
    )
    # `*/` inside the body must not close the block comment early
    head = executed.splitlines()[0]
    assert head == "/* evil * / select 1; -- */"


def test_hooks_and_tests_get_commented(project_dir, spark):
    files = dict(BASE)
    files["dbt_project.yml"] = "name: qc\n"
    files["models/schema.yml"] = (
        "models:\n  - name: m1\n    columns:\n"
        "      - name: id\n        data_tests: [not_null]\n"
    )
    pdir = project_dir(files)
    eng = Engine(pdir, spark=spark)
    r = eng.invoke(["build"])
    assert r.success
    # the generic test's executed SQL is persisted with the comment and
    # the test node's id
    run_dir = os.path.join(pdir, "target", "run")
    hits = []
    for root, _, names in os.walk(run_dir):
        for n in names:
            body = open(os.path.join(root, n)).read()
            if "not_null" in body or "not_null" in n:
                hits.append(body)
    assert any(h.startswith("/*") and "node_id" in h.splitlines()[0] for h in hits), hits
