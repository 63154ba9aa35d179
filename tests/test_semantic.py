"""Typed semantic-layer parsing: validation failure modes mirrored from the
reference's functional tests (tests/functional/metrics/test_metrics.py
TestInvalidRefMetrics/TestInvalidDerivedMetrics/TestNamesWith*/,
tests/functional/semantic_models/test_semantic_model_parsing.py
test_semantic_model_error) plus the happy-path fixture shapes from
tests/functional/semantic_models/fixtures.py."""

import pytest

from dbt_spark.plans.semantic import SemanticValidationError
from dbt_spark.runner import Engine
from tests.conftest import SF_DIR

BASE = {
    "dbt_project.yml": "name: sem\n",
    "models/people.sql": (
        "select o_custkey as id, o_orderstatus as favorite_color, "
        "cast(o_orderdate as timestamp) as created_at, o_totalprice as tenure "
        "from {{ source('tpch','orders') }}"
    ),
    "models/sources.yml": """
sources:
  - name: tpch
    tables:
      - name: orders
        meta: {location: "__SF__/orders.parquet"}
""".replace("__SF__", SF_DIR),
}

SEMANTIC_YML = """
semantic_models:
  - name: semantic_people
    label: "Semantic People"
    model: ref('people')
    dimensions:
      - name: favorite_color
        type: categorical
      - name: created_at
        type: TIME
        type_params:
          time_granularity: day
    measures:
      - name: years_tenure
        agg: SUM
        expr: tenure
      - name: people
        agg: count
        expr: id
    entities:
      - name: id
        type: primary
    defaults:
      agg_time_dimension: created_at

metrics:
  - name: number_of_people
    label: "Number of people"
    type: simple
    type_params:
      measure: people
  - name: tenure_sum
    label: "Total tenure"
    type: simple
    type_params:
      measure: years_tenure
  - name: people_per_tenure
    label: "Derived"
    type: derived
    type_params:
      expr: number_of_people / tenure_sum
      metrics:
        - number_of_people
        - tenure_sum

saved_queries:
  - name: people_summary
    query_params:
      metrics: [number_of_people]
      group_by: [Dimension('favorite_color')]
    exports:
      - name: people_export
        config:
          export_as: table

exposures:
  - name: people_dash
    type: dashboard
    maturity: high
    owner: {email: someone@example.com}
    depends_on: ["ref('people')"]

groups:
  - name: core_team
    owner: {name: Core Team}
"""


def _engine(project_dir, spark, extra_yaml):
    pdir = project_dir({**BASE, "models/semantic.yml": extra_yaml})
    return Engine(pdir, spark=spark), pdir


def test_full_semantic_layer_parses_and_links(project_dir, spark):
    eng, _ = _engine(project_dir, spark, SEMANTIC_YML)
    m = eng.parse()
    sm = m.nodes["semantic_model.sem.semantic_people"]
    assert "model.sem.people" in sm.depends_on
    # simple metric depends on the semantic model that defines its measure
    metric = m.nodes["metric.sem.number_of_people"]
    assert "semantic_model.sem.semantic_people" in metric.depends_on
    # derived metric depends on its input metrics
    derived = m.nodes["metric.sem.people_per_tenure"]
    assert "metric.sem.number_of_people" in derived.depends_on
    assert "metric.sem.tenure_sum" in derived.depends_on
    # saved query depends on its metrics
    sq = m.nodes["saved_query.sem.people_summary"]
    assert "metric.sem.number_of_people" in sq.depends_on
    # DAG leaves never execute, but `build` traverses them as NoOp successes
    r = eng.invoke(["build"])
    assert r.success


def test_metric_dangling_measure_fails(project_dir, spark):
    """test_semantic_model_error: measure renamed → SemanticValidationFailure."""
    bad = SEMANTIC_YML.replace("measure: years_tenure", "measure: has_revenue")
    eng, _ = _engine(project_dir, spark, bad)
    with pytest.raises(SemanticValidationError, match="has_revenue"):
        eng.parse()


def test_derived_metric_dangling_input_fails(project_dir, spark):
    bad = SEMANTIC_YML.replace("- tenure_sum", "- no_such_metric")
    eng, _ = _engine(project_dir, spark, bad)
    with pytest.raises(SemanticValidationError, match="no_such_metric"):
        eng.parse()


def test_saved_query_dangling_metric_fails(project_dir, spark):
    bad = SEMANTIC_YML.replace(
        "metrics: [number_of_people]", "metrics: [ghost_metric]"
    )
    eng, _ = _engine(project_dir, spark, bad)
    with pytest.raises(SemanticValidationError, match="ghost_metric"):
        eng.parse()


@pytest.mark.parametrize(
    "name,msg",
    [
        ("number of people", "cannot contain spaces"),
        ("number_of_people!", "letters, numbers and underscores"),
        ("1number", "must begin with a letter"),
        ("n" * 251, "250 characters"),
    ],
)
def test_invalid_metric_names(project_dir, spark, name, msg):
    """TestNamesWithSpaces/SpecialChar/LeadingNumber/LongName."""
    bad = SEMANTIC_YML.replace("name: number_of_people", f"name: {name}", 1)
    eng, _ = _engine(project_dir, spark, bad)
    with pytest.raises(SemanticValidationError, match=msg):
        eng.parse()


def test_metric_missing_type_params_fails(project_dir, spark):
    yml = """
metrics:
  - name: broken
    label: Broken
    type: simple
"""
    eng, _ = _engine(project_dir, spark, yml)
    with pytest.raises(SemanticValidationError, match="type_params"):
        eng.parse()


def test_derived_metric_missing_expr_fails(project_dir, spark):
    """TestInvalidDerivedMetrics: derived without expr."""
    yml = """
metrics:
  - name: broken_derived
    label: Broken
    type: derived
    type_params:
      metrics: [x]
"""
    eng, _ = _engine(project_dir, spark, yml)
    with pytest.raises(SemanticValidationError, match="expr"):
        eng.parse()


def test_invalid_metric_type_fails(project_dir, spark):
    yml = """
metrics:
  - name: badtype
    label: Bad
    type: exotic
    type_params: {measure: m}
"""
    eng, _ = _engine(project_dir, spark, yml)
    with pytest.raises(SemanticValidationError, match="invalid type"):
        eng.parse()


def test_cumulative_bad_window_fails(project_dir, spark):
    yml = """
metrics:
  - name: cumul
    label: Cumulative
    type: cumulative
    type_params:
      measure: people
      window: fortnight
"""
    eng, _ = _engine(project_dir, spark, yml)
    with pytest.raises(SemanticValidationError, match="window"):
        eng.parse()


def test_semantic_model_requires_ref_model(project_dir, spark):
    yml = """
semantic_models:
  - name: no_ref
    model: people
"""
    eng, _ = _engine(project_dir, spark, yml)
    with pytest.raises(SemanticValidationError, match="ref\\(\\)"):
        eng.parse()


def test_time_dimension_requires_granularity(project_dir, spark):
    bad = SEMANTIC_YML.replace(
        "        type_params:\n          time_granularity: day\n", ""
    )
    eng, _ = _engine(project_dir, spark, bad)
    with pytest.raises(SemanticValidationError, match="time_granularity"):
        eng.parse()


def test_invalid_entity_and_agg_types(project_dir, spark):
    bad = SEMANTIC_YML.replace("type: primary", "type: sideways")
    eng, _ = _engine(project_dir, spark, bad)
    with pytest.raises(SemanticValidationError, match="entity"):
        eng.parse()
    bad = SEMANTIC_YML.replace("agg: SUM", "agg: harmonic_mean")
    eng, _ = _engine(project_dir, spark, bad)
    with pytest.raises(SemanticValidationError, match="invalid agg"):
        eng.parse()


def test_count_measure_requires_expr(project_dir, spark):
    bad = SEMANTIC_YML.replace("        agg: count\n        expr: id\n",
                               "        agg: count\n")
    eng, _ = _engine(project_dir, spark, bad)
    with pytest.raises(SemanticValidationError, match="count aggregation"):
        eng.parse()


def test_exposure_owner_and_type_validation(project_dir, spark):
    yml = """
exposures:
  - name: bad_exposure
    type: dashboard
    owner: {slack: '#nope'}
"""
    eng, _ = _engine(project_dir, spark, yml)
    with pytest.raises(SemanticValidationError, match="owner"):
        eng.parse()
    yml = """
exposures:
  - name: bad_exposure2
    type: billboard
    owner: {name: x}
"""
    eng, _ = _engine(project_dir, spark, yml)
    with pytest.raises(SemanticValidationError, match="invalid type"):
        eng.parse()


def test_group_requires_owner(project_dir, spark):
    yml = """
groups:
  - name: ownerless
"""
    eng, _ = _engine(project_dir, spark, yml)
    with pytest.raises(SemanticValidationError, match="owner"):
        eng.parse()


def test_duplicate_measure_names_fail(project_dir, spark):
    dup = SEMANTIC_YML + """
  - name: other_model
    model: ref('people')
    measures:
      - name: people
        agg: sum
        expr: id
"""
    # splice the second semantic model into the semantic_models block instead
    dup = SEMANTIC_YML.replace(
        "metrics:",
        """  - name: other_model
    model: ref('people')
    measures:
      - name: people
        agg: sum
        expr: id

metrics:""",
        1,
    )
    eng, _ = _engine(project_dir, spark, dup)
    with pytest.raises(SemanticValidationError, match="unique"):
        eng.parse()


def test_selector_methods_still_work(project_dir, spark):
    eng, _ = _engine(project_dir, spark, SEMANTIC_YML)
    ids = {x.unique_id for x in eng.invoke(["ls", "--select", "+saved_query:*"]).results}
    # upstream closure of the saved query: metric -> semantic model -> model
    assert "metric.sem.number_of_people" in ids
    assert "semantic_model.sem.semantic_people" in ids
    assert "model.sem.people" in ids


@pytest.mark.parametrize("yaml_extra,msg", [
    ("""
  - name: bad_cp
    label: b
    type: conversion
    type_params:
      conversion_type_params:
        base_measure: order_total
        conversion_measure: order_total
        constant_properties:
          - {base_property: session}
""", "constant_properties"),
    ("""
  - name: bad_otg
    label: b
    type: derived
    type_params:
      expr: a
      metrics:
        - {name: some_metric, alias: a, offset_to_grain: fortnight}
""", "offset_to_grain"),
    ("""
  - name: bad_tg
    label: b
    type: simple
    time_granularity: fortnight
    type_params: {measure: order_total}
""", "time_granularity"),
])
def test_new_metric_field_validation(yaml_extra, msg):
    import yaml as _yaml

    from dbt_spark.plans.semantic import SemanticValidationError, validate_metric

    entry = _yaml.safe_load("metrics:" + yaml_extra)["metrics"][0]
    with pytest.raises(SemanticValidationError, match=msg):
        validate_metric(entry)
