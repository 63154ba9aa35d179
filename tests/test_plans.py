"""Physical-plan shape assertions: the SCALE.md claims as executable checks.

Every headline query family must (a) push its filters into the parquet scan,
(b) prune the read schema to referenced columns, (c) broadcast fixed-size
dimension sides, and (d) keep hot expressions inside WholeStageCodegen. These
are the properties that decide whether a plan survives a 1000× scale-up."""

from dbt_spark.queries import QUERIES

from tests.conftest import SF_DIR_MED


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_pushdown_and_pruning(spark):
    """Q6 (pure scan-filter-agg): all predicates reach PushedFilters; the
    scan reads only the 4 referenced columns of lineitem's 10."""
    plan = _formatted(QUERIES["tpch_q6_forecast_revenue"](spark, SF_DIR_MED))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in read
    assert "l_orderkey" not in read and "l_comment" not in read.lower()


def test_q3_broadcasts_dimension(spark):
    """Q3: the filtered customer dimension joins via broadcast, not shuffle."""
    plan = _formatted(QUERIES["tpch_q3_shipping_priority"](spark, SF_DIR_MED))
    assert "BroadcastHashJoin" in plan


def test_dedup_exact_partial_aggregation(spark):
    """Exact dedup is a hash aggregate with a map-side partial pass (the
    property that makes it shuffle one row per distinct key, not every row)."""
    plan = _formatted(QUERIES["dedup_exact"](spark, SF_DIR_MED))
    assert "HashAggregate" in plan and "Window" not in plan
    assert "partial_min" in plan  # map-side partial pass
    assert "hashpartitioning" in plan


def test_training_pipeline_single_scan_no_udf(spark):
    """The composed training-data pipeline reads documents ONCE and contains
    no Python UDF (BatchEvalPython) stages — all column math is codegen'd."""
    import re

    plan = _formatted(QUERIES["training_data_pipeline"](spark, SF_DIR_MED))
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
